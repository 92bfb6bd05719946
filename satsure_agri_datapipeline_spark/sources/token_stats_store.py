"""Standing per-document token-stats store for BM25 retrieval
(optimization r14, VERDICT r13 "next round" item 3).

``operators/text.py bm25_topk`` needs two corpus-wide quantities no query
filter can bound — N (document count) and avgdl (total tokens / N) — plus
per-doc ``dl``. Their derivation re-tokenized the FULL corpus on every
query: the one remaining full-corpus scan in the retrieval family (the tf
leg's scan is substring-prefiltered to docs that can match a term). This
module gives those statistics the same lifecycle as the band/shingle/
digest stores: a deterministic per-(source, params) bucketed table with
manifest fingerprinting, append deltas ∝ the batch under the O_EXCL
writer lock, ``pending_delta`` crash markers, delta-chain compaction,
rename-aside rebuilds, and a never-serve-stale default-serving hook.

Layout: ``(doc_id BIGINT, dl BIGINT)`` — one row per document passing
BM25's corpus filter (``text IS NOT NULL AND trim(text) != ''``), with
``dl = size(split(trim(text), '\\s+'))`` exactly as the query's corpus
leg computes it (case mapping never changes token counts, the r13
value-identity note). Written CLUSTERED BY (doc_id): the aggregate
consumer doesn't care, but a dl-join consumer gets the corpus-side
exchange for free. 16 bytes/doc ≈ 16 GB per trillion docs — the
statistics relation stays queryable at corpus sizes where re-tokenizing
is a full 100 TB pass.

Append-delta note: a data drop appends the new files' (doc_id, dl) rows
without touching standing rows — per-document statistics are row-local,
so the delta is exact (no re-distinct needed; a doc_id duplicated across
drops would be double-counted by the RAW path too).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.sources.store_util import (
    atomic_swap,
    build_scratch_dir,
    cached_source_fingerprint,
    claim_append,
    classify_source_change,
    default_n_buckets,
    discard_retired,
    discard_stale_siblings,
    layout_dir,
    log_store_fallback,
    max_deltas,
    read_manifest_or_none,
    release_append,
    retire_layout,
    source_fingerprint,
    write_manifest,
)

MANIFEST_NAME = "_token_stats_manifest.json"
ENV_KNOB = "SPARK_GRAFT_TOKEN_STATS_STORE"
TABLE = "bkt_token_stats"


def _stat_rows(docs: DataFrame) -> DataFrame:
    """BM25's corpus-stats derivation, verbatim: the filter and the token
    count MUST stay expression-identical to ``text.bm25_topk``'s corpus
    leg, or the served aggregate diverges from the raw path."""
    return docs.where(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    ).select(
        F.col("doc_id"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("dl"),
    )


def build_token_stats_store(
    spark: SparkSession,
    sf_dir: str | Path,
    layout: str | Path,
    n_buckets: int | None = None,
) -> dict:
    """One-time ingest: (doc_id, dl) rows, bucketed + bucket-sorted by
    doc_id. Idempotent."""
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    if n_buckets is None:
        n_buckets = default_n_buckets(Path(sf_dir).resolve() / "documents.parquet")
    layout = Path(layout).resolve()
    layout.mkdir(parents=True, exist_ok=True)
    files = source_fingerprint(Path(sf_dir).resolve() / "documents.parquet")
    docs = load_table(spark, sf_dir, "documents")
    rows = _stat_rows(docs)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    (
        rows.repartition(n_buckets, "doc_id")
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .option("path", str(layout / TABLE))
        .saveAsTable(TABLE)
    )
    manifest = {
        "sf_dir": str(Path(sf_dir).resolve()),
        "n_buckets": n_buckets,
        "table": TABLE,
        "files": files,
        "deltas": [],
        "ddl_schema": "`doc_id` bigint, `dl` bigint",
    }
    write_manifest(layout / MANIFEST_NAME, manifest)
    return manifest


def _attach(spark: SparkSession, layout: Path, manifest: dict) -> None:
    tbl = manifest["table"]
    location = layout / tbl
    if "'" in str(location):
        raise ValueError(f"token-stats store path contains a quote: {location}")
    spark.sql(
        f"CREATE TABLE {tbl} ({manifest['ddl_schema']}) USING parquet "
        f"CLUSTERED BY (doc_id) SORTED BY (doc_id) "
        f"INTO {manifest['n_buckets']} BUCKETS LOCATION '{location}'"
    )


def _serve_attached(spark: SparkSession, layout: Path, manifest: dict) -> DataFrame:
    from satsure_agri_datapipeline_spark.sources.bucketed import (
        _normalize_location,
        _table_location,
    )
    from satsure_agri_datapipeline_spark.sources.store_util import (
        refresh_if_rebuilt,
    )

    tbl = manifest["table"]
    if not spark.catalog.tableExists(tbl):
        _attach(spark, layout, manifest)
    elif _table_location(spark, tbl) != _normalize_location(str(layout / tbl)):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        _attach(spark, layout, manifest)
    refresh_if_rebuilt(spark, tbl, layout / MANIFEST_NAME)
    return spark.table(tbl)


def _classify(
    manifest_path: Path, sf_resolved: Path, n_buckets: int, cached: bool = False
) -> tuple[str, list[str], dict | None]:
    manifest = read_manifest_or_none(manifest_path)
    if manifest is None:
        return ("rebuild", [], None)
    if manifest.get("sf_dir") != str(sf_resolved) or (
        manifest.get("n_buckets") != n_buckets
    ):
        return ("rebuild", [], manifest)
    if "pending_delta" in manifest:
        return ("rebuild", [], manifest)
    src = sf_resolved / "documents.parquet"
    if cached:
        try:
            salt = manifest_path.stat().st_mtime_ns
        except OSError:
            salt = 0
        current = cached_source_fingerprint(src, salt)
    else:
        current = source_fingerprint(src)
    state, new_files = classify_source_change(manifest.get("files"), current)
    if state == "append" and len(manifest.get("deltas", [])) >= max_deltas():
        return ("rebuild", [], manifest)  # compact
    return (state, new_files, manifest)


def append_token_stats_delta(
    spark: SparkSession,
    layout: Path,
    manifest: dict,
    new_files: list[str],
) -> dict:
    """Delta maintenance for a data drop: tokenize ONLY the new files'
    rows and append — cost ∝ the batch, not the corpus."""
    from satsure_agri_datapipeline_spark.sources.tables import load_parquet_files

    manifest_path = layout / MANIFEST_NAME
    _serve_attached(spark, layout, manifest)
    pending = dict(manifest, pending_delta=sorted(new_files))
    write_manifest(manifest_path, pending)

    src = Path(manifest["sf_dir"]) / "documents.parquet"
    current = source_fingerprint(src)
    read_files = {f: current[f] for f in new_files if f in current}
    if set(read_files) != set(new_files):
        raise FileNotFoundError(
            "token-stats delta: a new source file vanished before the read"
        )
    docs = load_parquet_files(spark, [src / f for f in sorted(new_files)])
    rows = _stat_rows(docs)
    (
        rows.repartition(manifest["n_buckets"], "doc_id")
        .write.format("parquet")
        .mode("append")
        .bucketBy(manifest["n_buckets"], "doc_id")
        .sortBy("doc_id")
        .saveAsTable(manifest["table"])
    )
    done = dict(manifest)
    done["files"] = {**manifest.get("files", {}), **read_files}
    done["deltas"] = list(manifest.get("deltas", [])) + [sorted(new_files)]
    write_manifest(manifest_path, done)
    return done


def ensure_token_stats_store(
    spark: SparkSession,
    sf_dir: str | Path,
    n_buckets: int | None = None,
) -> DataFrame:
    """Serve the (doc_id, dl) relation from the per-(sf_dir, n_buckets)
    store, building on first use; append-delta / rebuild maintenance
    identical to the digest store."""
    sf_resolved = Path(sf_dir).resolve()
    if n_buckets is None:
        n_buckets = default_n_buckets(sf_resolved / "documents.parquet")
    layout = layout_dir("token_stats", sf_resolved, n_buckets)
    manifest_path = layout / MANIFEST_NAME
    state, new_files, manifest = _classify(manifest_path, sf_resolved, n_buckets)
    if state == "append":
        if claim_append(layout):
            try:
                manifest = append_token_stats_delta(
                    spark, layout, manifest, new_files
                )
                return _serve_attached(spark, layout, manifest)
            except Exception as exc:
                log_store_fallback("token-stats append delta", exc)
                state = "rebuild"
            finally:
                release_append(layout)
        else:
            state, new_files, manifest = _classify(
                manifest_path, sf_resolved, n_buckets
            )
            if state == "fresh":
                return _serve_attached(spark, layout, manifest)
            state = "rebuild"
    if state == "rebuild":
        aside = retire_layout(layout)
        scratch = build_scratch_dir(layout)
        build_token_stats_store(spark, sf_resolved, scratch, n_buckets=n_buckets)
        atomic_swap(scratch, layout)
        discard_retired(aside)
        discard_stale_siblings(
            "token_stats", MANIFEST_NAME, layout, {"sf_dir": str(sf_resolved)}
        )
        manifest = json.loads((layout / MANIFEST_NAME).read_text())
    return _serve_attached(spark, layout, manifest)


def token_stats_store_or_none(
    spark: SparkSession,
    sf_dir: str | Path,
    n_buckets: int | None = None,
) -> DataFrame | None:
    """Default-serving hook for the RAW query names: serve a FRESH store
    when one exists, ``None`` otherwise. Never builds, never appends;
    ``SPARK_GRAFT_TOKEN_STATS_STORE=none|off|0|raw`` is the escape hatch."""
    knob = os.environ.get(ENV_KNOB, "")
    if knob.lower() in ("none", "off", "0", "raw"):
        return None
    sf_resolved = Path(sf_dir).resolve()
    if n_buckets is None:
        n_buckets = default_n_buckets(sf_resolved / "documents.parquet")
    layout = layout_dir("token_stats", sf_resolved, n_buckets)
    state, _, manifest = _classify(
        layout / MANIFEST_NAME, sf_resolved, n_buckets, cached=True
    )
    if state != "fresh":
        return None
    try:
        return _serve_attached(spark, layout, manifest)
    except Exception as exc:
        log_store_fallback("token-stats attach", exc)
        return None
