"""Bucketed SimHash fingerprint store: the Hamming-LSH analog of
``band_store.py`` — the last dedup candidate-generation family that was
still re-paying its signature pass every run (r9 verdict task 2).

``doc_simhash`` / ``doc_simhash_pairs`` re-pay two costs per run on a
corpus that is deduplicated repeatedly:

1. the fingerprints — per doc, an md5 over every distinct token feeding a
   ±1 bit-sum (vectorized Arrow UDF, map-only but CPU-heavy; DuckDB is
   kernel-OOM-killed on this exact workload at 1000× bench scale, r7);
2. the banded Hamming self-join's TWO hash exchanges of the exploded
   ``(doc, band, band_key)`` relation (the two sides project different
   column names, so ReuseExchange cannot dedupe them).

This module pays both ONCE at ingest: the band relation — ``n_bands``
fixed-width rows per doc, each carrying the full 62-bit-max fingerprint —
is written CLUSTERED BY (band, band_key), so later runs read co-located
buckets and plan ZERO Exchange on either self-join side; only the inherent
pair groupBy remains. ``doc_simhash`` itself is the ``band = 0``
projection (one row per doc, fingerprint rides every band row), a pruned
bucketed scan instead of the full md5-per-token pass.

Same lifecycle discipline as the band store (store_util): deterministic
per-(source, params) layout dir; manifests written atomically
(temp + os.replace); a per-file source fingerprint classifying changes as
fresh / append / rebuild; append deltas ∝ the batch under an O_EXCL
writer lock with a ``pending_delta`` crash marker; rebuilds through a
process-unique scratch dir + atomic rename with the stale layout renamed
aside. ``simhash_store_or_none`` serves a FRESH store under the RAW
catalog names by default (``SPARK_GRAFT_SIMHASH_STORE=none`` opts out)
and never builds implicitly.

Reference shape: the reference's near-dup pass is a single-process pandas
re-shingle per run (no storage-layout concept,
/root/reference/src/components/transformation.py); this is the
Spark-native ingest-time answer at 100 TB.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.sources.store_util import (
    atomic_swap,
    default_n_buckets,
    build_scratch_dir,
    cached_source_fingerprint,
    claim_append,
    classify_source_change,
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

MANIFEST_NAME = "_simhash_manifest.json"
ENV_KNOB = "SPARK_GRAFT_SIMHASH_STORE"


def _table_name(bits: int, n_bands: int) -> str:
    return f"bkt_simhash_b{bits}x{n_bands}"


def _band_rows(sh: DataFrame, bits: int, n_bands: int) -> DataFrame:
    """Explode fingerprints into (doc_id, simhash, band, band_key) — the
    same expressions as ``dedup.simhash_near_dup_pairs`` so the stored
    join keys are bit-identical to the recompute."""
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    return sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_key", F.expr(f"shiftright(simhash, band * {band_bits}) & {mask}")
    )


def build_simhash_store(
    spark: SparkSession,
    sf_dir: str | Path,
    layout: str | Path,
    bits: int = 32,
    n_bands: int = 4,
    n_buckets: int | None = None,
) -> dict:
    """One-time ingest: compute the documents table's SimHash fingerprints
    (identical Arrow UDF to ``dedup.simhash``) exploded into band rows,
    written bucketed AND bucket-sorted by (band, band_key). Idempotent."""
    from satsure_agri_datapipeline_spark.operators.dedup import simhash
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    if bits % n_bands != 0:
        raise ValueError(f"bits={bits} must be divisible by n_bands={n_bands}")
    if n_buckets is None:  # scale-aware default (r12, store_util)
        n_buckets = default_n_buckets(Path(sf_dir).resolve() / "documents.parquet")
    layout = Path(layout).resolve()
    layout.mkdir(parents=True, exist_ok=True)
    # Fingerprint BEFORE the read: a file landing mid-build is then absent
    # from the manifest and picked up as an append delta next ensure.
    files = source_fingerprint(Path(sf_dir).resolve() / "documents.parquet")
    docs = load_table(spark, sf_dir, "documents")
    bands = _band_rows(simhash(docs, bits=bits), bits, n_bands)
    tbl = _table_name(bits, n_bands)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        bands.repartition(n_buckets, "band", "band_key")
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, "band", "band_key")
        .sortBy("band", "band_key")
        .option("path", str(layout / tbl))
        .saveAsTable(tbl)
    )
    manifest = {
        "sf_dir": str(Path(sf_dir).resolve()),
        "bits": bits,
        "n_bands": n_bands,
        "n_buckets": n_buckets,
        "table": tbl,
        "files": files,
        "deltas": [],
        "ddl_schema": ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in bands.schema.fields
        ),
    }
    write_manifest(layout / MANIFEST_NAME, manifest)
    return manifest


def _attach(spark: SparkSession, layout: Path, manifest: dict) -> None:
    tbl = manifest["table"]
    location = layout / tbl
    if "'" in str(location):
        raise ValueError(f"simhash store path contains a quote: {location}")
    spark.sql(
        f"CREATE TABLE {tbl} ({manifest['ddl_schema']}) USING parquet "
        f"CLUSTERED BY (band, band_key) SORTED BY (band, band_key) "
        f"INTO {manifest['n_buckets']} BUCKETS LOCATION '{location}'"
    )


def _serve_attached(spark: SparkSession, layout: Path, manifest: dict) -> DataFrame:
    """Attach-if-needed with location verification (see band_store)."""
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
    manifest_path: Path, sf_resolved: Path, params: tuple, cached: bool = False
) -> tuple[str, list[str], dict | None]:
    """(state, new_files, manifest); state ∈ fresh|append|rebuild — same
    contract as band_store._classify (pending_delta or an unreadable
    manifest ⇒ rebuild; ``cached=True`` for the hot serving hook only —
    ensure keeps the exact fingerprint so mutations are always caught)."""
    manifest = read_manifest_or_none(manifest_path)
    if manifest is None:
        return ("rebuild", [], None)
    if manifest.get("sf_dir") != str(sf_resolved) or (
        manifest.get("bits"),
        manifest.get("n_bands"),
        manifest.get("n_buckets"),
    ) != params:
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
        return ("rebuild", [], manifest)  # compact the delta chain
    return (state, new_files, manifest)


def append_simhash_delta(
    spark: SparkSession,
    layout: Path,
    manifest: dict,
    new_files: list[str],
) -> dict:
    """Delta maintenance for a data drop: fingerprint ONLY the new source
    files and append their band rows into the standing bucketed table —
    cost ∝ the batch, not the corpus. Band rows are per-doc, so appended
    docs need no reconciliation with standing rows. Same pending_delta
    crash discipline and O_EXCL writer lock as ``band_store`` (the caller
    holds the lock)."""
    from satsure_agri_datapipeline_spark.operators.dedup import simhash
    from satsure_agri_datapipeline_spark.sources.tables import load_parquet_files

    manifest_path = layout / MANIFEST_NAME
    _serve_attached(spark, layout, manifest)
    pending = dict(manifest, pending_delta=sorted(new_files))
    write_manifest(manifest_path, pending)

    src = Path(manifest["sf_dir"]) / "documents.parquet"
    # Record ONLY the files this delta actually read (see band_store).
    current = source_fingerprint(src)
    read_files = {f: current[f] for f in new_files if f in current}
    if set(read_files) != set(new_files):
        raise FileNotFoundError(
            "simhash-store delta: a new source file vanished before the read"
        )
    docs = load_parquet_files(spark, [src / f for f in sorted(new_files)])
    bands = _band_rows(
        simhash(docs, bits=manifest["bits"]), manifest["bits"], manifest["n_bands"]
    )
    (
        bands.repartition(manifest["n_buckets"], "band", "band_key")
        .write.format("parquet")
        .mode("append")
        .bucketBy(manifest["n_buckets"], "band", "band_key")
        .sortBy("band", "band_key")
        .saveAsTable(manifest["table"])
    )
    done = dict(manifest)
    done["files"] = {**manifest.get("files", {}), **read_files}
    done["deltas"] = list(manifest.get("deltas", [])) + [sorted(new_files)]
    write_manifest(manifest_path, done)
    return done


def ensure_simhash_store(
    spark: SparkSession,
    sf_dir: str | Path,
    bits: int = 32,
    n_bands: int = 4,
    n_buckets: int | None = None,
) -> DataFrame:
    """Serve the band relation ``(doc_id, simhash, band, band_key)`` from
    the per-(sf_dir, params) store, building it on first use. Fingerprint-
    driven maintenance: unchanged source → serve; source that only gained
    files → append delta over just those files (under the writer lock);
    mutation/deletion → full rebuild via scratch dir + rename-aside."""
    sf_resolved = Path(sf_dir).resolve()
    if n_buckets is None:  # scale-aware default (r12, store_util)
        n_buckets = default_n_buckets(sf_resolved / "documents.parquet")
    params = (bits, n_bands, n_buckets)
    layout = layout_dir("simhash", sf_resolved, bits, n_bands, n_buckets)
    manifest_path = layout / MANIFEST_NAME
    state, new_files, manifest = _classify(manifest_path, sf_resolved, params)
    if state == "append":
        if claim_append(layout):
            try:
                manifest = append_simhash_delta(spark, layout, manifest, new_files)
                return _serve_attached(spark, layout, manifest)
            except Exception as exc:
                log_store_fallback("simhash append delta", exc)
                state = "rebuild"  # pending_delta marker forces it anyway
            finally:
                release_append(layout)
        else:
            # Another session claimed this delta; its pending/done manifest
            # decides — re-classify and serve or rebuild on their outcome.
            state, new_files, manifest = _classify(
                manifest_path, sf_resolved, params
            )
            if state == "fresh":
                return _serve_attached(spark, layout, manifest)
            state = "rebuild"
    if state == "rebuild":
        aside = retire_layout(layout)
        scratch = build_scratch_dir(layout)
        build_simhash_store(
            spark, sf_resolved, scratch, bits=bits, n_bands=n_bands,
            n_buckets=n_buckets,
        )
        atomic_swap(scratch, layout)
        discard_retired(aside)
        # ADVICE r12: drop superseded-bucket-count layout generations.
        discard_stale_siblings(
            "simhash", MANIFEST_NAME, layout,
            {"sf_dir": str(sf_resolved), "bits": bits, "n_bands": n_bands},
        )
        manifest = json.loads((layout / MANIFEST_NAME).read_text())
    return _serve_attached(spark, layout, manifest)


def simhash_store_or_none(
    spark: SparkSession,
    sf_dir: str | Path,
    bits: int = 32,
    n_bands: int = 4,
    n_buckets: int | None = None,
) -> DataFrame | None:
    """Default-serving hook for the RAW query names (r8 fact-layout
    pattern): serve a FRESH store when one exists, ``None`` otherwise.
    Never builds and never delta-appends; a store awaiting an append is
    stale for the raw name. ``SPARK_GRAFT_SIMHASH_STORE=none|off|0|raw``
    is the escape hatch."""
    knob = os.environ.get(ENV_KNOB, "")
    if knob.lower() in ("none", "off", "0", "raw"):
        return None
    sf_resolved = Path(sf_dir).resolve()
    if n_buckets is None:  # scale-aware default (r12, store_util)
        n_buckets = default_n_buckets(sf_resolved / "documents.parquet")
    params = (bits, n_bands, n_buckets)
    layout = layout_dir("simhash", sf_resolved, bits, n_bands, n_buckets)
    state, _, manifest = _classify(
        layout / MANIFEST_NAME, sf_resolved, params, cached=True
    )
    if state != "fresh":
        return None
    try:
        return _serve_attached(spark, layout, manifest)
    except Exception as exc:
        # racing rebuild retired the layout mid-attach: raw path
        log_store_fallback("simhash store attach", exc)
        return None


def fingerprints_from_store(bands: DataFrame) -> DataFrame:
    """``doc_simhash`` from the stored band relation: the fingerprint rides
    every band row, so ``band = 0`` is exactly one row per doc — a pruned
    bucketed scan instead of the md5-per-token fingerprint pass."""
    return bands.where(F.col("band") == 0).select("doc_id", "simhash")


def pairs_from_store(
    bands: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    n_bands: int = 4,
) -> DataFrame:
    """``doc_simhash_pairs`` from the stored band relation: the banded
    Hamming self-join on (band, band_key) — both sides scan the SAME
    bucketed table, so the plan has ZERO Exchange. Bit-identical to
    ``dedup.simhash_near_dup_pairs`` (exhaustive by pigeonhole for
    max_hamming < n_bands). ``bits``/``n_bands`` must match the store's
    manifest (defaults = the default store layout); pair dedup is the
    lowest-agreeing-band predicate, not a groupBy exchange (r11).

    Mismatch guard (r12 ADVICE): with the groupBy dedup gone, a wrong
    ``bits``/``n_bands`` silently DROPS or DUPLICATES pairs (the predicate
    recomputes band keys from the fingerprint), so every band row is
    checked against the claimed geometry — ``band < n_bands`` and
    ``band_key == shiftright(simhash, band·band_bits) & mask``, the exact
    build expression of ``_band_rows``. Three integer ops per band row in
    codegen; a 60-bit store served with the 32/4 defaults raises on the
    first band row instead of returning a wrong pair set."""
    from satsure_agri_datapipeline_spark.operators.dedup import (
        lowest_agreeing_band_predicate,
    )

    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    geometry_ok = (F.col("band") < n_bands) & (
        F.col("band_key")
        == F.expr(f"shiftright(simhash, band * {band_bits}) & {mask}")
    )
    bands = bands.where(
        F.when(geometry_ok, F.lit(True)).otherwise(
            F.raise_error(
                F.lit(
                    f"pairs_from_store: stored band rows do not match "
                    f"bits={bits}/n_bands={n_bands} — pass the store's "
                    f"manifest params"
                )
            )
        )
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sim_a"),
        "band",
        "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sim_b"),
        "band",
        "band_key",
    )
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(lowest_agreeing_band_predicate(bits // n_bands, n_bands))
        .select("id_a", "id_b", F.expr("bit_count(sim_a ^ sim_b)").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
