"""Bucketed MinHash band store: the LSH analog of ``shingle_store.py``.

``doc_minhash_lsh`` re-pays two costs every run on a corpus that is
deduplicated repeatedly (each new-data drop, each curation round):

1. the signatures — num_hashes affine-mixed mins over each doc's shingle
   set (one md5 per shingle, map-only but CPU-heavy: 114 s at 1000× bench
   scale, where DuckDB is OOM-killed outright);
2. the band self-join's TWO hash exchanges of the exploded
   ``(doc, band, band_sig)`` relation (the two sides project different
   column names, so ReuseExchange cannot dedupe them).

This module pays both ONCE at ingest: the band relation — num_bands
fixed-width rows per doc with the full signature riding along — is written
CLUSTERED BY (band, band_sig), so every later LSH run reads co-located
buckets and plans ZERO Exchange on either self-join side; only the
inherent pair groupBy remains. The same stored relation serves the
incremental near-dup path (``dedup.incremental_minhash_dedup``): the
standing band store is exactly this table, already bucketed on the join
key the batch probes.

Same manifest discipline as the shingle store: keyed by (source sf_dir,
num_hashes, band_size, n, n_buckets); a store built from different data or
parameters is never served, and rebuilds go through a process-unique
scratch dir + atomic rename (``store_util``) so concurrent builders never
interleave.

Reference shape: the reference's near-dup pass is a single-process pandas
re-shingle per run (no storage-layout concept); this is the Spark-native
ingest-time answer at 100 TB, where the signature pass alone is hours of
CPU and the band exchange is tens of TB.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from satsure_agri_datapipeline_spark.sources.store_util import (
    atomic_swap,
    build_scratch_dir,
    layout_dir,
)

MANIFEST_NAME = "_band_manifest.json"


def _table_name(num_hashes: int, band_size: int, n: int) -> str:
    return f"bkt_bands_h{num_hashes}b{band_size}n{n}"


def build_band_store(
    spark: SparkSession,
    sf_dir: str | Path,
    layout: str | Path,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    n_buckets: int = 32,
) -> dict:
    """One-time ingest: compute the documents table's MinHash signatures
    (identical expressions to ``dedup.minhash_signature_arrays`` — the
    downstream match counts are bit-identical) exploded into band rows,
    written bucketed AND bucket-sorted by (band, band_sig). Idempotent."""
    from satsure_agri_datapipeline_spark.operators.dedup import (
        _band_rows,
        minhash_signature_arrays,
    )
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    layout = Path(layout).resolve()
    layout.mkdir(parents=True, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signature_arrays(docs, num_hashes=num_hashes, n=n)
    bands = _band_rows(sig, band_size, "doc_id").select(
        "doc_id", "band", "band_sig", "sig"
    )
    tbl = _table_name(num_hashes, band_size, n)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        bands.repartition(n_buckets, "band", "band_sig")
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, "band", "band_sig")
        .sortBy("band", "band_sig")
        .option("path", str(layout / tbl))
        .saveAsTable(tbl)
    )
    manifest = {
        "sf_dir": str(Path(sf_dir).resolve()),
        "num_hashes": num_hashes,
        "band_size": band_size,
        "n": n,
        "n_buckets": n_buckets,
        "table": tbl,
        "ddl_schema": ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in bands.schema.fields
        ),
    }
    (layout / MANIFEST_NAME).write_text(json.dumps(manifest, indent=2))
    return manifest


def _attach(spark: SparkSession, layout: Path, manifest: dict) -> None:
    tbl = manifest["table"]
    location = layout / tbl
    if "'" in str(location):
        raise ValueError(f"band store path contains a quote: {location}")
    spark.sql(
        f"CREATE TABLE {tbl} ({manifest['ddl_schema']}) USING parquet "
        f"CLUSTERED BY (band, band_sig) SORTED BY (band, band_sig) "
        f"INTO {manifest['n_buckets']} BUCKETS LOCATION '{location}'"
    )


def ensure_band_store(
    spark: SparkSession,
    sf_dir: str | Path,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    n_buckets: int = 32,
) -> DataFrame:
    """Serve the band relation ``(doc_id, band, band_sig, sig)`` from the
    per-(sf_dir, params) store, building it on first use and re-attaching
    (metadata-only DDL) in later sessions. Rebuilds when the manifest is
    missing, was built from different data/params, or is older than the
    source parquet."""
    sf_resolved = Path(sf_dir).resolve()
    layout = layout_dir(
        "bands", sf_resolved, num_hashes, band_size, n, n_buckets
    )
    manifest_path = layout / MANIFEST_NAME
    tbl = _table_name(num_hashes, band_size, n)

    needs_build = True
    if manifest_path.exists():
        manifest = json.loads(manifest_path.read_text())
        src = sf_resolved / "documents.parquet"
        src_mtime = src.stat().st_mtime_ns if src.exists() else 0
        if (
            manifest.get("sf_dir") == str(sf_resolved)
            and (
                manifest.get("num_hashes"),
                manifest.get("band_size"),
                manifest.get("n"),
                manifest.get("n_buckets"),
            )
            == (num_hashes, band_size, n, n_buckets)
            and manifest_path.stat().st_mtime_ns > src_mtime
        ):
            needs_build = False
    if needs_build:
        if layout.exists():  # stale layout must not survive under the path
            shutil.rmtree(layout, ignore_errors=True)
        scratch = build_scratch_dir(layout)
        build_band_store(
            spark,
            sf_resolved,
            scratch,
            num_hashes=num_hashes,
            band_size=band_size,
            n=n,
            n_buckets=n_buckets,
        )
        atomic_swap(scratch, layout)
    manifest = json.loads(manifest_path.read_text())
    # A table by this name from an EARLIER store (different tmpdir, rebuilt
    # data, or the scratch dir the build registered) must not be served —
    # verify location, like bucketed.register_bucketed_layout does.
    from satsure_agri_datapipeline_spark.sources.bucketed import (
        _normalize_location,
        _table_location,
    )

    if not spark.catalog.tableExists(tbl):
        _attach(spark, layout, manifest)
    elif _table_location(spark, tbl) != _normalize_location(str(layout / tbl)):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        _attach(spark, layout, manifest)
    return spark.table(tbl)
