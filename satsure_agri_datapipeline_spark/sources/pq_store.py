"""Standing product-quantization codes store — the ANN family's MEMORY-path
ingest artifact (r13).

The IVF store (``sources/ivf_store.py``) keeps the cell routing; this store
keeps the COMPRESSED vectors: trained per-subspace codebooks plus the m-int
code of every corpus vector. At 100 TB this is the relation ADC search
actually scans — dim-64 float32 embeddings are 256 B/vector, the m=8 codes
are 8 small ints (~50× smaller), and ``pq_topk_adc`` touches only the codes
(distances come out of a broadcast m×k LUT). Recomputing the fit + the
full-corpus encode per query is exactly the per-query waste the other six
stores retire for their families.

Layout (per (sf_dir, m, k, iterations, seed)):

- ``codebook/`` — m×k rows (subspace, cluster_id, centroid array<double>),
  the trained per-subspace quantizers. Broadcast-sized by construction.
- ``codes/``    — (vec_id, codes array<int>). Plain parquet: the ADC scan
  is map-only (zip_with against the broadcast LUT row), so there is no
  join key to bucket by — file count follows the writing job's
  parallelism.

Same lifecycle discipline as the other stores (store_util): atomic
manifests, per-file source fingerprints, O_EXCL append lock,
``pending_delta`` crash marker, delta-chain compaction, rename-aside
rebuilds.

DELTA SEMANTICS ARE THE IVF STORE'S, NOT THE DEDUP STORES': a delta
encodes new vectors against the PINNED standing codebooks — the correct
production contract (nobody refits codebooks per batch; compaction IS the
periodic refit) but NOT what a full refit over the grown corpus would
produce (per-subspace seeds and means shift). Hence the same split
serving rule:

- ``ensure_pq_store`` (``_stored`` names / pipelines): serves fresh,
  delta-encodes on source growth, rebuilds on mutation / chain overflow.
- ``pq_store_or_none`` (the raw names' default-serving hook): serves ONLY
  fresh AND never-delta'd — exactly when stored codes equal the
  from-scratch recompute the raw names' oracles pin.

Reference shape: the reference has no embedding surface; this is the
Spark-native IVF-PQ-at-ingest answer (Jégou et al., "Product quantization
for nearest neighbor search", public).
"""

from __future__ import annotations

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
    discard_retired,
    layout_dir,
    log_store_fallback,
    max_deltas,
    read_manifest_or_none,
    release_append,
    retire_layout,
    source_fingerprint,
    write_manifest,
)

MANIFEST_NAME = "_pq_manifest.json"
ENV_KNOB = "SPARK_GRAFT_PQ_STORE"


def build_pq_store(
    spark: SparkSession,
    sf_dir: str | Path,
    layout: str | Path,
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    seed: int = 0,
) -> dict:
    """One-time ingest: train the per-subspace codebooks
    (``similarity.pq_fit`` — deterministic, so the build is exactly
    reproducible) over the embeddings table, then encode every vector and
    write codebook + codes. Idempotent."""
    from satsure_agri_datapipeline_spark.operators.similarity import (
        pq_encode,
        pq_fit,
    )
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    layout = Path(layout).resolve()
    layout.mkdir(parents=True, exist_ok=True)
    # Fingerprint BEFORE the read (store discipline): a file landing
    # mid-build is absent from the manifest → next ensure appends it.
    files = source_fingerprint(Path(sf_dir).resolve() / "embeddings.parquet")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq_fit(emb, m=m, k=k, iterations=iterations, seed=seed)
    cb.write.mode("overwrite").parquet(str(layout / "codebook"))
    cb_back = spark.read.parquet(str(layout / "codebook"))
    codes = pq_encode(emb, cb_back, m=m)
    codes.write.mode("overwrite").parquet(str(layout / "codes"))
    manifest = {
        "sf_dir": str(Path(sf_dir).resolve()),
        "m": m,
        "k": k,
        "iterations": iterations,
        "seed": seed,
        "files": files,
        "deltas": [],
    }
    write_manifest(layout / MANIFEST_NAME, manifest)
    return manifest


def _serve(spark: SparkSession, layout: Path) -> tuple[DataFrame, DataFrame]:
    """(codebook, codes) path reads — each read re-lists the dirs, so a
    rebuild is picked up without refresh bookkeeping."""
    cb = spark.read.parquet(str(layout / "codebook"))
    codes = spark.read.parquet(str(layout / "codes"))
    return cb, codes


def _classify(
    manifest_path: Path, sf_resolved: Path, params: tuple, cached: bool = False
) -> tuple[str, list[str], dict | None]:
    """(state, new_files, manifest); state ∈ fresh|append|rebuild — same
    contract as the other stores' _classify."""
    manifest = read_manifest_or_none(manifest_path)
    if manifest is None:
        return ("rebuild", [], None)
    if manifest.get("sf_dir") != str(sf_resolved) or (
        manifest.get("m"),
        manifest.get("k"),
        manifest.get("iterations"),
        manifest.get("seed"),
    ) != params:
        return ("rebuild", [], manifest)
    if "pending_delta" in manifest:
        return ("rebuild", [], manifest)
    src = sf_resolved / "embeddings.parquet"
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
        return ("rebuild", [], manifest)  # compaction IS the periodic refit
    return (state, new_files, manifest)


def append_pq_delta(
    spark: SparkSession,
    layout: Path,
    manifest: dict,
    new_files: list[str],
) -> dict:
    """Delta maintenance for a data drop: encode ONLY the new files'
    vectors against the STANDING codebooks and append into the codes
    layout — cost ∝ the batch, never a refit. Same pending_delta crash
    discipline as the other stores; writer mutual exclusion is the
    caller's job via ``claim_append``. After this the store serves
    pinned-codebook semantics (see module docstring) — the raw-name hook
    stops serving it until compaction refits."""
    from satsure_agri_datapipeline_spark.operators.similarity import pq_encode
    from satsure_agri_datapipeline_spark.sources.tables import load_parquet_files

    manifest_path = layout / MANIFEST_NAME
    pending = dict(manifest, pending_delta=sorted(new_files))
    write_manifest(manifest_path, pending)

    src = Path(manifest["sf_dir"]) / "embeddings.parquet"
    current = source_fingerprint(src)
    read_files = {f: current[f] for f in new_files if f in current}
    if set(read_files) != set(new_files):
        raise FileNotFoundError(
            "pq-store delta: a new source file vanished before the read"
        )
    emb = load_parquet_files(spark, [src / f for f in sorted(new_files)]).select(
        "vec_id", "embedding"
    )
    cb = spark.read.parquet(str(layout / "codebook"))
    codes = pq_encode(emb, cb, m=int(manifest["m"]))
    codes.write.mode("append").parquet(str(layout / "codes"))
    done = dict(manifest)
    done["files"] = {**manifest.get("files", {}), **read_files}
    done["deltas"] = list(manifest.get("deltas", [])) + [sorted(new_files)]
    write_manifest(manifest_path, done)
    return done


def ensure_pq_store(
    spark: SparkSession,
    sf_dir: str | Path,
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Serve ``(codebook, codes)`` from the per-(sf_dir, m, k, iterations,
    seed) store, building on first use. Unchanged source → serve; source
    that only gained files → delta-encode those files against the standing
    codebooks (under the writer lock); mutation / deletion / delta-chain
    overflow → full rebuild (a fresh fit) via scratch dir + rename-aside."""
    sf_resolved = Path(sf_dir).resolve()
    params = (m, k, iterations, seed)
    layout = layout_dir("pq", sf_resolved, m, k, iterations, seed)
    manifest_path = layout / MANIFEST_NAME
    state, new_files, manifest = _classify(manifest_path, sf_resolved, params)
    if state == "append":
        if claim_append(layout):
            try:
                manifest = append_pq_delta(spark, layout, manifest, new_files)
                return _serve(spark, layout)
            except Exception as exc:
                log_store_fallback("pq append delta", exc)
                state = "rebuild"  # pending_delta marker forces it anyway
            finally:
                release_append(layout)
        else:
            # Another session claimed this delta; its manifest decides.
            state, new_files, manifest = _classify(
                manifest_path, sf_resolved, params
            )
            if state == "fresh":
                return _serve(spark, layout)
            state = "rebuild"
    if state == "rebuild":
        aside = retire_layout(layout)
        scratch = build_scratch_dir(layout)
        build_pq_store(
            spark, sf_resolved, scratch, m=m, k=k, iterations=iterations, seed=seed
        )
        atomic_swap(scratch, layout)
        discard_retired(aside)
    return _serve(spark, layout)


def pq_store_or_none(
    spark: SparkSession,
    sf_dir: str | Path,
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame] | None:
    """Default-serving hook for the RAW query names: serve ONLY a store
    that is fresh AND has never been delta-appended — the one state in
    which stored codes equal the from-scratch recompute the raw names'
    oracles pin (PQ deltas are pinned-codebook semantics, not
    refit-identical). Never builds. ``SPARK_GRAFT_PQ_STORE=none|off|0|raw``
    is the escape hatch."""
    knob = os.environ.get(ENV_KNOB, "")
    if knob.lower() in ("none", "off", "0", "raw"):
        return None
    sf_resolved = Path(sf_dir).resolve()
    params = (m, k, iterations, seed)
    layout = layout_dir("pq", sf_resolved, m, k, iterations, seed)
    state, _, manifest = _classify(
        layout / MANIFEST_NAME, sf_resolved, params, cached=True
    )
    if state != "fresh" or manifest.get("deltas"):
        return None
    try:
        return _serve(spark, layout)
    except Exception as exc:
        # racing rebuild retired the layout mid-read: raw path
        log_store_fallback("pq store read", exc)
        return None


def codebook_report_from_store(cb: DataFrame, codes: DataFrame) -> DataFrame:
    """``emb_pq_codebook`` from the standing store: per-codeword assignment
    counts come from ONE posexplode + hash-aggregate over the m-int codes
    relation — zero distance math, zero fit. Bit-identical to the raw path
    (the store build used the same deterministic fit/encode)."""
    counts = (
        codes.select(F.posexplode("codes").alias("subspace", "cluster_id"))
        .groupBy("subspace", "cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = F.round(
        F.sqrt(
            F.aggregate(
                F.transform("centroid", lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
        6,
    )
    return (
        cb.join(counts, ["subspace", "cluster_id"], "left")
        .select(
            "subspace",
            "cluster_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_vectors"),
            norm.alias("centroid_norm"),
        )
        .orderBy("subspace", "cluster_id")
    )
