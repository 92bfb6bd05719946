"""Standing IVF (k-means) embedding index — the ANN family's ingest-time
store (r12, verdict task 4).

Every dedup candidate-generation family already pays its signature pass
ONCE at ingest (band/shingle/simhash/digest stores); the similarity family
was the last heavy family recomputing its index per query: both
``emb_ann_ivf_kmeans`` and ``emb_semantic_dedup`` re-run the 2-iteration
distributed Lloyd's fit (`operators/similarity.py kmeans_fit`) plus the
full-corpus assignment on every call. At 100 TB an embedding index is
exactly the artifact you maintain incrementally — FAISS-style IVF keeps
trained centroids and re-assigns only new vectors.

Layout (per (sf_dir, k, iterations, seed)):

- ``centroids/``      — k rows (cluster_id, centroid array<double>), the
  trained quantizer. Plain parquet; broadcast-sized by construction.
- ``assignments/``    — (vec_id, embedding, dist, cluster_id), hive-
  PARTITIONED BY cluster_id: a probe of nprobe cells reads nprobe/k of
  the data via partition pruning — the scan shape `ivf_topk_kmeans`'s
  docstring promises ("written partitioned by cluster_id"). ``dist`` is
  the squared-euclidean distance to the owning centroid (raw double, the
  exact argmin value), so SemDeDup keeper selection needs ZERO vector
  math at serve time.

Same lifecycle discipline as the five dedup stores (store_util):
manifests written atomically, per-file source fingerprints, append deltas
∝ the batch under the O_EXCL writer lock with a ``pending_delta`` crash
marker, delta-chain compaction, rename-aside rebuilds.

DELTA SEMANTICS DIFFER FROM THE DEDUP STORES — and the serving rules
encode it: a band/shingle/digest delta is recompute-identical (per-doc
deterministic functions), but an IVF delta assigns new vectors against
the PINNED standing centroids, which is NOT what a full refit over the
grown corpus would produce (k-means seeds and means shift). That is the
correct production contract (nobody refits a 100-TB index per batch;
compaction — every ``max_deltas`` drops — IS the periodic refit), but it
means a delta'd store no longer equals the from-scratch recompute the RAW
catalog names are oracle-pinned to. Hence:

- ``ensure_ivf_store`` (the ``_stored`` names / incremental pipelines):
  serves fresh, delta-appends on source growth, rebuilds on mutation or
  compaction — cost ∝ batch.
- ``ivf_store_or_none`` (the raw names' default-serving hook): serves a
  store ONLY when it is fresh AND has an empty delta chain — i.e. exactly
  when stored assignments equal the recompute. A delta'd store falls back
  to raw compute for those names until compaction refits it.

Reference shape: the reference has no embedding surface at all; this is
the Spark-native ANN-at-ingest answer.
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

MANIFEST_NAME = "_ivf_manifest.json"
ENV_KNOB = "SPARK_GRAFT_IVF_STORE"


def _assign_with_dist(
    emb: DataFrame, cent: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """(id, embedding, dist, cluster_id): the argmin assignment of
    ``operators/similarity.kmeans_assign`` RETAINING the winning distance —
    the same ``min(struct(dist, cluster))`` tiebreak (equal distances go to
    the smaller cluster_id), so the stored rows are bit-identical to what
    both raw consumers derive internally. Original (float) embedding rides
    along untouched: serving-time cosine casts per element exactly like the
    raw path, so parquet roundtrip changes nothing."""
    dist = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    d = emb.crossJoin(F.broadcast(cent)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cluster_id").alias("__c"),
        dist.alias("__dist"),
    )
    return (
        d.groupBy(id_col)
        .agg(
            F.min(F.struct(F.col("__dist"), F.col("__c"))).alias("__m"),
            F.first(vec_col).alias(vec_col),
        )
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__m.__dist").alias("dist"),
            F.col("__m.__c").alias("cluster_id"),
        )
    )


def build_ivf_store(
    spark: SparkSession,
    sf_dir: str | Path,
    layout: str | Path,
    k: int = 8,
    iterations: int = 2,
    seed: int = 0,
) -> dict:
    """One-time ingest: fit the deterministic k-means quantizer
    (``similarity.kmeans_fit`` — hash-seeded init, 9-dp-rounded centroids,
    so the fit is exactly reproducible) over the embeddings table, then
    write centroids + the full distance-retaining assignment partitioned
    by cluster_id. Idempotent."""
    from satsure_agri_datapipeline_spark.operators.similarity import kmeans_fit
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    layout = Path(layout).resolve()
    layout.mkdir(parents=True, exist_ok=True)
    # Fingerprint BEFORE the read (store discipline): a file landing
    # mid-build is absent from the manifest → next ensure appends it.
    files = source_fingerprint(Path(sf_dir).resolve() / "embeddings.parquet")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = kmeans_fit(emb, k=k, iterations=iterations, seed=seed)
    cent.write.mode("overwrite").parquet(str(layout / "centroids"))
    cent_back = spark.read.parquet(str(layout / "centroids"))
    asg = _assign_with_dist(emb, cent_back, "embedding", "vec_id")
    (
        asg.write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(str(layout / "assignments"))
    )
    manifest = {
        "sf_dir": str(Path(sf_dir).resolve()),
        "k": k,
        "iterations": iterations,
        "seed": seed,
        "files": files,
        "deltas": [],
    }
    write_manifest(layout / MANIFEST_NAME, manifest)
    return manifest


def _serve(spark: SparkSession, layout: Path) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments) path reads — no catalog table to manage;
    each read re-lists the partition dirs, so a rebuild is picked up
    without refresh bookkeeping."""
    cent = spark.read.parquet(str(layout / "centroids"))
    asg = spark.read.parquet(str(layout / "assignments"))
    return cent, asg


def _classify(
    manifest_path: Path, sf_resolved: Path, params: tuple, cached: bool = False
) -> tuple[str, list[str], dict | None]:
    """(state, new_files, manifest); state ∈ fresh|append|rebuild — same
    contract as the dedup stores' _classify."""
    manifest = read_manifest_or_none(manifest_path)
    if manifest is None:
        return ("rebuild", [], None)
    if manifest.get("sf_dir") != str(sf_resolved) or (
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


def append_ivf_delta(
    spark: SparkSession,
    layout: Path,
    manifest: dict,
    new_files: list[str],
) -> dict:
    """Delta maintenance for a data drop: assign ONLY the new files'
    vectors against the STANDING centroids and append into the partitioned
    assignment layout — cost ∝ the batch, never a refit. Same
    pending_delta crash discipline as the dedup stores; writer mutual
    exclusion is the caller's job via ``claim_append``. After this the
    store serves the PINNED-centroid semantics (see module docstring) —
    the raw-name hook stops serving it until compaction refits."""
    from satsure_agri_datapipeline_spark.sources.tables import load_parquet_files

    manifest_path = layout / MANIFEST_NAME
    pending = dict(manifest, pending_delta=sorted(new_files))
    write_manifest(manifest_path, pending)

    src = Path(manifest["sf_dir"]) / "embeddings.parquet"
    current = source_fingerprint(src)
    read_files = {f: current[f] for f in new_files if f in current}
    if set(read_files) != set(new_files):
        raise FileNotFoundError(
            "ivf-store delta: a new source file vanished before the read"
        )
    emb = load_parquet_files(spark, [src / f for f in sorted(new_files)]).select(
        "vec_id", "embedding"
    )
    cent = spark.read.parquet(str(layout / "centroids"))
    asg = _assign_with_dist(emb, cent, "embedding", "vec_id")
    (
        asg.write.mode("append")
        .partitionBy("cluster_id")
        .parquet(str(layout / "assignments"))
    )
    done = dict(manifest)
    done["files"] = {**manifest.get("files", {}), **read_files}
    done["deltas"] = list(manifest.get("deltas", [])) + [sorted(new_files)]
    write_manifest(manifest_path, done)
    return done


def ensure_ivf_store(
    spark: SparkSession,
    sf_dir: str | Path,
    k: int = 8,
    iterations: int = 2,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Serve ``(centroids, assignments)`` from the per-(sf_dir, k,
    iterations, seed) store, building on first use. Unchanged source →
    serve; source that only gained files → delta-assign those files
    against the standing centroids (under the writer lock); mutation /
    deletion / delta-chain overflow → full rebuild (a fresh fit) via
    scratch dir + rename-aside."""
    sf_resolved = Path(sf_dir).resolve()
    params = (k, iterations, seed)
    layout = layout_dir("ivf", sf_resolved, k, iterations, seed)
    manifest_path = layout / MANIFEST_NAME
    state, new_files, manifest = _classify(manifest_path, sf_resolved, params)
    if state == "append":
        if claim_append(layout):
            try:
                manifest = append_ivf_delta(spark, layout, manifest, new_files)
                return _serve(spark, layout)
            except Exception as exc:
                log_store_fallback("ivf append delta", exc)
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
        build_ivf_store(
            spark, sf_resolved, scratch, k=k, iterations=iterations, seed=seed
        )
        atomic_swap(scratch, layout)
        discard_retired(aside)
    return _serve(spark, layout)


def ivf_store_or_none(
    spark: SparkSession,
    sf_dir: str | Path,
    k: int = 8,
    iterations: int = 2,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame] | None:
    """Default-serving hook for the RAW query names: serve ONLY a store
    that is fresh AND has never been delta-appended — the one state in
    which stored assignments equal the from-scratch recompute the raw
    names' oracles pin (see module docstring: IVF deltas are
    pinned-centroid semantics, not refit-identical). Never builds.
    ``SPARK_GRAFT_IVF_STORE=none|off|0|raw`` is the escape hatch."""
    knob = os.environ.get(ENV_KNOB, "")
    if knob.lower() in ("none", "off", "0", "raw"):
        return None
    sf_resolved = Path(sf_dir).resolve()
    params = (k, iterations, seed)
    layout = layout_dir("ivf", sf_resolved, k, iterations, seed)
    state, _, manifest = _classify(
        layout / MANIFEST_NAME, sf_resolved, params, cached=True
    )
    if state != "fresh" or manifest.get("deltas"):
        return None
    try:
        return _serve(spark, layout)
    except Exception as exc:
        # racing rebuild retired the layout mid-read: raw path
        log_store_fallback("ivf store read", exc)
        return None


def ann_topk_from_store(
    cent: DataFrame,
    asg: DataFrame,
    query_id: int,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """``emb_ann_ivf_kmeans`` from the standing index: probe selection on
    the k-row centroid relation, then exact cosine over ONLY the probed
    cells — the cell filter is a partition-pruning join against the
    cluster_id-partitioned assignment layout, so the scan reads nprobe/k
    of the corpus. Bit-identical to ``similarity.ivf_topk_kmeans`` (same
    expressions over the same float arrays; the fit is deterministic and
    the store build used it)."""
    from satsure_agri_datapipeline_spark.operators.similarity import (
        cosine_similarity_col,
    )

    q = asg.where(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("__q")
    )
    qdist = F.aggregate(
        F.zip_with(
            F.col("__q"),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probes = (
        cent.crossJoin(F.broadcast(q))
        .select("cluster_id", qdist.alias("__d"))
        .orderBy(F.col("__d").asc(), F.col("cluster_id").asc())
        .limit(nprobe)
        .select("cluster_id")
    )
    sim_col = cosine_similarity_col(F.col("embedding"), F.col("__q"))
    return (
        asg.join(F.broadcast(probes), "cluster_id")
        .crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_id)
        .select(F.col("vec_id"), F.round(sim_col, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(k)
    )


def semantic_dedup_from_store(asg: DataFrame) -> DataFrame:
    """``emb_semantic_dedup`` from the standing index: keeper selection is
    ONE aggregate over the stored (vec_id, dist, cluster_id) rows — zero
    vector math, zero fit, zero broadcast. The stored ``dist`` is the raw
    argmin double, so the 6-dp display rounding happens here exactly as in
    ``similarity.semantic_dedup``."""
    return (
        asg.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(F.struct(F.col("dist"), F.col("vec_id"))).alias("__k"),
        )
        .select(
            "cluster_id",
            F.col("__k.vec_id").alias("keeper_vec_id"),
            "n_vectors",
            F.round(F.col("__k.dist"), 6).alias("keeper_dist"),
        )
    )
