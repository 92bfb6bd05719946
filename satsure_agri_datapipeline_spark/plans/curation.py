"""End-to-end training-corpus curation: the composed LLM-data pipeline
(quality gate → exact dedup → near-dup canonical dedup → benchmark
decontamination) as ONE lazy DataFrame lineage.

This is the documents-table analog of ``plans/pipeline.py``: each stage is
an existing operator (``operators/text.py`` / ``operators/dedup.py``), the
composition materializes nothing between stages, and the only actions are
whatever the caller runs on the returned frame (plus optional stage
counters, which cost one aggregate pass per stage when requested).

Scale notes: every stage keeps its own shuffle discipline (digest-keyed
exact dedup, bucket-join near-dup, broadcast benchmark hashes); the stages
compose without re-keying the corpus — documents flow through keyed by
id, and text columns never enter a shuffle except as 60-bit hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.operators import dedup as dd
from satsure_agri_datapipeline_spark.operators import text as tx


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    min_quality_e4: int = 5000,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    decon_n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return the curated corpus (same schema as ``docs``), keeping a doc iff

    1. its heuristic quality score ≥ ``min_quality_e4`` (×10⁴ scale);
    2. it is the keeper (min id) of its exact-content group;
    3. it is the canonical (min id) member of its near-dup cluster
       (n-gram Jaccard ≥ ``jaccard_threshold``);
    4. it shares no ``decon_n``-gram with ``benchmark`` (when given) —
       benchmark docs present in ``docs`` are thereby dropped too.
    """
    quality = tx.quality_score(docs, text_col=text_col, id_col=id_col).select(
        id_col, "quality_score_e4"
    )
    kept = (
        docs.join(quality, id_col)
        .where(F.col("quality_score_e4") >= min_quality_e4)
        .drop("quality_score_e4")
    )

    keepers = dd.exact_duplicate_groups(kept, text_col=text_col, id_col=id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    kept = kept.join(keepers, id_col, "left_semi")

    pairs = dd.ngram_jaccard_pairs(
        kept, n=shingle_n, threshold=jaccard_threshold,
        text_col=text_col, id_col=id_col,
    )
    kept = dd.dedup_keep_canonical(kept, pairs, id_col=id_col)

    if benchmark is not None:
        contaminated = tx.decontaminate(
            kept, benchmark, n=decon_n, text_col=text_col, id_col=id_col
        ).select(id_col)
        kept = kept.join(contaminated, id_col, "left_anti")
    return kept


def curation_stats(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    **kwargs,
) -> dict[str, int]:
    """Per-stage survivor counts (A13-style counters for the curation
    pipeline). Runs one count per stage — call on samples at extreme scale."""
    out: dict[str, int] = {"input": docs.count()}
    q = kwargs.get("min_quality_e4", 5000)
    stage1 = curate_corpus(
        docs, None, min_quality_e4=q, jaccard_threshold=1.1, decon_n=9999
    )
    # jaccard_threshold > 1 disables near-dup; exact dedup still applies
    out["after_quality_and_exact"] = stage1.count()
    stage2 = curate_corpus(docs, None, **{**kwargs, "min_quality_e4": q})
    out["after_near_dup"] = stage2.count()
    if benchmark is not None:
        out["after_decontaminate"] = curate_corpus(docs, benchmark, **kwargs).count()
    return out


def curate_incremental(
    new_docs: DataFrame,
    digest_store: DataFrame | None,
    band_store: DataFrame | None,
    min_quality_e4: int = 5000,
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Continuous-crawl form of :func:`curate_corpus`: curate ONE new batch
    against the standing stores instead of re-curating the corpus.

    Stages (same discipline as the batch pipeline, all store-bounded):

    1. quality gate — row-local, no state;
    2. exact dedup vs the 64-byte-per-doc digest store
       (``dd.incremental_exact_dedup``);
    3. near-dup dedup vs the LSH band store
       (``dd.incremental_minhash_dedup``), applied to exact-survivors only
       so an exact duplicate never pays signature cost.

    Returns ``(accepted, new_digests, new_bands)`` — the caller appends the
    two store deltas and writes the accepted docs; per-batch cost is
    ∝ batch size + store-join cost, never corpus rescan. The stores are
    plain DataFrames (parquet tables in practice), so the whole loop fits
    ``foreachBatch`` unchanged.
    """
    quality = tx.quality_score(new_docs, text_col=text_col, id_col=id_col).select(
        id_col, "quality_score_e4"
    )
    gated = (
        new_docs.join(quality, id_col)
        .where(F.col("quality_score_e4") >= min_quality_e4)
        .drop("quality_score_e4")
    )
    exact_ok, new_digests = dd.incremental_exact_dedup(
        gated, digest_store, text_col=text_col, id_col=id_col
    )
    accepted, new_bands = dd.incremental_minhash_dedup(
        exact_ok,
        band_store,
        num_hashes=num_hashes,
        band_size=band_size,
        n=shingle_n,
        text_col=text_col,
        id_col=id_col,
    )
    # digests must reflect only finally-accepted docs, or a rejected
    # near-dup would poison the exact store for future batches
    final_digests = (
        accepted.withColumn("digest", F.sha2(F.col(text_col), 256))
        .select("digest")
    )
    return accepted, final_digests, new_bands
