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
    shingle_store: DataFrame | None = None,
    broadcast_id_limit: int = 2_000_000,
    max_shingle_df: int | None = None,
    decon_store: DataFrame | None = None,
    decon_bench_exploded: DataFrame | None = None,
    quality_kernel: bool = False,
) -> DataFrame:
    """Return the curated corpus (same schema as ``docs``), keeping a doc iff

    1. its heuristic quality score ≥ ``min_quality_e4`` (×10⁴ scale);
    2. it is the keeper (min id) of its exact-content group;
    3. it is the canonical (min id) member of its near-dup cluster
       (n-gram Jaccard ≥ ``jaccard_threshold``);
    4. it shares no ``decon_n``-gram with ``benchmark`` (when given) —
       benchmark docs present in ``docs`` are thereby dropped too.

    ``shingle_store`` (optional, r8): the corpus's bucketed exploded
    shingle relation (``sources/shingle_store.ensure_shingle_store`` with
    matching ``shingle_n`` — the caller owns parameter consistency).
    When given, stage 3 skips re-shingling: the store is restricted to
    the surviving ids with a BROADCAST semi-join (ids are fixed-width —
    ~16 MB per 2M docs — and the broadcast preserves the store's
    bucketing, so the Jaccard self-join still plans zero Exchange).
    Jaccard scores are corpus-independent (per-pair set overlap), so
    restricting full-corpus shingles to kept docs yields exactly the
    pairs the per-run shingling computes. When the measured survivor-id
    count exceeds ``broadcast_id_limit`` the restriction auto-degrades to
    a plain (shuffled) semi-join — the store's bucketing is lost but the
    run completes instead of OOMing the driver on the broadcast (r11:
    the comment-only escape hatch DNF'd the 1000×/5 M-doc run; this is
    the CC ``driver_threshold`` gate pattern applied to the broadcast).

    ``max_shingle_df`` (r12): when set, stage 3 runs the BOUNDED-STATE
    df-capped Jaccard (``dedup.ngram_jaccard_pairs_capped``) instead of
    the uncapped pair pipeline — document frequencies are computed over
    the stage-3 SURVIVOR corpus (quality+exact keepers), shingles hotter
    than the cap are dropped, and near-dup scores use the capped sets.
    This changes which pairs edge the cluster graph BY DEFINITION (its
    own oracle semantics), and is the spill-free production form at
    scale: the uncapped pair aggregate is the 400 GiB-class state
    PERF.md r12 retired.

    ``decon_store`` (r12): the corpus's bucketed ``decon_n``-gram shingle
    relation. When given (requires ``shingle_store`` too — the production
    config), stage 4's per-run n-gram hashing — the single largest stage
    of the 1000× profile — becomes a semi-join restriction of the store
    to the quality+exact survivor ids (a SUPERSET of stage 4's input,
    which is safe: the contaminated-id set is consumed by an anti-join,
    so extra ids never match).
    """
    kept, _ = _curate_staged(
        docs,
        benchmark,
        observe_stages=False,
        min_quality_e4=min_quality_e4,
        jaccard_threshold=jaccard_threshold,
        shingle_n=shingle_n,
        decon_n=decon_n,
        text_col=text_col,
        id_col=id_col,
        shingle_store=shingle_store,
        broadcast_id_limit=broadcast_id_limit,
        max_shingle_df=max_shingle_df,
        decon_store=decon_store,
        decon_bench_exploded=decon_bench_exploded,
        quality_kernel=quality_kernel,
    )
    return kept


def _curate_staged(
    docs: DataFrame,
    benchmark: DataFrame | None,
    observe_stages: bool,
    min_quality_e4: int,
    jaccard_threshold: float,
    shingle_n: int,
    decon_n: int,
    text_col: str,
    id_col: str,
    shingle_store: DataFrame | None = None,
    broadcast_id_limit: int = 2_000_000,
    max_shingle_df: int | None = None,
    decon_store: DataFrame | None = None,
    decon_bench_exploded: DataFrame | None = None,
    quality_kernel: bool = False,
) -> tuple[DataFrame, dict]:
    """Shared staged lineage. With ``observe_stages`` each stage boundary
    carries a ``CollectMetrics`` row count (Spark dedupes the metric across
    plan fan-out, so a stage relation consumed by both the predicate-derive
    and predicate-apply subtrees still counts once)."""
    from pyspark.sql import Observation

    observations: dict[str, "Observation"] = {}

    def mark(df: DataFrame, stage: str) -> DataFrame:
        if not observe_stages:
            return df
        obs = Observation(f"curate:{stage}")
        observations[stage] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    docs = mark(docs, "input")
    # Stages 1+2 fused into ONE pass (optimization r13): quality score as an
    # inline expression and the exact-dedup keeper as an AGGREGATE —
    # groupBy(digest).agg(min(id)) on a narrow (id, digest, score)
    # projection. The r13 first cut used MIN(id) OVER (PARTITION BY digest)
    # + filter; downstream consumes ONLY the keeper id set (kept_ids), so
    # the window's full-row pass-through bought nothing and cost a
    # sort-within-partition plus a full-row exchange. The aggregate gets
    # map-side partial aggregation (duplicate digests combine BEFORE the
    # shuffle — on a dup-heavy corpus the exchange carries distinct digests
    # per task, not rows) and no sort. Id set identical by construction:
    # min-id-per-digest-group IS the exact_duplicate_groups keeper rule,
    # and NULL digests form one group in both forms. The pre-fusion history
    # (two diamonds: docs JOIN quality_score(docs) ON id, then
    # kept SEMI-JOIN exact_duplicate_groups(kept)) and its race
    # (1.062 s -> 0.608 s, tools/race_curation_stage12.py) are in
    # OPTIMIZATION_r13.md §2; the window->aggregate re-cut is §9.
    # ``quality_kernel`` (optimization r14): score via the one-pass Arrow
    # kernel instead of the three-regex-pass JVM expression — identical
    # per-doc values (operators/text.py:quality_score_kernel_col's parity
    # ledger), −45% on this subplan at 100×. The caller size-gates: the
    # Python round-trip only amortizes past ~100 MiB of corpus.
    q_col = (
        tx.quality_score_kernel_col(F.col(text_col))
        if quality_kernel
        else tx.quality_score_col(F.col(text_col))
    )
    scored = docs.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("__digest"),
        q_col.alias("__q"),
    )
    kept_q = mark(
        scored.where(F.col("__q") >= min_quality_e4), "after_quality"
    )
    kept = mark(
        kept_q.groupBy("__digest").agg(F.min(id_col).alias(id_col)),
        "after_exact",
    )

    # Materialize the quality+exact survivor IDS once (r9): the near-dup
    # stage's pair derivation executes during plan CONSTRUCTION (the
    # connected-components collect), and the final action used to
    # re-execute the whole quality+exact lineage a second time. Persisting
    # the id set (8 bytes/doc) and rebuilding the survivor rows as
    # docs ⋉ ids makes both consumers share ONE execution of the scoring
    # stages; the observe markers ride the ids' lineage, so staged
    # counters still fire on the final action. Caller releases via
    # ``operators.dedup.release`` / the bench rearm registry.
    from pyspark import StorageLevel

    kept_ids = kept.select(id_col).persist(StorageLevel.MEMORY_AND_DISK)
    extra_deps: list[DataFrame] = []
    survivors = docs.join(kept_ids, id_col, "left_semi")

    if shingle_store is not None:
        # Size-gate the broadcast (r12, verdict task 2): the id set must be
        # materialized here anyway (the CC collect below consumes it), so
        # the count reuses the persist. Above the gate a broadcast of the
        # survivor ids OOMs a driver-sized heap; degrade to a plain semi-
        # join — the store's bucketing is lost (the Jaccard self-join pays
        # its exchanges again) but the pipeline completes. Same pattern as
        # connected_components' driver_threshold gate.
        n_ids = kept_ids.count()
        if n_ids <= broadcast_id_limit:
            restricted = F.broadcast(kept_ids)
        else:
            import logging

            logging.getLogger(__name__).warning(
                "curate_corpus: %d survivor ids exceed broadcast_id_limit=%d;"
                " degrading the shingle-store restriction to a shuffled"
                " semi-join (bucketing lost, run completes)",
                n_ids,
                broadcast_id_limit,
            )
            restricted = kept_ids
        surviving = shingle_store.join(restricted, id_col, "left_semi")
        decon_restriction = restricted
        if max_shingle_df is not None:
            # bounded-state near-dup: df counts over the SURVIVOR corpus
            # (the restricted store relation), capped sets everywhere.
            # PERSIST the restriction: the capped pipeline consumes its
            # exploded input on FOUR legs (df pass, both self-join sides,
            # sizes) and each uncached consumption re-runs the store scan
            # + the id semi-join — measured at 1000×: 518.9 s uncached
            # (≈ the raw path, the store's savings fully re-spent) — the
            # diamond-lineage trap from SURVEY §4.4. Released with the
            # result's other deps.
            surviving = surviving.persist(StorageLevel.MEMORY_AND_DISK)
            extra_deps.append(surviving)
            pairs = dd.ngram_jaccard_pairs_capped(
                survivors, n=shingle_n, threshold=jaccard_threshold,
                max_shingle_df=max_shingle_df, text_col=text_col,
                id_col=id_col, exploded=surviving,
            )
        else:
            pairs = dd.jaccard_pairs_from_exploded(
                surviving, jaccard_threshold, id_col=id_col
            )
    elif max_shingle_df is not None:
        pairs = dd.ngram_jaccard_pairs_capped(
            survivors, n=shingle_n, threshold=jaccard_threshold,
            max_shingle_df=max_shingle_df, text_col=text_col, id_col=id_col,
        )
    else:
        pairs = dd.ngram_jaccard_pairs(
            survivors, n=shingle_n, threshold=jaccard_threshold,
            text_col=text_col, id_col=id_col,
        )
    kept = mark(
        dd.dedup_keep_canonical(survivors, pairs, id_col=id_col), "after_near_dup"
    )

    if benchmark is not None:
        decon_exploded = None
        if decon_store is not None and shingle_store is None:
            # ADVICE r12: the decon store can only be used when stage 3's
            # gate decision exists (decon_restriction is built there) — a
            # caller passing decon_store alone would otherwise silently pay
            # the full per-run n-gram hashing. Make the dropped
            # optimization visible instead of a docstring-only contract.
            import logging

            logging.getLogger(__name__).warning(
                "curate_corpus: decon_store given without shingle_store —"
                " ignored; stage 4 recomputes train n-grams per run (the"
                " store restriction reuses stage 3's broadcast-gate"
                " decision, which only exists when shingle_store is set)"
            )
        if decon_store is not None and shingle_store is not None:
            # stage 4 from the n-gram store: restrict to the quality+exact
            # survivor ids with the SAME gate decision stage 3 made (a
            # superset of kept's ids — safe, the consumer is an anti-join).
            # Consumed once, so no persist needed.
            decon_exploded = decon_store.join(
                decon_restriction, id_col, "left_semi"
            )
        contaminated = tx.decontaminate(
            kept, benchmark, n=decon_n, text_col=text_col, id_col=id_col,
            exploded=decon_exploded,
            # bench-side store restriction (optimization r13): only the
            # caller can know the benchmark is a slice of the store's
            # corpus, so it passes the exact-id restricted relation; an
            # approximate/superset restriction would create false hits
            # (see decontaminate's docstring).
            bench_exploded=decon_bench_exploded,
        ).select(id_col)
        kept = mark(
            kept.join(contaminated, id_col, "left_anti"), "after_decontaminate"
        )
    return dd._register_cache(kept, kept_ids, *extra_deps), observations


def curate_with_observed_counters(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    min_quality_e4: int = 5000,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    decon_n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, dict]:
    """:func:`curate_corpus` plus ZERO-extra-job stage counters.

    Returns ``(curated, observations)``: run ONE action on ``curated``
    (write, count, collect) and then read ``observations[stage].get["rows"]``
    for input / after_quality / after_exact / after_near_dup /
    after_decontaminate — the counts are collected as the data streams
    through that single action (``CollectMetrics``), replacing the one
    count-job-per-stage formulation. This is the same ``observe`` discipline
    as :func:`operators.validation.observed_counters`, applied across the
    whole composed pipeline.
    """
    return _curate_staged(
        docs,
        benchmark,
        observe_stages=True,
        min_quality_e4=min_quality_e4,
        jaccard_threshold=jaccard_threshold,
        shingle_n=shingle_n,
        decon_n=decon_n,
        text_col=text_col,
        id_col=id_col,
    )


def curation_stats(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    **kwargs,
) -> dict[str, int]:
    """Per-stage survivor counts (A13-style counters for the curation
    pipeline), collected in ONE job: the observed-counter lineage runs a
    single noop-sink action and every stage count streams out of it via
    ``CollectMetrics`` (r4 verdict: the 4-count()-jobs formulation re-ran
    the pipeline per counter)."""
    curated, observations = curate_with_observed_counters(
        docs, benchmark, **kwargs
    )
    curated.write.format("noop").mode("overwrite").save()
    out = {
        "input": observations["input"].get["rows"],
        "after_quality_and_exact": observations["after_exact"].get["rows"],
        "after_near_dup": observations["after_near_dup"].get["rows"],
    }
    if benchmark is not None:
        out["after_decontaminate"] = observations["after_decontaminate"].get["rows"]
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
    # Join-free quality gate (optimization r13, same fusion as the batch
    # pipeline's stage 1): the score is a per-row expression, so filtering
    # directly avoids a per-micro-batch self-join of the batch with its own
    # score projection.
    gated = new_docs.where(
        tx.quality_score_col(F.col(text_col)) >= min_quality_e4
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
