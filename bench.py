"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "queries_cold": {...},
     "duckdb": {"q1": sec, ...}, "duckdb_total_sec": N,
     "spark_vs_duckdb_ratio": N, "sf": ...}

Each query is executed to completion with a noop sink (full plan runs, no
driver collect cost skews the number). Methodology: standard steady-state
benchmarking (as in JMH / TPC) — each query's DataFrame is built ONCE and
executed SPARK_GRAFT_BENCH_RUNS times (default 7; both engines get the
same count, so the ±40% co-tenant noise on this box has several chances to
give each side a quiet slot); the headline number is
the best run, so it measures the engine's execution speed rather than the
one-time Catalyst analysis + whole-stage-codegen (Janino) compile + JVM
C2-JIT cost a distinct plan pays on early runs (~0.4-0.5 s/query on this
box, irrelevant at 100 TB where a plan compiles once and runs for minutes;
DuckDB similarly caches prepared plans across a warm session).
Between runs, operator-internal caches are RE-ARMED (unpersist + persist via
a snapshot of ``operators.dedup.CACHE_REGISTRY`` taken at query
construction), so every timed run re-pays its
own cache population from the raw scan — no run reads a warm cache it did
not itself populate.
First-run timings are reported alongside under "queries_cold" /
"total_cold_sec" for transparency (run 1 additionally pays plan analysis +
codegen).

The DuckDB baseline runs each query's ``oracle_sql()`` (the exact SQL the
correctness gate validates against) over the SAME parquet files in the SAME
process run, best-of-N with full materialization — so the Spark-vs-DuckDB
ratio is measured under identical machine load and is auditable per query,
not reconstructed from separate runs (this sandbox has ±40% co-tenant
noise; same-run ratios are the stable signal).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    # transform chain (flagship pipeline shape)
    "sensor_daily_avg",
    "sensor_rolling_avg",
    "sensor_zscore_anomalies",
    "sensor_gap_detection",
    "sensor_impute_median",
    # relational / join surface
    "tpch_pricing_summary",
    "join_multiway_revenue",
    "join_segment_revenue",
    "window_running_and_lag",
    "window_top_order_per_customer",
    # LLM data ops. Stores are pre-ensured before the loop (r9): the raw
    # doc_ngram_jaccard / doc_minhash_lsh names serve them BY DEFAULT, so
    # their numbers are what a user of the default configuration gets;
    # raw-plan scaling is tracked by tools/bench_scale.py with the
    # SPARK_GRAFT_*_STORE=none knobs.
    "doc_exact_dedup",
    "doc_ngram_jaccard",
    "doc_ngram_jaccard_stored",
    "doc_minhash_lsh",
    "doc_minhash_lsh_stored",
    "doc_simhash",
    "doc_simhash_pairs",
    "doc_simhash_pairs_stored",
    # scale operating points (r11 guard): the 60-bit band variant and the
    # df-capped char-shingle variant are the forms production runs at scale;
    # a regression here (e.g. the r10 wide-hash degeneracy) must flag even
    # while the 32-bit / uncapped oracle forms stay green
    "doc_simhash_wide",
    "doc_char_jaccard_capped",
    # composed production dedup order (r11): exact-first → banded Hamming
    "doc_simhash_pairs_deduped",
    # fingerprint-canonical pairs (r11): the form that deletes the
    # hamming-0 quadratic cluster mass — 3.65 s vs 51.1 s all-pairs at 100×
    "doc_simhash_rep_pairs",
    # the full production configuration (60-bit keys + canonical reps):
    # 9.09 s at 1000× where all-pairs takes 57.1 s and DuckDB OOM-DNFs
    "doc_simhash_rep_pairs_wide",
    # span-granularity exact substring dedup (r11): window-count over span
    # hashes — guards the explode_outer/InferFiltersFromGenerate fix (the
    # plain-explode regression is a never-finishing scan at 100×)
    "doc_dup_spans",
    # df-capped containment + jaccard (r12): the bounded-state scale forms —
    # the uncapped pair aggregates spill 400-415 GiB at 1000× on one box
    "doc_containment_pairs_capped",
    "doc_ngram_jaccard_capped",
    # gram-array explode_outer form (r13 verdict task 6): guards the
    # trap-1 fix — the index-explode form re-ran split(trim(text)) per
    # gram row (80-85 s vs 51-55 s at 100×)
    "doc_top_ngrams",
    "doc_quality_score",
    "emb_cosine_topk",
    "emb_centroid_norms",
    # standing IVF index (r12): raw names serve the store by default once
    # fresh — fit + full-corpus assignment vanish; _stored guards the
    # ensure-path staleness logic the same way the incremental pairs do
    "emb_ann_ivf_kmeans",
    "emb_ann_ivf_kmeans_stored",
    "emb_semantic_dedup",
    "emb_semantic_dedup_stored",
    # stored/incremental serving paths (r8 verdict task 3): a staleness-
    # logic regression that silently rebuilt or re-signed per run would
    # surface here as a timing flag
    "doc_incremental_near_dup",
    "doc_incremental_near_dup_stored",
    "doc_incremental_dedup",
    "doc_incremental_dedup_stored",
    "doc_curation_pipeline",
    "doc_curation_pipeline_stored",
    # production-scale composed curation (r12): near-dup stage runs the
    # bounded-state df-capped Jaccard — spill-free where the uncapped
    # pair aggregate is 400 GiB-class state at 1000×
    "doc_curation_pipeline_capped",
    # lexical + hybrid retrieval (r13): BM25 over term-filtered aggregates
    # and its RRF fusion with the cosine top-k — the RAG retrieval stack
    "doc_bm25_topk",
    "hybrid_rrf_topk",
    # PQ serving paths (r13b): ADC over the standing codes store and the
    # IVFPQ two-store composition — a staleness regression that re-fit or
    # re-encoded per run would flag here as a timing jump
    "emb_pq_topk_stored",
    "emb_ann_ivfpq_stored",
    # co-located IVFPQ (r13c): the partition-pruned inverted-list serving —
    # at 2M the join-composed form loses to full ADC; this one wins
    "emb_ann_ivfpq_colocated",
]

# Queries whose plan CONSTRUCTION executes work (connected_components'
# size-gated driver union-find collects the pair relation eagerly): the
# build-once-run-N methodology would time only the post-collect tail, so
# these construct INSIDE the timed region each run instead.
CONSTRUCT_EACH_RUN = {
    "doc_curation_pipeline",
    "doc_curation_pipeline_stored",
    "doc_curation_pipeline_capped",
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = Path(sf_dir).name.replace("sf", "")

    from satsure_agri_datapipeline_spark.session import get_spark
    import __spark_entry__ as entry_mod

    # Scan-split sizing: session default (128 MB splits — 1 task/file here).
    # Parquet scan parallelism is ROW-GROUP-bounded and every testdata file is
    # a single row group, so smaller splits cannot add parallelism — they only
    # add no-op tasks (a 64 KB-split run schedules 32 scan tasks of which 1
    # reads the lone row group; measured: doc_ngram_jaccard 12.1 s → 4.6 s
    # steady by dropping the 2 MB/64 KB override, everything else neutral or
    # better). At real scale files span many row groups and the same default
    # parallelizes scans naturally.
    spark = get_spark(app_name="bench", timezone="UTC", data_dir=sf_dir)
    queries = entry_mod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: prime JVM, parquet footers, codegen
    run(queries["sensor_global_stats"](spark, sf_dir))

    # prime the Python/Arrow worker pool on synthetic rows (NOT a benchmark
    # query or benchmark data): first pandas_udf use otherwise pays worker
    # spawn + Arrow codepath init inside whichever timed query hits it first
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    def _prime_fn(s):
        return s.astype("int64")

    _prime_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _prime = pandas_udf(_prime_fn, "long")
    run(spark.range(0, 10000, 1, 32).select(_prime(F.col("id")).alias("x")))

    # One-time ingest, untimed (the production layout-build analog): with
    # fresh stores present, the raw dedup names serve the bucketed
    # band/shingle relations by default (r9) — the numbers below are the
    # default-configuration numbers.
    from satsure_agri_datapipeline_spark.sources.band_store import ensure_band_store
    from satsure_agri_datapipeline_spark.sources.digest_store import (
        ensure_digest_store,
    )
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        ensure_shingle_store,
    )
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        ensure_simhash_store,
    )

    ensure_band_store(spark, sf_dir, num_hashes=16, band_size=4, n=3)
    ensure_shingle_store(spark, sf_dir, n=3, unit="word", seed=0)
    # span store (r11): doc_dup_spans serves the n=15 shingle store —
    # a span IS a word shingle, so the family needs no new store code
    ensure_shingle_store(spark, sf_dir, n=15, unit="word", seed=0)
    # decon store (r12): doc_decontaminate + the capped curation's stage 4
    # serve the n=4 store — per-run 4-gram hashing was the largest stage
    # of the 1000× curation profile
    ensure_shingle_store(spark, sf_dir, n=4, unit="word", seed=0)
    from satsure_agri_datapipeline_spark.plans.catalog_llm import (
        INCR_HISTORY_SUBSET,
    )

    ensure_simhash_store(spark, sf_dir, bits=32, n_bands=4)
    # the 60-bit scale operating point (r11): doc_simhash_wide and
    # doc_simhash_rep_pairs_wide serve this store by default
    ensure_simhash_store(spark, sf_dir, bits=60, n_bands=4)
    ensure_digest_store(spark, sf_dir, subset=INCR_HISTORY_SUBSET)
    # standing IVF index (r12): emb_ann_ivf_kmeans / emb_semantic_dedup
    # serve it by default while it is fresh and never-delta'd
    from satsure_agri_datapipeline_spark.sources.ivf_store import ensure_ivf_store

    ensure_ivf_store(spark, sf_dir, k=8, iterations=2, seed=0)
    # standing PQ codes store (r13b): emb_pq_topk_stored / emb_ann_ivfpq_stored
    # serve it — pre-ensured so the timed region is the ADC read, not the fit
    from satsure_agri_datapipeline_spark.sources.pq_store import ensure_pq_store

    ensure_pq_store(spark, sf_dir, m=8, k=16, iterations=2, seed=0)
    from satsure_agri_datapipeline_spark.sources.ivfpq_store import (
        ensure_ivfpq_store,
    )

    ensure_ivfpq_store(spark, sf_dir, n_clusters=8, m=8, k=16, iterations=2, seed=0)
    # standing token-stats relation (r14): doc_bm25_topk / hybrid_rrf_topk
    # serve N/avgdl from it by default — the retrieval family's last
    # full-corpus text scan becomes a 16-byte-per-doc statistics read
    from satsure_agri_datapipeline_spark.sources.token_stats_store import (
        ensure_token_stats_store,
    )

    ensure_token_stats_store(spark, sf_dir)

    from satsure_agri_datapipeline_spark.operators import dedup as _dedup

    # Queries whose operators persist intermediate relations (shingle /
    # signature arrays). Their deps MUST surface in the registry snapshot —
    # a silent empty snapshot would mean runs 2..N reuse run 1's warm cache
    # while DuckDB re-executes fully, biasing the ratio.
    PERSIST_BEARING = {"doc_ngram_jaccard", "doc_minhash_lsh"}

    def rearm_caches(deps):
        """Drop and re-mark the operator-internal persists captured at query
        construction (``operators.dedup.CACHE_REGISTRY`` snapshot — the
        DataFrame attribute does not survive catalog .select()/.orderBy()
        wrappers) so the next run repopulates them from the raw scan —
        steady-state without cross-run cache reuse."""
        for dep in deps:
            level = dep.storageLevel
            dep.unpersist(blocking=True)
            dep.persist(level)

    # Input-size-aware execution conf (the r4 verdict's explicit lever:
    # "set spark.sql.shuffle.partitions adaptively in bench.py per query
    # input size"). Event-log accounting (tools/stage_probe.py) showed AQE
    # coalesce DOES collapse every post-shuffle stage to 1 task — the floor
    # is the per-exchange driver re-planning ROUND, not reducer count. On a
    # dataset whose every exchange is kB-sized, those rounds cost more than
    # they can save, so small inputs run the floor queries with static
    # planning + input-sized shuffle partitions (measured best-of-7: every
    # floor query faster or tied, total 4.5 s → 3.5 s; results identical —
    # these queries' broadcasts are explicit, nothing needs runtime strategy
    # choice). The bucket-join dedup queries KEEP AQE at any size: its
    # runtime broadcast-vs-shuffle choice is worth 6x on them (PERF.md r5
    # item 1). Above the size cutoff everything keeps the session defaults —
    # at real scale AQE's re-planning amortizes into noise and its skew/
    # strategy decisions are the 100 TB safety net.
    total_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).glob("**/*.parquet")
    )
    small_input = total_bytes < 64 * 1024 * 1024
    udf_partitions_set_here = False
    if small_input and "SPARK_GRAFT_UDF_PARTITIONS" not in os.environ:
        # fewer, fatter Python-UDF tasks at toy scale (see dedup._repartitioned);
        # scoped to the HEADLINE loop — popped after it so later additions to
        # this script (and the DuckDB baseline's process env) see the default.
        os.environ["SPARK_GRAFT_UDF_PARTITIONS"] = "8"
        udf_partitions_set_here = True
    AQE_ALWAYS = {
        "doc_ngram_jaccard",
        "doc_minhash_lsh",
        "doc_incremental_near_dup",
        "doc_incremental_near_dup_stored",
        "doc_curation_pipeline",
        "doc_curation_pipeline_stored",
    }

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7"))
    # Snapshot the session's actual pre-loop conf so the post-loop restore
    # reinstates whatever get_spark (or an override) set, not hardcoded values.
    pre_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    pre_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    for name in HEADLINE:
        if small_input and name not in AQE_ALWAYS:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"),
            )
        if name in CONSTRUCT_EACH_RUN:
            # construction executes work (eager union-find collect) —
            # time construction + execution together, every run
            per_run = []
            for _ in range(n_runs):
                _dedup.CACHE_REGISTRY.clear()
                t0 = time.time()
                run(queries[name](spark, sf_dir))
                per_run.append(round(time.time() - t0, 3))
                for dep in _dedup.CACHE_REGISTRY:
                    dep.unpersist(blocking=True)
            cold[name] = per_run[0]
            timings[name] = min(per_run)
            print(
                f"# {name}: {timings[name]:.2f}s (cold {cold[name]:.2f}s)",
                file=sys.stderr,
            )
            continue
        _dedup.CACHE_REGISTRY.clear()
        df = queries[name](spark, sf_dir)
        deps = list(_dedup.CACHE_REGISTRY)
        if name in PERSIST_BEARING and not deps:
            # store-served plans legitimately register no persists (the
            # stored relation replaces the signature/shingle cache)
            plan_str = df._jdf.queryExecution().executedPlan().toString()
            if "bkt_" not in plan_str:
                raise AssertionError(
                    f"{name} is persist-bearing but registered no cache deps; "
                    "rearm would silently benchmark a warm cache"
                )
        per_run = []
        for _ in range(n_runs):
            t0 = time.time()
            run(df)
            per_run.append(round(time.time() - t0, 3))
            rearm_caches(deps)
        for dep in deps:
            dep.unpersist(blocking=True)
        cold[name] = per_run[0]
        timings[name] = min(per_run)
        print(f"# {name}: {timings[name]:.2f}s (cold {cold[name]:.2f}s)", file=sys.stderr)

    # Restore the snapshotted pre-loop conf: the per-query toggling above
    # otherwise leaves whatever the LAST query set (AQE off / 4 shuffle
    # partitions for a small-input non-AQE query) in force for any Spark work
    # added after the loop — a silent mis-measurement trap.
    spark.conf.set("spark.sql.adaptive.enabled", pre_aqe)
    spark.conf.set("spark.sql.shuffle.partitions", pre_shuffle)
    if udf_partitions_set_here:
        del os.environ["SPARK_GRAFT_UDF_PARTITIONS"]

    duck = duckdb_baseline(entry_mod, sf_dir, n_runs)

    total = round(sum(timings.values()), 3)
    duck_total = round(sum(duck.values()), 3) if duck else None
    out = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "total_cold_sec": round(sum(cold.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if duck:
        out["duckdb"] = duck
        out["duckdb_total_sec"] = duck_total
        out["spark_vs_duckdb_ratio"] = round(total / duck_total, 2)
    regressions = regression_guard(timings, out["sf"])
    if regressions is not None:
        out["regressions_vs_prev"] = regressions
    # The driver records only the last ~2000 chars of stdout; a single fat
    # JSON line gets its HEAD truncated and parses as null (BENCH_r09.json).
    # Full detail goes to a sidecar file; the final stdout line is a compact
    # summary (warm timings + totals) guaranteed to fit under the tail cap.
    sidecar = Path(__file__).resolve().parent / "BENCH_local.json"
    try:
        sidecar.write_text(json.dumps(out, indent=1))
        print(f"# full bench detail: {sidecar}", file=sys.stderr)
    except OSError:
        pass
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": timings,
        "sf": out["sf"],
        "total_cold_sec": out["total_cold_sec"],
    }
    for k in ("duckdb_total_sec", "spark_vs_duckdb_ratio"):
        if k in out:
            compact[k] = out[k]
    if regressions is not None:
        compact["regressions_flagged"] = sorted(regressions["flagged"])
    line = json.dumps(compact)
    if len(line) > 1900:  # last resort: totals always survive the cap
        compact["queries"] = {}
        compact["queries_in_sidecar"] = len(timings)
        line = json.dumps(compact)
    print(line)


def _unwrap_artifact(cand) -> dict | None:
    """Unwrap a committed BENCH_r*.json. Driver artifacts wrap the bench
    JSON line under "parsed"; the key may exist with a NULL value when the
    driver's 2000-char tail cap truncated the bench line and its own parse
    failed (BENCH_r09.json). Fall back to the wrapper dict in that case and
    reject anything that isn't a dict at all."""
    if not isinstance(cand, dict):
        return None
    inner = cand.get("parsed")
    return inner if isinstance(inner, dict) else cand


def regression_guard(timings: dict[str, float], sf) -> dict | None:
    """Non-fatal guard: compare each headline query's warm time against the
    newest committed BENCH_r*.json artifact at the SAME scale factor and
    record >2x regressions, so a conf trade that silently hurts a query
    nobody re-ran surfaces in the artifact instead of a later verdict.
    Returns None when no prior same-sf artifact exists."""
    here = Path(__file__).resolve().parent
    # numeric sort: lexicographic would order BENCH_r9 after BENCH_r10
    # once zero-padding is dropped (ADVICE r7)
    prev_files = sorted(
        (f for f in here.glob("BENCH_r*.json")
         if f.stem.replace("BENCH_r", "").isdigit()),
        key=lambda f: int(f.stem.replace("BENCH_r", "")),
    )
    prev = None
    for f in reversed(prev_files):
        try:
            cand = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        cand = _unwrap_artifact(cand)
        if cand is None:
            continue
        if cand.get("sf") == sf and "queries" in cand:
            prev = (f.name, cand["queries"])
            break
    if prev is None:
        return None
    prev_name, prev_q = prev
    flagged = {
        name: {"now": t, "prev": prev_q[name], "ratio": round(t / prev_q[name], 2)}
        for name, t in timings.items()
        if name in prev_q
        # bench_scale-style artifacts may carry DNF strings, not numbers
        and isinstance(prev_q[name], (int, float))
        and prev_q[name] > 0
        and t > 2.0 * prev_q[name]
    }
    for name, r in flagged.items():
        print(
            f"# REGRESSION {name}: {r['now']:.2f}s vs {r['prev']:.2f}s "
            f"in {prev_name} ({r['ratio']}x)",
            file=sys.stderr,
        )
    return {"baseline_artifact": prev_name, "flagged": flagged}


def duckdb_baseline(entry_mod, sf_dir: str, n_runs: int) -> dict[str, float]:
    """Best-of-N DuckDB timing of each headline query's oracle SQL over the
    same parquet tables (views over ``read_parquet``, so scan cost is inside
    the measurement exactly as it is for Spark). Fully materializes each
    result (``fetchall``) — the analog of the Spark noop sink."""
    try:
        import duckdb
    except ImportError:
        return {}
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # directory dataset (e.g. Spark-written part files)
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif p.exists():
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    duck: dict[str, float] = {}
    for name in HEADLINE:
        if name not in oracles:
            continue
        per_run = []
        for _ in range(n_runs):
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            per_run.append(round(time.time() - t0, 3))
        duck[name] = min(per_run)
        print(f"# duckdb {name}: {duck[name]:.2f}s", file=sys.stderr)
    return duck


if __name__ == "__main__":
    main()
