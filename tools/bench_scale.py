"""Single-engine scale bench runner (r7): one engine per PROCESS, because at
1000x the in-harness DuckDB views contend for memory with Spark and skew
both sides (r6 measured the multiway join 196.9 s contended vs 61.5 s
clean). The r7 artifact runs Spark and DuckDB in separate invocations and
merges the JSON.

Usage:
    python tools/bench_scale.py --engine spark  --sf /tmp/sf100 --runs 2 \
        [--queries q1,q2] [--skip q3,q4]
    python tools/bench_scale.py --engine duckdb --sf /tmp/sf100 --runs 2 ...

Prints ONE JSON line {"engine":..., "sf_dir":..., "queries": {name: best_sec}}.
Query set defaults to bench.HEADLINE (+ the bucketed variants for spark via
--extra).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402


def run_spark(sf_dir: str, names: list[str], n_runs: int) -> dict:
    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.operators import dedup as _dedup
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="bench_scale", timezone="UTC", data_dir=sf_dir)
    queries = entry_mod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries["sensor_global_stats"](spark, sf_dir))  # warmup

    # Queries whose plan CONSTRUCTION executes work (iterative
    # localCheckpoint rounds, size-gated driver union-find): time
    # construction + execution together each run, or the number is only
    # the post-collect tail (r9 sweep caught events_pagerank at a bogus
    # 0.08 s this way).
    eager = {
        "events_pagerank",
        "doc_curation_pipeline",
        "doc_curation_pipeline_stored",
        "doc_near_dup_clusters",
        "doc_dedup_canonical",
        "doc_dedup_best_quality",
    }
    out = {}
    for name in names:
        per = []
        if name in eager:
            for _ in range(n_runs):
                _dedup.CACHE_REGISTRY.clear()
                t0 = time.time()
                run(queries[name](spark, sf_dir))
                per.append(round(time.time() - t0, 2))
                for dep in _dedup.CACHE_REGISTRY:
                    dep.unpersist(blocking=True)
        else:
            _dedup.CACHE_REGISTRY.clear()
            df = queries[name](spark, sf_dir)
            deps = list(_dedup.CACHE_REGISTRY)
            for _ in range(n_runs):
                t0 = time.time()
                run(df)
                per.append(round(time.time() - t0, 2))
                for dep in deps:
                    level = dep.storageLevel
                    dep.unpersist(blocking=True)
                    dep.persist(level)
            for dep in deps:
                dep.unpersist(blocking=True)
        out[name] = min(per)
        print(f"# spark {name}: best {min(per)}s of {per}", file=sys.stderr, flush=True)
    return out


def _register_views(con, sf_dir: str) -> None:
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{p}/*.parquet')"
            )
        elif p.exists():
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )


def run_duckdb(sf_dir: str, names: list[str], n_runs: int) -> dict:
    import duckdb

    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    _register_views(con, sf_dir)
    out = {}
    for name in names:
        if name not in oracles:
            continue
        per = []
        try:
            for _ in range(n_runs):
                t0 = time.time()
                con.execute(oracles[name]).fetchall()
                per.append(round(time.time() - t0, 2))
        except Exception as exc:  # record the DNF, keep benching (r7:
            # doc_simhash OOMs DuckDB at 1000x and killed the whole run)
            out[name] = f"DNF: {type(exc).__name__}: {str(exc)[:120]}"
            print(f"# duckdb {name}: {out[name]}", file=sys.stderr, flush=True)
            con = duckdb.connect()  # the OOM poisons the connection
            con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
            _register_views(con, sf_dir)
            continue
        out[name] = min(per)
        print(f"# duckdb {name}: best {min(per)}s of {per}", file=sys.stderr, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=["spark", "duckdb"], required=True)
    ap.add_argument("--sf", default="/tmp/sf100")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--extra", default="")
    args = ap.parse_args()

    names = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else list(HEADLINE)
    )
    names += [q for q in args.extra.split(",") if q]
    skip = {q for q in args.skip.split(",") if q}
    names = [n for n in names if n not in skip]

    fn = run_spark if args.engine == "spark" else run_duckdb
    out = fn(args.sf, names, args.runs)
    print(
        json.dumps(
            {
                "engine": args.engine,
                "sf_dir": args.sf,
                "runs": args.runs,
                "queries": out,
                "total_sec": round(
                    sum(v for v in out.values() if isinstance(v, (int, float))), 2
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
