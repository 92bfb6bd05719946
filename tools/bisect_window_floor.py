"""Bisect the window_* floor regression (VERDICT r13 "what's wrong" #1):
window_running_and_lag / window_top_order_per_customer measured 0.065/0.052 s
in the r12 driver bench and ~0.16-0.22 s ever since, with byte-identical
plans and code. Suspect: bench-SESSION composition — the r13-build prelude
added six HEADLINE queries and the PQ/IVFPQ store pre-ensures to the shared
JVM before these two rows run.

Each composition runs in its own process (pass --stage):

  bare     warmup + pandas prime only (sub-bench of what r12 ran)
  r12      + the r12 ensure set (band, shingle n=3/15/4, simhash 32/60,
             digest, ivf)
  r13      + ensure_pq_store + ensure_ivfpq_store (the r13-build additions)
  full     + the eight HEADLINE queries that precede the window rows
             (sensors + tpch + joins), bench methodology

then times the two window queries exactly as bench.py does (small-input
mode: AQE off, 4 shuffle partitions, noop sink, best-of-N).

Usage: python tools/bisect_window_floor.py --stage bare|r12|r13|full
       (or no --stage: runs all four sequentially as subprocesses)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["window_running_and_lag", "window_top_order_per_customer"]


def run_stage(stage: str, sf_dir: str, n_runs: int) -> None:
    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name=f"bisect_{stage}", timezone="UTC", data_dir=sf_dir)
    queries = entry_mod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # bench.py warmup
    run(queries["sensor_global_stats"](spark, sf_dir))
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _prime_fn(s):
        return s.astype("int64")

    _prime_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _prime = pandas_udf(_prime_fn, "long")
    run(spark.range(0, 10000, 1, 32).select(_prime(F.col("id")).alias("x")))

    if stage in ("r12", "r13", "full"):
        from satsure_agri_datapipeline_spark.plans.catalog_llm import (
            INCR_HISTORY_SUBSET,
        )
        from satsure_agri_datapipeline_spark.sources.band_store import (
            ensure_band_store,
        )
        from satsure_agri_datapipeline_spark.sources.digest_store import (
            ensure_digest_store,
        )
        from satsure_agri_datapipeline_spark.sources.ivf_store import (
            ensure_ivf_store,
        )
        from satsure_agri_datapipeline_spark.sources.shingle_store import (
            ensure_shingle_store,
        )
        from satsure_agri_datapipeline_spark.sources.simhash_store import (
            ensure_simhash_store,
        )

        ensure_band_store(spark, sf_dir, num_hashes=16, band_size=4, n=3)
        ensure_shingle_store(spark, sf_dir, n=3, unit="word", seed=0)
        ensure_shingle_store(spark, sf_dir, n=15, unit="word", seed=0)
        ensure_shingle_store(spark, sf_dir, n=4, unit="word", seed=0)
        ensure_simhash_store(spark, sf_dir, bits=32, n_bands=4)
        ensure_simhash_store(spark, sf_dir, bits=60, n_bands=4)
        ensure_digest_store(spark, sf_dir, subset=INCR_HISTORY_SUBSET)
        ensure_ivf_store(spark, sf_dir, k=8, iterations=2, seed=0)
    if stage in ("r13", "full"):
        from satsure_agri_datapipeline_spark.sources.ivfpq_store import (
            ensure_ivfpq_store,
        )
        from satsure_agri_datapipeline_spark.sources.pq_store import (
            ensure_pq_store,
        )

        ensure_pq_store(spark, sf_dir, m=8, k=16, iterations=2, seed=0)
        ensure_ivfpq_store(
            spark, sf_dir, n_clusters=8, m=8, k=16, iterations=2, seed=0
        )

    # bench small-input mode for the floor queries
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    if stage == "full":
        preceding = [
            "sensor_daily_avg", "sensor_rolling_avg", "sensor_zscore_anomalies",
            "sensor_gap_detection", "sensor_impute_median",
            "tpch_pricing_summary", "join_multiway_revenue",
            "join_segment_revenue",
        ]
        for name in preceding:
            df = queries[name](spark, sf_dir)
            for _ in range(n_runs):
                run(df)

    out = {}
    for name in QUERIES:
        df = queries[name](spark, sf_dir)
        per_run = []
        for _ in range(n_runs):
            t0 = time.time()
            run(df)
            per_run.append(round(time.time() - t0, 3))
        out[name] = per_run
        print(f"[{stage}] {name}: best={min(per_run)} {per_run}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--stage", default=None)
    ap.add_argument("--runs", type=int, default=7)
    args = ap.parse_args()
    if args.stage:
        run_stage(args.stage, args.sf, args.runs)
        return
    for stage in ("bare", "r12", "r13", "full"):
        subprocess.run(
            [sys.executable, __file__, "--stage", stage, "--sf", args.sf,
             "--runs", str(args.runs)],
            check=True,
        )


if __name__ == "__main__":
    main()
