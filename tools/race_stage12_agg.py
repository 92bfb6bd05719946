"""Alternating A/B race: stage-1+2 keeper via WINDOW (r13 first cut) vs
AGGREGATE (r13 re-cut). Asserts identical id sets first, then races the
kept_ids subplan and the full stored-curation query.

Usage: python tools/race_stage12_agg.py [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=9)
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.tables import load_table
    from satsure_agri_datapipeline_spark.operators import text as tx

    spark = get_spark(app_name="race_stage12b", timezone="UTC", data_dir=args.sf)
    docs = load_table(spark, args.sf, "documents")

    scored = docs.select(
        F.col("doc_id"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("__digest"),
        tx.quality_score_col(F.col("text")).alias("__q"),
    )
    kept_q = scored.where(F.col("__q") >= 5000)

    window_ids = (
        kept_q.withColumn(
            "__keep", F.min("doc_id").over(Window.partitionBy("__digest"))
        )
        .where(F.col("doc_id") == F.col("__keep"))
        .select("doc_id")
    )
    agg_ids = kept_q.groupBy("__digest").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")

    a_set = {r.doc_id for r in window_ids.collect()}
    b_set = {r.doc_id for r in agg_ids.collect()}
    assert a_set == b_set, f"id sets differ: {len(a_set)} vs {len(b_set)}"
    print(f"id sets identical (n={len(a_set)})")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(window_ids); run(agg_ids)
    times = {"A": [], "B": []}
    for _ in range(args.rounds):
        for v, df in (("A", window_ids), ("B", agg_ids)):
            t0 = time.time()
            run(df)
            times[v].append(round(time.time() - t0, 3))
    print(f"A(window) best={min(times['A'])} {times['A']}")
    print(f"B(agg)    best={min(times['B'])} {times['B']}")


if __name__ == "__main__":
    main()
