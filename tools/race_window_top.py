"""Alternating A/B race: window_top_order_per_customer as ROW_NUMBER
window + rn=1 filter (committed r12 form) vs a max-of-struct aggregate
(guide §2.3 — aggregate before you shuffle: map-side partial aggregation
sends one row per customer into the exchange instead of every order, and
the per-partition Sort + Window disappear).

Equivalence: row_number()=1 under ORDER BY (o_totalprice DESC, o_orderkey
ASC) picks, per customer, the argmax of (o_totalprice, -o_orderkey) —
o_orderkey is unique, so the struct max is unique and the carried payload
fields never decide. NULL prices: desc_nulls_last loses to any non-null,
exactly as a NULL struct field loses under max. Rows asserted identical
before timing.

Usage: python tools/race_window_top.py [--sf DIR] [--rounds N]
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
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--rounds", type=int, default=9)
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="race_window_top", timezone="UTC", data_dir=args.sf)
    o = load_table(spark, args.sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    a = (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", cents.alias("top_price_c"))
    )
    top = F.max(
        F.struct(
            F.col("o_totalprice").alias("p"),
            (-F.col("o_orderkey")).alias("nk"),
            F.col("o_orderkey").alias("k"),
            cents.alias("c"),
        )
    ).alias("t")
    b = o.groupBy("o_custkey").agg(top).select(
        "o_custkey",
        F.col("t.k").alias("o_orderkey"),
        F.col("t.c").alias("top_price_c"),
    )

    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb, "aggregate form must reproduce the window form exactly"
    print(f"rows identical (n={len(ra)})")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # bench small-input mode (the mode these floor rows are timed in)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    run(a)
    run(b)
    times = {"A window": [], "B agg   ": []}
    for _ in range(args.rounds):
        for k, df in (("A window", a), ("B agg   ", b)):
            t0 = time.time()
            run(df)
            times[k].append(round(time.time() - t0, 3))
    for k, ts in times.items():
        print(f"{k} best={min(ts):.3f} {ts}")


if __name__ == "__main__":
    main()
