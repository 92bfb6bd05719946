"""Deterministically scale the test dataset N× for scaling-curve runs
(PERF.md). Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), writes
``--out`` (default /tmp/sf1) with every fact table replicated ``--copies``
times under disjoint key spaces:

- events: user_id shifted per copy (10× users at the same per-user density);
  event_id shifted to stay unique.
- documents: doc_id shifted; every word suffixed with the copy index, so
  copies of a document share ZERO shingles — near-dup structure within each
  copy is preserved exactly, and no artificial cross-copy near-dup cliques
  inflate the pair output beyond the true 10× (a naive text copy would turn
  every original pair-cluster into a 10-clique, a ~50× output blow-up that
  measures the workload change, not the engine).
- embeddings: vec_id shifted; first component nudged by copy*1e-4 to break
  exact ties in top-k.
- orders/lineitem/customer: orderkey/custkey shifted by the copy index ×
  key-space stride.
- region/nation/part/supplier: copied as-is (dimensions stay
  dimension-sized, exactly as they would at 100 TB).

Everything is a Spark job writing parquet — no driver-side row handling.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    src = Path(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="make_scaled_sf", timezone="UTC")

    def copies_of(df, make_copy):
        parts = [make_copy(df, i) for i in range(args.copies)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    # events: disjoint user/event id spaces per copy
    ev = spark.read.parquet(str(src / "events.parquet"))
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    copies_of(
        ev,
        lambda d, i: d.withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
        .withColumn("event_id", F.col("event_id") + F.lit(i * n_events)),
    ).coalesce(8).write.mode("overwrite").parquet(str(out / "events.parquet"))

    # documents: word-suffix per copy kills cross-copy shingle overlap
    docs = spark.read.parquet(str(src / "documents.parquet"))
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies_of(
        docs,
        lambda d, i: d.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        .withColumn(
            "text",
            F.regexp_replace(F.col("text"), r"(\S+)", r"$1_" + str(i)),
        ),
    ).coalesce(8).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    # embeddings: tie-broken copies
    emb = spark.read.parquet(str(src / "embeddings.parquet"))
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    copies_of(
        emb,
        lambda d, i: d.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_vecs))
        .withColumn(
            "embedding",
            F.concat(
                F.array(
                    (F.element_at("embedding", 1) + F.lit(i * 1e-4)).cast("float")
                ),
                F.slice("embedding", 2, 10_000),
            ),
        ),
    ).coalesce(8).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    # orders / lineitem / customer: disjoint order+customer key spaces
    orders = spark.read.parquet(str(src / "orders.parquet"))
    li = spark.read.parquet(str(src / "lineitem.parquet"))
    cust = spark.read.parquet(str(src / "customer.parquet"))
    n_ok = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    n_ck = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    copies_of(
        orders,
        lambda d, i: d.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * n_ok))
        .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * n_ck)),
    ).coalesce(8).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    copies_of(
        li,
        lambda d, i: d.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * n_ok)),
    ).coalesce(8).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    copies_of(
        cust,
        lambda d, i: d.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * n_ck)),
    ).coalesce(8).write.mode("overwrite").parquet(str(out / "customer.parquet"))

    # dimensions copied verbatim
    for t in ["region", "nation", "part", "supplier"]:
        spark.read.parquet(str(src / f"{t}.parquet")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(out / f"{t}.parquet"))

    print(f"wrote {args.copies}x scaled tables to {out}")


if __name__ == "__main__":
    main()
