"""Alternating A/B race: BM25 corpus-stats leg with lower() (old) vs
without (new) — lowercasing cannot change token counts, so the stats leg
can skip the full-corpus lower pass. Verifies identical rows first.

Usage: python tools/race_bm25_lower.py [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.tables import load_table
    from satsure_agri_datapipeline_spark.operators import text as tx

    spark = get_spark(app_name="race_bm25_lower", timezone="UTC", data_dir=args.sf)
    docs = load_table(spark, args.sf, "documents")
    terms = ["dup", "spark", "vector"]

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # B: current module implementation (stats leg without lower)
    new_q = tx.bm25_topk(docs, terms, k=10)

    # A: the pre-change stats leg, reconstructed inline: same operator but
    # with the corpus agg computed over the lowered projection
    def old_bm25():
        base = docs.where(
            F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
        ).select(F.col("doc_id"), F.lower(F.trim(F.col("text"))).alias("__t"))
        with_t = base.select(
            "doc_id", "__t", F.size(F.split(F.col("__t"), r"\s+")).alias("dl")
        )
        return with_t.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
        )

    def new_stats():
        return docs.where(
            F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
        ).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("total_tokens"),
        )

    a_stats, b_stats = old_bm25(), new_stats()
    assert a_stats.collect() == b_stats.collect(), "stats leg rows must be identical"
    print("stats rows identical")

    run(a_stats); run(b_stats); run(new_q)
    times = {"A": [], "B": [], "Q": []}
    for _ in range(args.rounds):
        for v, df in (("A", a_stats), ("B", b_stats), ("Q", new_q)):
            t0 = time.time()
            run(df)
            times[v].append(round(time.time() - t0, 3))
    print(f"A(stats with lower) best={min(times['A'])} {times['A']}")
    print(f"B(stats no lower)  best={min(times['B'])} {times['B']}")
    print(f"full bm25 (new)    best={min(times['Q'])} {times['Q']}")


if __name__ == "__main__":
    main()
