"""Race curation stages 1+2 (quality gate -> exact-dedup keeper ids).

Current form (plans/curation.py): docs JOIN quality(docs) ON id -> filter ->
exact_duplicate_groups(kept) -> kept SEMI JOIN keepers.  Two diamonds: the
docs scan runs up to 4x (self-join + keeper derivation), plus two joins.

Fused form (optimization r13 hypothesis): one scan -- score computed inline,
digest projected narrow, keeper chosen with MIN(id) OVER (PARTITION BY
digest) on the (id, digest) projection.  One scan, one narrow exchange,
zero joins.  Row set must be identical.

Usage: python tools/race_curation_stage12.py [--sf DIR] [--runs N]
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


def current_form(docs, min_quality_e4=5000):
    from satsure_agri_datapipeline_spark.operators import dedup as dd
    from satsure_agri_datapipeline_spark.operators import text as tx

    quality = tx.quality_score(docs).select("doc_id", "quality_score_e4")
    kept = (
        docs.join(quality, "doc_id")
        .where(F.col("quality_score_e4") >= min_quality_e4)
        .drop("quality_score_e4")
    )
    keepers = dd.exact_duplicate_groups(kept).select(
        F.col("keeper_id").alias("doc_id")
    )
    kept = kept.join(keepers, "doc_id", "left_semi")
    return kept.select("doc_id")


def fused_form(docs, min_quality_e4=5000):
    from satsure_agri_datapipeline_spark.operators import text as tx

    scored = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("__digest"),
        tx.quality_score_col(F.col("text")).alias("__q"),
    ).where(F.col("__q") >= min_quality_e4)
    w = Window.partitionBy("__digest")
    return (
        scored.withColumn("__keep", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("__keep"))
        .select("doc_id")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="race_curation12", timezone="UTC", data_dir=args.sf)
    docs = load_table(spark, args.sf, "documents")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(docs.groupBy().count())  # warm

    results = {}
    for tag, fn in [("current", current_form), ("fused", fused_form)]:
        df = fn(docs)
        spark.sparkContext.setJobDescription(f"curation12:{tag}")
        per = []
        for _ in range(args.runs):
            t0 = time.time()
            run(df)
            per.append(round(time.time() - t0, 3))
        results[tag] = per
        print(f"{tag}: best={min(per):.3f} runs={per}")
        results[tag + "_rows"] = sorted(r.doc_id for r in df.collect())
    same = results["current_rows"] == results["fused_rows"]
    print(f"rows identical: {same} (n={len(results['current_rows'])})")
    if not same:
        a, b = set(results["current_rows"]), set(results["fused_rows"])
        print("only current:", sorted(a - b)[:10])
        print("only fused:", sorted(b - a)[:10])


if __name__ == "__main__":
    main()
