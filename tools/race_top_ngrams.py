"""Race doc_top_ngrams formulations at a given SF (optimization r13).

Hypothesis (guide §4.4-adjacent, SURVEY §4.4 trap 1): the one-projection
gram-array form still re-evaluates ``split(trim(text))`` per GRAM because
the split subtree sits INSIDE the ``transform`` lambda, and lambda
functions are excluded from both codegen and interpreted subexpression
elimination. Variants:

  A. current: one projection, when(size>=n, transform(seq, slice+join)).
  B. two-step: materialize ``toks`` in its own projection first, then build
     the gram array from the column (CollapseProject keeps non-cheap
     multi-use expressions separate since SPARK-36718, so the split should
     evaluate once per doc).
  C. mapInArrow combiner: per-task Python Counter over (ngram -> (docs,
     occs)) partials, then ONE groupBy(ngram).agg(sum, sum) — the classic
     word-count combiner; single exchange, no countDistinct double
     aggregate. Tokenization replicates Java's \\s+ split on trimmed text.

Usage: python tools/race_top_ngrams.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def variant_a(docs, n=2, k=20):
    from satsure_agri_datapipeline_spark.operators.text import top_ngrams

    return top_ngrams(docs, n=n, k=k)


def variant_b(docs, n=2, k=20, id_col="doc_id", text_col="text"):
    toks_df = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks")
    )
    toks = F.col("__toks")
    gram_arr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks_df.select(
        F.col(id_col), F.explode_outer(gram_arr).alias("ngram")
    ).where(F.col("ngram").isNotNull())
    return (
        grams.groupBy("ngram")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "ngram")
        .limit(k)
    )


def variant_c(docs, n=2, k=20, id_col="doc_id", text_col="text"):
    import pandas as pd  # noqa: F401

    def partial_counts(batches):
        import re
        from collections import Counter

        import pyarrow as pa

        ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s (ASCII class)
        docs_c: Counter = Counter()
        occ_c: Counter = Counter()
        for batch in batches:
            for text in batch.column(0).to_pylist():
                if text is None:
                    continue
                t = text.strip(" ")  # Spark/DuckDB trim: spaces only
                w = ws.split(t)
                if len(w) < n:
                    continue
                grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
                occ_c.update(grams)
                docs_c.update(set(grams))
        if docs_c:
            yield pa.record_batch(
                [
                    pa.array(list(docs_c.keys()), pa.string()),
                    pa.array(list(docs_c.values()), pa.int64()),
                    pa.array([occ_c[g] for g in docs_c], pa.int64()),
                ],
                names=["ngram", "pd", "po"],
            )

    partials = docs.select(text_col).mapInArrow(
        partial_counts, "ngram string, pd long, po long"
    )
    return (
        partials.groupBy("ngram")
        .agg(F.sum("pd").alias("n_docs"), F.sum("po").alias("n_occurrences"))
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "ngram")
        .limit(k)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--variants", default="abc")
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="race_top_ngrams", timezone="UTC", data_dir=args.sf)
    docs = load_table(spark, args.sf, "documents")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(docs.groupBy().count())  # warm

    variants = {"a": variant_a, "b": variant_b, "c": variant_c}
    results = {}
    for tag in args.variants:
        df = variants[tag](docs)
        spark.sparkContext.setJobDescription(f"top_ngrams:{tag}")
        per = []
        for _ in range(args.runs):
            t0 = time.time()
            run(df)
            per.append(round(time.time() - t0, 3))
        results[tag] = per
        print(f"{tag}: best={min(per):.3f} runs={per}")
        rows = [tuple(r) for r in df.collect()]
        results[tag + "_rows"] = rows
    # cross-check equality of results
    tags = [t for t in args.variants]
    base = results[tags[0] + "_rows"]
    for t in tags[1:]:
        same = results[t + "_rows"] == base
        print(f"rows {tags[0]} == {t}: {same}")
        if not same:
            for x, y in zip(base, results[t + "_rows"]):
                if x != y:
                    print("  diff:", x, "vs", y)


if __name__ == "__main__":
    main()
