"""Alternating A/B/C race for the curation stage-1 quality-score scan
(VERDICT r13 "Next round" item 1: the quality-score regexps are the
measured dominant term of the curation trio at 100×).

Variants, raced on the ACTUAL consumer shape (stage 1+2 fused subplan:
project (id, digest, q) → filter q ≥ 5000 → groupBy(digest).agg(min(id))):

- A: committed expression (`tx.quality_score_col`) — split+size for
  n_tokens, regexp_replace char-strip for n_punct, regexp_count for
  stop_hits: three regex passes over every byte.
- B: translate-punct expression — n_punct via
  length(txt) − length(translate(txt, ".,;:!?", "")) (char-map, no regex
  engine); split + regexp_count unchanged.
- C: one-pass Arrow kernel (`arrow_udf`, guide §4.2) — RE2
  count_substring_regex for token-run and punct counts,
  split_pattern_regex + is_in + offset-cumsum for stop hits, all
  arithmetic in float64 matching the JVM expression op-for-op.

Identity is asserted FIRST on the full per-doc score column (not just the
aggregate): any variant disagreeing on any doc aborts the race.

Usage: python tools/race_quality_kernel.py [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def quality_score_col_r13(txt):
    """Variant A: the pre-r14 committed expression — n_punct via a
    regexp_replace char-strip instead of the translate length-diff."""
    from satsure_agri_datapipeline_spark.operators.text import (
        LANG_MARKERS,
        _half_up,
        _marker_token_count,
    )

    n_chars = F.length(txt)
    toks = F.split(F.trim(txt), r"\s+")
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    n_punct = F.length(F.regexp_replace(txt, r"[^.,;:!?]", ""))
    stop_hits = _marker_token_count(txt, LANG_MARKERS["en"])
    punct_e4 = _half_up(n_punct * 10000.0 / F.greatest(n_chars, F.lit(1)))
    stop_e4 = _half_up(stop_hits * 10000.0 / n_tokens)
    len_component = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return _half_up(
        (
            0.5 * len_component
            + 0.3 * F.least(stop_e4 / F.lit(2000.0), F.lit(1.0))
            + 0.2 * (1.0 - F.least(punct_e4 / F.lit(1000.0), F.lit(1.0)))
        )
        * 10000
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--variants", default="abc")
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.operators import text as tx
    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="race_quality_kernel", timezone="UTC", data_dir=args.sf)
    docs = load_table(spark, args.sf, "documents")

    def stage12(qcol):
        scored = docs.select(
            F.col("doc_id"),
            F.md5(F.lower(F.trim(F.col("text")))).alias("__digest"),
            qcol.alias("__q"),
        )
        return (
            scored.where(F.col("__q") >= 5000)
            .groupBy("__digest")
            .agg(F.min("doc_id").alias("doc_id"))
        )

    variants = {}
    if "a" in args.variants:
        variants["A expr r13 regexp "] = stage12(quality_score_col_r13(F.col("text")))
    if "b" in args.variants:
        variants["B expr translate  "] = stage12(tx.quality_score_col(F.col("text")))
    if "c" in args.variants:
        variants["C arrow kernel    "] = stage12(
            tx.quality_score_kernel_col(F.col("text"))
        )

    # identity on the full per-doc score column first
    base = docs.select(
        "doc_id", quality_score_col_r13(F.col("text")).alias("q")
    ).orderBy("doc_id")
    base_rows = base.collect()
    for name, qcol in (
        ("B", tx.quality_score_col(F.col("text"))),
        ("C", tx.quality_score_kernel_col(F.col("text"))),
    ):
        if name.lower() not in args.variants:
            continue
        rows = docs.select("doc_id", qcol.alias("q")).orderBy("doc_id").collect()
        assert rows == base_rows, f"variant {name} scores differ from committed"
        print(f"variant {name}: per-doc scores identical (n={len(rows)})")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    for df in variants.values():
        run(df)  # warm codegen/JIT
    times = {k: [] for k in variants}
    for _ in range(args.rounds):
        for k, df in variants.items():
            t0 = time.time()
            run(df)
            times[k].append(round(time.time() - t0, 3))
    for k, ts in times.items():
        print(f"{k} best={min(ts):.3f} {ts}")


if __name__ == "__main__":
    main()
