"""Alternating race: barrier before the curation pipeline's final global
ORDER BY.

The committed plan's final ``Sort ← Exchange(rangepartitioning)`` child is
the full ``docs scan → kept_ids semi-join → CC anti-join → decon
anti-join`` chain with NO shuffle below it (all three joins are broadcast).
The range exchange's bounds come from a separate sampling job that
consumes EVERY row of the child — so that whole segment, including the
full documents scan, executes twice per action. At 100 TB that is one
extra corpus pass per run, bought by nothing.

B inserts ``repartition(doc_id)`` before the orderBy: the id set (8 B/row)
is materialized once as a shuffle stage; the sampler and the range
exchange then re-read shuffle blocks. Rows asserted identical first.

Methodology matches bench.py's CONSTRUCT_EACH_RUN handling for this query
(construction executes the CC collect, so construct + run are timed
together each round; caches cleared between rounds; AQE on — the trio is
in AQE_ALWAYS).

Usage: python tools/race_curation_sortbarrier.py [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def build_kept(spark, sf_dir):
    from satsure_agri_datapipeline_spark.plans.catalog_llm import (
        _quality_kernel_gate,
    )
    from satsure_agri_datapipeline_spark.plans.curation import curate_corpus
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    store = shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
    decon = (
        shingle_store_or_none(spark, sf_dir, n=4, unit="word", seed=0)
        if store is not None
        else None
    )
    return curate_corpus(
        docs, bench, min_quality_e4=5000, jaccard_threshold=0.5,
        shingle_n=3, decon_n=4, shingle_store=store, decon_store=decon,
        decon_bench_exploded=(
            decon.where(F.col("doc_id") % 97 == 0) if decon is not None else None
        ),
        quality_kernel=_quality_kernel_gate(sf_dir),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.operators import dedup as _dedup
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name="race_curation_sortbarrier", timezone="UTC", data_dir=args.sf
    )

    # parity check once, then timing
    _dedup.CACHE_REGISTRY.clear()
    kept = build_kept(spark, args.sf)
    a_rows = sorted(
        r[0] for r in kept.select("doc_id").orderBy("doc_id").collect()
    )
    b_rows = sorted(
        r[0]
        for r in kept.select("doc_id")
        .repartition(F.col("doc_id"))
        .orderBy("doc_id")
        .collect()
    )
    assert a_rows == b_rows, "barrier variant must keep the identical id set"
    print(f"rows identical (n={len(a_rows)})")
    for dep in _dedup.CACHE_REGISTRY:
        dep.unpersist(blocking=True)

    def run(finalize):
        _dedup.CACHE_REGISTRY.clear()
        t0 = time.time()
        kept = build_kept(spark, args.sf)
        finalize(kept).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        for dep in _dedup.CACHE_REGISTRY:
            dep.unpersist(blocking=True)
        return dt

    fa = lambda k: k.select("doc_id").orderBy("doc_id")  # noqa: E731
    fb = lambda k: (  # noqa: E731
        k.select("doc_id").repartition(F.col("doc_id")).orderBy("doc_id")
    )
    run(fa)
    run(fb)
    times = {"A orderBy        ": [], "B barrier+orderBy": []}
    for _ in range(args.rounds):
        times["A orderBy        "].append(run(fa))
        times["B barrier+orderBy"].append(run(fb))
    for k, ts in times.items():
        print(f"{k} best={min(ts):.3f} {ts}")


if __name__ == "__main__":
    main()
