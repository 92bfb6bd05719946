"""Alternating race: curation broadcast gate decided by the parquet-footer
row bound (survivor_bound, optimization r14) vs the r12 per-construction
kept_ids.count() job.

Both forms produce the identical plan downstream of the gate (the bound
only replaces the count's gate input; survivors ⊆ docs so bound ≤ limit
proves the broadcast safe); what the race measures is the removed job —
one fewer action per construction, with the kept_ids cache populated by
its first real consumer instead of by the count.

Methodology = bench.py CONSTRUCT_EACH_RUN: construct + run timed together,
caches cleared between rounds.

Usage: python tools/race_curation_countgate.py [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def build_kept(spark, sf_dir, bound):
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
        survivor_bound=bound,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.operators import dedup as _dedup
    from satsure_agri_datapipeline_spark.plans.catalog_llm import _docs_row_bound
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name="race_curation_countgate", timezone="UTC", data_dir=args.sf
    )
    bound = _docs_row_bound(args.sf)
    print(f"footer row bound: {bound}")

    # parity once
    _dedup.CACHE_REGISTRY.clear()
    ra = sorted(
        r[0] for r in build_kept(spark, args.sf, None).select("doc_id").collect()
    )
    for dep in _dedup.CACHE_REGISTRY:
        dep.unpersist(blocking=True)
    _dedup.CACHE_REGISTRY.clear()
    rb = sorted(
        r[0] for r in build_kept(spark, args.sf, bound).select("doc_id").collect()
    )
    for dep in _dedup.CACHE_REGISTRY:
        dep.unpersist(blocking=True)
    assert ra == rb, "bound-gated form must keep the identical id set"
    print(f"rows identical (n={len(ra)})")

    def run(b):
        _dedup.CACHE_REGISTRY.clear()
        t0 = time.time()
        kept = build_kept(spark, args.sf, b)
        kept.select("doc_id").orderBy("doc_id").write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.time() - t0, 3)
        for dep in _dedup.CACHE_REGISTRY:
            dep.unpersist(blocking=True)
        return dt

    run(None)
    run(bound)
    times = {"A count gate": [], "B footer gate": []}
    for _ in range(args.rounds):
        times["A count gate"].append(run(None))
        times["B footer gate"].append(run(bound))
    for k, ts in times.items():
        print(f"{k} best={min(ts):.3f} {ts}")


if __name__ == "__main__":
    main()
