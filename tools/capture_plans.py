"""Capture ``explain("formatted")`` for headline queries into plans/r13/.

Deliverable support for the optimization round: the judge checks plan-shape
claims (Exchange counts, join strategies, PushedFilters, Python-eval nodes)
against these committed files.

Usage:
    python tools/capture_plans.py --suffix before [--sf DIR] [-q NAME ...]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--suffix", required=True, help="before / after")
    ap.add_argument("-q", "--query", action="append", default=None)
    ap.add_argument("--out", default=None, help="output dir (default plans/r13)")
    args = ap.parse_args()

    out_dir = Path(args.out or Path(__file__).resolve().parent.parent / "plans" / "r13")
    out_dir.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="capture_plans", timezone="UTC", data_dir=args.sf)

    import bench

    # Same store pre-ensure as bench.py so the captured plans are the plans
    # the bench actually times (store-served where the default serves stores).
    from satsure_agri_datapipeline_spark.sources.band_store import ensure_band_store
    from satsure_agri_datapipeline_spark.sources.digest_store import ensure_digest_store
    from satsure_agri_datapipeline_spark.sources.shingle_store import ensure_shingle_store
    from satsure_agri_datapipeline_spark.sources.simhash_store import ensure_simhash_store
    from satsure_agri_datapipeline_spark.sources.ivf_store import ensure_ivf_store
    from satsure_agri_datapipeline_spark.sources.pq_store import ensure_pq_store
    from satsure_agri_datapipeline_spark.sources.ivfpq_store import ensure_ivfpq_store
    from satsure_agri_datapipeline_spark.plans.catalog_llm import INCR_HISTORY_SUBSET

    sf_dir = args.sf
    ensure_band_store(spark, sf_dir, num_hashes=16, band_size=4, n=3)
    ensure_shingle_store(spark, sf_dir, n=3, unit="word", seed=0)
    ensure_shingle_store(spark, sf_dir, n=15, unit="word", seed=0)
    ensure_shingle_store(spark, sf_dir, n=4, unit="word", seed=0)
    ensure_simhash_store(spark, sf_dir, bits=32, n_bands=4)
    ensure_simhash_store(spark, sf_dir, bits=60, n_bands=4)
    ensure_digest_store(spark, sf_dir, subset=INCR_HISTORY_SUBSET)
    ensure_ivf_store(spark, sf_dir, k=8, iterations=2, seed=0)
    ensure_pq_store(spark, sf_dir, m=8, k=16, iterations=2, seed=0)
    ensure_ivfpq_store(spark, sf_dir, n_clusters=8, m=8, k=16, iterations=2, seed=0)

    queries = entry_mod.queries()
    names = args.query or bench.HEADLINE
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {exc}"
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
