"""Re-time a handful of queries in isolation (bench methodology: build once,
best-of-N noop-sink runs) to adjudicate regression flags on a calm box.

Usage: python tools/retime_flagged.py [--runs N] [-q NAME ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=9)
    ap.add_argument("-q", "--query", action="append", required=True)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.band_store import ensure_band_store
    from satsure_agri_datapipeline_spark.sources.digest_store import ensure_digest_store
    from satsure_agri_datapipeline_spark.sources.shingle_store import ensure_shingle_store
    from satsure_agri_datapipeline_spark.plans.catalog_llm import INCR_HISTORY_SUBSET
    from satsure_agri_datapipeline_spark.operators import dedup as _dedup

    sf_dir = args.sf
    spark = get_spark(app_name="retime", timezone="UTC", data_dir=sf_dir)
    ensure_band_store(spark, sf_dir, num_hashes=16, band_size=4, n=3)
    ensure_shingle_store(spark, sf_dir, n=3, unit="word", seed=0)
    ensure_digest_store(spark, sf_dir, subset=INCR_HISTORY_SUBSET)
    queries = entry_mod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries["sensor_global_stats"](spark, sf_dir))

    for name in args.query:
        _dedup.CACHE_REGISTRY.clear()
        df = queries[name](spark, sf_dir)
        deps = list(_dedup.CACHE_REGISTRY)
        per = []
        for _ in range(args.runs):
            t0 = time.time()
            run(df)
            per.append(round(time.time() - t0, 3))
            for dep in deps:
                level = dep.storageLevel
                dep.unpersist(blocking=True)
                dep.persist(level)
        for dep in deps:
            dep.unpersist(blocking=True)
        print(f"{name}: best {min(per):.3f}s  runs {per}")


if __name__ == "__main__":
    main()
