"""Split the CURRENT catalog curation config (both stores + bench-side
restriction) into phases, using the exact catalog entries so the numbers
match the bench rows. Phases per run:

  construct      curate_corpus plan construction (includes kept_ids
                 persist+count gate job and the CC edge probe + union-find)
    cc           the connected_components slice of construct
  action         noop sink over the composed result

Usage: python tools/probe_curation_r13b.py [--runs N] [--mode raw|stored|capped]
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
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--mode", default="stored", choices=["raw", "stored", "capped"])
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.shingle_store import ensure_shingle_store
    from satsure_agri_datapipeline_spark.operators import dedup as _dedup

    spark = get_spark(app_name="probe_curation_b", timezone="UTC", data_dir=args.sf)
    sf_dir = args.sf
    ensure_shingle_store(spark, sf_dir, n=3, unit="word", seed=0)
    ensure_shingle_store(spark, sf_dir, n=4, unit="word", seed=0)
    queries = entry_mod.queries()
    name = {
        "raw": "doc_curation_pipeline",
        "stored": "doc_curation_pipeline_stored",
        "capped": "doc_curation_pipeline_capped",
    }[args.mode]

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries["sensor_global_stats"](spark, sf_dir))

    import satsure_agri_datapipeline_spark.operators.dedup as dd
    cc_orig = dd.connected_components
    phase = {}

    def cc_timed(*a, **k):
        t0 = time.time()
        out = cc_orig(*a, **k)
        phase["cc"] = round(time.time() - t0, 3)
        return out

    dd.connected_components = cc_timed
    try:
        for i in range(args.runs):
            _dedup.CACHE_REGISTRY.clear()
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            t_construct = round(time.time() - t0, 3)
            t1 = time.time()
            run(df)
            t_action = round(time.time() - t1, 3)
            total = round(time.time() - t0, 3)
            print(
                f"run{i}: total={total} construct={t_construct} "
                f"(cc={phase.get('cc')}) action={t_action}"
            )
            for dep in _dedup.CACHE_REGISTRY:
                dep.unpersist(blocking=True)
    finally:
        dd.connected_components = cc_orig


if __name__ == "__main__":
    main()
