"""Cross-process 100× before/after for the stored curation pipeline
(VERDICT r13 "next round" item 7: the r13 attempt was storm-invalidated by
4× host variance; re-run in a verified-calm window).

Times doc_curation_pipeline_stored at $SPARK_GRAFT_SF_DIR in ONE tree
(--tree: repo root to import from), bench methodology for the curation
family (construction inside the timed region — the CC collect executes
work — noop sink, N timed runs after one warmup), with the construct / cc
/ action phase split. The caller alternates PROCESSES between the HEAD
tree and the pre-optimization build tree (7271f23) over the same corpus
and stores, recording /proc/loadavg with every run so a storm window is
visible in the artifact.

Usage:
  python tools/retime_curation_trees.py --tree /root/repo --runs 3
  python tools/retime_curation_trees.py --tree /tmp/r13build --runs 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", required=True)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    tree = str(Path(args.tree).resolve())
    sys.path.insert(0, tree)

    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        ensure_shingle_store,
    )
    import satsure_agri_datapipeline_spark.operators.dedup as dd

    spark = get_spark(
        app_name="retime_trees", timezone="UTC", data_dir=args.sf
    )
    ensure_shingle_store(spark, args.sf, n=3, unit="word", seed=0)
    ensure_shingle_store(spark, args.sf, n=4, unit="word", seed=0)
    queries = entry_mod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries["sensor_global_stats"](spark, args.sf))

    cc_orig = dd.connected_components
    phase: dict[str, float] = {}

    def cc_timed(*a, **k):
        t0 = time.time()
        out = cc_orig(*a, **k)
        phase["cc"] = round(time.time() - t0, 3)
        return out

    dd.connected_components = cc_timed

    rows = []
    for i in range(args.runs + 1):  # +1 warmup
        dd.CACHE_REGISTRY.clear()
        phase.clear()
        load0 = open("/proc/loadavg").read().split()[0]
        t0 = time.time()
        df = queries["doc_curation_pipeline_stored"](spark, args.sf)
        t1 = time.time()
        run(df)
        t2 = time.time()
        for dep in dd.CACHE_REGISTRY:
            dep.unpersist(blocking=True)
        row = {
            "warmup": i == 0,
            "total": round(t2 - t0, 3),
            "construct": round(t1 - t0, 3),
            "cc": phase.get("cc"),
            "action": round(t2 - t1, 3),
            "loadavg_at_start": load0,
        }
        rows.append(row)
        print(json.dumps({"tree": tree, **row}), flush=True)
    timed = [r for r in rows if not r["warmup"]]
    best = min(timed, key=lambda r: r["total"])
    print(json.dumps({"tree": tree, "best": best}), flush=True)


if __name__ == "__main__":
    main()
