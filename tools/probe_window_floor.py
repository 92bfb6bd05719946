"""Event-level evidence for the window_* floor (VERDICT r13 item 2): run
the two window queries bench-style (AQE off, 4 shuffle partitions, noop
sink, best-of-N) and attribute each run's wall time from the Spark UI REST
API — per-job launch→complete, per-stage submit→complete gaps (scheduling
floor), executorRunTime, GC, shuffle fetch — so the flag is closed with
measurements instead of attribution.

Usage: python tools/probe_window_floor.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["window_running_and_lag", "window_top_order_per_customer",
           "doc_exact_dedup"]  # exact_dedup = the 0.065 s comparison row


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=7)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name="probe_window_floor", timezone="UTC", data_dir=args.sf,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI disabled; cannot probe (set spark.ui.enabled)")
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    queries = entry_mod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries["sensor_global_stats"](spark, args.sf))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    for name in QUERIES:
        df = queries[name](spark, args.sf)
        run(df)  # warm codegen
        best, best_jobs = None, None
        for _ in range(args.runs):
            before_jobs = {j["jobId"] for j in rest(base, "/jobs")}
            t0 = time.time()
            run(df)
            wall = time.time() - t0
            jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in before_jobs]
            if best is None or wall < best:
                best, best_jobs = wall, jobs
        print(f"\n=== {name}: best wall {best:.3f}s, {len(best_jobs)} job(s) ===")
        for j in sorted(best_jobs, key=lambda x: x["jobId"]):
            sub = j["submissionTime"]
            comp = j["completionTime"]
            print(f"  job {j['jobId']}: {sub} -> {comp}  stages={j['stageIds']}")
            for sid in sorted(j["stageIds"]):
                try:
                    stages = rest(base, f"/stages/{sid}")
                except Exception:
                    continue
                for s in stages:
                    if s["status"] != "COMPLETE":
                        continue
                    first = s.get("firstTaskLaunchedTime")
                    print(
                        f"    stage {sid} ({s['name'].split()[0]}): "
                        f"tasks={s['numCompleteTasks']} "
                        f"submit={s['submissionTime']} first_task={first} "
                        f"complete={s['completionTime']} "
                        f"execRunMs={s['executorRunTime']} "
                        f"cpuMs={s['executorCpuTime'] // 1_000_000} "
                        f"gcMs={s['jvmGcTime']} "
                        f"deserMs={s['executorDeserializeTime']} "
                        f"fetchWaitMs={s['shuffleFetchWaitTime']} "
                        f"writeTimeMs={s['shuffleWriteTime'] // 1_000_000}"
                    )


if __name__ == "__main__":
    main()
