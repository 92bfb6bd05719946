"""Stage/task accounting for bench floor queries (VERDICT r4 task 1).

Runs each named query N times steady-state with the event log enabled, then
parses the log to report per-run job / stage / task counts and per-stage task
counts — ground truth (not `.explain`) for whether AQE
``coalescePartitions`` actually collapses the kB-sized shuffles of the
near-zero-work queries, or whether we are paying a 32-task scheduling floor
per stage.

Usage:
    python tools/stage_probe.py sensor_impute_median sensor_zscore_anomalies
Env:
    SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
    PROBE_CONF          JSON dict of extra spark conf
    PROBE_RUNS          runs per query (default 3; last run is reported)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EVDIR = "/tmp/spark-events-probe"


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = json.loads(os.environ.get("PROBE_CONF", "{}"))
    runs = int(os.environ.get("PROBE_RUNS", "3"))

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from satsure_agri_datapipeline_spark.session import get_spark

    import __spark_entry__ as entry_mod

    conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{EVDIR}",
        "spark.eventLog.compress": "false",
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(64 * 1024),
    }
    conf.update(extra)
    spark = get_spark(app_name="stage_probe", timezone="UTC", extra_conf=conf)
    sc = spark.sparkContext
    qs = entry_mod.queries()

    # warm up codegen/workers outside any measured group
    qs["sensor_global_stats"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    marks: dict[str, tuple[int, int]] = {}  # name -> (firstJobId, lastJobId)
    times: dict[str, list[float]] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        per = []
        for r in range(runs):
            sc.setJobGroup(f"{name}#{r}", name)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            per.append(time.time() - t0)
        times[name] = per
    sc.setJobGroup("end", "end")
    spark.stop()

    # parse the single event-log file
    evfiles = [p for p in Path(EVDIR).rglob("*") if p.is_file() and "appstatus" not in p.name]
    jobs = []  # (group, jobId, stages:[{id,tasks,name}])
    stage_tasks: dict[int, int] = {}
    stage_names: dict[int, str] = {}
    job_rows = []
    for f in evfiles:
        for line in f.read_text().splitlines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_tasks[si["Stage ID"]] = si["Number of Tasks"]
                stage_names[si["Stage ID"]] = si["Stage Name"].split()[0]
            elif e == "SparkListenerJobStart":
                group = (ev.get("Properties") or {}).get("spark.jobGroup.id", "?")
                sids = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
                job_rows.append((group, ev["Job ID"], sids))

    per_group: dict[str, dict] = {}
    for group, jid, sids in job_rows:
        g = per_group.setdefault(group, {"jobs": 0, "stages": 0, "tasks": 0, "detail": []})
        g["jobs"] += 1
        # AQE submits stages lazily; count only stages that actually ran
        ran = [s for s in sids if s in stage_tasks]
        g["stages"] += len(ran)
        for s in ran:
            g["tasks"] += stage_tasks[s]
            g["detail"].append(f"{stage_names.get(s,'?')}:{stage_tasks[s]}")

    for name in names:
        for r in range(runs):
            g = per_group.get(f"{name}#{r}", {})
            print(
                f"{name} run{r}: {times[name][r]:.3f}s jobs={g.get('jobs',0)} "
                f"stages={g.get('stages',0)} tasks={g.get('tasks',0)} "
                f"[{' '.join(g.get('detail',[]))}]"
            )


if __name__ == "__main__":
    main()
