"""Alternating A/B race: bench small-input static planning (AQE off,
4 shuffle partitions) vs AQE-on (32 partitions) for given headline queries.

The bench's small-input branch dates to r4; plans have changed since. Both
variants run in the SAME process, alternating, with the bench's noop-sink
methodology, so co-tenant noise cancels.

Usage: python tools/race_aqe_floor.py -q NAME [-q NAME ...] [--rounds N]
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
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("-q", "--query", action="append", required=True)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="race_aqe", timezone="UTC", data_dir=args.sf)
    queries = entry_mod.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(queries["sensor_global_stats"](spark, args.sf))

    def set_conf(variant):
        if variant == "A":  # bench small-input static planning
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        else:  # AQE on, CPU-count partitions
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
            )

    for name in args.query:
        dfs = {}
        for v in ("A", "B"):
            set_conf(v)
            dfs[v] = queries[name](spark, args.sf)
            run(dfs[v])  # warm codegen per variant
        times = {"A": [], "B": []}
        for _ in range(args.rounds):
            for v in ("A", "B"):
                set_conf(v)
                t0 = time.time()
                run(dfs[v])
                times[v].append(round(time.time() - t0, 3))
        print(
            f"{name}: A(static4) best={min(times['A'])} {times['A']}  "
            f"B(aqe32) best={min(times['B'])} {times['B']}"
        )


if __name__ == "__main__":
    main()
