"""Runtime-bloom-filter race for the RAW join_multiway_revenue path
(VERDICT r6 task 6). The bucketed layout already wins when it exists; the
raw path is what the driver benches (2.64x at 100x, 2.89x at 1000x).

Idea: AQE runtime filters can push a might_contain(l_orderkey) pre-filter
built from the region-filtered orders side into the lineitem scan, dropping
~60% of fact rows BEFORE the big exchange. At sandbox scale the production
thresholds (creation side <= 10MB, application side >= 10GB scan) never
fire, so the race lowers/raises them explicitly:

- creationSideThreshold: the filtered orders relation is ~40% of orders
  (6M rows at 100x) — raise to 1GB so the bloom is allowed to build;
- applicationSideScanSizeThreshold: 0 so the sub-10GB lineitem qualifies;
- expectedNumItems / maxNumBits sized for millions of orderkeys (the 1M
  default would saturate: a full bloom passes everything and only adds CPU).

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 python tools/race_multiway.py [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from satsure_agri_datapipeline_spark.plans import catalog_relational as rel
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="race_multiway", timezone="UTC")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    BLOOM = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems": "16000000",
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits": "268435456",
    }

    def conf_set(kv):
        saved = {}
        for k, v in kv.items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            spark.conf.set(k, v)
        return saved

    def conf_restore(saved):
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    results = {}
    expected = None
    for name, conf in [("A_raw_default", {}), ("B_raw_bloom", BLOOM)]:
        saved = conf_set(conf) if conf else {}
        df = rel.join_multiway_revenue(spark, sf_dir)
        rows = [tuple(r) for r in df.collect()]
        if expected is None:
            expected = rows
        else:
            assert rows == expected, f"{name} diverged!"
        plan = df._jdf.queryExecution().executedPlan().toString().lower()
        has_bloom = "might_contain" in plan or "bloomfilter" in plan
        per = []
        for _ in range(n_runs):
            t0 = time.time()
            run(df)
            per.append(round(time.time() - t0, 2))
        if saved:
            conf_restore(saved)
        results[name] = {"best": min(per), "runs": per, "bloom_in_plan": has_bloom}
        print(f"# {name}: best {min(per)}s of {per} bloom={has_bloom}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "n_runs": n_runs, "results": results}))


if __name__ == "__main__":
    main()
