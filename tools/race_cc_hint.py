"""Alternating A/B race for the r13-opt connected-components changes:

  A (old): edges.persist BEFORE the limit-probe; union-find result unhinted
  B (new): probe unpersisted; driver union-find result broadcast-hinted

Both variants run in the SAME process, alternating, timing construct+action
of a curation catalog query with the bench's conf (AQE on, 32 shuffle
partitions) — co-tenant noise hits both sides equally.

Usage: python tools/race_cc_hint.py [--rounds N] [--mode stored|capped|raw]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--mode", default="stored", choices=["raw", "stored", "capped"])
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.shingle_store import ensure_shingle_store
    import satsure_agri_datapipeline_spark.operators.dedup as dd

    spark = get_spark(app_name="race_cc", timezone="UTC", data_dir=args.sf)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
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

    new_cc = dd.connected_components

    def old_cc(edges, src_col="id_a", dst_col="id_b", max_iterations=50,
               driver_threshold=1_000_000):
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        pdf = (
            edges.select(
                F.col(src_col).cast("long").alias("src"),
                F.col(dst_col).cast("long").alias("dst"),
            )
            .limit(driver_threshold + 1)
            .toPandas()
        )
        assert len(pdf) <= driver_threshold, "race expects the driver path"
        try:
            parent = {}

            def find(x):
                root = x
                while parent.setdefault(root, root) != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for a, b in zip(pdf["src"].to_numpy().tolist(), pdf["dst"].to_numpy().tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            rows = [(n, find(n)) for n in parent]
            # NO broadcast hint — the pre-change behavior
            return edges.sparkSession.createDataFrame(
                rows, "node_id long, component_id long"
            )
        finally:
            edges.unpersist()

    def one(variant):
        dd.connected_components = old_cc if variant == "A" else new_cc
        dd.CACHE_REGISTRY.clear()
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        run(df)
        dt = round(time.time() - t0, 3)
        for dep in dd.CACHE_REGISTRY:
            dep.unpersist(blocking=True)
        dd.connected_components = new_cc
        return dt

    # warm both variants once (codegen for both plan shapes)
    one("A"); one("B")
    a_times, b_times = [], []
    for i in range(args.rounds):
        a_times.append(one("A"))
        b_times.append(one("B"))
        print(f"round{i}: A={a_times[-1]} B={b_times[-1]}")
    print(f"A(old) best={min(a_times)} all={a_times}")
    print(f"B(new) best={min(b_times)} all={b_times}")


if __name__ == "__main__":
    main()
