"""Bucket-floor race at TINY source scale, one PROCESS per layout (store
ensures discard sibling layouts of the same source, so 32- and 8-bucket
layouts cannot coexist — alternate fresh processes instead, the
tools/retime_curation_trees.py protocol).

The r12 ``default_n_buckets`` ladder (store_util) was raced at its UPPER
end (spill at 1000×: >=256 MiB -> 128, >=64 MiB -> 64); the 32 floor was
inherited, never raced downward. At sf0.1 the event-log probe
(tools/stage_probe.py) shows every store-served query paying 32-64-task
stages of ~2-4 ms/task over ~20 KB bucket files — the guide §6 small-files
cost, twice per self-join.

Usage (one invocation = one layout, prints one JSON line):
    python tools/race_bucket_floor.py --buckets 32 [--sf DIR] [--rounds N]
    python tools/race_bucket_floor.py --buckets 8  ...
Alternate invocations from a shell loop and compare the JSON lines.
Row parity across layouts: each invocation also prints a per-query
order-insensitive checksum — compare across layouts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "doc_ngram_jaccard",
    "doc_minhash_lsh",
    "doc_simhash_pairs",
    "doc_containment_pairs_capped",
    "doc_dup_spans",
    "doc_incremental_near_dup",
]


def ensure_all(spark, sf):
    from satsure_agri_datapipeline_spark.plans.catalog_llm import (
        INCR_HISTORY_SUBSET,
    )
    from satsure_agri_datapipeline_spark.sources.band_store import (
        ensure_band_store,
    )
    from satsure_agri_datapipeline_spark.sources.digest_store import (
        ensure_digest_store,
    )
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        ensure_shingle_store,
    )
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        ensure_simhash_store,
    )

    ensure_shingle_store(spark, sf, n=3, unit="word", seed=0)
    ensure_shingle_store(spark, sf, n=15, unit="word", seed=0)
    ensure_band_store(spark, sf, num_hashes=16, band_size=4, n=3)
    ensure_simhash_store(spark, sf, bits=32, n_bands=4)
    ensure_digest_store(spark, sf, subset=INCR_HISTORY_SUBSET)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--buckets", type=int, required=True, help="0 = default")
    args = ap.parse_args()

    if args.buckets:
        os.environ["SPARK_GRAFT_STORE_N_BUCKETS"] = str(args.buckets)
    else:
        os.environ.pop("SPARK_GRAFT_STORE_N_BUCKETS", None)

    from satsure_agri_datapipeline_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name=f"race_bucket_floor_{args.buckets}", timezone="UTC",
        data_dir=args.sf,
    )
    queries = entry_mod.queries()
    ensure_all(spark, args.sf)
    dfs = {q: queries[q](spark, args.sf) for q in QUERIES}

    import hashlib

    sums = {}
    for q in QUERIES:
        rows = sorted(tuple(r) for r in dfs[q].collect())
        sums[q] = hashlib.md5(repr(rows).encode()).hexdigest()[:12]

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    AQE_ALWAYS = {
        "doc_ngram_jaccard",
        "doc_minhash_lsh",
        "doc_incremental_near_dup",
    }
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    def conf_for(q):
        if q in AQE_ALWAYS:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.shuffle.partitions", cpus)
        else:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", "4")

    times = {}
    for q in QUERIES:
        conf_for(q)
        run(dfs[q])
        ts = []
        for _ in range(args.rounds):
            t0 = time.time()
            run(dfs[q])
            ts.append(round(time.time() - t0, 3))
        times[q] = ts
    with open("/proc/loadavg") as f:
        load = f.read().split()[0]
    print(
        "BUCKET_RACE "
        + json.dumps(
            {
                "buckets": args.buckets,
                "best": {q: min(ts) for q, ts in times.items()},
                "runs": times,
                "checksums": sums,
                "loadavg": load,
            }
        )
    )


if __name__ == "__main__":
    main()
