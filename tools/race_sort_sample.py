"""Alternating race: does the final global ORDER BY of the simhash-pairs
family double-execute the band self-join?

A global sort plans ``Exchange rangepartitioning`` whose range bounds come
from a SEPARATE sampling job over the exchange's child RDD (reservoir
sampling reads EVERY row of every child partition). Shuffle output below
the child is reused across jobs, so the re-executed segment is everything
between the last shuffle (or scan) and the sort. For
``pairs_from_store(...).orderBy(...)`` there is NO shuffle below the sort —
the zero-Exchange bucketed self-join IS the child — so the whole candidate
join runs twice per action: once for the sampler, once for the exchange's
map tasks. This is invisible in ``explain`` (it is a runtime job, not a
plan node), which is how three rounds of plan audits called this family
"output-bound" without seeing it.

Variants (rows asserted identical before timing):

A. committed form: ``pairs.orderBy(id_a, id_b)``.
B. hash-repartition barrier: ``pairs.repartition(id_a, id_b).orderBy(...)``
   — the extra exchange materializes the join output once; both the
   sampler and the range exchange then re-read shuffle blocks instead of
   re-running the join. Costs one extra shuffle of the (3 longs/row)
   result; saves one full execution of the join segment.
C. in-query persist barrier: ``pairs.persist(); pairs.orderBy(...)`` —
   the sampler populates the cache, the exchange reads it (released and
   re-armed per round, the bench's own rearm discipline).

Per-action job counts are printed via job-group tracking as structural
evidence (A = 2 jobs: sample + main; B = 3: barrier + sample + main).

Usage: python tools/race_sort_sample.py [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument(
        "--session-conf",
        action="store_true",
        help="keep session conf (AQE on) instead of the bench's "
        "small-input static mode — use for scaled runs",
    )
    ap.add_argument(
        "--skip-persist",
        action="store_true",
        help="skip variant C (persist barrier) — at 100x the cache write "
        "of the full pair set just re-measures variant-B's shuffle",
    )
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        ensure_simhash_store,
        pairs_from_store,
    )

    spark = get_spark(app_name="race_sort_sample", timezone="UTC", data_dir=args.sf)
    sc = spark.sparkContext
    store = ensure_simhash_store(spark, args.sf, bits=32, n_bands=4)

    pairs = pairs_from_store(store, max_hamming=3)
    a = pairs.orderBy("id_a", "id_b")
    b = pairs.repartition(F.col("id_a"), F.col("id_b")).orderBy("id_a", "id_b")
    from pyspark import StorageLevel

    pairs_cached = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    c = pairs_cached.orderBy("id_a", "id_b")

    def sig(df):
        # order-insensitive distributed checksum: count + sum of row hashes
        # (collect() of the 100x pair set would blow the driver)
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("id_a", "id_b", "hamming").cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sa, sb = sig(a), sig(b)
    assert sa == sb, f"variants disagree: {sa} {sb}"
    if not args.skip_persist:
        sc = sig(c)
        assert sa == sc, f"persist variant disagrees: {sa} {sc}"
    print(f"row multisets identical (n={sa[0]})")
    pairs_cached.unpersist(blocking=True)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def jobs_for(tag, df):
        sc.setJobGroup(tag, tag)
        run(df)
        sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    # bench small-input mode for this family (doc_simhash_pairs is not in
    # AQE_ALWAYS): static planning, 4 shuffle partitions. At scale
    # (--session-conf) keep the session defaults instead — AQE on, cpus
    # shuffle partitions — which is how tools/bench_scale.py times it.
    if not args.session_conf:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "4")

    print(f"jobs per action: A={jobs_for('ja', a)} B={jobs_for('jb', b)}")

    run(a)
    run(b)
    times = {"A orderBy        ": [], "B barrier+orderBy": [], "C persist+orderBy": []}
    for _ in range(args.rounds):
        t0 = time.time()
        run(a)
        times["A orderBy        "].append(round(time.time() - t0, 3))
        t0 = time.time()
        run(b)
        times["B barrier+orderBy"].append(round(time.time() - t0, 3))
        if args.skip_persist:
            continue
        pairs_cached.persist(StorageLevel.MEMORY_AND_DISK)
        t0 = time.time()
        run(c)
        times["C persist+orderBy"].append(round(time.time() - t0, 3))
        pairs_cached.unpersist(blocking=True)
    for k, ts in times.items():
        if ts:
            print(f"{k} best={min(ts):.3f} {ts}")


if __name__ == "__main__":
    main()
