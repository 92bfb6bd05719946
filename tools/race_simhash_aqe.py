"""Alternating race: which execution mode should the bench's small-input
policy give the doc_simhash_pairs family?

bench.py's r4 small-input policy runs sub-64 MiB inputs with AQE off +
4 shuffle partitions, EXCEPT the bucket-join dedup queries (AQE_ALWAYS:
ngram_jaccard, minhash_lsh, curation, incremental_near_dup) where AQE's
runtime decisions pay. doc_simhash_pairs{,_stored,_deduped} are
bucket-join dedup queries too — but they sat in the static bucket, and
unlike the other floor rows they push 1.5 M result pairs through the
final rangepartitioning exchange + sort, where 4-vs-32 partitions is not
floor noise.

Modes raced (same DataFrame, conf toggled per run as bench.py does):
  static4  — AQE off, shuffle.partitions=4 (current bench mode)
  static32 — AQE off, shuffle.partitions=$SPARK_GRAFT_CPUS
  aqe      — AQE on, shuffle.partitions=$SPARK_GRAFT_CPUS (session mode)

Usage: python tools/race_simhash_aqe.py [--sf DIR] [--rounds N]
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
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        ensure_simhash_store,
        pairs_from_store,
    )

    spark = get_spark(
        app_name="race_simhash_aqe", timezone="UTC", data_dir=args.sf
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    store = ensure_simhash_store(spark, args.sf, bits=32, n_bands=4)
    df = pairs_from_store(store, max_hamming=3).orderBy("id_a", "id_b")

    modes = {
        "static4 ": ("false", "4"),
        "static32": ("false", cpus),
        "aqe     ": ("true", cpus),
    }

    def run(mode):
        aqe, parts = modes[mode]
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for m in modes:
        run(m)  # warm each mode's codegen
    times = {m: [] for m in modes}
    for _ in range(args.rounds):
        for m in modes:
            times[m].append(run(m))
    for m, ts in times.items():
        print(f"{m} best={min(ts):.3f} {ts}")


if __name__ == "__main__":
    main()
