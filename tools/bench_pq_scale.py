"""PQ scale probe (PERF.md r13): build a scaled embeddings-only corpus with
the make_scaled_sf recipe (vec_id shifted per copy, first component nudged
by copy*1e-4 — same rows, built as ONE range-crossJoin job instead of an
N-leg union), then measure on it:

- emb_pq_topk raw shape (fit + encode + ADC in-query)
- emb_pq_topk served from the standing PQ store (ensure first, untimed,
  then the fitted ADC read)
- brute-force exact squared-L2 top-k over the floats (the scan PQ replaces)
- pq_recall_eval (fitted) — recall@10 at this scale

Usage: python tools/bench_pq_scale.py [--copies 1000] [--out /tmp/pq_scale]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=1000)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/pq_scale")
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.operators import similarity as sim
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="bench_pq_scale", timezone="UTC")
    out = Path(args.out)
    emb_path = out / "embeddings.parquet"

    if not args.skip_gen:
        src_emb = spark.read.parquet(str(Path(args.src) / "embeddings.parquet"))
        n_vecs = src_emb.agg(F.max("vec_id")).collect()[0][0] + 1
        copies = spark.range(args.copies).select(F.col("id").alias("__copy"))
        scaled = (
            src_emb.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("__copy") * n_vecs).alias("vec_id"),
                F.concat(
                    F.array(
                        (
                            F.element_at("embedding", 1)
                            + F.col("__copy") * F.lit(1e-4)
                        ).cast("float")
                    ),
                    F.slice("embedding", 2, 10_000),
                ).alias("embedding"),
                "label",
            )
        )
        scaled.repartition(32).write.mode("overwrite").parquet(str(emb_path))

    emb = spark.read.parquet(str(emb_path))
    n = emb.count()
    print(f"corpus: {n} vectors", file=sys.stderr)

    results: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        rows = fn().collect()
        dt = round(time.time() - t0, 2)
        results[name] = dt
        print(f"{name}: {dt} s ({len(rows)} rows)", file=sys.stderr)
        return rows

    # raw shape: fit + encode + ADC in one query
    timed(
        "pq_topk_raw",
        lambda: sim.pq_topk_adc(emb, query_id=0, k=10, m=8, n_codes=16),
    )

    # standing store: build untimed, then the served ADC read
    from satsure_agri_datapipeline_spark.sources import pq_store as pqs

    t0 = time.time()
    cb, codes = pqs.ensure_pq_store(spark, out, m=8, k=16, iterations=2, seed=0)
    results["store_build_untimed"] = round(time.time() - t0, 2)
    print(f"store build: {results['store_build_untimed']} s", file=sys.stderr)
    timed(
        "pq_topk_stored",
        lambda: sim.pq_topk_adc(
            emb, query_id=0, k=10, m=8, n_codes=16, fitted=(cb, codes)
        ),
    )

    # the float scan PQ replaces (exact squared-L2 top-k)
    def exact():
        q = emb.where(F.col("vec_id") == 0).select(
            F.transform("embedding", lambda x: x.cast("double")).alias("__q")
        )
        d = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("__q"),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return (
            emb.crossJoin(F.broadcast(q))
            .where(F.col("vec_id") != 0)
            .select("vec_id", F.round(d, 6).alias("l2sq"))
            .orderBy(F.asc("l2sq"), F.col("vec_id").asc())
            .limit(10)
        )

    timed("exact_l2_topk", exact)

    # composed IVF-PQ from both standing stores (probe-pruned + compressed)
    from satsure_agri_datapipeline_spark.sources import ivf_store as ivfs

    t0 = time.time()
    cent, asg = ivfs.ensure_ivf_store(spark, out, k=8, iterations=2, seed=0)
    results["ivf_store_build_untimed"] = round(time.time() - t0, 2)
    timed(
        "ivfpq_topk_stored",
        lambda: sim.ivfpq_topk(
            emb, query_id=0, k=10, n_clusters=8, nprobe=2, m=8, n_codes=16,
            fitted_ivf=(cent, asg), fitted_pq=(cb, codes),
        ),
    )

    # co-located IVF-PQ (r13c): codes partitioned INTO the inverted lists —
    # probe partition-prunes the codes scan, no per-query candidate id-join
    from satsure_agri_datapipeline_spark.sources import ivfpq_store as ivfpqs

    t0 = time.time()
    cent2, cb2, lists = ivfpqs.ensure_ivfpq_store(
        spark, out, n_clusters=8, m=8, k=16, iterations=2, seed=0
    )
    results["ivfpq_colocated_build_untimed"] = round(time.time() - t0, 2)
    timed(
        "ivfpq_topk_colocated",
        lambda: ivfpqs.ivfpq_topk_from_lists(
            emb, cent2, cb2, lists, query_id=0, k=10, nprobe=2, m=8
        ),
    )

    ev = timed(
        "pq_recall_eval_stored",
        lambda: sim.pq_recall_eval(
            emb, query_id=0, k=10, m=8, n_codes=16, fitted=(cb, codes)
        ),
    )
    print(
        json.dumps(
            {
                "n_vectors": n,
                "times_sec": results,
                "recall": {
                    "n_truth": ev[0].n_truth,
                    "n_hits": ev[0].n_hits,
                    "recall_e4": ev[0].recall_e4,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
