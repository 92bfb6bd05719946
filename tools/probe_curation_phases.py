"""Phase-level wall-clock accounting for the curation pipeline at a given SF.

The bench times construction+execution together (CONSTRUCT_EACH_RUN). This
probe splits one steady-state run into its phases:

  P1  plan construction up to the CC gate: kept_ids persist+count (the
      broadcast-gate job) -- only in store mode
  P2  CC edge materialization: edges persist+count + Arrow toPandas +
      driver union-find (executes the stage-3 pair lineage)
  P3  final action: noop sink over the composed result (docs semi kept_ids,
      canonical anti-join, decontaminate anti-join)

Usage: python tools/probe_curation_phases.py [--sf DIR] [--runs N] [--mode raw|stored|capped]
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
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--mode", default="stored", choices=["raw", "stored", "capped"])
    args = ap.parse_args()

    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.sources.tables import load_table
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        ensure_shingle_store,
        shingle_store_or_none,
    )
    from satsure_agri_datapipeline_spark.plans.curation import curate_corpus
    from satsure_agri_datapipeline_spark.operators import dedup as _dedup

    spark = get_spark(app_name="probe_curation", timezone="UTC", data_dir=args.sf)
    sf_dir = args.sf
    ensure_shingle_store(spark, sf_dir, n=3, unit="word", seed=0)
    ensure_shingle_store(spark, sf_dir, n=4, unit="word", seed=0)
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(docs.groupBy().count())  # warm

    # monkeypatch timing points: wrap connected_components to time the
    # eager work it does at plan-construction time
    import satsure_agri_datapipeline_spark.operators.dedup as dd
    cc_orig = dd.connected_components
    phase = {}

    def cc_timed(*a, **k):
        t0 = time.time()
        out = cc_orig(*a, **k)
        phase["cc"] = round(time.time() - t0, 3)
        return out

    dd.connected_components = cc_timed

    store = (
        shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
        if args.mode in ("stored", "capped")
        else None
    )
    decon = (
        shingle_store_or_none(spark, sf_dir, n=4, unit="word", seed=0)
        if args.mode == "capped"
        else None
    )
    kw = {}
    if args.mode == "capped":
        kw = dict(max_shingle_df=10, decon_store=decon)

    for i in range(args.runs):
        _dedup.CACHE_REGISTRY.clear()
        t0 = time.time()
        kept = curate_corpus(
            docs, bench, min_quality_e4=5000, jaccard_threshold=0.5,
            shingle_n=3, decon_n=4, shingle_store=store, **kw,
        )
        t_construct = round(time.time() - t0, 3)
        out = kept.select("doc_id").orderBy("doc_id")
        t1 = time.time()
        run(out)
        t_action = round(time.time() - t1, 3)
        total = round(time.time() - t0, 3)
        print(
            f"run{i}: total={total} construct={t_construct} "
            f"(cc={phase.get('cc')}) action={t_action}"
        )
        for dep in _dedup.CACHE_REGISTRY:
            dep.unpersist(blocking=True)

    dd.connected_components = cc_orig


if __name__ == "__main__":
    main()
