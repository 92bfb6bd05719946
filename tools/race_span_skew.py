"""Race the two duplicated_span_stats formulations (r12, verdict task 3):
the single-consumption WINDOW form (r11 default) vs the skew-safe
groupBy+flag-join form, on two corpora:

1. the REAL 100× corpus (/tmp/sf10 by default) — near-dup-shaped span
   frequencies (group sizes are cluster-sized), where the window form's
   single consumption is expected to win;
2. a SYNTHETIC BOILERPLATE corpus derived from it — the same documents
   with one fixed 15-word boilerplate prefix prepended to every text, so
   ONE span is shared by every document: the window form must put all
   N rows of that span into a single unsplittable window partition (one
   straggler task carries the hot span), while the skew form's hash
   aggregate absorbs it with map-side partials.

Both forms run the RAW path (no stores for the synthetic dir; the real
corpus runs raw too so the two corpora are comparable). Prints one JSON
line per (corpus, form) with best-of-N wall seconds.

Usage:
    python tools/race_span_skew.py                 # /tmp/sf10, 2 runs
    SPARK_GRAFT_SF_DIR=/tmp/sf10 RACE_RUNS=3 python tools/race_span_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BOILER_DIR = Path("/tmp/sf_span_boiler")


def main() -> None:
    sf_dir = Path(os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10"))
    runs = int(os.environ.get("RACE_RUNS", "2"))

    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.operators import dedup as dd
    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="race_span_skew", timezone="UTC")

    # synthetic boilerplate corpus: every doc shares one 15-word span
    boiler_docs = BOILER_DIR / "documents.parquet"
    if not boiler_docs.exists():
        boiler = " ".join(f"boiler{i}" for i in range(15))
        (
            spark.read.parquet(str(sf_dir / "documents.parquet"))
            .withColumn("text", F.concat(F.lit(boiler + " "), F.col("text")))
            .write.mode("overwrite")
            .parquet(str(boiler_docs))
        )

    def race(tag: str, docs_path: Path) -> None:
        docs = spark.read.parquet(str(docs_path)).select("doc_id", "text")
        for form, kw in (("window", {}), ("skew_safe", {"skew_safe": True})):
            per = []
            for _ in range(runs):
                df = dd.duplicated_span_stats(docs, span_words=15, **kw)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                per.append(round(time.time() - t0, 2))
                dd.release(df)
            print(
                json.dumps(
                    {
                        "corpus": tag,
                        "form": form,
                        "runs": per,
                        "best_sec": min(per),
                        "store_state": ["raw"],
                        "fresh_process": True,
                    }
                ),
                flush=True,
            )

    race("real_100x", sf_dir / "documents.parquet")
    race("boilerplate_100x", boiler_docs)
    spark.stop()


if __name__ == "__main__":
    main()
