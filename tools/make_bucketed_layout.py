"""Build the bucketed storage layout for an sf dir (one-time ingest cost).

Usage:
    python tools/make_bucketed_layout.py --sf /tmp/sf10 --out /tmp/bkt_sf10
    SPARK_GRAFT_BUCKETED_LAYOUT=/tmp/bkt_sf10 python bench.py

See ``satsure_agri_datapipeline_spark/sources/bucketed.py`` for the key
choices and the manifest contract.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from satsure_agri_datapipeline_spark.session import get_spark  # noqa: E402
from satsure_agri_datapipeline_spark.sources.bucketed import (  # noqa: E402
    build_bucketed_layout,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(app_name="make_bucketed_layout", timezone="UTC")
    t0 = time.time()
    manifest = build_bucketed_layout(
        spark, args.sf, args.out, n_buckets=args.buckets
    )
    print(
        f"built {list(manifest['tables'])} x{manifest['n_buckets']} buckets "
        f"from {manifest['sf_dir']} in {time.time() - t0:.1f}s -> {args.out}"
    )


if __name__ == "__main__":
    main()
