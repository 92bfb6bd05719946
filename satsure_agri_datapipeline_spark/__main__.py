"""CLI entry point: ``python -m satsure_agri_datapipeline_spark --config path.yaml``.

Mirrors the reference orchestrator surface (``src/main.py:136-150``): load the
YAML config (reference format, defaults when omitted), run the full
ingest→transform→validate→load pipeline, print a summary, exit 0 on success.
A FAILED validation does not fail the run — the reference stores the data and
reports the issues (``main.py:90-104``); a pipeline *error* exits 1.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from satsure_agri_datapipeline_spark.config import load_config
from satsure_agri_datapipeline_spark.plans.pipeline import run_pipeline
from satsure_agri_datapipeline_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="satsure_agri_datapipeline_spark",
        description="Agricultural sensor data pipeline (PySpark engine)",
    )
    parser.add_argument(
        "--config", "-c", default=None,
        help="pipeline YAML in the reference format; defaults mirror config/default.yaml",
    )
    parser.add_argument(
        "--base-dir", default=None,
        help="re-anchor the config's relative paths under this directory",
    )
    parser.add_argument("--master", default=None, help="Spark master override")
    parser.add_argument("--log-level", default="INFO")
    parser.add_argument(
        "--streaming", action="store_true",
        help="run the incremental foreachBatch streaming pipeline (processes "
        "all available files exactly-once, then stops) instead of the batch "
        "pipeline",
    )
    parser.add_argument(
        "--checkpoint-dir", default=None,
        help="streaming checkpoint location (default: <processed>/_stream_checkpoint)",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s %(message)s",
    )

    config = load_config(args.config)
    if args.base_dir:
        config = config.resolve_paths(args.base_dir)

    # Session stays UTC: the transform stage shifts instants itself
    # (from_utc_timestamp) so derived fields render the configured wall clock.
    spark = get_spark(master=args.master, timezone="UTC")

    if args.streaming:
        from pathlib import Path

        from satsure_agri_datapipeline_spark.streaming.ingest import (
            run_streaming_pipeline,
        )

        ckpt = args.checkpoint_dir or str(
            Path(config.paths.data_processed) / "_stream_checkpoint"
        )
        q = run_streaming_pipeline(spark, config, ckpt, once=True)
        q.awaitTermination()
        print(json.dumps({"success": True, "mode": "streaming", "checkpoint": ckpt}))
        return 0

    result = run_pipeline(spark, config)

    summary = {
        "success": result.success,
        "records_processed": result.records_processed,
        "stages_completed": result.stages_completed,
        "validation_passed": result.validation.passed if result.validation else None,
        "issues_found": len(result.validation.issues_found) if result.validation else 0,
        "files_accepted": len(result.gate.accepted) if result.gate else 0,
        "files_rejected": len(result.gate.rejected) if result.gate else 0,
    }
    print(json.dumps(summary))
    return 0 if result.success else 1


if __name__ == "__main__":
    sys.exit(main())
