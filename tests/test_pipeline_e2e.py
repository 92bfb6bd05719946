"""End-to-end pipeline on reference-shaped raw parquet, including bad-schema
edge-case files (reference ``scripts/generate_synthetic_raw.py:140-158``
pattern) and Hive layout / read-back pruning assertions."""

from datetime import datetime
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.operators.loading import query_stored_data
from satsure_agri_datapipeline_spark.plans.pipeline import run_pipeline


def _raw(tmp_path):
    raw = tmp_path / "data" / "raw"
    raw.mkdir(parents=True)
    good = pd.DataFrame(
        {
            "sensor_id": ["sensor_1"] * 24 + ["sensor_2"] * 24,
            "timestamp": [datetime(2023, 6, 1, h) for h in range(24)] * 2,
            "reading_type": ["temperature"] * 24 + ["humidity"] * 24,
            "value": [20.0 + i * 0.5 for i in range(24)] + [55.0 + i for i in range(24)],
            "battery_level": [80.0] * 47 + [None],
        }
    )
    good.to_parquet(raw / "2023-06-01.parquet")
    good.drop(columns=["battery_level"]).to_parquet(raw / "2023-06-02_missing_columns.parquet")
    bad_types = good.copy()
    bad_types["value"] = bad_types["value"].astype(str)
    bad_types.to_parquet(raw / "2023-06-03_wrong_types.parquet")
    return raw


def test_full_pipeline(spark, tmp_path, config):
    _raw(tmp_path)
    res = run_pipeline(spark, config)
    assert res.success
    assert res.stages_completed == ["ingestion", "transformation", "validation", "loading"]
    assert len(res.gate.accepted) == 1 and len(res.gate.rejected) == 2
    assert res.records_processed == 48
    assert res.storage["files_written"] >= 1

    out_dir = Path(config.paths.data_processed)
    # Hive layout: date=.../sensor_id=... directories
    parts = {p.name for p in out_dir.iterdir() if p.is_dir()}
    assert any(p.startswith("date=") for p in parts)
    assert (out_dir / "_validation_metadata.json").exists()
    assert Path(config.paths.dq_report_csv).exists()

    # read-back with partition-pruned filters
    back = query_stored_data(spark, out_dir, sensor_filter="sensor_1")
    assert back.count() == 24
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "sensor_1" in plan  # pushed into partition filters

    # incremental: second run sees no new files
    res2 = run_pipeline(spark, config)
    assert res2.success and res2.records_processed == 0


def test_timezone_semantics(spark, tmp_path, config):
    _raw(tmp_path)
    run_pipeline(spark, config)
    back = spark.read.parquet(config.paths.data_processed)
    # UTC 00:00 → +05:30 wall clock 05:30 on the same date
    first = back.orderBy("timestamp").first()
    assert first.timestamp.minute == 30
