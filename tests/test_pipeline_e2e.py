"""End-to-end pipeline on reference-shaped raw parquet, including bad-schema
edge-case files (reference ``scripts/generate_synthetic_raw.py:140-158``
pattern) and Hive layout / read-back pruning assertions."""

from datetime import datetime
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.exceptions import (
    IngestionError,
    LoadingError,
    PipelineError,
)
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


def test_stage_counters(spark, tmp_path, config):
    """A13: duplicates_removed / records_dropped / outliers_detected surfaced
    in PipelineResult from one extra raw-side aggregation."""
    raw = tmp_path / "data" / "raw"
    raw.mkdir(parents=True)
    rows = pd.DataFrame(
        {
            "sensor_id": ["s1", "s1", "s1", "s1", "s2", "s2"],
            "timestamp": [
                datetime(2023, 6, 1, 10),
                datetime(2023, 6, 1, 10),  # exact duplicate of row 0
                datetime(2023, 6, 1, 11),
                datetime(2023, 6, 1, 12),
                datetime(2023, 6, 1, 10),
                datetime(2023, 6, 1, 11),
            ],
            "reading_type": ["temperature"] * 4 + ["humidity"] * 2,
            "value": [20.0, 20.0, 21.0, None, 60.0, 61.0],  # one null critical
            "battery_level": [80.0] * 6,
        }
    )
    rows.to_parquet(raw / "2023-06-01.parquet")
    res = run_pipeline(spark, config)
    assert res.success
    c = res.stage_counters
    assert c["records_read"] == 6
    assert c["duplicates_removed"] == 1
    assert c["records_dropped_null_critical"] == 1
    assert c["outliers_detected"] == 0  # in-range values, degenerate z-stats
    assert res.records_processed == 4


def test_checkpoint_not_advanced_on_write_failure(spark, tmp_path, config, monkeypatch):
    """A post-gate failure must leave the batch un-checkpointed so a re-run
    reprocesses it (the r2 ordering marked files processed before any action)."""
    import satsure_agri_datapipeline_spark.plans.pipeline as pl
    from satsure_agri_datapipeline_spark.sources.checkpoint import FileCheckpoint

    _raw(tmp_path)

    def boom(*args, **kwargs):
        raise RuntimeError("simulated write failure")

    monkeypatch.setattr(pl, "write_partitioned", boom)
    with pytest.raises(LoadingError, match="simulated write failure"):
        run_pipeline(spark, config)
    assert FileCheckpoint(config.ingestion.checkpoint_file).load() == set()

    monkeypatch.undo()
    res = run_pipeline(spark, config)
    assert res.success and res.records_processed == 48
    # now the batch IS checkpointed (incl. rejected files — reference quirk)
    assert len(FileCheckpoint(config.ingestion.checkpoint_file).load()) == 3


def test_empty_ranges_config(spark, sample_sensor_data):
    """Empty ``ranges`` is a legal config; validate() must not emit malformed
    stack(0, ...) SQL."""
    from satsure_agri_datapipeline_spark.config import PipelineConfig
    from satsure_agri_datapipeline_spark.operators.validation import (
        validate,
        validate_ranges,
    )

    cfg = PipelineConfig()
    cfg.ranges = {}
    assert validate_ranges(sample_sensor_data, cfg).count() == 0
    vres = validate(sample_sensor_data, cfg)
    assert vres.total_records == 5
    assert not any("outside range" in i for i in vres.issues_found)


def test_cli_module_entry(spark, tmp_path):
    """``python -m satsure_agri_datapipeline_spark --config c.yaml`` surface
    (reference ``src/main.py:136-150``), invoked in-process for JVM reuse."""
    from satsure_agri_datapipeline_spark.__main__ import main

    _raw(tmp_path)
    cfg_yaml = tmp_path / "pipeline.yaml"
    cfg_yaml.write_text("validation:\n  max_gap_hours: 2.0\n")
    rc = main(
        ["--config", str(cfg_yaml), "--base-dir", str(tmp_path), "--log-level", "WARNING"]
    )
    assert rc == 0
    assert (tmp_path / "data" / "processed" / "_validation_metadata.json").exists()
    assert (tmp_path / "reports" / "data_quality_report.csv").exists()


def test_timezone_semantics(spark, tmp_path, config):
    _raw(tmp_path)
    run_pipeline(spark, config)
    back = spark.read.parquet(config.paths.data_processed)
    # UTC 00:00 → +05:30 wall clock 05:30 on the same date
    first = back.orderBy("timestamp").first()
    assert first.timestamp.minute == 30


def test_exception_domains(spark, tmp_path, config):
    """Stage failures surface as their domain error (reference
    src/utils/exceptions.py pattern), chained to the original cause, and all
    are catchable as PipelineError."""
    # nonexistent raw dir -> IngestionError from discovery
    config.paths.data_raw = str(tmp_path / "nope")
    with pytest.raises(IngestionError) as ei:
        run_pipeline(spark, config)
    assert isinstance(ei.value, PipelineError)
    assert ei.value.__cause__ is not None


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Same-bucketed tables joined on the bucket key produce a plan with no
    Exchange on either side (the co-location contract of write_bucketed)."""
    from satsure_agri_datapipeline_spark.operators.loading import write_bucketed

    orders = spark.range(0, 1000).selectExpr("id AS order_id", "id % 7 AS segment")
    items = spark.range(0, 5000).selectExpr(
        "id % 1000 AS order_id", "CAST(id AS DOUBLE) AS amount"
    )
    write_bucketed(orders, "t_orders_b", ["order_id"], n_buckets=8,
                   path=tmp_path / "orders_b")
    write_bucketed(items, "t_items_b", ["order_id"], n_buckets=8,
                   path=tmp_path / "items_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(spark.table("t_items_b"), "order_id")
        assert joined.count() == 5000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")
