"""Pin the pipeline to the reference's published artifacts.

The reference repo ships the outputs of a real run over
``data/raw/2023-06-{02,03,04}.parquet`` (``reports/data_quality_report.csv``,
``README.md:314-317``): 72 records, 13 issues, validation FAILED, 643 total
missing hours, 4 temperature / 9 humidity / 2 battery range violations.
(The published run excluded ``2023-06-01.parquet``, whose 2025-dated rows
would blow the gap grid to ~176k hours.) This test runs our pipeline over the
same three files with the default (= reference) config and asserts every
published number, so behavioral drift from the reference is caught directly.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from satsure_agri_datapipeline_spark.config import PipelineConfig
from satsure_agri_datapipeline_spark.plans.pipeline import run_pipeline
from satsure_agri_datapipeline_spark.sources.parquet import read_sensor_parquet

REF_RAW = Path("/root/reference/data/raw")
PUBLISHED_FILES = ["2023-06-02.parquet", "2023-06-03.parquet", "2023-06-04.parquet"]

pytestmark = pytest.mark.skipif(
    not REF_RAW.exists(), reason="reference data not available"
)


def test_published_report_parity(spark, tmp_path):
    raw = tmp_path / "data" / "raw"
    raw.mkdir(parents=True)
    for f in PUBLISHED_FILES:
        shutil.copy(REF_RAW / f, raw / f)
    cfg = PipelineConfig().resolve_paths(tmp_path)

    res = run_pipeline(spark, cfg)
    assert res.success
    assert res.records_processed == 72

    v = res.validation
    assert v.passed is False
    assert len(v.issues_found) == 13

    # range violations exactly as published (reference data_quality_report.csv)
    assert "Found 4 temperature values outside range [-10.0, 60.0]" in v.issues_found
    assert "Found 9 humidity values outside range [0.0, 100.0]" in v.issues_found
    assert "Found 2 battery_level values outside range [0.0, 100.0]" in v.issues_found

    m = v.quality_metrics
    assert m["total_missing_hours"] == 643
    assert (
        "Sensor sensor_3 (temperature): 70 hour gap "
        "from 2023-06-02 06:45:00 to 2023-06-05 04:45:00" in v.issues_found
    )

    anom = m["anomalies_by_type"]
    assert anom["humidity"]["total_records"] == 40
    assert anom["humidity"]["anomalous_count"] == 9
    assert anom["humidity"]["anomaly_percentage"] == 22.5
    assert anom["temperature"]["total_records"] == 32
    assert anom["temperature"]["anomalous_count"] == 4
    assert anom["temperature"]["anomaly_percentage"] == 12.5

    cov = m["sensor_coverage"]
    expected = {
        "sensor_1": (51.6, 12),
        "sensor_2": (64.1, 14),
        "sensor_3": (76.2, 5),
        "sensor_4": (53.0, 14),
        "sensor_5": (61.6, 27),
    }
    for sid, (avg_batt, n_readings) in expected.items():
        assert cov[sid]["avg_battery_level"] == avg_batt, sid
        assert cov[sid]["total_readings"] == n_readings, sid

    assert Path(cfg.paths.dq_report_csv).exists()


def test_schema_gate_rejects_reference_bad_files(spark):
    """The reference raw dir ships three deliberately bad files; the footer
    gate must reject each with the matching reason (``ingestion.py:203-254``)."""
    cfg = PipelineConfig()
    _, gate = read_sensor_parquet(
        spark, REF_RAW, cfg.schema_.expected_columns, cfg.schema_.types
    )
    rejected = {Path(p).name: reason for p, reason in gate.rejected.items()}
    assert "missing columns" in rejected["2023-06-05_missing_columns.parquet"]
    assert "extra columns" in rejected["2023-06-06_extra_columns.parquet"]
    assert "incompatible type" in rejected["2023-06-07_wrong_types.parquet"]
    assert len(gate.accepted) == 4  # the four dated good files
