"""Transformation semantics — exact-value assertions mirroring reference
``tests/test_transformation.py`` (duplicate removal, imputation, calibration,
tz shift, daily avg 25.0, rolling [20.0, 22.5, 25.0], z-score/range outliers,
flag vs remove)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.config import Calibration, PipelineConfig, RangeBound
from satsure_agri_datapipeline_spark.operators.transformation import (
    calibrate,
    convert_timezone,
    derive_daily_average,
    derive_rolling_average,
    drop_exact_duplicates,
    drop_null_critical,
    flag_anomalies,
    handle_outliers,
    impute_battery_median,
)


def test_exact_duplicate_removal(spark, sample_sensor_data):
    dup = sample_sensor_data.union(sample_sensor_data.limit(2))
    assert dup.count() == 7
    assert drop_exact_duplicates(dup).count() == 5


def test_drop_null_critical(spark):
    df = spark.createDataFrame(
        [
            ("s1", datetime(2023, 6, 1), "temperature", 20.0, 80.0),
            (None, datetime(2023, 6, 1), "temperature", 21.0, 80.0),
            ("s1", None, "temperature", 22.0, 80.0),
            ("s1", datetime(2023, 6, 1), None, 23.0, 80.0),
            ("s1", datetime(2023, 6, 1), "temperature", None, 80.0),
            ("s1", datetime(2023, 6, 1, 1), "temperature", 24.0, None),  # kept
        ],
        "sensor_id string, timestamp timestamp, reading_type string, value double, battery_level double",
    )
    out = drop_null_critical(df)
    assert out.count() == 2  # battery_level null is NOT critical


def test_battery_median_imputation(spark):
    df = spark.createDataFrame(
        [
            ("s1", 10.0),
            ("s1", 20.0),
            ("s1", 30.0),
            ("s1", None),
            ("s2", None),  # all-null sensor → global median
        ],
        "sensor_id string, battery_level double",
    )
    out = impute_battery_median(df)
    vals = {(r.sensor_id, r.battery_level) for r in out.collect()}
    assert ("s1", 20.0) in vals  # sensor median fill
    assert ("s2", 20.0) in vals  # global median fallback (median of 10,20,30)
    assert out.where(F.col("battery_level").isNull()).count() == 0


def test_calibration_identity_and_affine(spark, sample_sensor_data):
    cfg = PipelineConfig()
    cfg.calibration = {"temperature": Calibration(multiplier=1.0, offset=0.0)}
    out = calibrate(sample_sensor_data, cfg)
    assert [r.value for r in out.orderBy("timestamp", "sensor_id").collect()] == [
        20.0,
        60.0,
        25.0,
        65.0,
        30.0,
    ]
    cfg.calibration = {"temperature": Calibration(multiplier=2.0, offset=1.0)}
    out = calibrate(sample_sensor_data, cfg)
    temp = out.where(F.col("reading_type") == "temperature").orderBy("timestamp")
    assert [r.value for r in temp.collect()] == [41.0, 51.0, 61.0]
    hum = out.where(F.col("reading_type") == "humidity").orderBy("timestamp")
    assert [r.value for r in hum.collect()] == [60.0, 65.0]  # untouched


def test_timezone_shift(spark, sample_sensor_data):
    out = convert_timezone(sample_sensor_data, "UTC+05:30")
    first = out.orderBy("timestamp").first()
    # 10:00 UTC → 15:30 wall clock in +05:30
    assert first.timestamp == datetime(2023, 6, 1, 15, 30)


def test_daily_and_rolling_average_exact(spark, sample_sensor_data):
    out = derive_daily_average(sample_sensor_data)
    t = out.where(F.col("sensor_id") == "sensor_1").first()
    assert t.daily_avg_value == pytest.approx(25.0)  # mean(20,25,30)

    out2 = derive_rolling_average(out, window_days=7)
    rolling = [
        r.rolling_avg_value
        for r in out2.where(F.col("sensor_id") == "sensor_1").orderBy("timestamp").collect()
    ]
    assert rolling == pytest.approx([20.0, 22.5, 25.0])  # expanding mean

    # join-based variant matches the window-based one
    outj = derive_daily_average(sample_sensor_data, use_join=True)
    tj = outj.where(F.col("sensor_id") == "sensor_1").first()
    assert tj.daily_avg_value == pytest.approx(25.0)


def test_anomaly_flags_range_and_zscore(spark):
    rows = [("s1", datetime(2023, 6, 1, h), "temperature", 20.0 + h * 0.1, 80.0) for h in range(20)]
    rows.append(("s1", datetime(2023, 6, 1, 21), "temperature", 99.0, 80.0))  # out of range + z
    df = spark.createDataFrame(
        rows,
        "sensor_id string, timestamp timestamp, reading_type string, value double, battery_level double",
    )
    cfg = PipelineConfig()
    out = flag_anomalies(df, cfg)
    flagged = out.where(F.col("anomalous_reading")).collect()
    assert len(flagged) == 1 and flagged[0].value == 99.0

    # single-reading group never z-flagged
    one = spark.createDataFrame(
        [("s1", datetime(2023, 6, 1), "soil", 30.0, 80.0)],
        "sensor_id string, timestamp timestamp, reading_type string, value double, battery_level double",
    )
    assert flag_anomalies(one, cfg).where(F.col("anomalous_reading")).count() == 0


def test_battery_violation_tracked_not_flagged(spark):
    df = spark.createDataFrame(
        [
            ("s1", datetime(2023, 6, 1), "temperature", 20.0, 150.0),
            ("s1", datetime(2023, 6, 1, 1), "temperature", 21.0, 80.0),
        ],
        "sensor_id string, timestamp timestamp, reading_type string, value double, battery_level double",
    )
    out = flag_anomalies(df, PipelineConfig())
    assert out.where(F.col("anomalous_reading")).count() == 0
    assert out.where(F.col("battery_range_violation")).count() == 1


def test_outlier_remove_mode(spark):
    df = spark.createDataFrame(
        [("s1", True), ("s2", False)], "sensor_id string, anomalous_reading boolean"
    )
    assert handle_outliers(df, "remove").count() == 1
    assert handle_outliers(df, "flag").count() == 2
