"""Series / table generation (SURVEY.md §2.9 G1, G2).

G1 — hourly clock grid: reference builds it with DuckDB ``generate_series``
(``src/components/validation.py:247-257``); here it's ``F.sequence`` +
``F.explode``, fully distributed (the sequence literal lives in one row, the
explode fans out across partitions after a repartition).

G2 — deterministic synthetic sensor data mirroring the shape produced by
reference ``scripts/generate_synthetic_raw.py:65-158`` (5 sensors ×
{temperature, humidity}, hourly timestamps, ~10% out-of-range anomalies,
~10% missing battery, injected duplicates) — built from ``spark.range`` +
seeded ``F.rand`` so fixtures are reproducible without any driver-side loops.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_series(
    spark: SparkSession,
    start: datetime | str,
    end: datetime | str,
    step_hours: int = 1,
) -> DataFrame:
    """Expected-timestamp grid: one row per ``step_hours`` tick in [start, end]."""
    df = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"interval {int(step_hours)} hours"),
            )
        ).alias("expected_ts")
    )
    return df


def synthetic_sensor_readings(
    spark: SparkSession,
    n_sensors: int = 5,
    hours: int = 72,
    start: str = "2023-06-01 00:00:00",
    anomaly_rate: float = 0.10,
    missing_battery_rate: float = 0.10,
    duplicate_rate: float = 0.03,
    seed: int = 42,
) -> DataFrame:
    """Deterministic sensor-reading fixture with injected anomalies/dups."""
    base = (
        spark.range(n_sensors * hours * 2)
        .withColumn("sensor_idx", (F.col("id") / (hours * 2)).cast("int"))
        .withColumn("slot", F.col("id") % (hours * 2))
        .withColumn("hour", (F.col("slot") / 2).cast("int"))
        .withColumn(
            "reading_type",
            F.when(F.col("slot") % 2 == 0, F.lit("temperature")).otherwise(F.lit("humidity")),
        )
        .withColumn("sensor_id", F.concat(F.lit("sensor_"), (F.col("sensor_idx") + 1)))
        .withColumn(
            "timestamp",
            F.lit(start).cast("timestamp") + F.make_interval(hours=F.col("hour")),
        )
        .withColumn("r_val", F.rand(seed))
        .withColumn("r_anom", F.rand(seed + 1))
        .withColumn("r_batt", F.rand(seed + 2))
        .withColumn("r_dup", F.rand(seed + 3))
    )
    base = base.withColumn(
        "value",
        F.when(
            F.col("reading_type") == "temperature",
            F.when(F.col("r_anom") < anomaly_rate, F.lit(80.0) + F.col("r_val") * 20)
            .otherwise(F.lit(15.0) + F.col("r_val") * 20),
        ).otherwise(
            F.when(F.col("r_anom") < anomaly_rate, F.lit(110.0) + F.col("r_val") * 20)
            .otherwise(F.lit(40.0) + F.col("r_val") * 40)
        ),
    ).withColumn(
        "battery_level",
        F.when(F.col("r_batt") < missing_battery_rate, F.lit(None).cast("double"))
        .otherwise(F.lit(20.0) + F.col("r_batt") * 79),
    )
    cols = ["sensor_id", "timestamp", "reading_type", "value", "battery_level"]
    readings = base.select(*cols)
    dups = base.where(F.col("r_dup") < duplicate_rate).select(*cols)
    return readings.unionByName(dups)
