"""Query catalog: every SURVEY.md §2 operator as a (spark, sf_dir) -> DataFrame
callable plus a DuckDB-ANSI oracle SQL string (the driver's correctness gate).

Cross-engine determinism rules (why results hash-match exactly):
- SUM/AVG over doubles is summation-order-dependent, so any aggregated money
  column is converted to exact integer cents FIRST (``ROUND(x*100)`` → BIGINT;
  all testdata numerics are 2-decimal) — integer sums are order-independent;
- derived averages are emitted as ``FLOOR(scaled + 0.5)`` integers computed
  with an identical operation order on both sides (single correctly-rounded
  float ops on exact ints produce identical doubles in any IEEE-754 engine);
- timestamps are emitted as second-truncated strings or FLOOR'd epochs
  (DuckDB's epoch() keeps fractional seconds; Spark's unix_timestamp floors);
- window orderings always carry a unique tiebreak column.

The ``sensor_*`` family maps the ``events`` table onto the reference's
sensor-reading shape (user_id → sensor_id, event_type → reading_type, ts →
timestamp) and exercises the real operator implementations from
``operators/transformation.py`` / ``operators/validation.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.config import Calibration, PipelineConfig, RangeBound
from satsure_agri_datapipeline_spark.operators.joins import report_sort
from satsure_agri_datapipeline_spark.operators import transformation as tr
from satsure_agri_datapipeline_spark.operators import validation as vl
from satsure_agri_datapipeline_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def cents(col) -> F.Column:
    """Exact integer cents from a non-negative 2-decimal double column.

    floor(x*100 + 0.5), NOT round(x*100): Spark's Round codegen on
    DoubleType allocates a java.math.BigDecimal PER VALUE, which at 1000×
    bench scale made it the dominant cost of the TPC-H Q1 shape — 4 round
    calls × 600M rows. The floor form is pure double arithmetic + one cast
    and is value-identical here: for non-negative inputs both are half-up,
    and a 2-decimal double times 100 lands within ~1e-10 of an integer, so
    no input sits near the .5 boundary where representations could differ
    (measured r7: 2.34 s → 1.09 s at 100×, equal collect() on all groups;
    the 155-query oracle gate re-verified green after the switch).

    CONTRACT — non-negative inputs only (r8 fence): floor(x*100+0.5) is
    half-UP (toward +inf) while the oracle's ROUND is half-away-from-zero;
    the two diverge on negative exact midpoints (-0.005 → 0 here, -1
    there). Every current catalog input is non-negative (TPC-H money,
    events.value with min 0.0); a signed column (deltas, calibrated values
    with negative offsets) must NOT go through this helper — use
    ``signed_cents`` instead, which spends one extra ``sign`` op to match
    ROUND on the full domain. Pinned by
    ``tests/test_properties.py::test_floor_cents_negative_midpoint_fence``."""
    return F.floor(col * 100 + F.lit(0.5))


def signed_cents(col, scale: int = 100) -> F.Column:
    """Sign-aware exact integer cents: ``sign(x)*floor(abs(x)*scale+0.5)``
    — half-away-from-zero, value-identical to the oracle ROUND on the FULL
    signed domain. One extra sign/abs pair vs ``cents``; use this for any
    column that can be negative."""
    return (F.signum(col) * F.floor(F.abs(col) * scale + F.lit(0.5))).cast("long")


def half_cents(col) -> F.Column:
    """Exact integer half-cents (×200) — same floor form and rationale as
    ``cents``; used where calibration multipliers of 0.5 make half-cents the
    exact unit."""
    return F.floor(col * 200 + F.lit(0.5))


def half_up(expr) -> F.Column:
    """Explicit half-up to integer: FLOOR(x + 0.5) — identical in any IEEE
    engine given identical x."""
    return F.floor(expr + F.lit(0.5)).cast("long")


# The events → sensor-readings mapping, shared by Spark and the oracle.
# battery_level is synthesized with deterministic nulls (event_id % 10 == 0)
# so the imputation path is actually exercised.
READINGS_SQL = """
    SELECT
        'sensor_' || CAST(user_id AS VARCHAR) AS sensor_id,
        ts AS timestamp,
        event_type AS reading_type,
        value,
        CASE WHEN event_id % 10 = 0 THEN NULL ELSE 50.0 + value END AS battery_level,
        event_id
    FROM events
"""


def events_as_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("sensor_"), F.col("user_id").cast("string")).alias("sensor_id"),
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("reading_type"),
        "value",
        F.when(F.col("event_id") % 10 == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(50.0) + F.col("value"))
        .alias("battery_level"),
        "event_id",
    )


# ---------------------------------------------------------------------------
# Sensor-pipeline family (reference operator parity over `events`)
# ---------------------------------------------------------------------------


@query(
    "sensor_dedup_exact",
    f"""
    WITH readings AS ({READINGS_SQL}),
    deduped AS (SELECT DISTINCT sensor_id, reading_type, value FROM readings)
    SELECT reading_type, COUNT(*) AS n_rows
    FROM deduped GROUP BY reading_type ORDER BY reading_type
    """,
)
def sensor_dedup_exact(spark, sf_dir):
    """P1 — dropDuplicates over a projected row (transformation.py:107-110)."""
    r = events_as_readings(spark, sf_dir).select("sensor_id", "reading_type", "value")
    return (
        tr.drop_exact_duplicates(r)
        .groupBy("reading_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("reading_type")
    )


@query(
    "sensor_drop_null_critical",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT reading_type, COUNT(*) AS n_rows
    FROM readings
    WHERE sensor_id IS NOT NULL AND timestamp IS NOT NULL
      AND reading_type IS NOT NULL AND value IS NOT NULL
    GROUP BY reading_type ORDER BY reading_type
    """,
)
def sensor_drop_null_critical(spark, sf_dir):
    """P2 — na.drop on critical fields (transformation.py:120-122)."""
    r = events_as_readings(spark, sf_dir)
    return (
        tr.drop_null_critical(r)
        .groupBy("reading_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("reading_type")
    )


@query(
    "sensor_impute_median",
    f"""
    WITH readings AS ({READINGS_SQL}),
    sensor_med AS (
        SELECT sensor_id, MEDIAN(battery_level) AS med
        FROM readings GROUP BY sensor_id
    ),
    global_med AS (SELECT MEDIAN(battery_level) AS gmed FROM readings),
    imputed AS (
        SELECT r.sensor_id,
               CAST(ROUND(COALESCE(r.battery_level, m.med, g.gmed) * 200) AS BIGINT) AS hc
        FROM readings r
        LEFT JOIN sensor_med m ON r.sensor_id = m.sensor_id
        CROSS JOIN global_med g
    )
    SELECT sensor_id,
           CAST(FLOOR(SUM(hc) * 50.0 / COUNT(*) + 0.5) AS BIGINT) AS avg_imputed_battery_e4
    FROM imputed GROUP BY sensor_id ORDER BY sensor_id
    """,
)
def sensor_impute_median(spark, sf_dir):
    """A2 — per-sensor median imputation w/ global fallback
    (transformation.py:126-140). Imputed battery is half-cent exact (median
    interpolation midpoints), so half-cents (×200) are an exact integer.

    ALGEBRAICALLY FUSED (r6): the naive impute-then-aggregate plan
    materializes the median join-back across every fact row just to
    average it again. Since every imputed row of a sensor carries the SAME
    value, the per-sensor sum of half-cents decomposes exactly:
    ``Σ hc = Σ_{{non-null}} round(b·200) + n_null · round(median·200)`` —
    so the report needs only per-sensor aggregates (n, n_null, Σ) joined
    with the O(#sensors) medians relation, and the 10M-row imputed
    relation never exists. Measured at 100× bench scale: 1.93 s fused vs
    3.22 s naive (same session, identical 150k-row output). The general
    ``tr.impute_battery_median`` operator (row-preserving, for pipeline
    use where downstream consumers need the imputed rows) is exercised by
    the pipeline e2e + unit tests. Per-sensor medians use the sort-based
    window form (see the operator's docstring for the six-way measurement)
    with Percentile's exact ``lo + (hi-lo)·0.5`` interpolation.

    r8 (formulation 7, ``tools/race_impute.py``): the base aggregates
    (n, n_null, Σ half-cents) are FOLDED INTO the median window pass —
    both key on sensor_id, so one shuffle+sort of the full projection
    serves both, replacing the separate groupBy scan (3 source scans →
    2). Null rows ride the same shuffle sorted NULLS FIRST (non-null
    rank = rn − n_null); an all-null sensor keeps its rn == 1 row so the
    global fallback still sees it. Measured 1.67 → 1.54 s best-of-3 at
    100× (DuckDB 0.71 s same-run); the remaining gap is the exact-median
    sort + the separate global-median scan — the seven-way raced floor."""
    r = events_as_readings(spark, sf_dir)
    col = "battery_level"
    allr = r.select(
        "sensor_id",
        F.col(col).alias("__v"),
        half_cents(F.col(col)).alias("__hc"),
    )
    w_n = Window.partitionBy("sensor_id")
    w_rn = Window.partitionBy("sensor_id").orderBy(F.asc_nulls_first("__v"))
    annotated = allr.select(
        "sensor_id",
        "__v",
        F.count(F.lit(1)).over(w_n).alias("__n"),
        F.sum(F.col("__v").isNull().cast("long")).over(w_n).alias("__n_null"),
        F.sum("__hc").over(w_n).alias("__s"),
        F.row_number().over(w_rn).alias("__rn"),
    )
    m = F.col("__n") - F.col("__n_null")
    nn_rank = F.col("__rn") - F.col("__n_null")
    kept = annotated.where(
        (
            F.col("__v").isNotNull()
            & (
                (nn_rank * 2 == m)
                | (nn_rank * 2 == m + 1)
                | (nn_rank * 2 == m + 2)
            )
        )
        | ((m == 0) & (F.col("__rn") == 1))
    )
    per_sensor = kept.groupBy("sensor_id").agg(
        (F.min("__v") + (F.max("__v") - F.min("__v")) * F.lit(0.5)).alias("__med"),
        F.first("__n").alias("__n"),
        F.first("__n_null").alias("__n_null"),
        F.first("__s").alias("__s"),
    )
    gmed = r.agg(F.median(col).alias("__g"))
    return (
        per_sensor.crossJoin(F.broadcast(gmed))
        .select(
            "sensor_id",
            half_up(
                (
                    F.coalesce(F.col("__s"), F.lit(0))
                    + F.col("__n_null")
                    * half_cents(F.coalesce(F.col("__med"), F.col("__g")))
                )
                * 50.0
                / F.col("__n")
            ).alias("avg_imputed_battery_e4"),
        )
        .transform(report_sort, "sensor_id")
    )


@query(
    "sensor_calibration",
    f"""
    WITH readings AS ({READINGS_SQL}),
    cal AS (
        SELECT reading_type,
               CAST(ROUND((CASE
                   WHEN reading_type = 'click' THEN value * 2.0 + 1.0
                   WHEN reading_type = 'view' THEN value * 0.5 + 10.0
                   ELSE value * 1.0 + 0.0
               END) * 200) AS BIGINT) AS hc
        FROM readings
    )
    SELECT reading_type, CAST(SUM(hc) AS BIGINT) AS sum_calibrated_hc
    FROM cal GROUP BY reading_type ORDER BY reading_type
    """,
)
def sensor_calibration(spark, sf_dir):
    """F1 — affine calibration per reading_type (transformation.py:163-185);
    calibrated values are half-cent exact for these multipliers."""
    cfg = PipelineConfig()
    cfg.calibration = {
        "click": Calibration(multiplier=2.0, offset=1.0),
        "view": Calibration(multiplier=0.5, offset=10.0),
    }
    r = events_as_readings(spark, sf_dir)
    return (
        tr.calibrate(r, cfg)
        .withColumn("hc", half_cents(F.col("value")))
        .groupBy("reading_type")
        .agg(F.sum("hc").alias("sum_calibrated_hc"))
        .orderBy("reading_type")
    )


@query(
    "sensor_timezone_shift",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT CAST(EXTRACT(HOUR FROM timestamp + INTERVAL 330 MINUTE) AS BIGINT) AS local_hour,
           COUNT(*) AS n_rows
    FROM readings GROUP BY 1 ORDER BY 1
    """,
)
def sensor_timezone_shift(spark, sf_dir):
    """F2 — UTC→+05:30 wall-clock shift (transformation.py:187-228)."""
    r = tr.convert_timezone(events_as_readings(spark, sf_dir), "UTC+05:30")
    return (
        r.groupBy(F.hour("timestamp").cast("long").alias("local_hour"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("local_hour")
    )


@query(
    "sensor_daily_avg",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT sensor_id, reading_type,
           STRFTIME(CAST(timestamp AS DATE), '%Y-%m-%d') AS date_str,
           CAST(FLOOR(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100.0 / COUNT(*) + 0.5) AS BIGINT) AS daily_avg_e4
    FROM readings
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def sensor_daily_avg(spark, sf_dir):
    """A1/F3 — per (sensor, type, date) mean (transformation.py:243-254);
    integer-cents aggregation for order-independent exactness. The engine's
    user-facing window form lives in derive_daily_average (unit-tested)."""
    r = events_as_readings(spark, sf_dir).withColumn("date", F.to_date("timestamp"))
    return (
        r.groupBy(
            "sensor_id",
            "reading_type",
            F.date_format("date", "yyyy-MM-dd").alias("date_str"),
        )
        .agg(half_up(F.sum(cents(F.col("value"))) * 100.0 / F.count(F.lit(1))).alias("daily_avg_e4"))
    )


@query(
    "sensor_rolling_avg",
    f"""
    WITH readings AS ({READINGS_SQL}),
    w AS (
        SELECT event_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY sensor_id, reading_type
                   ORDER BY timestamp, event_id
                   ROWS BETWEEN 167 PRECEDING AND CURRENT ROW) AS sum_c,
               COUNT(*) OVER (
                   PARTITION BY sensor_id, reading_type
                   ORDER BY timestamp, event_id
                   ROWS BETWEEN 167 PRECEDING AND CURRENT ROW) AS n
        FROM readings
    )
    SELECT event_id, CAST(FLOOR(sum_c * 100.0 / n + 0.5) AS BIGINT) AS rolling_avg_e4
    FROM w ORDER BY event_id
    """,
)
def sensor_rolling_avg(spark, sf_dir):
    """W1 — 168-row rolling mean (rows frame, min_periods=1 semantics,
    transformation.py:257-269) as an exact integer-cents sliding sum; the
    float window form is derive_rolling_average (unit-tested)."""
    r = events_as_readings(spark, sf_dir)
    w = (
        Window.partitionBy("sensor_id", "reading_type")
        .orderBy("timestamp", "event_id")
        .rowsBetween(-167, 0)
    )
    return (
        r.select(
            "event_id",
            F.sum(cents(F.col("value"))).over(w).alias("sum_c"),
            F.count(F.lit(1)).over(w).alias("n"),
        )
        .select("event_id", half_up(F.col("sum_c") * 100.0 / F.col("n")).alias("rolling_avg_e4"))
    )


@query(
    "sensor_zscore_anomalies",
    f"""
    WITH readings AS ({READINGS_SQL}),
    stats AS (
        SELECT event_id, value, reading_type,
               AVG(value) OVER (PARTITION BY reading_type) AS mean_v,
               STDDEV_POP(value) OVER (PARTITION BY reading_type) AS std_v,
               COUNT(value) OVER (PARTITION BY reading_type) AS cnt_v
        FROM readings
    )
    SELECT event_id
    FROM stats
    WHERE cnt_v > 1 AND std_v > 0 AND ABS((value - mean_v) / std_v) > 2.5
    ORDER BY event_id
    """,
)
def sensor_zscore_anomalies(spark, sf_dir):
    """A3 — population-std z-score flags (transformation.py:287-302; ddof=0).
    Float threshold compare is stable: a flip needs |z| within ~1e-10 of the
    threshold, measure-zero on continuous data."""
    cfg = PipelineConfig()
    cfg.transformation.z_score_threshold = 2.5
    cfg.ranges = {}  # isolate the z-score path
    r = tr.flag_anomalies(events_as_readings(spark, sf_dir), cfg)
    return report_sort(
        r.where(F.col("anomalous_reading")).select("event_id"), "event_id"
    )


@query(
    "sensor_range_violations",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT 'click' AS range_key,
           CAST(SUM(CASE WHEN reading_type='click' AND (value < 0 OR value > 30) THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range
    FROM readings
    UNION ALL
    SELECT 'view', CAST(SUM(CASE WHEN reading_type='view' AND (value < 0 OR value > 20) THEN 1 ELSE 0 END) AS BIGINT)
    FROM readings
    UNION ALL
    SELECT 'battery_level', CAST(SUM(CASE WHEN battery_level < 0 OR battery_level > 60 THEN 1 ELSE 0 END) AS BIGINT)
    FROM readings
    """,
)
def sensor_range_violations(spark, sf_dir):
    """A11 — one-pass range-violation counts (validation.py:176-216)."""
    cfg = PipelineConfig()
    cfg.ranges = {
        "click": RangeBound(min=0, max=30),
        "view": RangeBound(min=0, max=20),
        "battery_level": RangeBound(min=0, max=60),
    }
    return vl.validate_ranges(events_as_readings(spark, sf_dir), cfg)


@query(
    "sensor_missing_pct",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT reading_type,
           COUNT(*) AS total_records,
           CAST(SUM(CASE WHEN battery_level IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_values,
           CAST(FLOOR(SUM(CASE WHEN battery_level IS NULL THEN 1 ELSE 0 END) * 10000.0 / COUNT(*) + 0.5) AS BIGINT) AS missing_pct_e2
    FROM readings GROUP BY reading_type ORDER BY reading_type
    """,
)
def sensor_missing_pct(spark, sf_dir):
    """A4 — missing % per type (validation.py:343-352), on the synthesized-null
    battery column (value itself has no nulls in the testdata)."""
    r = events_as_readings(spark, sf_dir)
    miss = F.sum(F.col("battery_level").isNull().cast("long"))
    return (
        r.groupBy("reading_type")
        .agg(
            F.count(F.lit(1)).alias("total_records"),
            miss.alias("missing_values"),
            half_up(miss * 10000.0 / F.count(F.lit(1))).alias("missing_pct_e2"),
        )
        .orderBy("reading_type")
    )


@query(
    "sensor_coverage",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT sensor_id,
           CAST(COUNT(DISTINCT reading_type) AS BIGINT) AS reading_types_count,
           COUNT(*) AS total_readings,
           STRFTIME(MIN(timestamp), '%Y-%m-%d %H:%M:%S') AS first_reading,
           STRFTIME(MAX(timestamp), '%Y-%m-%d %H:%M:%S') AS last_reading,
           CAST(FLOOR(SUM(CAST(ROUND(battery_level * 200) AS BIGINT)) / (20.0 * COUNT(battery_level)) + 0.5) AS BIGINT) AS avg_battery_e1
    FROM readings GROUP BY sensor_id ORDER BY sensor_id
    """,
)
def sensor_coverage(spark, sf_dir):
    """A6 — multi-agg per-sensor coverage (validation.py:396-407); timestamps
    second-truncated strings, battery average via exact half-cents."""
    r = events_as_readings(spark, sf_dir)
    hc = half_cents(F.col("battery_level"))
    return (
        r.groupBy("sensor_id")
        .agg(
            F.countDistinct("reading_type").cast("long").alias("reading_types_count"),
            F.count(F.lit(1)).alias("total_readings"),
            F.date_format(F.min("timestamp"), "yyyy-MM-dd HH:mm:ss").alias("first_reading"),
            F.date_format(F.max("timestamp"), "yyyy-MM-dd HH:mm:ss").alias("last_reading"),
            half_up(F.sum(hc) / (20.0 * F.count("battery_level"))).alias("avg_battery_e1"),
        )
        .orderBy("sensor_id")
    )


@query(
    "sensor_global_stats",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT COUNT(*) AS total_records,
           CAST(COUNT(DISTINCT sensor_id) AS BIGINT) AS unique_sensors,
           CAST(COUNT(DISTINCT reading_type) AS BIGINT) AS unique_reading_types,
           CAST(FLOOR(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 1.0 / COUNT(value) + 0.5) AS BIGINT) AS avg_value_e2,
           CAST(FLOOR(SUM(CAST(ROUND(battery_level * 200) AS BIGINT)) * 0.5 / COUNT(battery_level) + 0.5) AS BIGINT) AS avg_battery_e2
    FROM readings
    """,
)
def sensor_global_stats(spark, sf_dir):
    """A7/A8 — global stats (validation.py:422-430)."""
    r = events_as_readings(spark, sf_dir)
    vc = cents(F.col("value"))
    hc = half_cents(F.col("battery_level"))
    return r.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.countDistinct("sensor_id").cast("long").alias("unique_sensors"),
        F.countDistinct("reading_type").cast("long").alias("unique_reading_types"),
        half_up(F.sum(vc) * 1.0 / F.count("value")).alias("avg_value_e2"),
        half_up(F.sum(hc) * 0.5 / F.count("battery_level")).alias("avg_battery_e2"),
    )


@query(
    "sensor_type_violations",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT CAST(SUM(CASE WHEN value IS NOT NULL AND TRY_CAST(value AS DOUBLE) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS non_numeric_values,
           CAST(SUM(CASE WHEN battery_level IS NOT NULL AND TRY_CAST(battery_level AS DOUBLE) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS non_numeric_battery,
           CAST(SUM(CASE WHEN timestamp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_timestamps
    FROM readings
    """,
)
def sensor_type_violations(spark, sf_dir):
    """A12/F7 — try-cast type probes (validation.py:137-167)."""
    return vl.validate_types(events_as_readings(spark, sf_dir))


@query(
    "sensor_gap_detection",
    f"""
    WITH readings AS ({READINGS_SQL}),
    bounds AS (SELECT MIN(timestamp) AS min_t, MAX(timestamp) AS max_t FROM readings),
    expected_times AS (
        SELECT UNNEST(GENERATE_SERIES(min_t, max_t, INTERVAL 1 HOUR)) AS expected_timestamp
        FROM bounds
    ),
    combos AS (SELECT DISTINCT sensor_id, reading_type FROM readings),
    expected AS (
        SELECT c.sensor_id, c.reading_type, e.expected_timestamp
        FROM combos c CROSS JOIN expected_times e
    ),
    observed AS (
        SELECT DISTINCT sensor_id, reading_type, DATE_TRUNC('hour', timestamp) AS hr
        FROM readings
    ),
    missing AS (
        SELECT ex.sensor_id, ex.reading_type, ex.expected_timestamp
        FROM expected ex
        LEFT JOIN observed o
          ON ex.sensor_id = o.sensor_id AND ex.reading_type = o.reading_type
         AND DATE_TRUNC('hour', ex.expected_timestamp) = o.hr
        WHERE o.sensor_id IS NULL
    )
    SELECT sensor_id, reading_type,
           COUNT(*) AS missing_hours,
           STRFTIME(MIN(expected_timestamp), '%Y-%m-%d %H:%M:%S') AS first_gap,
           STRFTIME(MAX(expected_timestamp), '%Y-%m-%d %H:%M:%S') AS last_gap
    FROM missing
    GROUP BY sensor_id, reading_type
    ORDER BY missing_hours DESC, sensor_id, reading_type
    """,
)
def sensor_gap_detection(spark, sf_dir):
    """G1+J2+J3+A9 — clock-grid gap detection (validation.py:218-330):
    sequence/explode grid, distinct observed hours, anti-join, gap agg."""
    r = events_as_readings(spark, sf_dir)
    gaps, _ = vl.detect_time_gaps(r, frequency_hours=1)
    return gaps.select(
        "sensor_id",
        "reading_type",
        "missing_hours",
        F.date_format("first_gap", "yyyy-MM-dd HH:mm:ss").alias("first_gap"),
        F.date_format("last_gap", "yyyy-MM-dd HH:mm:ss").alias("last_gap"),
    )


@query(
    "sensor_hourly_activity",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT STRFTIME(DATE_TRUNC('hour', timestamp), '%Y-%m-%d %H:%M:%S') AS hour_str,
           reading_type, COUNT(*) AS n_events,
           CAST(FLOOR(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100.0 / COUNT(*) + 0.5) AS BIGINT) AS avg_value_e4
    FROM readings GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def sensor_hourly_activity(spark, sf_dir):
    """F5/F6 — hour truncation + conditional aggregation
    (validation.py:282; experiments/data_exploration.py:128-137)."""
    r = events_as_readings(spark, sf_dir)
    return (
        r.groupBy(
            F.date_format(F.date_trunc("hour", "timestamp"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_str"
            ),
            "reading_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            half_up(F.sum(cents(F.col("value"))) * 100.0 / F.count(F.lit(1))).alias(
                "avg_value_e4"
            ),
        )
    )


@query(
    "sensor_dedup_keyed",
    f"""
    WITH readings AS ({READINGS_SQL}),
    ranked AS (
        SELECT event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY sensor_id, reading_type ORDER BY timestamp, event_id
               ) AS rn
        FROM readings
    )
    SELECT event_id FROM ranked WHERE rn = 1 ORDER BY event_id
    """,
)
def sensor_dedup_keyed(spark, sf_dir):
    """W2 — ROW_NUMBER keyed dedup probe (experiments/data_exploration.py:102-115)."""
    r = events_as_readings(spark, sf_dir)
    w = Window.partitionBy("sensor_id", "reading_type").orderBy("timestamp", "event_id")
    return (
        r.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id")
    )


@query(
    "sensor_trend",
    f"""
    WITH readings AS ({READINGS_SQL}),
    cent AS (
        SELECT sensor_id, reading_type, value,
               CAST(FLOOR(epoch(timestamp)) AS BIGINT)
               - MIN(CAST(FLOOR(epoch(timestamp)) AS BIGINT))
                 OVER (PARTITION BY sensor_id, reading_type) AS x
        FROM readings WHERE value IS NOT NULL
    ),
    sums AS (
        SELECT sensor_id, reading_type,
               COUNT(*) AS n,
               SUM(x) AS sx, SUM(x * x) AS sxx,
               SUM(value) AS sy, SUM(x * value) AS sxy
        FROM cent
        GROUP BY sensor_id, reading_type
        HAVING COUNT(*) > 1
    )
    SELECT sensor_id, reading_type, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept
    FROM sums
    ORDER BY sensor_id, reading_type
    """,
)
def sensor_trend(spark, sf_dir):
    """Per-sensor linear drift: least-squares slope/intercept of value over
    seconds since each group's first reading — one window + one hash
    aggregate, no UDF. Two determinism choices: the x origin is centered per
    group (raw epoch ~1.7e9 amplifies slope ulps 1e9× into the intercept),
    and the fit uses the EXPLICIT normal-equation sums rather than
    ``F.regr_slope``/``regr_intercept`` — engines implement the regr_*
    family with different internal formulations (measured: Spark vs DuckDB
    intercepts differ at 1e-4), while identical sum expressions agree to
    rounding."""
    r = events_as_readings(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy("sensor_id", "reading_type")
    x = F.unix_timestamp("timestamp") - F.min(F.unix_timestamp("timestamp")).over(w)
    sums = (
        r.withColumn("__x", x)
        .groupBy("sensor_id", "reading_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("sx"),
            F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
            F.sum("value").alias("sy"),
            F.sum(F.col("__x") * F.col("value")).alias("sxy"),
        )
        .where(F.col("n") > 1)
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "sensor_id",
        "reading_type",
        "n",
        F.round(slope, 8).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    ).orderBy("sensor_id", "reading_type")


@query(
    "sensor_sessionize",
    f"""
    WITH readings AS ({READINGS_SQL}),
    gaps AS (
        SELECT sensor_id, timestamp AS ts, event_id AS eid,
               CAST(FLOOR(epoch(timestamp)) AS BIGINT) AS ts_s,
               CASE WHEN CAST(FLOOR(epoch(timestamp)) AS BIGINT)
                         - LAG(CAST(FLOOR(epoch(timestamp)) AS BIGINT)) OVER (
                               PARTITION BY sensor_id ORDER BY timestamp, event_id
                           ) > 1800
                         OR LAG(timestamp) OVER (
                               PARTITION BY sensor_id ORDER BY timestamp, event_id
                           ) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM readings
    ),
    sessions AS (
        SELECT sensor_id, ts_s,
               SUM(is_start) OVER (
                   PARTITION BY sensor_id ORDER BY ts, eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM gaps
    ),
    per_session AS (
        SELECT sensor_id, session_id, COUNT(*) AS n_events,
               MAX(ts_s) - MIN(ts_s) AS span_s
        FROM sessions GROUP BY sensor_id, session_id
    )
    SELECT sensor_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(MAX(span_s) AS BIGINT) AS max_session_span_s
    FROM per_session
    GROUP BY sensor_id
    ORDER BY sensor_id
    """,
)
def sensor_sessionize(spark, sf_dir):
    """Gap-based sessionization — the lag/flag/cumulative-sum idiom: a new
    session starts after a >30 min silence (operators/temporal.py:
    sessionize). One shuffle on sensor_id serves the lag window, the
    session-id running sum, and both aggregates (same partition key
    throughout, so Catalyst reuses the exchange). At 100 TB this is the
    batch analog of ``F.session_window`` (see streaming/ingest); state per
    key is one row, never the whole session's events."""
    from satsure_agri_datapipeline_spark.operators.temporal import session_stats

    r = events_as_readings(spark, sf_dir)
    return session_stats(
        r, gap_seconds=1800, key_col="sensor_id", ts_col="timestamp",
        tiebreak_col="event_id",
    )


@query(
    "sensor_rollup_monthly",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT sensor_id, reading_type,
           STRFTIME(DATE_TRUNC('month', timestamp), '%Y-%m') AS month_str,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           COUNT(value) AS n,
           CAST(ROUND(MIN(value) * 100) AS BIGINT) AS min_c,
           CAST(ROUND(MAX(value) * 100) AS BIGINT) AS max_c
    FROM readings
    WHERE value IS NOT NULL
    GROUP BY sensor_id, reading_type, 3
    ORDER BY sensor_id, reading_type, month_str
    """,
)
def sensor_rollup_monthly(spark, sf_dir):
    """Hypertable-style continuous-aggregate chain (operators/temporal.py:
    hierarchical_rollup): the MONTHLY level computed raw → hourly → daily →
    monthly through mergeable partials (sum/count/min/max). The oracle
    aggregates raw → monthly DIRECTLY — matching hashes prove the partial
    states compose exactly across levels. Values aggregate as integer
    cents so the sums are order-independent."""
    from satsure_agri_datapipeline_spark.operators.temporal import hierarchical_rollup

    r = events_as_readings(spark, sf_dir).where(F.col("value").isNotNull())
    r = r.withColumn("value_c", cents(F.col("value")))
    _, _, monthly = hierarchical_rollup(
        r, key_cols=["sensor_id", "reading_type"], ts_col="timestamp",
        value_col="value_c",
    )
    return monthly.select(
        "sensor_id",
        "reading_type",
        F.date_format("bucket", "yyyy-MM").alias("month_str"),
        F.col("v_sum").alias("sum_c"),
        F.col("v_count").alias("n"),
        F.col("v_min").alias("min_c"),
        F.col("v_max").alias("max_c"),
    ).orderBy("sensor_id", "reading_type", "month_str")


@query(
    "sensor_gap_fill",
    f"""
    WITH readings AS ({READINGS_SQL}),
    per_hour AS (
        SELECT sensor_id, reading_type,
               CAST(FLOOR(epoch(DATE_TRUNC('hour', timestamp)) / 3600) AS BIGINT) AS idx,
               AVG(CAST(ROUND(value * 100) AS BIGINT)) AS v
        FROM readings WHERE value IS NOT NULL
        GROUP BY sensor_id, reading_type, 3
    ),
    with_next AS (
        SELECT sensor_id, reading_type, idx, v,
               LEAD(idx) OVER (PARTITION BY sensor_id, reading_type ORDER BY idx) AS next_idx,
               LEAD(v) OVER (PARTITION BY sensor_id, reading_type ORDER BY idx) AS next_v
        FROM per_hour
    ),
    observed AS (
        SELECT sensor_id, reading_type, idx AS m, v AS val, FALSE AS is_interpolated
        FROM with_next
    ),
    filled AS (
        SELECT sensor_id, reading_type,
               UNNEST(generate_series(idx + 1, next_idx - 1)) AS m,
               v, next_v, idx, next_idx
        FROM with_next WHERE next_idx > idx + 1
    ),
    interp AS (
        SELECT sensor_id, reading_type, m,
               v + (next_v - v) * (m - idx) / (next_idx - idx) AS val,
               TRUE AS is_interpolated
        FROM filled
    ),
    unioned AS (
        SELECT * FROM observed UNION ALL SELECT sensor_id, reading_type, m, val, is_interpolated FROM interp
    )
    SELECT sensor_id, reading_type,
           STRFTIME(to_timestamp(m * 3600), '%Y-%m-%d %H:%M:%S') AS grid_ts,
           CAST(FLOOR(val * 100 + 0.5) AS BIGINT) AS value_e4,
           is_interpolated
    FROM unioned
    ORDER BY sensor_id, reading_type, grid_ts
    """,
)
def sensor_gap_fill(spark, sf_dir):
    """Linear gap-fill on the hourly grid (operators/temporal.py:
    interpolate_gaps): missing hours strictly inside a key's observed span
    get linearly interpolated rows; boundary gaps are not invented. Values
    run in exact integer cents (hour means are exact-sum divisions) so the
    interpolation arithmetic is engine-identical; output ×10⁴ half-up."""
    from satsure_agri_datapipeline_spark.operators.temporal import interpolate_gaps

    r = (
        events_as_readings(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .withColumn("value_c", cents(F.col("value")).cast("double"))
    )
    filled = interpolate_gaps(
        r, key_cols=["sensor_id", "reading_type"], ts_col="timestamp",
        value_col="value_c", frequency_hours=1,
    )
    return filled.select(
        "sensor_id",
        "reading_type",
        F.date_format("grid_ts", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
        half_up(F.col("value_c") * 100).alias("value_e4"),
        "is_interpolated",
    ).orderBy("sensor_id", "reading_type", "grid_ts")


@query(
    "sensor_forward_fill",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT event_id, sensor_id,
           COALESCE(
               CAST(FLOOR(last_value(battery_level IGNORE NULLS) OVER (
                   PARTITION BY sensor_id ORDER BY timestamp, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) * 100 + 0.5) AS BIGINT),
               -1) AS battery_e2
    FROM readings ORDER BY event_id
    """,
)
def sensor_forward_fill(spark, sf_dir):
    """LOCF imputation (transformation.forward_fill): most recent non-null
    battery reading carried forward per sensor — the timeline-respecting
    alternative to median impute (A2); -1 marks rows before the first
    observation."""
    r = events_as_readings(spark, sf_dir)
    filled = tr.forward_fill(
        r, ["battery_level"], ["sensor_id"], ["timestamp", "event_id"]
    )
    return filled.select(
        "event_id",
        "sensor_id",
        F.coalesce(half_up(F.col("battery_level") * 100), F.lit(-1).cast("long")).alias(
            "battery_e2"
        ),
    ).orderBy("event_id")


@query(
    "sensor_backward_fill",
    f"""
    WITH readings AS ({READINGS_SQL})
    SELECT event_id, sensor_id,
           COALESCE(
               CAST(FLOOR(first_value(battery_level IGNORE NULLS) OVER (
                   PARTITION BY sensor_id ORDER BY timestamp, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) * 100 + 0.5) AS BIGINT),
               -1) AS battery_e2
    FROM readings ORDER BY event_id
    """,
)
def sensor_backward_fill(spark, sf_dir):
    """NOCB imputation (transformation.backward_fill): leading nulls take
    the earliest later observation per sensor — the mirror of LOCF for
    series that start inside a gap; -1 marks trailing unmatched rows."""
    r = events_as_readings(spark, sf_dir)
    filled = tr.backward_fill(
        r, ["battery_level"], ["sensor_id"], ["timestamp", "event_id"]
    )
    return filled.select(
        "event_id",
        "sensor_id",
        F.coalesce(half_up(F.col("battery_level") * 100), F.lit(-1).cast("long")).alias(
            "battery_e2"
        ),
    ).orderBy("event_id")
