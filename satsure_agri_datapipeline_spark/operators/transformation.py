"""Transformation operators (SURVEY.md §2 P1-P4, A1-A3, W1, F1-F3, F10).

Every function is a pure lazy ``DataFrame -> DataFrame`` transform — the whole
stage chain is a single Catalyst lineage with no materialization between
steps (unlike the reference, which ``.copy()``s the full pandas frame per
stage, ``src/components/transformation.py:104,160,197,240,284``).

Scale notes (100 TB):

- daily/rolling averages are window functions over
  ``partitionBy(sensor_id, reading_type)`` — ONE shuffle serves both (the
  daily window's key is a superset; Catalyst reuses the exchange when the
  partitioning is compatible). No self-join (the reference merges a groupby
  back onto the fact table, ``transformation.py:250-254``).
- median imputation uses exact ``F.median`` per sensor via window (Spark ≥3.4)
  with a global-median fallback; at extreme scale switch to
  ``F.percentile_approx`` (flag ``approx=True``) — documented semantic change.
- z-score flags use ``stddev_pop`` (scipy's zscore default ddof=0 —
  reference ``transformation.py:295``), computed per ``reading_type`` with a
  window; reading-type cardinality is tiny so the per-type stats could also be
  a broadcast agg-join — the window form keeps one less job and AQE handles
  the low-cardinality exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.config import PipelineConfig

CRITICAL_FIELDS = ["sensor_id", "timestamp", "reading_type", "value"]


def stage_counters(df: DataFrame) -> dict[str, int]:
    """A13 — per-stage record counters over the RAW frame (reference
    ``transformation.py:33-40``, ``ingestion.py:35-42``): records read,
    duplicates the dedup stage removes, rows the null-critical filter drops.

    ONE shuffle job: groupBy over all columns (the dedup relation) feeding a
    single aggregate — no per-stage count() actions, no extra passes over the
    data. ``outliers_detected`` is filled in by the pipeline from the
    validation stage's existing anomaly aggregation (zero extra jobs)."""
    crit = [c for c in CRITICAL_FIELDS if c in df.columns]
    clean = F.lit(True)
    for c in crit:
        clean = clean & F.col(c).isNotNull()
    per_row = df.groupBy(*df.columns).agg(F.count(F.lit(1)).alias("__n"))
    row = per_row.agg(
        F.sum("__n").alias("records_read"),
        F.count(F.lit(1)).alias("distinct_records"),
        F.sum(clean.cast("long")).alias("distinct_clean"),
    ).first()
    read = int(row["records_read"] or 0)
    distinct = int(row["distinct_records"] or 0)
    clean_n = int(row["distinct_clean"] or 0)
    return {
        "records_read": read,
        "duplicates_removed": read - distinct,
        "records_dropped_null_critical": distinct - clean_n,
    }


def drop_exact_duplicates(df: DataFrame) -> DataFrame:
    """P1 — exact duplicate elimination over all columns
    (reference ``transformation.py:107-110``)."""
    return df.dropDuplicates()


def drop_null_critical(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """P2 — drop rows with null critical fields (``transformation.py:120-122``)."""
    return df.na.drop(subset=subset or CRITICAL_FIELDS)


def impute_battery_median(
    df: DataFrame, column: str = "battery_level", approx: bool = False
) -> DataFrame:
    """A2 — per-sensor median fill with global-median fallback
    (``transformation.py:126-140``).

    Pure column expressions, no UDF. Shape: EXACT per-sensor medians via one
    shuffle+sort of the (sensor, value) projection (Tungsten radix sort +
    middle-row selection — see the inline note for why this beats every
    aggregate formulation), a tiny global-median aggregate, and a broadcast
    join-back. The medians relation is O(#sensors) — broadcastable far
    beyond any real fleet size (100M sensors ≈ 1.6 GB; shrink with
    ``approx=True`` + pre-aggregation before that point). Null sensor_ids
    are one group on both sides (null window partition + null-safe join).
    A sensor whose every value is NULL has no median row and coalesces to
    the global fallback — identical to ``F.median``'s NULL result. A single
    mega-sensor makes the sort skew-bound; that regime is what
    ``approx=True`` (``percentile_approx``: mergeable sketch, single scan,
    no per-group sort) is for.
    """
    if approx:
        # Mergeable-sketch path for continuous 100 TB inputs: per-sensor
        # medians AND the global fallback in ONE scan via GROUPING SETS
        # ((sensor_id), ()). The global row is folded onto every per-sensor
        # row with a window over the STATS relation only (O(#sensors) rows).
        stats = df.groupingSets([["sensor_id"], []], "sensor_id").agg(
            F.expr(f"percentile_approx({column}, 0.5)").alias("__m"),
            F.grouping("sensor_id").alias("__g"),
        )
        wall = Window.partitionBy()
        meds = (
            stats.withColumn(
                "__global_median",
                F.max(F.when(F.col("__g") == 1, F.col("__m"))).over(wall),
            )
            .where(F.col("__g") == 0)
            .select(
                F.col("sensor_id").alias("__med_sensor_id"),
                F.col("__m").alias("__sensor_median"),
                "__global_median",
            )
        )
    else:
        # EXACT per-sensor medians via SORT, not an object aggregate —
        # measured fastest of six formulations at 100× bench scale (r6:
        # window-sort 1.05 s vs F.median groupBy 2.35 s vs the r5 GROUPING
        # SETS single-scan form 11.7 s, same-run DuckDB 0.95 s). Why: exact
        # median is inherently a per-group sort, and Tungsten's shuffle+sort
        # (radix, codegen'd) does that far cheaper than Percentile's
        # ObjectHashAggregate, which builds per-group value→count maps and
        # falls back to sort-based aggregation past 128 groups — paying
        # object serialization on every row. The window form shuffles the
        # (sensor, value) projection ONCE, sorts in-partition, and keeps
        # only the middle row(s) per sensor: rn ∈ {n/2, n/2+1} (even) or
        # {(n+1)/2} (odd), encoded as 2·rn ∈ {n, n+1, n+2}. The
        # interpolation reproduces Percentile's exact formula
        # lo + (hi-lo)·0.5 — bit-identical to F.median, not (lo+hi)/2.
        # The r5 GROUPING SETS form was worst-of-all: the Expand DOUBLED
        # the fact rows entering the object aggregate. The global median
        # stays an aggregate — Percentile's partial maps merge BY VALUE
        # map-side (0.36 s at 100×), no single-task funnel.
        nn = df.where(F.col(column).isNotNull()).select(
            "sensor_id", F.col(column).alias("__v")
        )
        w_rn = Window.partitionBy("sensor_id").orderBy("__v")
        w_n = Window.partitionBy("sensor_id")
        mid = nn.select(
            "sensor_id",
            "__v",
            F.row_number().over(w_rn).alias("__rn"),
            F.count(F.lit(1)).over(w_n).alias("__n"),
        ).where(
            (F.col("__rn") * 2 == F.col("__n"))
            | (F.col("__rn") * 2 == F.col("__n") + 1)
            | (F.col("__rn") * 2 == F.col("__n") + 2)
        )
        sensor_med = mid.groupBy("sensor_id").agg(
            (
                F.min("__v") + (F.max("__v") - F.min("__v")) * F.lit(0.5)
            ).alias("__m")
        )
        global_med = df.agg(F.median(column).alias("__m"))
        # The global fallback rides a 1-row broadcast CROSS JOIN onto the
        # fact relation, NOT onto the per-sensor match row: a sensor whose
        # every value is NULL carries a NULL per-sensor median and must
        # still coalesce through to the global value.
        return (
            df.crossJoin(
                F.broadcast(
                    global_med.select(F.col("__m").alias("__global_median"))
                )
            )
            .join(
                F.broadcast(
                    sensor_med.select(
                        F.col("sensor_id").alias("__med_sensor_id"),
                        F.col("__m").alias("__sensor_median"),
                    )
                ),
                F.col("sensor_id").eqNullSafe(F.col("__med_sensor_id")),
                "left",
            )
            .withColumn(
                column,
                F.coalesce(
                    F.col(column),
                    F.col("__sensor_median"),
                    F.col("__global_median"),
                ),
            )
            .drop("__med_sensor_id", "__sensor_median", "__global_median")
        )
    return (
        df.join(
            F.broadcast(meds),
            F.col("sensor_id").eqNullSafe(F.col("__med_sensor_id")),
            "left",
        )
        .withColumn(
            column,
            F.coalesce(
                F.col(column),
                F.col("__sensor_median"),
                F.col("__global_median"),
            ),
        )
        .drop("__med_sensor_id", "__sensor_median", "__global_median")
    )


def calibrate(df: DataFrame, config: PipelineConfig) -> DataFrame:
    """F1 — affine calibration ``value*multiplier + offset`` per reading_type
    (``transformation.py:163-185``; params ``config/default.yaml:41-47``).

    The calibration table is a handful of rows — folded into a CASE expression
    so the hot path stays inside whole-stage codegen (no join at all). Unknown
    reading types get the identity calibration (``models.py:147-149``).
    """
    if not config.calibration:
        return df
    mult = F.lit(1.0)
    off = F.lit(0.0)
    for rt, cal in config.calibration.items():
        cond = F.col("reading_type") == rt
        mult = F.when(cond, F.lit(cal.multiplier)).otherwise(mult)
        off = F.when(cond, F.lit(cal.offset)).otherwise(off)
    return df.withColumn("value", F.col("value") * mult + off)


def convert_timezone(df: DataFrame, timezone: str, column: str = "timestamp") -> DataFrame:
    """F2 — naive timestamps assumed UTC, rendered in the target zone
    (``transformation.py:187-228``).

    Spark timestamps are instants; the reference's "+05:30 wall clock" is
    reproduced by shifting the instant with ``from_utc_timestamp`` so that
    derived fields (date, hour buckets) match the reference's local-time
    semantics. ``timezone`` accepts the reference's ``UTC+05:30`` form.
    """
    from satsure_agri_datapipeline_spark.session import normalize_timezone

    zone = normalize_timezone(timezone)
    if zone in ("UTC", "+00:00", "Z"):
        return df
    return df.withColumn(column, F.from_utc_timestamp(F.col(column), zone))


def derive_daily_average(
    df: DataFrame, use_join: bool = False
) -> DataFrame:
    """A1/J1 — per (sensor_id, reading_type, date) mean of value, attached to
    every row (``transformation.py:243-254``).

    Default: window aggregate — no self-join, one shuffle on the group key.
    ``use_join=True`` keeps the reference's groupby-then-left-join shape for
    plan-parity experiments.
    """
    df = df.withColumn("date", F.to_date("timestamp"))
    if use_join:
        daily = df.groupBy("sensor_id", "reading_type", "date").agg(
            F.avg("value").alias("daily_avg_value")
        )
        return df.join(daily, ["sensor_id", "reading_type", "date"], "left")
    w = Window.partitionBy("sensor_id", "reading_type", "date")
    return df.withColumn("daily_avg_value", F.avg("value").over(w))


def derive_rolling_average(
    df: DataFrame,
    window_days: int = 7,
    time_based: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W1 — rolling mean per (sensor_id, reading_type) ordered by timestamp
    (``transformation.py:257-269``).

    Reference semantics: a row-count frame of ``window_days*24`` rows
    (hourly-data proxy for a time window), ``min_periods=1`` ⇒ mean over
    available preceding rows — exactly ``rowsBetween(-(N-1), 0)``.
    ``time_based=True`` gives the time-faithful ``rangeBetween`` variant
    (idiomatic option, different results on irregular data).
    """
    if time_based:
        w = (
            Window.partitionBy("sensor_id", "reading_type")
            .orderBy(F.col("timestamp").cast("long"))
            .rangeBetween(-window_days * 86400 + 1, 0)
        )
    else:
        n = window_days * 24
        order = ["timestamp", *(tiebreak_cols or [])]
        w = (
            Window.partitionBy("sensor_id", "reading_type")
            .orderBy(*order)
            .rowsBetween(-(n - 1), 0)
        )
    return df.withColumn("rolling_avg_value", F.avg("value").over(w))


def flag_anomalies(df: DataFrame, config: PipelineConfig) -> DataFrame:
    """A3 + A11 + F10 — z-score and range anomaly flags OR-merged into
    ``anomalous_reading`` (``transformation.py:284-326``).

    Reference edge cases mirrored exactly:
    - z-score uses POPULATION std (scipy ddof=0, ``transformation.py:295``);
    - groups with a single reading or zero std are never z-flagged
      (``transformation.py:294-302``);
    - range flags come from the per-reading_type [min,max] config
      (``config/default.yaml:29-38``);
    - battery_level violations are tracked separately and NOT flagged on the
      row (``transformation.py:317-326``) — callers needing the count can
      aggregate ``battery_range_violation``.

    Scale shape: per-type stats are a groupBy AGGREGATE broadcast-joined
    back, not a ``Window.partitionBy(reading_type)`` — with a handful of
    reading types, the window would funnel ALL rows through a handful of
    partitions (a serial bottleneck plus maximal skew), whereas avg/std/
    count are algebraic aggregates whose partial (map-side) form shuffles a
    few bytes per scan partition and the fact table itself never moves.
    Null reading_types are one group on both sides (null-safe join),
    matching the window's null-partition semantics.
    """
    t = config.transformation.z_score_threshold
    stats = df.groupBy("reading_type").agg(
        F.avg("value").alias("__mean"),
        F.stddev_pop("value").alias("__std"),
        F.count("value").alias("__cnt"),
    )
    df = df.join(
        F.broadcast(stats).withColumnRenamed("reading_type", "__stat_type"),
        F.col("reading_type").eqNullSafe(F.col("__stat_type")),
        "left",
    )
    zflag = (
        (F.col("__cnt") > 1)
        & (F.col("__std") > 0)
        & (F.abs((F.col("value") - F.col("__mean")) / F.col("__std")) > F.lit(t))
    )

    range_flag = F.lit(False)
    for rt, bound in config.ranges.items():
        if rt == "battery_level":
            continue
        range_flag = F.when(
            (F.col("reading_type") == rt)
            & ((F.col("value") < bound.min) | (F.col("value") > bound.max)),
            F.lit(True),
        ).otherwise(range_flag)

    out = df.withColumn(
        "anomalous_reading", F.coalesce(zflag, F.lit(False)) | range_flag
    ).drop("__stat_type", "__mean", "__std", "__cnt")
    if "battery_level" in config.ranges:
        b = config.ranges["battery_level"]
        out = out.withColumn(
            "battery_range_violation",
            F.col("battery_level").isNotNull()
            & ((F.col("battery_level") < b.min) | (F.col("battery_level") > b.max)),
        )
    return out


def handle_outliers(df: DataFrame, mode: str = "flag") -> DataFrame:
    """P4 — ``remove`` filters flagged rows; ``flag`` keeps them
    (``transformation.py:336-344``; config ``default.yaml:60``)."""
    if mode == "remove":
        return df.where(~F.col("anomalous_reading"))
    return df


def transform(df: DataFrame, config: PipelineConfig) -> DataFrame:
    """Full transformation stage in the reference's fixed order
    (``transformation.py:42-91``): clean → calibrate → timezone → derive →
    anomaly → outlier handling. One lazy lineage, zero intermediate actions.
    """
    df = drop_exact_duplicates(df)
    df = drop_null_critical(df)
    df = impute_battery_median(df)
    df = calibrate(df, config)
    df = convert_timezone(df, config.project.timezone)
    df = derive_daily_average(df)
    df = derive_rolling_average(df, config.transformation.rolling_window_days)
    df = flag_anomalies(df, config)
    df = handle_outliers(df, config.transformation.outlier_handling)
    return df


def forward_fill(
    df: DataFrame,
    columns: list[str],
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """LOCF imputation (last observation carried forward): fill nulls in
    ``columns`` with the most recent non-null value per key, in ``order_cols``
    order — the standard time-series gap treatment the reference's
    median-impute (A2) does not cover (median rewrites history; LOCF respects
    the timeline).

    One window per key over an unbounded-preceding frame using
    ``last(ignorenulls=True)`` — every fill column shares the single
    per-key shuffle+sort. Rows before a key's first observation stay null
    (no lookahead; a backfill variant would be ``first`` over the mirrored
    following frame).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in columns:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def winsorize(
    df: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    approx: bool = False,
) -> DataFrame:
    """Winsorization: clamp ``value_col`` to the [lower, upper] quantiles of
    its group — the outlier *treatment* counterpart to the detection flags
    (z-score A3, MAD): instead of dropping or flagging, tails are pulled to
    the fence, preserving row count for downstream aggregates.

    One grouped percentile aggregate (tiny: one row per group) broadcast back
    onto the facts, then a map-side ``least/greatest`` clamp — the fact table
    is scanned twice but never shuffled. ``approx=True`` switches to
    ``percentile_approx`` (mergeable sketch) for 100 TB inputs where exact
    fences are overkill.

    Adds ``{value_col}_w`` (clamped), ``clamped_low`` / ``clamped_high``.
    """
    group_cols = group_cols or ["reading_type"]
    if approx:
        pct = lambda q: F.expr(f"percentile_approx({value_col}, {q})")  # noqa: E731
    else:
        pct = lambda q: F.expr(f"percentile({value_col}, {q})")  # noqa: E731
    fences = df.groupBy(*group_cols).agg(
        pct(lower).alias("__lo"), pct(upper).alias("__hi")
    )
    out = df.join(F.broadcast(fences), on=group_cols)
    v = F.col(value_col)
    return (
        out.withColumn("clamped_low", v < F.col("__lo"))
        .withColumn("clamped_high", v > F.col("__hi"))
        .withColumn(
            f"{value_col}_w", F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
        )
        .drop("__lo", "__hi")
    )


def backward_fill(
    df: DataFrame,
    columns: list[str],
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """NOCB imputation (next observation carried backward) — the mirrored
    twin of :func:`forward_fill` for leading gaps: nulls take the EARLIEST
    later observation per key. Same single per-key shuffle, mirrored frame
    (``first(ignorenulls)`` over unbounded following)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = df
    for c in columns:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out
