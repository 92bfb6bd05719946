"""Temporal join operators Spark lacks as built-ins: as-of join and
symmetric range join — expressed as compositions of existing DataFrame ops
(the preferred custom-operator strategy: no UDF, no mapPartitions).

As-of join (latest reading at or before a probe time) is THE enrichment
primitive for sensor/event timelines. The union-marker formulation used here
is the scale-correct shape: both sides shuffle ONCE on the equality keys,
the per-key timeline is sorted within its partition, and one running
``last(ignorenulls)`` window resolves every probe — no range-condition
nested-loop join (Spark's default for time inequalities), no per-probe
backward scan. Cost is sort-shuffle of |probes| + |readings|, independent of
time-gap sizes.

Range join (count/collect matches within ±radius) uses fixed-width time
binning: each probe replicates into its bin and the two adjacent bins, the
join is a pure equi-join on (keys, bin), and the exact |Δt| ≤ radius
predicate filters the ≤3× candidate fan-out. This turns an inequality join
Catalyst would nested-loop into a hash join whose fan-out is bounded by the
bin population, with AQE skew-splitting applicable to hot bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str = "timestamp",
    right_time: str = "timestamp",
    value_col: str = "value",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach ``value_col`` from the right row with the
    latest ``right_time`` ≤ ``left_time`` (direction="backward", inclusive;
    "forward" mirrors to earliest ≥) sharing the ``on`` keys. Returns all
    left columns + ``asof_value`` + ``asof_time`` (null when no match or
    outside ``tolerance_seconds``).

    Right rows with null ``value_col`` are skipped (no value to attach). If
    multiple right rows share a timestamp, pre-aggregate the right side to
    make the result deterministic — this function does not choose for you.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    vtype = right.schema[value_col].dataType
    left_extra = [c for c in left.columns if c not in on]
    l_rows = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__probe"),
        F.lit(None).cast(vtype).alias("__v"),
        *[F.col(c) for c in left_extra],
    )
    r_rows = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__probe"),
        F.col(value_col).alias("__v"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extra],
    )
    u = l_rows.unionByName(r_rows)
    # readings sort before probes at equal __t → the match is inclusive
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = Window.partitionBy(*on).orderBy(t_order, F.col("__probe").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    matched_v = F.last("__v", ignorenulls=True).over(w)
    matched_t = F.last(
        F.when(F.col("__probe") == 0, F.col("__t")), ignorenulls=True
    ).over(w)
    out = (
        u.withColumn("__asof_v", matched_v)
        .withColumn("__asof_t", matched_t)
        .where(F.col("__probe") == 1)
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_timestamp(F.col("__t")) - F.unix_timestamp(F.col("__asof_t"))
        )
        out = out.withColumn(
            "__asof_v", F.when(gap <= tolerance_seconds, F.col("__asof_v"))
        ).withColumn("__asof_t", F.when(gap <= tolerance_seconds, F.col("__asof_t")))
    return out.select(
        *on,
        *left_extra,
        F.col("__asof_v").alias("asof_value"),
        F.col("__asof_t").alias("asof_time"),
    )


def range_join_count(
    probes: DataFrame,
    readings: DataFrame,
    on: list[str],
    probe_time: str = "probe_ts",
    reading_time: str = "timestamp",
    radius_seconds: int = 3600,
) -> DataFrame:
    """Count readings within ± ``radius_seconds`` of each probe time, per
    ``on`` keys. Returns all probe columns + ``n_nearby`` (0 when none).

    Binned equi-join: probes replicate into bins {b−1, b, b+1} of width
    ``radius_seconds``; any reading within the radius necessarily lands in
    one of those bins, so the bin equi-join is exhaustive and the exact
    predicate only trims the bounded fan-out."""
    b = F.lit(int(radius_seconds))
    p = probes.withColumn(
        "__b",
        F.explode(
            F.array(
                *[
                    (F.unix_timestamp(F.col(probe_time)) / b).cast("long") + d
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    r = readings.select(
        *on,
        (F.unix_timestamp(F.col(reading_time)) / b).cast("long").alias("__b"),
        F.unix_timestamp(F.col(reading_time)).alias("__r_secs"),
    )
    near = (
        p.join(r, [*on, "__b"])
        .where(
            F.abs(F.unix_timestamp(F.col(probe_time)) - F.col("__r_secs"))
            <= radius_seconds
        )
        .groupBy(*on, *[c for c in probes.columns if c not in on])
        .agg(F.count(F.lit(1)).alias("n_nearby"))
    )
    return probes.join(near, probes.columns, "left").na.fill({"n_nearby": 0})


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "sensor_id",
    ts_col: str = "timestamp",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: assign each row a per-key ``session_id``
    (1-based, in time order); a new session starts after a silence longer
    than ``gap_seconds``. The batch analog of ``F.session_window`` —
    the lag/flag/cumulative-sum idiom.

    One shuffle on ``key_col`` serves both windows (same partitioning and
    ordering, Catalyst reuses the sort). Per-row state during execution is
    one lag value — nothing buffers a whole session. Ties on ``ts_col``
    deterministically break on ``tiebreak_col`` when given.
    """
    order = [ts_col, tiebreak_col] if tiebreak_col else [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_s = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(ts_s).over(w)
    is_start = (prev.isNull() | (ts_s - prev > gap_seconds)).cast("long")
    return df.withColumn("session_id", F.sum(is_start).over(run))


def session_stats(
    df: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "sensor_id",
    ts_col: str = "timestamp",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key session summary over ``sessionize``: session count, event
    count, largest session (events) and longest session span (seconds).
    Both aggregates stay keyed by ``key_col`` — no new shuffle key."""
    s = sessionize(df, gap_seconds, key_col, ts_col, tiebreak_col)
    per_session = s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.unix_timestamp(ts_col)) - F.min(F.unix_timestamp(ts_col))).alias(
            "span_s"
        ),
    )
    return (
        per_session.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            F.max("span_s").alias("max_session_span_s"),
        )
        .orderBy(key_col)
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest time each step in
    ``steps`` was reached STRICTLY AFTER the previous step's reach time
    (first 'signup', then first 'click' after that, ...). Returns one row
    per user with a ``<step>_ts`` column per step (null = never reached).

    Shape: one conditional aggregate per step, all keyed by ``user_col`` —
    the per-step join back is on the same key as the aggregation, so the
    partitioning established by the first shuffle is reused down the chain
    (no new exchange per step; verified in test_plans.py). Cost is
    O(steps × events) with no window over full event history and no
    per-user event buffering.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ts = F.col(ts_col)
    cur = df.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == steps[0], ts)).alias(f"{steps[0]}_ts")
    )
    for prev, step in zip(steps, steps[1:]):
        nxt = (
            df.join(cur.select(user_col, f"{prev}_ts"), user_col)
            .groupBy(user_col)
            .agg(
                F.min(
                    F.when(
                        (F.col(type_col) == step) & (ts > F.col(f"{prev}_ts")), ts
                    )
                ).alias(f"{step}_ts")
            )
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One-row funnel summary: how many users reached each step in order.
    Monotonically non-increasing by construction."""
    per_user = funnel_steps(df, steps, user_col, type_col, ts_col)
    return per_user.agg(
        *[F.count(F.col(f"{s}_ts")).alias(f"n_{s}") for s in steps]
    )


def hierarchical_rollup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Hypertable-style continuous-aggregate chain: (hourly, daily, monthly)
    rollups where each level derives from the PREVIOUS level's partials —
    daily re-aggregates 24 hourly rows, monthly ~30 daily rows — never from
    raw. This is the continuous-aggregate maintenance shape: at 100 TB the
    raw table is touched once for the finest grain, and coarser grains cost
    O(coarse rows); refreshing a late hour cascades through partials
    instead of rescanning the day.

    Composability contract (what makes the derivation exact, tested by the
    oracle): the partial state is (sum, count, min, max) — all of which
    merge associatively; avg is derived at read time as sum/count, never
    averaged across levels.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = df.groupBy(*key_cols, hour.alias("bucket")).agg(
        F.sum(value_col).alias("v_sum"),
        F.count(value_col).alias("v_count"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
    )

    def _up(frame: DataFrame, grain: str) -> DataFrame:
        return frame.groupBy(
            *key_cols, F.date_trunc(grain, F.col("bucket")).alias("bucket")
        ).agg(
            F.sum("v_sum").alias("v_sum"),
            F.sum("v_count").alias("v_count"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )

    daily = _up(hourly, "day")
    monthly = _up(daily, "month")
    return hourly, daily, monthly


def interpolate_gaps(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "value",
    frequency_hours: int = 1,
) -> DataFrame:
    """Linear gap-fill on the hourly clock grid: for every missing grid
    point strictly between two observed hours of a key, emit an
    interpolated row (value linearly interpolated between the surrounding
    observations). Returns (keys..., grid_ts, value, is_interpolated).

    Scale shape: the full grid is never built — each key's observed hours
    sort under ONE (keys) window (hour-level mean collapses duplicates
    first), `lead` exposes each hole, and only the missing points inside a
    hole are exploded (``sequence(idx+1, next_idx−1)``) — output rows =
    observed + missing, the same O(observed + holes) discipline as
    ``detect_time_gaps``. Boundary gaps (before the first / after the last
    observation of a key) have no bracketing pair and are not invented.
    """
    secs = 3600 * int(frequency_hours)
    hour = F.date_trunc("hour", F.col(ts_col))
    # mean per grid hour (duplicate readings in one hour collapse here)
    per_hour = df.groupBy(
        *key_cols, (F.unix_timestamp(hour) / secs).cast("long").alias("idx")
    ).agg(F.avg(value_col).alias("v"))

    w = Window.partitionBy(*key_cols).orderBy("idx")
    with_next = per_hour.select(
        *key_cols,
        "idx",
        "v",
        F.lead("idx").over(w).alias("next_idx"),
        F.lead("v").over(w).alias("next_v"),
    )
    observed = with_next.select(
        *key_cols,
        F.timestamp_seconds(F.col("idx") * secs).alias("grid_ts"),
        F.col("v").alias(value_col),
        F.lit(False).alias("is_interpolated"),
    )
    holes = with_next.where(F.col("next_idx") > F.col("idx") + 1)
    filled = holes.select(
        *key_cols,
        "idx",
        "v",
        "next_idx",
        "next_v",
        F.explode(F.sequence(F.col("idx") + 1, F.col("next_idx") - 1)).alias("m"),
    ).select(
        *key_cols,
        F.timestamp_seconds(F.col("m") * secs).alias("grid_ts"),
        (
            F.col("v")
            + (F.col("next_v") - F.col("v"))
            * (F.col("m") - F.col("idx"))
            / (F.col("next_idx") - F.col("idx"))
        ).alias(value_col),
        F.lit(True).alias("is_interpolated"),
    )
    return observed.unionByName(filled)


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention analysis: bucket users by the week of their first
    event (cohort), then count how many of each cohort are active in each
    subsequent week — the standard growth-analytics triangle, and at corpus
    scale the shape behind "contributors still active N weeks after first
    commit" style questions.

    Weeks are absolute epoch-day buckets (``floor(epoch_days / 7)``) so the
    result is a pure function of the data — no reference date. Cost: one
    window keyed by user computes the cohort without a separate join pass
    (min-over-partition reuses the per-user shuffle), then one hash-aggregate
    on (cohort_week, week_offset). Distinct users per cell is exact here;
    ``approx_count_distinct`` is the scale knob.
    """
    wk = lambda c: F.floor(F.unix_timestamp(c) / F.lit(86400 * period_days))  # noqa: E731
    w = Window.partitionBy(user_col)
    per_event = df.select(
        F.col(user_col), wk(F.col(ts_col)).alias("event_week")
    ).withColumn("cohort_week", F.min("event_week").over(w))
    return (
        per_event.groupBy(
            "cohort_week",
            (F.col("event_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def run_length_streaks(
    df: DataFrame,
    flag_col: str,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Run-length encoding of a boolean flag per key: one row per maximal
    run of consecutive TRUE flags, with its length and ordinal position —
    the building block of "alert only after N consecutive violations"
    monitoring rules (a single spike is noise; a streak is a condition).

    Same single-shuffle shape as SCD2 compression: a lag marks change
    points, a running sum numbers runs, and only TRUE runs aggregate.
    Returns (key..., streak_no, streak_len).
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    runs = (
        df.withColumn("__f", F.col(flag_col).cast("int"))
        .withColumn("__prev", F.lag("__f").over(w))
        .withColumn(
            "__chg",
            (F.col("__prev").isNull() | (F.col("__prev") != F.col("__f"))).cast("long"),
        )
        .withColumn(
            "__run", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    return (
        runs.where(F.col("__f") == 1)
        .groupBy(*key_cols, "__run")
        .agg(F.count(F.lit(1)).alias("streak_len"))
        .withColumn(
            "streak_no",
            F.row_number().over(
                Window.partitionBy(*key_cols).orderBy("__run")
            ),
        )
        .select(*key_cols, "streak_no", "streak_len")
    )
