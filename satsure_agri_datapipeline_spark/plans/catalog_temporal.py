"""Temporal-join query family: as-of enrichment and symmetric range counts
over the sensor timeline (operators/temporal.py).

The oracles are deliberately DIFFERENT formulations: DuckDB's native
``ASOF JOIN`` and a plain inequality join check the Spark union-marker
window and binned equi-join against an independent implementation of the
same semantics — not a re-derivation of the same plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.operators import sampling as sp
from satsure_agri_datapipeline_spark.operators import temporal as tp
from satsure_agri_datapipeline_spark.plans.catalog import (
    READINGS_SQL,
    events_as_readings,
    query,
)

# Deterministic probe set: a ~5% keyed-hash sample of readings, probing 37
# minutes after each sampled reading (off-grid so matches are non-trivial).
PROBES_SQL = """
    probes AS (
        SELECT event_id, sensor_id, reading_type,
               timestamp + INTERVAL 37 MINUTE AS probe_ts
        FROM readings
        WHERE ('0x' || substr(md5('3:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 < 50000
    )
"""


def _probes(spark, sf_dir):
    r = events_as_readings(spark, sf_dir)
    return sp.hash_sample(r, fraction=0.05, id_col="event_id", seed=3).select(
        "event_id",
        "sensor_id",
        "reading_type",
        (F.col("timestamp") + F.expr("interval 37 minutes")).alias("probe_ts"),
    )


@query(
    "sensor_asof_enrich",
    f"""
    WITH readings AS ({READINGS_SQL}),
    {PROBES_SQL},
    dedup AS (
        SELECT sensor_id, reading_type, timestamp, MAX(value) AS value
        FROM readings GROUP BY 1, 2, 3
    )
    SELECT p.event_id, p.sensor_id, p.reading_type,
           STRFTIME(p.probe_ts, '%Y-%m-%d %H:%M:%S') AS probe_ts,
           d.value AS asof_value,
           STRFTIME(d.timestamp, '%Y-%m-%d %H:%M:%S') AS asof_time
    FROM probes p
    ASOF LEFT JOIN dedup d
      ON p.sensor_id = d.sensor_id
     AND p.reading_type = d.reading_type
     AND p.probe_ts >= d.timestamp
    ORDER BY p.event_id
    """,
)
def sensor_asof_enrich(spark, sf_dir):
    """As-of join: latest reading value at or before each probe time
    (operators/temporal.py asof_join — union-marker + running-last window;
    oracle is DuckDB's native ASOF JOIN)."""
    readings = events_as_readings(spark, sf_dir)
    dedup = readings.groupBy("sensor_id", "reading_type", "timestamp").agg(
        F.max("value").alias("value")
    )
    out = tp.asof_join(
        _probes(spark, sf_dir),
        dedup,
        on=["sensor_id", "reading_type"],
        left_time="probe_ts",
        right_time="timestamp",
        value_col="value",
    )
    return out.select(
        "event_id",
        "sensor_id",
        "reading_type",
        F.date_format("probe_ts", "yyyy-MM-dd HH:mm:ss").alias("probe_ts"),
        "asof_value",
        F.date_format("asof_time", "yyyy-MM-dd HH:mm:ss").alias("asof_time"),
    ).orderBy("event_id")


@query(
    "sensor_range_count",
    f"""
    WITH readings AS ({READINGS_SQL}),
    {PROBES_SQL}
    SELECT p.event_id,
           CAST(COUNT(r.timestamp) AS BIGINT) AS n_nearby
    FROM probes p
    LEFT JOIN readings r
      ON p.sensor_id = r.sensor_id
     AND p.reading_type = r.reading_type
     AND ABS(epoch(p.probe_ts) - epoch(r.timestamp)) <= 3600
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def sensor_range_count(spark, sf_dir):
    """Symmetric range join: readings within ±1h of each probe
    (operators/temporal.py range_join_count — binned equi-join; oracle is a
    plain inequality join)."""
    readings = events_as_readings(spark, sf_dir)
    out = tp.range_join_count(
        _probes(spark, sf_dir),
        readings,
        on=["sensor_id", "reading_type"],
        probe_time="probe_ts",
        reading_time="timestamp",
        radius_seconds=3600,
    )
    return out.select("event_id", "n_nearby").orderBy("event_id")


@query(
    "funnel_signup_click_purchase",
    """
    WITH t1 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts
        FROM events GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id,
               MIN(CASE WHEN e.event_type = 'click' AND e.ts > t1.signup_ts
                        THEN e.ts END) AS click_ts
        FROM events e JOIN t1 ON e.user_id = t1.user_id GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.click_ts
                        THEN e.ts END) AS purchase_ts
        FROM events e JOIN t2 ON e.user_id = t2.user_id GROUP BY e.user_id
    )
    SELECT COUNT(t1.signup_ts) AS n_signup,
           COUNT(t2.click_ts) AS n_click,
           COUNT(t3.purchase_ts) AS n_purchase
    FROM t1 JOIN t2 USING (user_id) JOIN t3 USING (user_id)
    """,
)
def funnel_signup_click_purchase(spark, sf_dir):
    """Ordered funnel (signup → click-after → purchase-after) counts over
    the events stream (operators/temporal.py:funnel_counts). Every
    aggregate and join in the chain is keyed by user_id, so the first
    shuffle's partitioning is reused throughout."""
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return tp.funnel_counts(ev, ["signup", "click", "purchase"])


@query(
    "events_mad_outliers",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, ABS(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad, COUNT(*) AS n
        FROM dev GROUP BY event_type
    ),
    cnt AS (
        SELECT d.event_type,
               CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type
    )
    SELECT m.event_type, m.n,
           CAST(FLOOR(med.med * 100 + 0.5) AS BIGINT) AS med_e2,
           CAST(FLOOR(m.mad * 100 + 0.5) AS BIGINT) AS mad_e2,
           c.n_outliers
    FROM mad m
    JOIN med USING (event_type)
    JOIN cnt c USING (event_type)
    ORDER BY m.event_type
    """,
)
def events_mad_outliers(spark, sf_dir):
    """Robust MAD outlier counts per event_type (validation.mad_outliers) —
    the 50%-breakdown alternative to the reference's z-score flag; per-group
    stats broadcast back so the fact table never shuffles."""
    from satsure_agri_datapipeline_spark.operators import validation as vl
    from satsure_agri_datapipeline_spark.plans.catalog import half_up
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    r = vl.mad_outliers(ev, value_col="value", group_cols=["event_type"], k=3.0)
    return r.select(
        "event_type",
        "n",
        half_up(F.col("med") * 100).alias("med_e2"),
        half_up(F.col("mad") * 100).alias("mad_e2"),
        "n_outliers",
    ).orderBy("event_type")


@query(
    "user_scd2_history",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, ts,
               SUM(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run
        FROM ordered
    ),
    per_run AS (
        SELECT user_id, CAST(run AS BIGINT) AS version,
               ANY_VALUE(event_type) AS event_type,
               MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS valid_from_s
        FROM runs GROUP BY user_id, run
    )
    SELECT user_id, version, event_type, valid_from_s,
           COALESCE(LEAD(valid_from_s) OVER (PARTITION BY user_id ORDER BY version),
                    -1) AS valid_to_s
    FROM per_run ORDER BY user_id, version
    """,
)
def user_scd2_history(spark, sf_dir):
    """SCD-type-2 interval compression of the event stream
    (maintenance.scd2_intervals): consecutive equal event_type runs per user
    become validity intervals — change-point lag + running-sum run ids +
    lead-closed intervals, all over ONE per-user shuffle."""
    from satsure_agri_datapipeline_spark.operators import maintenance as mt
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return mt.scd2_intervals(
        ev, key_col="user_id", attr_col="event_type", ts_col="ts",
        tiebreak_col="event_id",
    ).orderBy("user_id", "version")


@query(
    "user_retention_cohorts",
    """
    WITH pe AS (
        SELECT user_id,
               CAST(FLOOR(FLOOR(epoch(ts)) / 604800) AS BIGINT) AS event_week
        FROM events
    ),
    c AS (
        SELECT user_id, event_week,
               MIN(event_week) OVER (PARTITION BY user_id) AS cohort_week
        FROM pe
    )
    SELECT cohort_week,
           event_week - cohort_week AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c GROUP BY cohort_week, event_week - cohort_week
    ORDER BY cohort_week, week_offset
    """,
)
def user_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle (temporal.retention_cohorts): absolute
    epoch-week buckets, cohort via min-over-user window (reuses the per-user
    shuffle), one hash-aggregate for the cells."""
    from satsure_agri_datapipeline_spark.operators import temporal as tp2
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return tp2.retention_cohorts(ev, user_col="user_id", ts_col="ts").orderBy(
        "cohort_week", "week_offset"
    )


@query(
    "events_winsorized",
    """
    WITH fences AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type
    ),
    clamped AS (
        SELECT e.event_type,
               CASE WHEN e.value < f.lo THEN 1 ELSE 0 END AS is_lo,
               CASE WHEN e.value > f.hi THEN 1 ELSE 0 END AS is_hi,
               LEAST(GREATEST(e.value, f.lo), f.hi) AS vw
        FROM events e JOIN fences f USING (event_type)
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(is_lo) AS BIGINT) AS n_low,
           CAST(SUM(is_hi) AS BIGINT) AS n_high,
           CAST(SUM(CAST(ROUND(vw * 100) AS BIGINT)) AS BIGINT) AS sum_clamped_c
    FROM clamped GROUP BY event_type ORDER BY event_type
    """,
)
def events_winsorized(spark, sf_dir):
    """Winsorization (transformation.winsorize): clamp values to per-type
    [p5, p95] fences — outlier treatment that preserves row count; exact
    integer-cents sum keeps the aggregate order-independent."""
    from satsure_agri_datapipeline_spark.operators.transformation import winsorize
    from satsure_agri_datapipeline_spark.plans.catalog import cents
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = winsorize(ev, value_col="value", group_cols=["event_type"])
    return (
        w.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("clamped_low").cast("long")).alias("n_low"),
            F.sum(F.col("clamped_high").cast("long")).alias("n_high"),
            F.sum(cents(F.col("value_w"))).alias("sum_clamped_c"),
        )
        .orderBy("event_type")
    )


@query(
    "events_value_percentiles",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(FLOOR(quantile_cont(value, 0.50) * 100 + 0.5) AS BIGINT) AS p50_e2,
           CAST(FLOOR(quantile_cont(value, 0.95) * 100 + 0.5) AS BIGINT) AS p95_e2,
           CAST(FLOOR(quantile_cont(value, 0.99) * 100 + 0.5) AS BIGINT) AS p99_e2
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_value_percentiles(spark, sf_dir):
    """SLA-style tail percentiles (p50/p95/p99) per event_type in ONE
    grouped aggregate — `percentile` takes the probe array, so the sort-based
    exact computation runs once per group, not once per probe. The scale
    switch is `percentile_approx` with the same array signature (mergeable
    sketch, map-side partials)."""
    from satsure_agri_datapipeline_spark.plans.catalog import half_up
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    pcts = F.expr("percentile(value, array(0.50, 0.95, 0.99))")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), pcts.alias("__p"))
        .select(
            "event_type",
            "n",
            half_up(F.col("__p").getItem(0) * 100).alias("p50_e2"),
            half_up(F.col("__p").getItem(1) * 100).alias("p95_e2"),
            half_up(F.col("__p").getItem(2) * 100).alias("p99_e2"),
        )
        .orderBy("event_type")
    )


@query(
    "events_filtered_aggregates",
    """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE value > 400) AS n_high,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                FILTER (WHERE value > 400) AS BIGINT) AS high_sum_c,
           COUNT(DISTINCT user_id) FILTER (WHERE value > 400) AS n_high_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_filtered_aggregates(spark, sf_dir):
    """ANSI aggregate FILTER clause (SQL surface, one hash-agg pass): each
    aggregate carries its own predicate instead of a CASE fold — Catalyst
    lowers both forms to the same conditional aggregation, checked here
    cross-engine through the SQL front-end rather than the DataFrame API."""
    from satsure_agri_datapipeline_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE value > 400) AS n_high,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    FILTER (WHERE value > 400) AS BIGINT) AS high_sum_c,
               COUNT(DISTINCT user_id) FILTER (WHERE value > 400) AS n_high_users
        FROM events GROUP BY event_type ORDER BY event_type
        """
    )


@query(
    "events_salted_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
           CAST(COUNT(event_id) AS BIGINT) AS count_event_id,
           CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS min_value_c
    FROM (SELECT event_type, event_id, value FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_salted_agg(spark, sf_dir):
    """Salted two-phase aggregation (joins.salted_two_phase_agg) checked
    against its UNSALTED oracle: hot keys split across 8 salt reducers in
    phase 1, re-merged in phase 2 — same answer by re-mergeability, salt
    derived from a stable hash (replay-safe, unlike rand())."""
    from satsure_agri_datapipeline_spark.operators.joins import salted_two_phase_agg
    from satsure_agri_datapipeline_spark.plans.catalog import cents
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", cents(F.col("value")).alias("value_c")
    )
    out = salted_two_phase_agg(
        ev,
        keys=["event_type"],
        aggs={"value_c": "sum", "event_id": "count"},
        n_salts=8,
        salt_src="event_id",
    )
    mins = salted_two_phase_agg(
        ev, keys=["event_type"], aggs={"value_c": "min"}, n_salts=8,
        salt_src="event_id",
    )
    return (
        out.join(mins, "event_type")
        .select(
            "event_type",
            F.col("sum_value_c").alias("sum_value_c"),
            F.col("count_event_id").cast("long").alias("count_event_id"),
            F.col("min_value_c").alias("min_value_c"),
        )
        .orderBy("event_type")
    )


@query(
    "events_transition_matrix",
    """
    WITH ordered AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           COUNT(*) AS n_transitions
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order behavioral transition matrix: consecutive event-type
    pairs per user (lag over the per-user shuffle), counted globally — the
    Markov-chain view of user journeys that funnels summarize a single path
    of. One window + one hash-aggregate; the matrix is |types|² rows."""
    from pyspark.sql import Window as W

    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


@query(
    "events_violation_streaks",
    """
    WITH flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN value > 50 THEN 1 ELSE 0 END AS f
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN LAG(f) OVER w IS NULL OR LAG(f) OVER w <> f
                       THEN 1 ELSE 0 END AS chg
        FROM flagged
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT *, SUM(chg) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS run
        FROM marked
    ),
    streaks AS (
        SELECT user_id, event_type, run, COUNT(*) AS streak_len
        FROM runs WHERE f = 1 GROUP BY user_id, event_type, run
    )
    SELECT event_type,
           COUNT(*) AS n_streaks,
           CAST(SUM(CASE WHEN streak_len >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_streaks_ge2,
           CAST(MAX(streak_len) AS BIGINT) AS max_streak
    FROM streaks GROUP BY event_type ORDER BY event_type
    """,
)
def events_violation_streaks(spark, sf_dir):
    """Consecutive-violation streaks (temporal.run_length_streaks): runs of
    value > 50 per (user, type), summarized per type — the "alert after N
    consecutive" monitoring rule the reference's single-row anomaly flag
    (A3) cannot express."""
    from satsure_agri_datapipeline_spark.operators.temporal import run_length_streaks
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "is_violation", F.col("value") > 50
    )
    streaks = run_length_streaks(
        ev, "is_violation", ["user_id", "event_type"], ["ts", "event_id"]
    )
    return (
        streaks.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum((F.col("streak_len") >= 2).cast("long")).alias("n_streaks_ge2"),
            F.max("streak_len").alias("max_streak"),
        )
        .orderBy("event_type")
    )


_PR_ITER = """
    SELECT n.node,
           CAST(150000000 + COALESCE(SUM(
               (85 * CAST(r.r AS BIGINT) * CAST(e.w AS BIGINT))
               // (100 * CAST(e.tot_w AS BIGINT))), 0) AS BIGINT) AS r
    FROM nodes n
    LEFT JOIN e ON e.dst = n.node
    LEFT JOIN {prev} r ON r.node = e.src
    GROUP BY n.node
"""


@query(
    "events_pagerank",
    f"""
    WITH ordered AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    e0 AS (
        SELECT prev_type AS src, event_type AS dst, COUNT(*) AS w
        FROM ordered WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    ow AS (SELECT src, SUM(w) AS tot_w FROM e0 GROUP BY src),
    e AS (SELECT e0.src, e0.dst, e0.w, ow.tot_w FROM e0 JOIN ow USING (src)),
    nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
    r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
    r1 AS ({_PR_ITER.format(prev="r0")}),
    r2 AS ({_PR_ITER.format(prev="r1")}),
    r3 AS ({_PR_ITER.format(prev="r2")})
    SELECT node AS node_id, r AS rank_e9 FROM r3 ORDER BY node_id
    """,
)
def events_pagerank(spark, sf_dir):
    """Fixed-point weighted PageRank over the event-type transition graph
    (operators/graph.py pagerank_fixed_point, 3 iterations, e9-scaled
    integer ranks — engine-exact, see the module header). The oracle
    unrolls the identical integer recurrence as chained CTEs. The graph
    here is |types|² edges; the operator's shape (edge join + dst
    aggregate per round, out-weights riding the edges) is what runs on a
    billion-edge near-dup or citation graph."""
    from pyspark.sql import Window as W

    from satsure_agri_datapipeline_spark.operators.graph import pagerank_fixed_point
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank_fixed_point(
        trans, "src", "dst", weight_col="w", iterations=3
    ).orderBy("node_id")
