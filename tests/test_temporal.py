"""As-of join and range join semantics (operators/temporal.py)."""

from datetime import datetime

import pytest

from satsure_agri_datapipeline_spark.operators import temporal as tp


@pytest.fixture(scope="module")
def readings(spark):
    rows = [
        ("s1", datetime(2023, 6, 1, 10, 0), 10.0),
        ("s1", datetime(2023, 6, 1, 11, 0), 11.0),
        ("s1", datetime(2023, 6, 1, 13, 0), 13.0),
        ("s2", datetime(2023, 6, 1, 10, 30), 99.0),
    ]
    return spark.createDataFrame(rows, "sensor_id string, timestamp timestamp, value double")


@pytest.fixture(scope="module")
def probes(spark):
    rows = [
        (1, "s1", datetime(2023, 6, 1, 10, 59)),
        (2, "s1", datetime(2023, 6, 1, 11, 0)),   # exact hit -> inclusive
        (3, "s1", datetime(2023, 6, 1, 9, 0)),    # before any reading
        (4, "s2", datetime(2023, 6, 1, 12, 0)),
        (5, "s3", datetime(2023, 6, 1, 12, 0)),   # key with no readings
    ]
    return spark.createDataFrame(rows, "probe_id long, sensor_id string, probe_ts timestamp")


def test_asof_backward(readings, probes):
    out = {
        r.probe_id: r
        for r in tp.asof_join(
            probes, readings, on=["sensor_id"], left_time="probe_ts"
        ).collect()
    }
    assert out[1].asof_value == 10.0
    assert out[2].asof_value == 11.0  # inclusive at equal timestamps
    assert out[3].asof_value is None and out[3].asof_time is None
    assert out[4].asof_value == 99.0
    assert out[5].asof_value is None
    assert out[1].asof_time == datetime(2023, 6, 1, 10, 0)
    assert len(out) == 5  # all probes survive


def test_asof_forward_and_tolerance(readings, probes):
    fwd = {
        r.probe_id: r.asof_value
        for r in tp.asof_join(
            probes, readings, on=["sensor_id"], left_time="probe_ts",
            direction="forward",
        ).collect()
    }
    assert fwd[1] == 11.0
    assert fwd[2] == 11.0
    assert fwd[3] == 10.0
    assert fwd[4] is None  # nothing after 12:00 for s2

    tol = {
        r.probe_id: r.asof_value
        for r in tp.asof_join(
            probes, readings, on=["sensor_id"], left_time="probe_ts",
            tolerance_seconds=600,
        ).collect()
    }
    assert tol[2] == 11.0      # 0s gap
    assert tol[1] is None      # 59 min > 10 min tolerance
    with pytest.raises(ValueError):
        tp.asof_join(probes, readings, on=["sensor_id"], direction="sideways")


def test_asof_skips_null_values(spark, probes):
    r = spark.createDataFrame(
        [("s1", datetime(2023, 6, 1, 10, 0), 10.0), ("s1", datetime(2023, 6, 1, 10, 30), None)],
        "sensor_id string, timestamp timestamp, value double",
    )
    out = {
        x.probe_id: x.asof_value
        for x in tp.asof_join(probes, r, on=["sensor_id"], left_time="probe_ts").collect()
    }
    assert out[1] == 10.0  # null reading at 10:30 skipped, falls back to 10:00


def test_range_join_count(readings, probes):
    out = {
        r.probe_id: r.n_nearby
        for r in tp.range_join_count(
            probes, readings, on=["sensor_id"], radius_seconds=3600
        ).collect()
    }
    assert out[1] == 2  # 10:00 and 11:00 within +-1h of 10:59
    assert out[2] == 2  # 10:00 (60 min, inclusive) and 11:00
    assert out[3] == 1  # 10:00 within +-1h of 09:00 (inclusive boundary)
    assert out[4] == 0  # s2 reading at 10:30 is 90 min away
    assert out[5] == 0  # no readings for s3


def test_funnel_ordered_semantics(spark):
    from datetime import datetime

    from satsure_agri_datapipeline_spark.operators.temporal import (
        funnel_counts,
        funnel_steps,
    )

    t = lambda m: datetime(2023, 6, 1, 10, m)  # noqa: E731
    rows = [
        # u1: full ordered funnel
        (1, "signup", t(0)), (1, "click", t(5)), (1, "purchase", t(9)),
        # u2: click BEFORE signup — click must not count
        (2, "click", t(0)), (2, "signup", t(1)),
        # u3: signup + purchase but never clicks — purchase must not count
        (3, "signup", t(0)), (3, "purchase", t(2)),
        # u4: no signup at all
        (4, "click", t(0)), (4, "purchase", t(1)),
        # u5: simultaneous click (not strictly after) — must not count
        (5, "signup", t(3)), (5, "click", t(3)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    counts = funnel_counts(ev, ["signup", "click", "purchase"]).collect()[0]
    assert (counts.n_signup, counts.n_click, counts.n_purchase) == (4, 1, 1)

    per_user = {r.user_id: r for r in funnel_steps(ev, ["signup", "click"]).collect()}
    assert per_user[1].click_ts == t(5)
    assert per_user[2].click_ts is None
    assert per_user[5].click_ts is None

    with pytest.raises(ValueError):
        funnel_steps(ev, [])


def test_interpolate_gaps_linear_values(spark):
    from datetime import datetime

    from satsure_agri_datapipeline_spark.operators.temporal import interpolate_gaps

    rows = [
        # k1: hours 0 and 3 observed -> hours 1, 2 interpolated at 1/3, 2/3
        ("k1", datetime(2023, 6, 1, 0, 15), 30.0),
        ("k1", datetime(2023, 6, 1, 3, 45), 60.0),
        # duplicate readings in one hour average first
        ("k1", datetime(2023, 6, 1, 0, 30), 60.0),  # hour-0 mean = 45.0
        # k2: single observation -> nothing to interpolate
        ("k2", datetime(2023, 6, 1, 5, 0), 10.0),
    ]
    df = spark.createDataFrame(rows, "sensor_id string, timestamp timestamp, value double")
    out = interpolate_gaps(df, key_cols=["sensor_id"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.sensor_id, {})[r.grid_ts.hour] = (r.value, r.is_interpolated)
    k1 = by_key["k1"]
    assert k1[0] == (45.0, False)
    assert k1[1] == (50.0, True)
    assert k1[2] == (55.0, True)
    assert k1[3] == (60.0, False)
    assert by_key["k2"] == {5: (10.0, False)}


def test_run_length_streaks_exact_runs(spark):
    from satsure_agri_datapipeline_spark.operators.temporal import run_length_streaks

    # key A: T T F T T T  -> streaks of 2 and 3; key B: F F -> none
    rows = [
        ("A", 1, True), ("A", 2, True), ("A", 3, False),
        ("A", 4, True), ("A", 5, True), ("A", 6, True),
        ("B", 1, False), ("B", 2, False),
    ]
    df = spark.createDataFrame(rows, "k string, seq int, flag boolean")
    out = {
        (r.k, r.streak_no): r.streak_len
        for r in run_length_streaks(df, "flag", ["k"], ["seq"]).collect()
    }
    assert out == {("A", 1): 2, ("A", 2): 3}
