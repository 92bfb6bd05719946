"""Edge cases for the FUSED sensor_impute_median catalog query (r6): the
algebraic decomposition Σhc = Σ_nonnull round(b·200) + n_null·round(m·200)
must agree with the DuckDB oracle on inputs the testdata never produces —
an ALL-NULL-battery sensor (per-sensor median NULL → global fallback for
every row) and an all-null GLOBAL corner is excluded by construction
(events always have some non-null batteries).

Built as a miniature of the driver's own harness: synthetic events parquet
→ Spark query vs oracle SQL over the identical file."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("edge_sf")
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # sensors 1..3: mixed null/non-null batteries (battery null iff
    # event_id % 10 == 0 per events_as_readings)
    for uid in (1, 2, 3):
        for k in range(25):
            rows.append((eid, base + timedelta(hours=k), uid, "click",
                         10.0 * uid + k * 0.37, "{}"))
            eid += 1
    # sensor 9: EVERY event_id divisible by 10 → battery all NULL
    eid = ((eid // 10) + 1) * 10
    for k in range(6):
        rows.append((eid, base + timedelta(hours=k), 9, "view",
                     40.0 + k, "{}"))
        eid += 10
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(out / "events.parquet", index=False)
    return str(out)


def test_fused_impute_matches_oracle_with_all_null_sensor(spark, edge_sf_dir):
    import __spark_entry__ as em

    got = (
        em.queries()["sensor_impute_median"](spark, edge_sf_dir)
        .toPandas()
        .sort_values("sensor_id")
        .reset_index(drop=True)
    )
    assert "sensor_9" in set(got["sensor_id"])  # the all-null sensor exists

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_sf_dir}/events.parquet')"
    )
    want = (
        con.execute(em.oracle_sql()["sensor_impute_median"])
        .df()
        .sort_values("sensor_id")
        .reset_index(drop=True)
    )
    assert got["sensor_id"].tolist() == want["sensor_id"].tolist()
    assert (
        got["avg_imputed_battery_e4"].astype("int64").tolist()
        == want["avg_imputed_battery_e4"].astype("int64").tolist()
    )
    # sensor_9's average must equal the GLOBAL median exactly (every row
    # fell through the NULL per-sensor median to the global fallback)
    g9 = got.loc[got.sensor_id == "sensor_9", "avg_imputed_battery_e4"].iloc[0]
    gmed = con.execute(
        "SELECT CAST(FLOOR(ROUND(MEDIAN(CASE WHEN event_id % 10 = 0 THEN NULL "
        "ELSE 50.0 + value END) * 200) * 50.0 + 0.5) AS BIGINT) "
        "FROM events WHERE user_id != 9"
    ).fetchone()[0]
    assert int(g9) == int(gmed)
