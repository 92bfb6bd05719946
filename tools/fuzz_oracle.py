"""Cross-engine query fuzzer (SQLsmith-lite, seeded): generate N random
filter → groupBy → aggregate specs over the events table, run each spec
BOTH as a Spark DataFrame plan and as DuckDB SQL, and compare results
exactly.

The catalog queries pin 149 hand-written shapes; this fuzzer samples the
combinatorial space AROUND them (predicate × grouping × aggregate
combinations) so a mapping bug in a less-traveled corner (e.g. a null
ordering, an integer-division edge, a grouping-on-expression rename)
can't hide between hand-written cases.

Specs are deterministic-by-construction so comparison is exact, not
statistical:
- aggregates are integer-valued (COUNT, SUM of integer cents, MIN/MAX of
  BIGINT ids) — order-independent under parallel summation;
- group keys are low-cardinality expressions (event_type, user_id % k,
  hour(ts));
- predicates compare against sampled constants.

Usage:
    python tools/fuzz_oracle.py [--n 50] [--seed 7] [--sf DIR]
Exit code 0 iff every spec matches. Also used by
tests/test_fuzz_oracle.py with a small N.
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


GROUP_EXPRS = [
    # (name, spark_fn, sql)
    ("event_type", lambda F: F.col("event_type"), "event_type"),
    ("user_mod", lambda F: (F.col("user_id") % 7).cast("long"), "CAST(user_id % 7 AS BIGINT)"),
    ("hour_of_day", lambda F: F.hour("ts").cast("long"), "CAST(EXTRACT(hour FROM ts) AS BIGINT)"),
    ("val_bucket", lambda F: F.floor(F.col("value") / 25).cast("long"), "CAST(FLOOR(value / 25) AS BIGINT)"),
]

AGG_EXPRS = [
    ("n_rows", lambda F: F.count(F.lit(1)), "CAST(COUNT(*) AS BIGINT)"),
    ("sum_cents", lambda F: F.sum(F.round(F.col("value") * 100, 0).cast("long")),
     "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)"),
    ("min_event", lambda F: F.min("event_id"), "MIN(event_id)"),
    ("max_event", lambda F: F.max("event_id"), "MAX(event_id)"),
    ("n_users", lambda F: F.countDistinct("user_id").cast("long"),
     "CAST(COUNT(DISTINCT user_id) AS BIGINT)"),
    ("sum_null_val", lambda F: F.sum(F.col("value").isNull().cast("long")),
     "CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)"),
]

JOIN_GROUP_EXPRS = [
    ("mktsegment", lambda F: F.col("c_mktsegment"), "c_mktsegment"),
    ("priority", lambda F: F.col("o_orderpriority"), "o_orderpriority"),
    ("nation_key", lambda F: F.col("c_nationkey").cast("long"), "CAST(c_nationkey AS BIGINT)"),
    ("order_year", lambda F: F.year("o_orderdate").cast("long"), "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)"),
]

JOIN_AGG_EXPRS = [
    ("n_rows", lambda F: F.count(F.lit(1)), "CAST(COUNT(*) AS BIGINT)"),
    ("sum_price_c", lambda F: F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")),
     "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)"),
    ("n_custs", lambda F: F.countDistinct("c_custkey").cast("long"),
     "CAST(COUNT(DISTINCT c_custkey) AS BIGINT)"),
    ("min_order", lambda F: F.min("o_orderkey"), "MIN(o_orderkey)"),
    ("sum_bal_c", lambda F: F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")),
     "CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)"),
]

JOIN_PRED_EXPRS = [
    ("price_gt", lambda F, c: F.col("o_totalprice") > c * 1000,
     lambda c: f"o_totalprice > {c * 1000}"),
    ("seg_in", lambda F, c: F.col("c_mktsegment").isin("BUILDING", "MACHINERY"),
     lambda c: "c_mktsegment IN ('BUILDING', 'MACHINERY')"),
    ("status_eq", lambda F, c: F.col("o_orderstatus") == "O",
     lambda c: "o_orderstatus = 'O'"),
    ("bal_pos", lambda F, c: F.col("c_acctbal") >= 0, lambda c: "c_acctbal >= 0"),
]

PRED_EXPRS = [
    ("val_gt", lambda F, c: F.col("value") > c, lambda c: f"value > {c}"),
    ("val_le", lambda F, c: F.col("value") <= c, lambda c: f"value <= {c}"),
    ("uid_mod", lambda F, c: F.col("user_id") % 5 == int(c) % 5,
     lambda c: f"user_id % 5 = {int(c) % 5}"),
    ("etype_in", lambda F, c: F.col("event_type").isin("click", "view"),
     lambda c: "event_type IN ('click', 'view')"),
    ("eid_band", lambda F, c: (F.col("event_id") % 100) < int(c) % 100 + 1,
     lambda c: f"event_id % 100 < {int(c) % 100 + 1}"),
]


def gen_spec(rng: random.Random) -> dict:
    # half the specs exercise the broadcast-join relation orders ⋈ customer
    joined = rng.random() < 0.5
    gp = JOIN_GROUP_EXPRS if joined else GROUP_EXPRS
    ag = JOIN_AGG_EXPRS if joined else AGG_EXPRS
    pr = JOIN_PRED_EXPRS if joined else PRED_EXPRS
    n_groups = rng.randint(0, 2)
    n_aggs = rng.randint(1, 3)
    n_preds = rng.randint(0, 2)
    return {
        "joined": joined,
        "groups": rng.sample(range(len(gp)), n_groups),
        "aggs": rng.sample(range(len(ag)), n_aggs),
        "preds": [
            (i, round(rng.uniform(0, 100), 2))
            for i in rng.sample(range(len(pr)), n_preds)
        ],
    }


def _pools(spec: dict):
    if spec.get("joined"):
        return JOIN_GROUP_EXPRS, JOIN_AGG_EXPRS, JOIN_PRED_EXPRS
    return GROUP_EXPRS, AGG_EXPRS, PRED_EXPRS


def spec_sql(spec: dict) -> str:
    gp, ag, pr = _pools(spec)
    groups = [gp[i] for i in spec["groups"]]
    aggs = [ag[i] for i in spec["aggs"]]
    sel = [f"{sql} AS {name}" for name, _, sql in groups]
    sel += [f"{sql} AS {name}" for name, _, sql in aggs]
    rel = (
        "orders JOIN customer ON o_custkey = c_custkey"
        if spec.get("joined")
        else "events"
    )
    q = f"SELECT {', '.join(sel)} FROM {rel}"
    if spec["preds"]:
        conds = [pr[i][2](c) for i, c in spec["preds"]]
        q += " WHERE " + " AND ".join(conds)
    if groups:
        q += " GROUP BY " + ", ".join(sql for _, _, sql in groups)
        q += " ORDER BY " + ", ".join(name for name, _, _ in groups)
    return q


def spec_spark(spec: dict, tables):
    from pyspark.sql import functions as F

    gp, ag, pr = _pools(spec)
    if spec.get("joined"):
        df = tables["orders"].join(
            F.broadcast(tables["customer"]),
            tables["orders"].o_custkey == tables["customer"].c_custkey,
        )
    else:
        df = tables["events"]
    for i, c in spec["preds"]:
        df = df.where(pr[i][1](F, c))
    groups = [gp[i] for i in spec["groups"]]
    aggs = [ag[i] for i in spec["aggs"]]
    agg_cols = [fn(F).alias(name) for name, fn, _ in aggs]
    if groups:
        gcols = [fn(F).alias(name) for name, fn, _ in groups]
        return df.groupBy(*gcols).agg(*agg_cols).orderBy(
            *[name for name, _, _ in groups]
        )
    return df.agg(*agg_cols)


def run_fuzz(spark, con, sf_dir: str, n: int, seed: int, verbose: bool = True):
    """Returns list of (spec_index, ok, detail)."""
    import pandas as pd

    from satsure_agri_datapipeline_spark.sources.tables import load_table

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from check_correctness import canonical  # the driver's hash contract

    tables = {
        t: load_table(spark, sf_dir, t) for t in ("events", "orders", "customer")
    }
    rng = random.Random(seed)
    results = []
    for i in range(n):
        spec = gen_spec(rng)
        sql = spec_sql(spec)
        try:
            got = spec_spark(spec, tables).toPandas()
            want = con.execute(sql).df()
            a, b = canonical(got), canonical(want)
            ok = a.equals(b)
            detail = "" if ok else f"spark {len(got)} rows vs duckdb {len(want)}"
        except Exception as exc:  # genuine mapping bug — report, keep going
            ok, detail = False, f"error: {exc}"
        results.append((i, ok, sql if not ok else ""))
        if verbose:
            print(f"# {'ok  ' if ok else 'FAIL'} [{i}] {sql[:100]}", file=sys.stderr)
            if not ok:
                print(f"#      {detail}", file=sys.stderr)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    from satsure_agri_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="fuzz_oracle", timezone="UTC")
    con = duckdb.connect()
    for t in ("events", "orders", "customer"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{Path(args.sf) / t}.parquet')"
        )
    results = run_fuzz(spark, con, args.sf, args.n, args.seed)
    n_fail = sum(1 for _, ok, _ in results if not ok)
    print(f"{len(results) - n_fail} ok, {n_fail} fail of {len(results)} specs")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
