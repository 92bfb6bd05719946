"""Cross-engine query fuzzer (SQLsmith-lite, seeded): generate N random
query specs over the test tables, run each spec BOTH as a Spark DataFrame
plan and as DuckDB SQL, and compare results exactly.

The catalog queries pin 149 hand-written shapes; this fuzzer samples the
combinatorial space AROUND them (predicate × grouping × aggregate × join
× window × grouping-sets combinations) so a mapping bug in a
less-traveled corner (e.g. a null ordering, an integer-division edge, a
grouping-on-expression rename) can't hide between hand-written cases.

Spec families (r6 grammar, covers SURVEY §2.3-2.7 operator classes):
- ``scan``:   events filter → groupBy → aggregate;
- ``join``:   orders ⋈ customer (broadcast) filter → groupBy → aggregate;
- ``outer``:  customer LEFT/FULL/INNER join a FILTERED orders side — the
  filter manufactures NULL-extending rows, exercising null join keys,
  null groups, and SUM/MIN over all-null groups (coalesced on both
  engines so the comparison stays dtype-exact);
- ``window``: running/sliding frames, row_number, rank, lag over orders
  with a unique tiebreak (deterministic row-level output);
- ``gsets``:  GROUP BY GROUPING SETS over pre-projected key columns with
  GROUPING() markers disambiguating the null-group vs rollup rows;
- ``semi``:   EXISTS / NOT EXISTS (left_semi / left_anti) against a
  filtered orders subquery — the keeper-filter and inactive-detection
  join types the catalog uses;
- ``setop``:  INTERSECT / EXCEPT, both DISTINCT and ALL multiset
  variants, over two independently-filtered low-cardinality projections
  with a manufactured NULL column (ANSI set ops treat NULL = NULL —
  semantics a predicate never exercises) and possibly-empty sides;
- ``rframe``: RANGE BETWEEN window frames with literal value offsets
  (PRECEDING/FOLLOWING/UNBOUNDED combinations incl. an empty-frame
  shape), asc and desc orderings — peer-inclusive frames, deterministic
  WITHOUT a tiebreak, the dual of the ROWS-frame family.

Predicates include type-boundary literals: the exact dataset min/max
timestamps and values, epsilon-adjacent doubles, and empty-result
constants.

Specs are deterministic-by-construction so comparison is exact, not
statistical:
- aggregates are integer-valued (COUNT, SUM of integer cents, MIN/MAX of
  BIGINT ids) — order-independent under parallel summation;
- group keys are low-cardinality expressions (event_type, user_id % k,
  hour(ts));
- window orderings always carry a unique tiebreak column.

Usage:
    python tools/fuzz_oracle.py [--n 50] [--seed 7] [--sf DIR]
Exit code 0 iff every spec matches. Also used by
tests/test_fuzz_oracle.py (full seeded run, >=500 specs).
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

def _ts_lit(c: float) -> str:
    return f"2024-01-{1 + int(c) % 30:02d} 12:00:00"


PRED_EXPRS = [
    ("val_gt", lambda F, c: F.col("value") > c, lambda c: f"value > {c}"),
    ("val_le", lambda F, c: F.col("value") <= c, lambda c: f"value <= {c}"),
    ("uid_mod", lambda F, c: F.col("user_id") % 5 == int(c) % 5,
     lambda c: f"user_id % 5 = {int(c) % 5}"),
    ("etype_in", lambda F, c: F.col("event_type").isin("click", "view"),
     lambda c: "event_type IN ('click', 'view')"),
    ("eid_band", lambda F, c: (F.col("event_id") % 100) < int(c) % 100 + 1,
     lambda c: f"event_id % 100 < {int(c) % 100 + 1}"),
    # type-boundary literals
    ("ts_ge", lambda F, c: F.col("ts") >= F.lit(_ts_lit(c)).cast("timestamp"),
     lambda c: f"ts >= TIMESTAMP '{_ts_lit(c)}'"),
    ("ts_lt", lambda F, c: F.col("ts") < F.lit(_ts_lit(c)).cast("timestamp"),
     lambda c: f"ts < TIMESTAMP '{_ts_lit(c)}'"),
    # exact dataset min: >= keeps the boundary row, > drops it — both engines
    # must parse 0.01 to the identical double
    ("val_min_edge", lambda F, c: F.col("value") >= 0.01, lambda c: "value >= 0.01"),
    # empty-result predicate (negative-zero boundary)
    ("val_none", lambda F, c: F.col("value") <= -0.0, lambda c: "value <= -0.0"),
]


# --- outer-join family ------------------------------------------------------
# customer (left) joined to a FILTERED orders side: the filter manufactures
# customers whose every order fails it → NULL-extended rows under left/full.
OUTER_ORDER_FILTERS = [
    lambda c: f"o_totalprice > {200000 + int(c) * 2500}",
    lambda c: f"o_orderstatus = 'F'",
    lambda c: f"o_orderdate >= TIMESTAMP '19{96 + int(c) % 4}-01-01 00:00:00'",
    # exact dataset max: only the boundary row(s) survive
    lambda c: "o_totalprice >= 499978.59",
]

OUTER_GROUP_EXPRS = [
    ("mktsegment", lambda F: F.col("c_mktsegment"), "c_mktsegment"),
    ("nation_key", lambda F: F.col("c_nationkey").cast("long"), "CAST(c_nationkey AS BIGINT)"),
    ("has_order", lambda F: F.col("o_orderkey").isNotNull(), "o_orderkey IS NOT NULL"),
    # NULL for null-extended rows → a null GROUP on both engines
    ("priority", lambda F: F.col("o_orderpriority"), "o_orderpriority"),
]

# all-null groups exist under outer joins: coalesce every aggregate so the
# dtype stays exact BIGINT on both engines (a bare SUM over an empty group is
# NULL → pandas float64 on the DuckDB side, a hash mismatch by design)
OUTER_AGG_EXPRS = [
    ("n_rows", lambda F: F.count(F.lit(1)), "CAST(COUNT(*) AS BIGINT)"),
    ("n_orders", lambda F: F.count("o_orderkey"), "CAST(COUNT(o_orderkey) AS BIGINT)"),
    ("sum_price_c", lambda F: F.coalesce(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")), F.lit(0)),
     "CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)"),
    ("min_order", lambda F: F.coalesce(F.min("o_orderkey"), F.lit(-1)),
     "CAST(COALESCE(MIN(o_orderkey), -1) AS BIGINT)"),
    ("n_custs", lambda F: F.countDistinct("c_custkey").cast("long"),
     "CAST(COUNT(DISTINCT c_custkey) AS BIGINT)"),
]

# --- window family ----------------------------------------------------------
# (name, spark_fn(F, Window) -> Column, sql) — all orderings carry the unique
# o_orderkey tiebreak, so every frame is deterministic.
WINDOW_EXPRS = [
    ("running_c",
     lambda F, W: F.sum("price_c").over(
         W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, 0)),
     "CAST(SUM(price_c) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"),
    ("sliding3_c",
     lambda F, W: F.sum("price_c").over(
         W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(-2, 0)),
     "CAST(SUM(price_c) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
     "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)"),
    ("rn",
     lambda F, W: F.row_number().over(
         W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")).cast("long"),
     "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)"),
    ("rnk",
     lambda F, W: F.rank().over(
         W.partitionBy("o_orderpriority").orderBy("price_c", "o_orderkey")).cast("long"),
     "CAST(RANK() OVER (PARTITION BY o_orderpriority ORDER BY price_c, o_orderkey) AS BIGINT)"),
    ("lag_delta_c",
     lambda F, W: F.coalesce(
         F.col("price_c") - F.lag("price_c").over(
             W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")),
         F.lit(0)),
     "CAST(COALESCE(price_c - LAG(price_c) OVER (PARTITION BY o_custkey "
     "ORDER BY o_orderdate, o_orderkey), 0) AS BIGINT)"),
    ("lead_key",
     lambda F, W: F.coalesce(F.lead("o_orderkey").over(
         W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")), F.lit(-1)),
     "CAST(COALESCE(LEAD(o_orderkey) OVER (PARTITION BY o_custkey "
     "ORDER BY o_orderdate, o_orderkey), -1) AS BIGINT)"),
]

# --- semi/anti-join family --------------------------------------------------
# customer EXISTS / NOT EXISTS against a filtered orders subquery — the
# left_semi / left_anti join types the catalog uses for keeper filters and
# inactive-customer detection.
SEMI_GROUP_EXPRS = [
    ("mktsegment", lambda F: F.col("c_mktsegment"), "c_mktsegment"),
    ("nation_key", lambda F: F.col("c_nationkey").cast("long"), "CAST(c_nationkey AS BIGINT)"),
]

SEMI_AGG_EXPRS = [
    ("n_rows", lambda F: F.count(F.lit(1)), "CAST(COUNT(*) AS BIGINT)"),
    ("sum_bal_c", lambda F: F.coalesce(
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")), F.lit(0)),
     "CAST(COALESCE(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)), 0) AS BIGINT)"),
    ("min_cust", lambda F: F.coalesce(F.min("c_custkey"), F.lit(-1)),
     "CAST(COALESCE(MIN(c_custkey), -1) AS BIGINT)"),
]

# --- set-op family (r6) -----------------------------------------------------
# Two filtered projections of events combined with INTERSECT / EXCEPT
# [ALL]. The projection is low-cardinality (lots of duplicate rows, so the
# ALL variants genuinely differ from DISTINCT) and manufactures a NULL
# string column: ANSI set ops treat NULL = NULL (unlike predicates), the
# null-semantics corner the r5 grammar didn't reach. Sides may be EMPTY
# (val_none predicate): A EXCEPT ∅ = DISTINCT(A), ∅ INTERSECT A = ∅.
SETOP_PROJ = [
    # (name, spark_fn, sql) — identical projection on both sides
    ("etype_n",
     lambda F: F.when(F.col("value") > 50, F.col("event_type")),
     "CASE WHEN value > 50 THEN event_type END"),
    ("uid_mod", lambda F: (F.col("user_id") % 3).cast("long"),
     "CAST(user_id % 3 AS BIGINT)"),
    ("etype", lambda F: F.col("event_type"), "event_type"),
]

SETOP_OPS = [
    # (sql_keyword, spark_method_name)
    ("INTERSECT", "intersect"),
    ("INTERSECT ALL", "intersectAll"),
    ("EXCEPT", "subtract"),
    ("EXCEPT ALL", "exceptAll"),
]

# --- range-frame window family (r6) ----------------------------------------
# RANGE BETWEEN frames with literal value offsets over price_c (BIGINT
# cents). RANGE frames include ALL PEERS of the boundary rows, so the
# output is deterministic WITHOUT a unique tiebreak — the opposite
# discipline from the ROWS family, and exactly why it needs its own
# grammar arm. Frame shape 4 (x FOLLOWING AND y FOLLOWING) manufactures
# EMPTY frames → NULL aggregates, coalesced to keep dtypes exact.
# Each shape: (x, y, W) -> (frame_sql, spark_lo, spark_hi); offsets are cents.
RFRAME_SHAPES = [
    lambda x, y, W: (f"RANGE BETWEEN {x} PRECEDING AND CURRENT ROW", -x, 0),
    lambda x, y, W: (f"RANGE BETWEEN CURRENT ROW AND {y} FOLLOWING", 0, y),
    lambda x, y, W: (
        f"RANGE BETWEEN UNBOUNDED PRECEDING AND {y} FOLLOWING",
        W.unboundedPreceding, y),
    lambda x, y, W: (f"RANGE BETWEEN {x} PRECEDING AND {y} FOLLOWING", -x, y),
    # empty-frame manufacturer: the frame starts AFTER the current row's
    # peer group and may contain no rows at all
    lambda x, y, W: (
        f"RANGE BETWEEN {min(x, y)} FOLLOWING AND {max(x, y)} FOLLOWING",
        min(x, y), max(x, y)),
]

RFRAME_AGGS = [
    # (name, spark_fn(F, over_window), sql_fn(frame_sql)) — every aggregate
    # coalesced: shape 4 produces empty frames → NULL SUM/MIN/MAX
    ("rsum_c", lambda F, w: F.coalesce(
        F.sum("price_c").over(w), F.lit(0)).cast("long"),
     lambda fr: f"CAST(COALESCE(SUM(price_c) OVER ({fr}), 0) AS BIGINT)"),
    ("rcnt", lambda F, w: F.count(F.lit(1)).over(w).cast("long"),
     lambda fr: f"CAST(COUNT(*) OVER ({fr}) AS BIGINT)"),
    ("rmin_k", lambda F, w: F.coalesce(F.min("o_orderkey").over(w), F.lit(-1)),
     lambda fr: f"CAST(COALESCE(MIN(o_orderkey) OVER ({fr}), -1) AS BIGINT)"),
    ("rmax_c", lambda F, w: F.coalesce(F.max("price_c").over(w), F.lit(-1)),
     lambda fr: f"CAST(COALESCE(MAX(price_c) OVER ({fr}), -1) AS BIGINT)"),
]

RFRAME_PARTS = ["o_orderpriority", "o_orderstatus"]

# literal offsets in cents, spanning no-op-tiny through frame-spans-all
RFRAME_OFFSETS = [10_000, 250_000, 2_500_000, 25_000_000]


# orders-only predicates for the window family (no customer columns)
ORDERS_PRED_EXPRS = [
    ("price_gt", lambda F, c: F.col("o_totalprice") > c * 1000,
     lambda c: f"o_totalprice > {c * 1000}"),
    ("status_eq", lambda F, c: F.col("o_orderstatus") == "O",
     lambda c: "o_orderstatus = 'O'"),
    ("odate_ge", lambda F, c: F.col("o_orderdate")
     >= F.lit(f"19{96 + int(c) % 4}-01-01 00:00:00").cast("timestamp"),
     lambda c: f"o_orderdate >= TIMESTAMP '19{96 + int(c) % 4}-01-01 00:00:00'"),
]

# --- grouping-sets family ---------------------------------------------------
# set shapes over two pre-projected key columns g0, g1 (indices into
# GROUP_EXPRS); GROUPING() markers disambiguate rollup rows from null groups
# Every key appears in >=1 set (DuckDB rejects GROUPING(x) for a column in
# no grouping set). KNOWN CROSS-ENGINE DIVERGENCE found by this fuzzer: over
# EMPTY input, a grouping-sets clause containing the grand-total set ``()``
# yields 1 row (the ANSI global aggregate) in DuckDB but 0 rows in Spark
# (SPARK grouping-sets Expand produces no input rows to aggregate). The
# grammar therefore never pairs the () set with an empty-result predicate
# (val_none is excluded from the gsets family below).
GSET_SHAPES = [
    [["g0"], ["g1"], []],
    [["g0", "g1"], ["g0"], []],
    [["g0", "g1"], []],
    [["g0", "g1"], ["g1"], []],
]

GSET_PRED_IDXS = [
    i for i, (name, _, _) in enumerate(PRED_EXPRS) if name != "val_none"
]


def gen_spec(rng: random.Random) -> dict:
    family = rng.choice(
        ["scan", "join", "outer", "window", "gsets", "semi", "setop", "rframe",
         "bktjoin"]
    )
    if family == "bktjoin":
        # family 9 (r7): the join grammar run BOTH raw and through the
        # bucketed storage layout (sources/bucketed.py) — the harness
        # executes each seed twice and asserts raw == bucketed == oracle.
        # No broadcast hint, so the custkey join actually exercises the
        # bucket clustering.
        return {
            "family": "bktjoin",
            "groups": rng.sample(range(len(JOIN_GROUP_EXPRS)), rng.randint(0, 2)),
            "aggs": rng.sample(range(len(JOIN_AGG_EXPRS)), rng.randint(1, 3)),
            "preds": [
                (i, round(rng.uniform(0, 100), 2))
                for i in rng.sample(range(len(JOIN_PRED_EXPRS)), rng.randint(0, 2))
            ],
        }
    if family == "setop":
        return {
            "family": "setop",
            "op": rng.randrange(len(SETOP_OPS)),
            "cols": sorted(
                rng.sample(range(len(SETOP_PROJ)), rng.randint(1, 3))
            ),
            # independent predicates for the two sides (val_none allowed:
            # an empty side is the best EXCEPT/INTERSECT edge case)
            "pred_a": (rng.randrange(len(PRED_EXPRS)), round(rng.uniform(0, 100), 2)),
            "pred_b": (rng.randrange(len(PRED_EXPRS)), round(rng.uniform(0, 100), 2)),
        }
    if family == "rframe":
        return {
            "family": "rframe",
            "part": rng.randrange(len(RFRAME_PARTS)),
            "desc": rng.random() < 0.5,
            "shape": rng.randrange(len(RFRAME_SHAPES)),
            "x": rng.choice(RFRAME_OFFSETS),
            "y": rng.choice(RFRAME_OFFSETS),
            "aggs": rng.sample(range(len(RFRAME_AGGS)), rng.randint(1, 3)),
            "preds": [
                (i, round(rng.uniform(0, 100), 2))
                for i in rng.sample(range(len(ORDERS_PRED_EXPRS)), rng.randint(0, 1))
            ],
        }
    if family == "semi":
        return {
            "family": "semi",
            "anti": rng.random() < 0.5,
            "ofilter": rng.randrange(len(OUTER_ORDER_FILTERS)),
            "const": round(rng.uniform(0, 100), 2),
            "groups": rng.sample(range(len(SEMI_GROUP_EXPRS)), rng.randint(0, 2)),
            "aggs": rng.sample(range(len(SEMI_AGG_EXPRS)), rng.randint(1, 2)),
        }
    if family == "outer":
        return {
            "family": "outer",
            "how": rng.choice(["left", "full", "inner"]),
            "ofilter": rng.randrange(len(OUTER_ORDER_FILTERS)),
            "const": round(rng.uniform(0, 100), 2),
            "groups": rng.sample(
                range(len(OUTER_GROUP_EXPRS)), rng.randint(0, 2)
            ),
            "aggs": rng.sample(range(len(OUTER_AGG_EXPRS)), rng.randint(1, 3)),
        }
    if family == "window":
        return {
            "family": "window",
            "wins": rng.sample(range(len(WINDOW_EXPRS)), rng.randint(1, 3)),
            "preds": [
                (i, round(rng.uniform(0, 100), 2))
                for i in rng.sample(range(len(ORDERS_PRED_EXPRS)), rng.randint(0, 1))
            ],
        }
    if family == "gsets":
        return {
            "family": "gsets",
            "keys": rng.sample(range(len(GROUP_EXPRS)), 2),
            "shape": rng.randrange(len(GSET_SHAPES)),
            "aggs": rng.sample(range(len(AGG_EXPRS)), rng.randint(1, 2)),
            "preds": [
                (i, round(rng.uniform(0, 100), 2))
                for i in rng.sample(GSET_PRED_IDXS, rng.randint(0, 1))
            ],
        }
    joined = family == "join"
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
    fam = spec.get("family")
    if fam == "bktjoin":
        spec = {**spec, "family": None, "joined": True}
        fam = None
    if fam == "outer":
        return _outer_sql(spec)
    if fam == "window":
        return _window_sql(spec)
    if fam == "gsets":
        return _gsets_sql(spec)
    if fam == "semi":
        return _semi_sql(spec)
    if fam == "setop":
        return _setop_sql(spec)
    if fam == "rframe":
        return _rframe_sql(spec)
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


def _outer_sql(spec: dict) -> str:
    groups = [OUTER_GROUP_EXPRS[i] for i in spec["groups"]]
    aggs = [OUTER_AGG_EXPRS[i] for i in spec["aggs"]]
    sel = [f"{sql} AS {name}" for name, _, sql in groups]
    sel += [f"{sql} AS {name}" for name, _, sql in aggs]
    how = {"left": "LEFT JOIN", "full": "FULL JOIN", "inner": "JOIN"}[spec["how"]]
    ofil = OUTER_ORDER_FILTERS[spec["ofilter"]](spec["const"])
    q = (
        f"SELECT {', '.join(sel)} FROM customer {how} "
        f"(SELECT * FROM orders WHERE {ofil}) o ON c_custkey = o_custkey"
    )
    if groups:
        q += " GROUP BY " + ", ".join(sql for _, _, sql in groups)
    return q


def _window_sql(spec: dict) -> str:
    wins = [WINDOW_EXPRS[i] for i in spec["wins"]]
    sel = ["o_orderkey"] + [f"{sql} AS {name}" for name, _, sql in wins]
    q = (
        f"SELECT {', '.join(sel)} FROM (SELECT *, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c FROM orders"
    )
    if spec["preds"]:
        conds = [ORDERS_PRED_EXPRS[i][2](c) for i, c in spec["preds"]]
        q += " WHERE " + " AND ".join(conds)
    return q + ") t"


def _gsets_sql(spec: dict) -> str:
    k0, k1 = (GROUP_EXPRS[i] for i in spec["keys"])
    aggs = [AGG_EXPRS[i] for i in spec["aggs"]]
    shape = GSET_SHAPES[spec["shape"]]
    alias = {"g0": "g0", "g1": "g1"}
    sets_sql = ", ".join("(" + ", ".join(alias[g] for g in s) + ")" for s in shape)
    sel = [
        "g0", "g1",
        "CAST(GROUPING(g0) AS BIGINT) AS gf0",
        "CAST(GROUPING(g1) AS BIGINT) AS gf1",
    ]
    sel += [f"{sql} AS {name}" for name, _, sql in aggs]
    inner = f"SELECT *, {k0[2]} AS g0, {k1[2]} AS g1 FROM events"
    if spec["preds"]:
        conds = [PRED_EXPRS[i][2](c) for i, c in spec["preds"]]
        inner += " WHERE " + " AND ".join(conds)
    return (
        f"SELECT {', '.join(sel)} FROM ({inner}) t "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def _semi_sql(spec: dict) -> str:
    groups = [SEMI_GROUP_EXPRS[i] for i in spec["groups"]]
    aggs = [SEMI_AGG_EXPRS[i] for i in spec["aggs"]]
    sel = [f"{sql} AS {name}" for name, _, sql in groups]
    sel += [f"{sql} AS {name}" for name, _, sql in aggs]
    neg = "NOT " if spec["anti"] else ""
    ofil = OUTER_ORDER_FILTERS[spec["ofilter"]](spec["const"])
    q = (
        f"SELECT {', '.join(sel)} FROM customer c WHERE {neg}EXISTS "
        f"(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND {ofil})"
    )
    if groups:
        q += " GROUP BY " + ", ".join(sql for _, _, sql in groups)
    return q


def _setop_sql(spec: dict) -> str:
    cols = [SETOP_PROJ[i] for i in spec["cols"]]
    sel = ", ".join(f"{sql} AS {name}" for name, _, sql in cols)
    op = SETOP_OPS[spec["op"]][0]
    pa = PRED_EXPRS[spec["pred_a"][0]][2](spec["pred_a"][1])
    pb = PRED_EXPRS[spec["pred_b"][0]][2](spec["pred_b"][1])
    return (
        f"SELECT {sel} FROM events WHERE {pa} "
        f"{op} "
        f"SELECT {sel} FROM events WHERE {pb}"
    )


def _setop_spark(spec: dict, tables):
    from pyspark.sql import functions as F

    cols = [SETOP_PROJ[i] for i in spec["cols"]]
    proj = [fn(F).alias(name) for name, fn, _ in cols]
    ev = tables["events"]
    ia, ca = spec["pred_a"]
    ib, cb = spec["pred_b"]
    a = ev.where(PRED_EXPRS[ia][1](F, ca)).select(*proj)
    b = ev.where(PRED_EXPRS[ib][1](F, cb)).select(*proj)
    return getattr(a, SETOP_OPS[spec["op"]][1])(b)


def _rframe_over(spec: dict) -> str:
    shape = RFRAME_SHAPES[spec["shape"]]

    class _W:  # SQL side only needs the keyword
        unboundedPreceding = None

    frame_sql, _, _ = shape(spec["x"], spec["y"], _W)
    part = RFRAME_PARTS[spec["part"]]
    order = "price_c DESC" if spec["desc"] else "price_c"
    return f"PARTITION BY {part} ORDER BY {order} {frame_sql}"


def _rframe_sql(spec: dict) -> str:
    over = _rframe_over(spec)
    aggs = [RFRAME_AGGS[i] for i in spec["aggs"]]
    sel = ["o_orderkey"] + [f"{sql_fn(over)} AS {name}" for name, _, sql_fn in aggs]
    q = (
        f"SELECT {', '.join(sel)} FROM (SELECT *, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c FROM orders"
    )
    if spec["preds"]:
        conds = [ORDERS_PRED_EXPRS[i][2](c) for i, c in spec["preds"]]
        q += " WHERE " + " AND ".join(conds)
    return q + ") t"


def _rframe_spark(spec: dict, tables):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = tables["orders"].withColumn(
        "price_c", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    for i, c in spec["preds"]:
        df = df.where(ORDERS_PRED_EXPRS[i][1](F, c))
    _, lo, hi = RFRAME_SHAPES[spec["shape"]](spec["x"], spec["y"], W)
    order = F.col("price_c").desc() if spec["desc"] else F.col("price_c")
    w = (
        W.partitionBy(RFRAME_PARTS[spec["part"]])
        .orderBy(order)
        .rangeBetween(lo, hi)
    )
    aggs = [RFRAME_AGGS[i] for i in spec["aggs"]]
    return df.select(
        "o_orderkey", *[fn(F, w).alias(name) for name, fn, _ in aggs]
    )


def _semi_spark(spec: dict, tables):
    from pyspark.sql import functions as F

    c = tables["customer"]
    o = tables["orders"].where(
        F.expr(OUTER_ORDER_FILTERS[spec["ofilter"]](spec["const"]))
    )
    how = "left_anti" if spec["anti"] else "left_semi"
    df = c.join(o, c.c_custkey == o.o_custkey, how)
    groups = [SEMI_GROUP_EXPRS[i] for i in spec["groups"]]
    aggs = [SEMI_AGG_EXPRS[i] for i in spec["aggs"]]
    agg_cols = [fn(F).alias(name) for name, fn, _ in aggs]
    if groups:
        gcols = [fn(F).alias(name) for name, fn, _ in groups]
        return df.groupBy(*gcols).agg(*agg_cols)
    return df.agg(*agg_cols)


def _outer_spark(spec: dict, tables):
    from pyspark.sql import functions as F

    c = tables["customer"]
    o = tables["orders"]
    pred_sql = OUTER_ORDER_FILTERS[spec["ofilter"]](spec["const"])
    o = o.where(F.expr(pred_sql))
    df = c.join(o, c.c_custkey == o.o_custkey, spec["how"])
    groups = [OUTER_GROUP_EXPRS[i] for i in spec["groups"]]
    aggs = [OUTER_AGG_EXPRS[i] for i in spec["aggs"]]
    agg_cols = [fn(F).alias(name) for name, fn, _ in aggs]
    if groups:
        gcols = [fn(F).alias(name) for name, fn, _ in groups]
        return df.groupBy(*gcols).agg(*agg_cols)
    return df.agg(*agg_cols)


def _window_spark(spec: dict, tables):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = tables["orders"].withColumn(
        "price_c", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    for i, c in spec["preds"]:
        df = df.where(ORDERS_PRED_EXPRS[i][1](F, c))
    wins = [WINDOW_EXPRS[i] for i in spec["wins"]]
    return df.select(
        "o_orderkey", *[fn(F, W).alias(name) for name, fn, _ in wins]
    )


def _gsets_spark(spec: dict, tables):
    from pyspark.sql import functions as F

    k0, k1 = (GROUP_EXPRS[i] for i in spec["keys"])
    df = tables["events"]
    for i, c in spec["preds"]:
        df = df.where(PRED_EXPRS[i][1](F, c))
    df = df.select("*", k0[1](F).alias("g0"), k1[1](F).alias("g1"))
    shape = GSET_SHAPES[spec["shape"]]
    sets = [[F.col(g) for g in s] for s in shape]
    aggs = [AGG_EXPRS[i] for i in spec["aggs"]]
    return df.groupingSets(sets, F.col("g0"), F.col("g1")).agg(
        F.grouping("g0").cast("long").alias("gf0"),
        F.grouping("g1").cast("long").alias("gf1"),
        *[fn(F).alias(name) for name, fn, _ in aggs],
    )


def spec_spark(spec: dict, tables):
    from pyspark.sql import functions as F

    fam = spec.get("family")
    if fam == "bktjoin":
        return _bktjoin_spark(spec, tables)
    if fam == "outer":
        return _outer_spark(spec, tables)
    if fam == "window":
        return _window_spark(spec, tables)
    if fam == "gsets":
        return _gsets_spark(spec, tables)
    if fam == "semi":
        return _semi_spark(spec, tables)
    if fam == "setop":
        return _setop_spark(spec, tables)
    if fam == "rframe":
        return _rframe_spark(spec, tables)
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


def _bktjoin_spark(spec: dict, tables):
    """orders ⋈ customer WITHOUT a broadcast hint (the bucketed variant must
    actually exercise the clustered layout), then the shared join grammar."""
    from pyspark.sql import functions as F

    o, c = tables["orders"], tables["customer"]
    df = o.join(c, o.o_custkey == c.c_custkey)
    for i, const in spec["preds"]:
        df = df.where(JOIN_PRED_EXPRS[i][1](F, const))
    groups = [JOIN_GROUP_EXPRS[i] for i in spec["groups"]]
    aggs = [JOIN_AGG_EXPRS[i] for i in spec["aggs"]]
    agg_cols = [fn(F).alias(name) for name, fn, _ in aggs]
    if groups:
        gcols = [fn(F).alias(name) for name, fn, _ in groups]
        return df.groupBy(*gcols).agg(*agg_cols).orderBy(
            *[name for name, _, _ in groups]
        )
    return df.agg(*agg_cols)


def _bucketed_fuzz_tables(spark, sf_dir, raw_tables):
    """orders/customer served from the per-sf_dir bucketed layout (built on
    first use); events has no bucket spec and stays raw."""
    from satsure_agri_datapipeline_spark.sources.bucketed import (
        _table_name,
        ensure_bucketed_layout,
    )

    ensure_bucketed_layout(spark, sf_dir, tables=["orders", "customer"])
    return {
        "orders": spark.table(_table_name("orders")),
        "customer": spark.table(_table_name("customer")),
        "events": raw_tables["events"],
    }


def run_fuzz(spark, con, sf_dir: str, n: int, seed: int, verbose: bool = True):
    """Returns list of (spec_index, ok, detail). ``bktjoin`` specs execute
    TWICE — raw parquet and the bucketed layout — and must match the oracle
    both ways (raw == bucketed == DuckDB)."""
    import pandas as pd

    from satsure_agri_datapipeline_spark.sources.tables import load_table

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from check_correctness import canonical  # the driver's hash contract

    tables = {
        t: load_table(spark, sf_dir, t) for t in ("events", "orders", "customer")
    }
    bkt_tables = None
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
            if ok and spec.get("family") == "bktjoin":
                if bkt_tables is None:
                    bkt_tables = _bucketed_fuzz_tables(spark, sf_dir, tables)
                got_bkt = spec_spark(spec, bkt_tables).toPandas()
                ok = canonical(got_bkt).equals(b)
                detail = (
                    ""
                    if ok
                    else f"bucketed {len(got_bkt)} rows diverged from oracle {len(want)}"
                )
        except Exception as exc:  # genuine mapping bug — report, keep going
            ok, detail = False, f"error: {exc}"
        results.append((i, ok, sql if not ok else ""))
        if verbose:
            tag = "ok  " if ok else "FAIL"
            fam = "bkt " if spec.get("family") == "bktjoin" else ""
            print(f"# {tag} [{i}] {fam}{sql[:100]}", file=sys.stderr)
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
