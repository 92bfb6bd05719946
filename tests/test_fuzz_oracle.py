"""Seeded cross-engine fuzz: random query specs compared Spark-vs-DuckDB
exactly (tools/fuzz_oracle.py). The r7 grammar (9 families) covers every
§2.3-2.7 operator class: scan/filter/agg, broadcast joins, OUTER joins
with NULL-generating keys, window frames (running/sliding/rank/lag/lead),
GROUPING SETS with GROUPING() markers, semi/anti joins, INTERSECT/EXCEPT
[ALL] set ops with NULL-equality and empty sides, RANGE-BETWEEN window
frames with literal offsets (incl. empty frames, asc/desc), type-boundary
literals (dataset-exact min/max timestamps and doubles, empty-result
predicates), and — family 9 (r7) — multi-relation joins executed BOTH over
raw parquet and through the bucketed storage layout (sources/bucketed.py),
asserting raw == bucketed == oracle per seed.

The full seeded run is 500 specs (SPARK_GRAFT_FUZZ_N overrides; the
500-spec run at seed 20260814 was green when this landed and takes ~4 min
at sf0.001). Known cross-engine divergence the fuzzer surfaced, excluded
by the grammar: GROUP BY GROUPING SETS (..., ()) over EMPTY input yields
1 row in DuckDB (ANSI grand total) but 0 rows in Spark.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from fuzz_oracle import run_fuzz  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_known_divergence_empty_input_grouping_sets(spark):
    """Pin the cross-engine divergence the fuzzer found (and its grammar
    now avoids): GROUP BY GROUPING SETS (..., ()) over EMPTY input yields
    the 1-row ANSI grand total in DuckDB but 0 rows in Spark. Documented
    so a future Spark version closing the gap is noticed (this test will
    fail and the fuzzer grammar restriction can be lifted)."""
    from pyspark.sql import functions as F

    empty = spark.range(10).where("id < 0")
    got = (
        empty.groupingSets([[F.col("id")], []], F.col("id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == []  # Spark: no rows

    want = duckdb.sql(
        "SELECT COUNT(*) FROM range(10) t(id) WHERE id < 0 "
        "GROUP BY GROUPING SETS ((id), ())"
    ).fetchall()
    assert want == [(0,)]  # DuckDB: ANSI grand-total row


def test_fuzzed_specs_match_duckdb(spark):
    con = duckdb.connect()
    for t in ("events", "orders", "customer"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{Path(SF) / t}.parquet')"
        )
    n = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "500"))
    results = run_fuzz(spark, con, SF, n=n, seed=20260814, verbose=False)
    failures = [(i, d) for i, ok, d in results if not ok]
    assert not failures, failures
