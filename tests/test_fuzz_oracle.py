"""Seeded cross-engine fuzz: random filter→group→aggregate specs compared
Spark-vs-DuckDB exactly (tools/fuzz_oracle.py). A small fixed-seed sample
runs in CI; the tool's default (--n 50) and larger sweeps run ad hoc —
170 specs across three seeds (incl. the orders ⋈ customer join relation) were green when this landed."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from fuzz_oracle import run_fuzz  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_fuzzed_specs_match_duckdb(spark):
    con = duckdb.connect()
    for t in ("events", "orders", "customer"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{Path(SF) / t}.parquet')"
        )
    results = run_fuzz(spark, con, SF, n=12, seed=20260814, verbose=False)
    failures = [(i, d) for i, ok, d in results if not ok]
    assert not failures, failures
