"""Bucketed storage layout (sources/bucketed.py): exchange elimination on
the hot join keys, manifest safety, and result identity vs the raw path.

The layout is the 100 TB answer for repeatedly-joined facts: pay the hash
exchange once at ingest, never per query. These tests pin (a) that the
planner actually reads the bucketing (no Exchange under the bucketed scan
in orders ⋈ customer), (b) that queries running through ``load_table``
return IDENTICAL rows with the layout on, and (c) that a layout built
from a DIFFERENT sf_dir is ignored (correctness can't depend on env)."""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.sources.bucketed import (
    build_bucketed_layout,
    bucketed_table_or_none,
    register_bucketed_layout,
)
from satsure_agri_datapipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("bkt_layout")
    build_bucketed_layout(spark, SF, out, n_buckets=4)
    yield str(out)
    for t in ("bkt_orders", "bkt_customer", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_plans_no_exchange(spark, layout):
    """orders ⋈ customer on custkey: both sides bucketed on the key with the
    same count — the physical plan must contain NO shuffle Exchange at all
    (broadcast of one side would also be exchange-free-on-key, so pin the
    stronger property: zero ShuffleExchange nodes AND bucketed scans)."""
    register_bucketed_layout(spark, layout)
    o = spark.table("bkt_orders")
    c = spark.table("bkt_customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(o.join(c, o.o_custkey == c.c_custkey))
        # the groupBy's own exchange is also gone for the custkey pre-agg
        agg_plan = _plan(o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "Bucketed: true" in plan
    assert "Exchange" not in plan
    assert "Exchange" not in agg_plan


def test_bucketed_groupby_no_exchange(spark, layout):
    register_bucketed_layout(spark, layout)
    l = spark.table("bkt_lineitem")
    agg = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange hashpartitioning" not in _plan(agg)


def test_load_table_serves_bucketed_and_matches_raw(spark, layout):
    raw = load_table(spark, SF, "orders")
    os.environ["SPARK_GRAFT_BUCKETED_LAYOUT"] = layout
    try:
        bkt = load_table(spark, SF, "orders")
        # a bare scan may print "Bucketed: false (disabled by query planner)"
        # — autoBucketedScan only engages when an operator benefits — so pin
        # the serving table by its storage location instead
        assert str(Path(layout) / "orders") in _plan(bkt)
        # an aggregation on the bucket key must actually use the bucketing
        assert "Exchange hashpartitioning" not in _plan(
            bkt.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
        )
        a = sorted(map(tuple, raw.collect()))
        b = sorted(map(tuple, bkt.collect()))
        assert a == b
    finally:
        del os.environ["SPARK_GRAFT_BUCKETED_LAYOUT"]


def test_layout_for_wrong_sf_dir_is_ignored(spark, layout):
    os.environ["SPARK_GRAFT_BUCKETED_LAYOUT"] = layout
    try:
        assert bucketed_table_or_none(spark, "/root/testdata/sf0.01", "orders") is None
        # non-bucketed tables always fall through
        assert bucketed_table_or_none(spark, SF, "events") is None
    finally:
        del os.environ["SPARK_GRAFT_BUCKETED_LAYOUT"]


def test_catalog_queries_identical_with_layout(spark, layout):
    """The two headline fact joins produce byte-identical results with the
    layout enabled (served through the normal load_table path)."""
    from satsure_agri_datapipeline_spark.plans.catalog_relational import (
        join_multiway_revenue,
        join_segment_revenue,
    )

    plain = {
        "multiway": [tuple(r) for r in join_multiway_revenue(spark, SF).collect()],
        "segment": [tuple(r) for r in join_segment_revenue(spark, SF).collect()],
    }
    os.environ["SPARK_GRAFT_BUCKETED_LAYOUT"] = layout
    try:
        assert [
            tuple(r) for r in join_multiway_revenue(spark, SF).collect()
        ] == plain["multiway"]
        assert [
            tuple(r) for r in join_segment_revenue(spark, SF).collect()
        ] == plain["segment"]
    finally:
        del os.environ["SPARK_GRAFT_BUCKETED_LAYOUT"]
