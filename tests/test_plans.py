"""Physical-plan assertions: the optimizer must pick the plan the operator
was designed for, not merely any plan that returns correct rows. Guards the
properties the 100 TB design depends on (broadcasts, decorrelation, filter
pushdown, exchange counts) against silent regressions.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return entry_mod.queries()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushes_filter_to_scan(spark, queries):
    plan = plan_of(queries["tpch_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_top_supplier_broadcasts_dimension_and_max(spark, queries):
    plan = plan_of(queries["top_supplier_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_corr_subquery_is_decorrelated(spark, queries):
    # Catalyst must rewrite the correlated scalar subquery into an
    # aggregate + join; no subquery node may survive optimization.
    opt = optimized_of(queries["corr_subquery_big_orders"](spark, SF))
    assert "scalar-subquery" not in opt.lower()
    assert "Join" in opt


def test_pivot_lowers_to_single_conditional_aggregate(spark, queries):
    # declared pivot values lower to conditional aggregation: one partial +
    # one final HashAggregate, one hash shuffle — vs .pivot()'s generic
    # two-phase plan (4 aggregates, 2 shuffles)
    plan = plan_of(queries["pivot_sensor_type"](spark, SF))
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_histogram_is_scan_plus_one_shuffle(spark, queries):
    plan = plan_of(queries["histogram_event_values"](spark, SF))
    # partial agg -> exchange -> final agg -> (sort for output order)
    assert plan.count("Exchange") <= 2  # agg shuffle + orderBy range exchange


def test_topk_is_take_ordered(spark, queries):
    plan = plan_of(queries["topk_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_gap_detection_never_materializes_grid(spark, queries):
    # O(observed) rewrite: no explode of a sequence spanning the grid
    opt = optimized_of(queries["sensor_gap_detection"](spark, SF))
    assert "explode" not in opt.lower()
    # one wide exchange serves hour-dedup (lag), hole detection (lead) and
    # the combo aggregate; only the output orderBy adds a range exchange
    plan = plan_of(queries["sensor_gap_detection"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_session_stats_reuses_one_exchange(spark):
    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.operators.temporal import session_stats
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select(
        F.col("user_id").cast("string").alias("sensor_id"),
        F.col("ts").alias("timestamp"),
        "event_id",
    )
    plan = plan_of(session_stats(ev, tiebreak_col="event_id"))
    # one shuffle keys the windows + both aggregates; orderBy adds a range
    # exchange for output ordering
    assert plan.count("Exchange hashpartitioning") == 1


def test_decontaminate_broadcasts_benchmark_hashes(spark):
    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.operators.text import decontaminate
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    plan = plan_of(decontaminate(train, bench, n=4))
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """AQE runtime bloom filters (on by default in session.py's Spark 4
    defaults) push a might_contain pre-filter from a selective dimension
    side into the fact scan of a shuffle join — the runtime analog of static
    predicate pushdown. Thresholds are lowered here because the sandbox
    tables sit far below the 10 GB production default."""
    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.sources.tables import load_table

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        o = load_table(spark, "/root/testdata/sf0.001", "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        plan = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            ._jdf.queryExecution()
            .toString()
            .lower()
        )
        assert "bloomfilter" in plan or "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_mad_outliers_never_shuffles_fact_table(spark):
    """The MAD operator's per-group stats broadcast back onto the facts:
    the physical plan must contain broadcast joins and NO hash-partition
    exchange of the fact relation (operators/validation.py mad_outliers)."""
    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.operators.validation import mad_outliers
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    plan = (
        mad_outliers(ev, value_col="value", group_cols=["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the only hashpartitioning exchanges allowed are on the tiny group key
    for line in plan.splitlines():
        if "hashpartitioning" in line:
            assert "event_type" in line, line


def test_merge_upsert_broadcasts_small_change_side(spark):
    """CDC merge with a small change batch: the anti-join must broadcast the
    change keys, leaving the base table a single un-shuffled pass
    (operators/maintenance.py merge_upsert)."""
    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.operators.maintenance import merge_upsert
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.001", "orders")
    changes = base.where(F.col("o_orderkey") % 997 == 0)
    plan = (
        merge_upsert(base, changes, ["o_orderkey"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_dedup_spans_shuffles_hashes_not_text(spark):
    """Span-dedup's corpus count aggregate shuffles md5 keys, never the span
    text beyond each doc's own rebuild rows (operators/dedup.py
    dedup_spans): the count-side exchange must be keyed on the hash."""
    from satsure_agri_datapipeline_spark.operators.dedup import dedup_spans
    from satsure_agri_datapipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = dedup_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "span_h" in plan  # hash key exists in the exchanges


def test_impute_median_sort_form_and_broadcast_joinback(spark, queries):
    # r8 fused shape (formulation 7, tools/race_impute.py — 1.67→1.54 s at
    # 100×): per-sensor medians AND base aggregates share ONE shuffle+sort
    # window over the (sensor, value, hc) projection with middle-row
    # selection — NOT an ObjectHashAggregate Percentile (2.2× slower) and
    # NOT the r5 GROUPING SETS form whose Expand doubled the fact rows
    # (Expand must be gone). There is no keyed join-back at all anymore:
    # the ONLY join is the 1-row global-median broadcast (nested-loop
    # cross join); a keyed BroadcastHashJoin reappearing means the base
    # aggregate split back out into its own scan.
    plan = plan_of(queries["sensor_impute_median"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row gmed cross join
    assert "BroadcastHashJoin" not in plan  # keyed join-back is fused away
    assert "Expand" not in plan  # the r5 GROUPING SETS regression
    # only the GLOBAL median (keys=[]) may be a Percentile object aggregate;
    # any keyed ObjectHashAggregate means the per-sensor path regressed
    for frag in plan.split("ObjectHashAggregate(keys=[")[1:]:
        assert frag.startswith("]"), "keyed ObjectHashAggregate in impute plan"
    # windows: the rn + partition-aggregate pair over one shuffle
    assert plan.count("Window") <= 2


def test_report_finals_avoid_range_exchange(spark, queries):
    # report-sized finals use report_sort (single-partition sort): the
    # rangepartitioning exchange would SAMPLE its child, re-executing every
    # scan/join below the sort when no shuffle intervenes (r5; the z-score
    # plan ran its whole scan+broadcast-join twice just to order a handful
    # of ids). Regression guard for every converted headline final.
    for name in [
        "sensor_zscore_anomalies",
        "sensor_impute_median",
        "sensor_gap_detection",
        "tpch_pricing_summary",
        "join_segment_revenue",
        "join_multiway_revenue",
    ]:
        plan = plan_of(queries[name](spark, SF))
        assert "rangepartitioning" not in plan.lower(), name


def test_zscore_broadcasts_per_type_stats(spark, queries):
    # per-type stats: algebraic groupBy aggregate broadcast back, never a
    # Window over a handful of reading_type partitions (serial bottleneck)
    plan = plan_of(queries["sensor_zscore_anomalies"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_bench_regression_guard_flags_and_unwraps_driver_artifacts():
    """bench.regression_guard (r7): finds the newest same-sf committed
    BENCH_r*.json — unwrapping the driver's {"parsed": ...} envelope —
    and flags only >2x warm-time regressions, non-fatally."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import regression_guard

    from bench import _unwrap_artifact

    prev = regression_guard({"sensor_daily_avg": 99.0, "doc_simhash": 0.01}, 0.1)
    assert prev is not None and prev["baseline_artifact"].startswith("BENCH_r")
    assert "sensor_daily_avg" in prev["flagged"]
    assert "doc_simhash" not in prev["flagged"]  # faster is never flagged
    assert regression_guard({"sensor_daily_avg": 99.0}, 31337.0) is None

    # r9 regression: the driver's 2000-char tail cap can truncate the bench
    # line, leaving an artifact with "parsed": null (BENCH_r09.json). The
    # guard must fall back to the wrapper, never crash on None.get.
    assert _unwrap_artifact({"parsed": None, "sf": 0.1}) == {
        "parsed": None, "sf": 0.1}
    assert _unwrap_artifact({"parsed": {"sf": 0.1}}) == {"sf": 0.1}
    assert _unwrap_artifact(["not", "a", "dict"]) is None
    assert _unwrap_artifact({"parsed": "truncated-garbage"}) == {
        "parsed": "truncated-garbage"}


def test_scale_aware_io_codec_selection(tmp_path):
    """r8: _pick_io_codec chooses zstd ONLY for big inputs without a fresh
    bucketed fact layout (the measured big-raw-exchange regime); small
    inputs, no declared dir, or a fresh layout all stay lz4."""
    import json
    import shutil
    import time

    from satsure_agri_datapipeline_spark import session as sess
    from satsure_agri_datapipeline_spark.sources import bucketed as bk

    assert sess._pick_io_codec(None) == "lz4"
    small = tmp_path / "small"
    small.mkdir()
    (small / "a.parquet").write_bytes(b"x" * 1024)
    assert sess._pick_io_codec(small) == "lz4"
    big = tmp_path / "big"
    (big / "nested").mkdir(parents=True)
    f = big / "nested" / "b.parquet"
    with f.open("wb") as fh:  # sparse: size without the disk cost
        fh.seek(sess.ZSTD_VOLUME_THRESHOLD)
        fh.write(b"\0")
    assert sess._pick_io_codec(big) == "zstd"
    # a FRESH fact layout for the dir flips big input back to lz4 (the
    # exchanges zstd was winning on no longer exist)
    layout = bk.default_layout_dir(big)
    layout.mkdir(parents=True)
    (layout / bk.MANIFEST_NAME).write_text(
        json.dumps({"sf_dir": str(big.resolve()), "tables": {}})
    )
    now = time.time() + 5
    import os as _os

    _os.utime(layout / bk.MANIFEST_NAME, (now, now))
    assert sess._pick_io_codec(big) == "lz4"
    # ...but a STALE layout (source regenerated after it) keeps zstd
    later = time.time() + 10
    _os.utime(f, (later, later))
    assert sess._pick_io_codec(big) == "zstd"
    shutil.rmtree(layout, ignore_errors=True)

    # r9 (r8 ADVICE): a fresh layout named by SPARK_GRAFT_BUCKETED_LAYOUT
    # counts exactly like the default one — but only if built from THIS
    # data dir; a foreign layout never flips the codec.
    env_layout = tmp_path / "env_layout"
    env_layout.mkdir()
    (env_layout / bk.MANIFEST_NAME).write_text(
        json.dumps({"sf_dir": str(big.resolve()), "tables": {}})
    )
    _os.utime(env_layout / bk.MANIFEST_NAME, (later + 5, later + 5))
    _os.environ["SPARK_GRAFT_BUCKETED_LAYOUT"] = str(env_layout)
    try:
        assert sess._pick_io_codec(big) == "lz4"
        (env_layout / bk.MANIFEST_NAME).write_text(
            json.dumps({"sf_dir": "/somewhere/else", "tables": {}})
        )
        _os.utime(env_layout / bk.MANIFEST_NAME, (later + 5, later + 5))
        assert sess._pick_io_codec(big) == "zstd"
    finally:
        del _os.environ["SPARK_GRAFT_BUCKETED_LAYOUT"]


def test_inverted_index_no_pair_distinct_exchange(spark, queries):
    # r8: (token, doc) dedup is map-side (array_distinct per document) —
    # the old post-explode .distinct() shuffled EVERY exploded pair on
    # (doc_id, tok) and was the operator's super-linear wall (88.4 -> 22.4 s
    # at 1000x). Any hashpartitioning on both pair columns means the
    # full-relation distinct crept back in.
    plan = plan_of(queries["doc_inverted_index"](spark, SF))
    import re

    for cols in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert not ("doc_id" in cols and "tok" in cols), cols
    # r10: top-N token selection is TakeOrderedAndProject (distributed
    # per-partition heaps), never an unpartitioned row_number window that
    # funnels the whole vocabulary through one task.
    assert "TakeOrderedAndProject" in plan


def test_scale_aware_shuffle_partitions(tmp_path, monkeypatch):
    """r10: _pick_shuffle_partitions launches big-input sessions with
    4x-core initial shuffle partitions (the measured -25%/-18% on the
    1000x spill-bound pair-counting family; AQE coalesces the rest back);
    small inputs, no declared dir, and the env override behave."""
    from satsure_agri_datapipeline_spark import session as sess

    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    base = sess.DEFAULT_SHUFFLE_PARTITIONS
    assert sess._pick_shuffle_partitions(None) == base

    small = tmp_path / "small"
    small.mkdir()
    (small / "a.parquet").write_bytes(b"x" * 1024)
    assert sess._pick_shuffle_partitions(small) == base

    big = tmp_path / "big"
    big.mkdir()
    f = big / "b.parquet"
    with f.open("wb") as fh:  # sparse: size without the disk cost
        fh.seek(sess.BIG_SHUFFLE_VOLUME_THRESHOLD)
        fh.write(b"\0")
    assert sess._pick_shuffle_partitions(big) == 4 * base

    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "17")
    assert sess._pick_shuffle_partitions(big) == 17
    assert sess._pick_shuffle_partitions(small) == 17
