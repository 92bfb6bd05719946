"""Unit tests for the incremental-maintenance, profiling, and corpus-curation
operators added in round 3: merge_upsert / compact_changes / scd2_intervals /
profile_columns (operators/maintenance.py), mad_outliers
(operators/validation.py), dedup_spans (operators/dedup.py),
build_vocab / encode_ids (operators/text.py), retention_cohorts
(operators/temporal.py). Exact-value assertions on hand-built micro-frames,
the reference's dominant test pattern (SURVEY.md §5.1)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.operators import maintenance as mt
from satsure_agri_datapipeline_spark.operators import validation as vl
from satsure_agri_datapipeline_spark.operators.dedup import dedup_spans
from satsure_agri_datapipeline_spark.operators.temporal import retention_cohorts
from satsure_agri_datapipeline_spark.operators.text import build_vocab, encode_ids


def test_merge_upsert_update_insert_delete_untouched(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "k int, v string, is_deleted boolean",
    )
    out = {
        r.k: r.v
        for r in mt.merge_upsert(base, changes, ["k"], deleted_col="is_deleted").collect()
    }
    assert out == {1: "a", 2: "B", 4: "d"}  # 3 deleted, 1 untouched


def test_merge_upsert_without_deletes_is_pure_upsert(spark):
    base = spark.createDataFrame([(1, "a")], "k int, v string")
    changes = spark.createDataFrame([(1, "A"), (2, "b")], "k int, v string")
    out = {r.k: r.v for r in mt.merge_upsert(base, changes, ["k"]).collect()}
    assert out == {1: "A", 2: "b"}


def test_merge_upsert_version_col_auto_compacts_multi_version_batch(spark):
    base = spark.createDataFrame([(1, "a", 0)], "k int, v string, ver int")
    changes = spark.createDataFrame(
        [(1, "mid", 5), (1, "new", 9), (2, "b", 1)], "k int, v string, ver int"
    )
    out = {
        r.k: r.v
        for r in mt.merge_upsert(base, changes, ["k"], version_col="ver").collect()
    }
    assert out == {1: "new", 2: "b"}  # no duplicate key 1, newest version wins


def test_merge_upsert_validate_rejects_duplicate_change_keys(spark):
    import pytest

    base = spark.createDataFrame([(1, "a")], "k int, v string")
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "k int, v string")
    with pytest.raises(ValueError, match="multiple rows"):
        mt.merge_upsert(base, dup, ["k"], validate_unique_keys=True)
    ok = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    out = {
        r.k: r.v
        for r in mt.merge_upsert(base, ok, ["k"], validate_unique_keys=True).collect()
    }
    assert out == {1: "x", 2: "y"}


def test_compact_changes_keeps_latest_version(spark):
    changes = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "only", 5)], "k int, v string, ver int"
    )
    out = {r.k: r.v for r in mt.compact_changes(changes, ["k"], "ver").collect()}
    assert out == {1: "new", 2: "only"}


def test_scd2_intervals_compresses_runs_and_closes_versions(spark):
    t = lambda h: datetime(2023, 6, 1, h)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, "x", t(0), 1),
            (1, "x", t(1), 2),
            (1, "y", t(2), 3),
            (1, "x", t(3), 4),
            (2, "z", t(0), 5),
        ],
        "user_id int, event_type string, ts timestamp, event_id int",
    )
    rows = {
        (r.user_id, r.version): (r.event_type, r.valid_from_s, r.valid_to_s)
        for r in mt.scd2_intervals(df, "user_id", "event_type", "ts", "event_id").collect()
    }
    e = lambda h: int(datetime(2023, 6, 1, h).timestamp())  # noqa: E731
    assert rows[(1, 1)] == ("x", e(0), e(2))
    assert rows[(1, 2)] == ("y", e(2), e(3))
    assert rows[(1, 3)] == ("x", e(3), -1)  # open version
    assert rows[(2, 1)] == ("z", e(0), -1)


def test_profile_columns_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "b"), (2, "a")], "k int, v string"
    )
    prof = {r.column_name: r for r in mt.profile_columns(df).collect()}
    assert (prof["k"].n_rows, prof["k"].n_nulls, prof["k"].n_distinct) == (3, 0, 2)
    assert (prof["k"].min_str, prof["k"].max_str) == ("1", "2")
    assert (prof["v"].n_nulls, prof["v"].n_distinct) == (1, 2)
    assert (prof["v"].min_str, prof["v"].max_str) == ("a", "b")


def test_mad_outliers_flags_gross_outlier_not_inliers(spark):
    # med=3, MAD=1 -> threshold 3*1.4826 = 4.4478; only 100 exceeds it.
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([("t", v) for v in vals], "g string, value double")
    [r] = vl.mad_outliers(df, value_col="value", group_cols=["g"], k=3.0).collect()
    assert (r.n, r.med, r.mad, r.n_outliers) == (5, 3.0, 1.0, 1)


def test_mad_outliers_zero_mad_group(spark):
    # Constant group: MAD=0 -> nothing exceeds a zero threshold strictly
    # except deviations > 0; all deviations are 0 -> no outliers.
    df = spark.createDataFrame([("c", 7.0)] * 4, "g string, value double")
    [r] = vl.mad_outliers(df, value_col="value", group_cols=["g"]).collect()
    assert (r.mad, r.n_outliers) == (0.0, 0)


def test_dedup_spans_drops_cross_doc_boilerplate(spark):
    shared = " ".join(f"s{i}" for i in range(10))  # one exact 10-token span
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(5))  # short tail span
    df = spark.createDataFrame(
        [(1, f"{shared} {uniq_a}"), (2, f"{shared} {uniq_b}"), (3, uniq_b)],
        "doc_id int, text string",
    )
    out = {r.doc_id: (r.text_clean, r.n_spans_kept) for r in dedup_spans(df).collect()}
    # the shared leading span is gone from both docs; uniq_b appears in docs
    # 2 and 3 as an identical tail span -> also boilerplate, so doc 2 and 3
    # lose it (doc 2 keeps nothing -> dropped entirely; doc 3 dropped too).
    assert out == {1: (uniq_a, 1)}


def test_dedup_spans_keeps_singleton_doc_intact(spark):
    text = " ".join(f"w{i}" for i in range(25))  # 3 spans: 10+10+5
    df = spark.createDataFrame([(7, text)], "doc_id int, text string")
    [r] = dedup_spans(df).collect()
    assert r.text_clean == text and r.n_spans_kept == 3


def test_build_vocab_rank_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c")], "doc_id int, text string"
    )
    vocab = {r.tok: (r.tok_id, r.cnt) for r in build_vocab(df, vocab_size=2).collect()}
    # a and b tie at 2; 'a' < 'b' lexicographically -> a gets id 1
    assert vocab == {"a": (1, 2), "b": (2, 2)}


def test_encode_ids_oov_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "b a zz a"), (2, "zz")], "doc_id int, text string"
    )
    # corpus counts: a=2, zz=2, b=1 -> vocab of 2 is {a: 1, zz: 2}; b is OOV
    vocab = build_vocab(docs, vocab_size=2)
    out = {r.doc_id: (r.token_ids, r.n_tokens) for r in encode_ids(docs, vocab).collect()}
    assert out == {1: ("0,1,2,1", 4), 2: ("2", 1)}


def test_encode_ids_truncates_at_max_len(spark):
    docs = spark.createDataFrame([(1, "a a a a a")], "doc_id int, text string")
    vocab = build_vocab(docs, vocab_size=1)
    [r] = encode_ids(docs, vocab, max_len=3).collect()
    assert r.token_ids == "1,1,1" and r.n_tokens == 3


def test_retention_cohorts_triangle(spark):
    day = 86400
    ts = lambda d: datetime.utcfromtimestamp(d * day)  # noqa: E731
    df = spark.createDataFrame(
        # user 1 first active week 0, active again week 2; user 2 week 2 only
        [(1, ts(0)), (1, ts(1)), (1, ts(15)), (2, ts(14))],
        "user_id int, ts timestamp",
    )
    cells = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert cells == {(0, 0): 1, (0, 2): 1, (2, 0): 1}


def test_snapshot_diff_insert_update_delete_and_nullsafe(spark):
    before = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k int, v string"
    )
    after = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (5, "e")], "k int, v string"
    )
    out = {
        r.k: (r.change_type, r.v)
        for r in mt.snapshot_diff(before, after, ["k"]).collect()
    }
    # 1 unchanged (dropped); 3 null==null unchanged (null-safe compare)
    assert out == {
        2: ("update", "B"),
        4: ("delete", "d"),
        5: ("insert", "e"),
    }


def test_snapshot_diff_null_to_value_is_update(spark):
    before = spark.createDataFrame([(1, None)], "k int, v string")
    after = spark.createDataFrame([(1, "x")], "k int, v string")
    [r] = mt.snapshot_diff(before, after, ["k"]).collect()
    assert (r.change_type, r.v) == ("update", "x")


def test_snapshot_diff_roundtrips_through_merge_upsert(spark):
    # Applying the generated diff onto `before` must reproduce `after`.
    before = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    after = spark.createDataFrame([(1, "A"), (3, "c"), (9, "z")], "k int, v string")
    diff = mt.snapshot_diff(before, after, ["k"]).withColumn(
        "is_deleted", F.col("change_type") == "delete"
    )
    applied = mt.merge_upsert(
        before, diff.drop("change_type"), ["k"], deleted_col="is_deleted"
    )
    assert {(r.k, r.v) for r in applied.collect()} == {
        (r.k, r.v) for r in after.collect()
    }



def test_key_histogram_ranks_and_share(spark):
    from satsure_agri_datapipeline_spark.operators.joins import key_histogram

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = {r.k: (r.n_rows, r.share_bp, r.rank) for r in key_histogram(df, ["k"]).collect()}
    assert out == {
        "hot": (6, 6000, 1),
        "warm": (3, 3000, 2),
        "cold": (1, 1000, 3),
    }


def test_key_histogram_top_n_cutoff(spark):
    from satsure_agri_datapipeline_spark.operators.joins import key_histogram

    df = spark.createDataFrame([(i % 5,) for i in range(50)], "k int")
    assert key_histogram(df, ["k"], top_n=2).count() == 2


def test_forward_fill_carries_last_observation(spark):
    from satsure_agri_datapipeline_spark.operators.transformation import forward_fill

    df = spark.createDataFrame(
        [
            ("s1", 1, None),   # before first obs -> stays null
            ("s1", 2, 10.0),
            ("s1", 3, None),   # -> 10.0
            ("s1", 4, 20.0),
            ("s1", 5, None),   # -> 20.0
            ("s2", 1, None),   # other key untouched by s1's values
        ],
        "sensor_id string, seq int, battery double",
    )
    out = forward_fill(df, ["battery"], ["sensor_id"], ["seq"])
    got = {(r.sensor_id, r.seq): r.battery for r in out.collect()}
    assert got == {
        ("s1", 1): None,
        ("s1", 2): 10.0,
        ("s1", 3): 10.0,
        ("s1", 4): 20.0,
        ("s1", 5): 20.0,
        ("s2", 1): None,
    }


def test_inverted_index_caps_postings_and_ranks_by_df(spark):
    from satsure_agri_datapipeline_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x z"), (4, "x")],
        "doc_id int, text string",
    )
    out = {r.tok: (r.df, r.postings) for r in inverted_index(docs, top_tokens=2, max_postings=2).collect()}
    # df: x=4, y=2, z=1 -> top 2 are x, y; x's postings capped at 2
    assert out == {"x": (4, "1,2"), "y": (2, "1,2")}


def test_collocations_integer_lift_and_min_count(spark):
    from satsure_agri_datapipeline_spark.operators.text import collocations

    # "a b" occurs 3x; unigrams: a=3, b=3 -> lift = 3*1e6 div 9 = 333333
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b")], "doc_id int, text string"
    )
    rows = collocations(docs, min_count=3, top_n=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.bigram, r.c_ab, r.c_a, r.c_b, r.lift_e6, r.rank) == ("a b", 3, 3, 3, 333333, 1)


def test_collocations_single_token_docs_produce_no_bigrams(spark):
    from satsure_agri_datapipeline_spark.operators.text import collocations

    docs = spark.createDataFrame([(1, "solo"), (2, "solo")], "doc_id int, text string")
    assert collocations(docs, min_count=1).count() == 0


def test_winsorize_clamps_tails_preserves_rows(spark):
    from satsure_agri_datapipeline_spark.operators.transformation import winsorize

    # values 1..10: p5 fence 1.45, p95 fence 9.55 (linear interpolation)
    df = spark.createDataFrame(
        [("t", float(i)) for i in range(1, 11)], "g string, value double"
    )
    out = winsorize(df, value_col="value", group_cols=["g"]).collect()
    assert len(out) == 10  # row count preserved
    lo = [r for r in out if r.clamped_low]
    hi = [r for r in out if r.clamped_high]
    import pytest

    assert [r.value for r in lo] == [1.0]
    assert lo[0].value_w == pytest.approx(1.45)
    assert [r.value for r in hi] == [10.0]
    assert hi[0].value_w == pytest.approx(9.55)
    untouched = [r for r in out if not (r.clamped_low or r.clamped_high)]
    assert all(r.value_w == r.value for r in untouched)


def test_dedup_keep_best_prefers_high_score_member(spark):
    from satsure_agri_datapipeline_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 100), (2, 500), (3, 500), (9, 42)],  # 9 is un-paired
        "doc_id int, n_chars int",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a int, id_b int")
    kept = sorted(r.doc_id for r in dedup_keep_best(docs, pairs, "n_chars").collect())
    # cluster {1,2,3}: scores 100/500/500 -> tie between 2 and 3 -> higher id 3
    assert kept == [3, 9]


def test_zorder_key_interleaves_bits(spark):
    from satsure_agri_datapipeline_spark.operators.loading import zorder_key

    def morton_ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(
        [(3, 1), (0, 0), (65535, 0), (0, 65535), (12345, 54321)], "x int, y int"
    )
    rows = df.select("x", "y", zorder_key("x", "y").alias("z")).collect()
    for r in rows:
        assert r.z == morton_ref(r.x, r.y), (r.x, r.y)


def test_zorder_sorted_write_is_locally_compact(spark, tmp_path):
    """Rows sorted by the z-key have bounded per-row-group spans in BOTH
    dimensions vs a 1-D sort (the data-skipping property, measured on the
    key domain rather than asserted via parquet internals)."""
    import itertools

    from satsure_agri_datapipeline_spark.operators.loading import zorder_key

    pts = [(x, y) for x, y in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(pts, "x int, y int")
    zs = [
        (r.x, r.y)
        for r in df.select("x", "y", zorder_key("x", "y").alias("z"))
        .orderBy("z")
        .collect()
    ]
    # any contiguous run of 64 z-ordered points spans <= 16 in each dim
    for i in range(0, len(zs), 64):
        chunk = zs[i : i + 64]
        xs = [p[0] for p in chunk]
        ys = [p[1] for p in chunk]
        assert max(xs) - min(xs) <= 15 and max(ys) - min(ys) <= 15


def test_write_zordered_bounds_both_dims_per_file(spark, tmp_path):
    """Files from a z-ordered write cover compact 2-D blocks: per-file spans
    are bounded in BOTH dimensions, while an x-sorted write leaves y at full
    width — the min/max-stat pruning advantage, measured directly."""
    import itertools

    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.operators.loading import write_zordered

    pts = [(x, y) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(pts, "x int, y int")

    write_zordered(df, "x", "y", tmp_path / "zo", n_files=16)
    spans = (
        spark.read.parquet(str(tmp_path / "zo"))
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) > 1
    # each 2-D block stays well under the full 0..63 width in BOTH dims
    assert max(r.sx for r in spans) <= 32 and max(r.sy for r in spans) <= 32

    # contrast: 1-D x-sorted write leaves y at full width per file
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "xs"))
    y_spans = (
        spark.read.parquet(str(tmp_path / "xs"))
        .groupBy(F.input_file_name().alias("f"))
        .agg((F.max("y") - F.min("y")).alias("sy"))
        .collect()
    )
    assert max(r.sy for r in y_spans) == 63
