"""Property-based tests (hypothesis): distributed operators vs brute-force
Python on randomized inputs. Each example batches many independent cases
(docs / combos / graphs) into ONE DataFrame so a property run costs a few
Spark jobs, not hundreds.

SURVEY.md §5.2 test plan — the oracle-differential idea applied a second
way: the DuckDB oracles pin cross-engine parity on fixed data; these pin
algorithmic correctness on adversarial random data."""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.operators import dedup as dd
from satsure_agri_datapipeline_spark.operators import sampling as sp
from satsure_agri_datapipeline_spark.operators import text as tx
from satsure_agri_datapipeline_spark.operators import validation as vl

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(" ".join)


@given(texts=st.lists(doc_strategy, min_size=2, max_size=25))
@settings(**SETTINGS)
def test_jaccard_pairs_match_bruteforce(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()
    }
    sets = {i: set(dd._shingle_set(t, 3)) for i, t in enumerate(texts)}
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            if inter:
                jac = inter / len(sets[i] | sets[j])
                if jac >= 0.3:
                    want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_connected_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node_id: r.component_id for r in dd.connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@given(
    combos=st.lists(
        st.sets(st.integers(0, 71), min_size=1, max_size=40),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_gap_detection_matches_bruteforce(spark, combos):
    """The O(observed) closed-form gap aggregation equals the explicit-grid
    reconstruction for arbitrary observed-hour subsets of a 72h span."""
    base = datetime(2023, 6, 1, 0, 17)  # off-hour anchor: grid carries :17
    rows = []
    for c, hours in enumerate(combos):
        for h in hours:
            rows.append((f"sensor_{c}", "temperature", base + timedelta(hours=h)))
    df = spark.createDataFrame(
        rows, "sensor_id string, reading_type string, timestamp timestamp"
    )
    gaps, _ = vl.detect_time_gaps(df, frequency_hours=1)
    got = {
        r.sensor_id: (r.missing_hours, r.first_gap, r.last_gap)
        for r in gaps.collect()
    }

    lo = min(min(h) for h in combos)
    hi = max(max(h) for h in combos)
    grid = list(range(lo, hi + 1))
    want = {}
    for c, hours in enumerate(combos):
        missing = [h for h in grid if h not in hours]
        if missing:
            want[f"sensor_{c}"] = (
                len(missing),
                base + timedelta(hours=missing[0]),
                base + timedelta(hours=missing[-1]),
            )
    assert got == want


@given(
    texts=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=60).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    chunk_tokens=st.integers(4, 16),
    overlap=st.integers(0, 3),
)
@settings(**SETTINGS)
def test_chunks_reassemble(spark, texts, chunk_tokens, overlap):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    chunks = tx.chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    stride = chunk_tokens - overlap
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        rs = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        # every chunk is the exact slice, and slices tile the doc
        rebuilt = []
        for r in rs:
            start = r.chunk_idx * stride
            assert r.chunk_text.split(" ") == toks[start : start + chunk_tokens]
            assert r.n_chunk_tokens == len(toks[start : start + chunk_tokens])
            rebuilt.extend(toks[start + (overlap if r.chunk_idx else 0) : start + chunk_tokens])
        assert rebuilt == toks
        # last chunk covers the tail; no chunk is pure overlap
        assert rs[-1].chunk_idx * stride + chunk_tokens >= len(toks)


@given(
    langs=st.lists(st.sampled_from(["en", "de", "es"]), min_size=1, max_size=40),
    k=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_stratified_sample_counts(spark, langs, k):
    df = spark.createDataFrame(
        [(i, lang) for i, lang in enumerate(langs)], "doc_id long, lang string"
    )
    out = sp.stratified_sample(df, ["lang"], k=k).collect()
    per = {}
    for r in out:
        per[r.lang] = per.get(r.lang, 0) + 1
    from collections import Counter

    pop = Counter(langs)
    assert per == {lang: min(k, n) for lang, n in pop.items()}
    # determinism: same seed, same sample
    again = sorted(r.doc_id for r in sp.stratified_sample(df, ["lang"], k=k).collect())
    assert again == sorted(r.doc_id for r in out)


@given(texts=st.lists(doc_strategy, min_size=2, max_size=20))
@settings(**SETTINGS)
def test_minhash_signatures_match_python_spec(spark, texts):
    """The Arrow-vectorized signature equals the scalar spec: per seed k,
    min over shingles of the affine-mixed portable hash."""
    import hashlib

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.doc_id: list(r.sig)
        for r in dd.minhash_signature_arrays(df, num_hashes=8, n=3).collect()
    }
    a, b = dd.minhash_params(8)
    want = {}
    for i, t in enumerate(texts):
        shs = dd._shingle_set(t, 3)
        if not shs:
            continue
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shs]
        want[i] = [
            min(((a[k] * h + b[k]) % (1 << 64)) & ((1 << 63) - 1) for h in hs)
            for k in range(8)
        ]
    assert got == want


@given(
    gaps=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 7200)), min_size=1, max_size=40
    )
)
@settings(**SETTINGS)
def test_sessionize_matches_bruteforce(spark, gaps):
    from satsure_agri_datapipeline_spark.operators.temporal import session_stats

    # build per-key increasing timestamps from (key, delta_seconds) pairs
    base = datetime(2023, 6, 1)
    clocks: dict[int, datetime] = {}
    rows = []
    for i, (k, delta) in enumerate(gaps):
        clocks[k] = clocks.get(k, base) + timedelta(seconds=delta)
        rows.append((f"k{k}", clocks[k], i))
    df = spark.createDataFrame(rows, "sensor_id string, timestamp timestamp, event_id long")

    got = {
        r.sensor_id: (r.n_sessions, r.n_events, r.max_session_events, r.max_session_span_s)
        for r in session_stats(df, gap_seconds=1800, tiebreak_col="event_id").collect()
    }

    per_key: dict[str, list[datetime]] = {}
    for key, ts, _ in rows:
        per_key.setdefault(key, []).append(ts)
    want = {}
    for key, tss in per_key.items():
        tss.sort()
        sessions: list[list[datetime]] = []
        for ts in tss:
            if sessions and (ts - sessions[-1][-1]).total_seconds() <= 1800:
                sessions[-1].append(ts)
            else:
                sessions.append([ts])
        want[key] = (
            len(sessions),
            len(tss),
            max(len(s) for s in sessions),
            int(max((s[-1] - s[0]).total_seconds() for s in sessions)),
        )
    assert got == want


@given(texts=st.lists(doc_strategy, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_repetition_stats_match_bruteforce(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in tx.repetition_stats(df).collect()}

    def e4(x):
        import math

        return math.floor(x * 10000 + 0.5)

    for i, t in enumerate(texts):
        toks = t.strip().split() if t.strip() else [""]
        # Spark's split on '\s+' over an empty/trimmed string yields ['']
        from collections import Counter

        c = Counter(toks)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = got[i]
        assert r.n_tokens == len(toks)
        assert r.distinct_ratio_e4 == e4(len(c) / len(toks))
        assert r.top_token_ratio_e4 == e4(max(c.values()) / len(toks))
        want_bi = e4(1 - len(set(bigrams)) / len(bigrams)) if bigrams else 0
        assert r.dup_bigram_ratio_e4 == want_bi


@given(
    train=st.lists(doc_strategy, min_size=1, max_size=15),
    bench=st.lists(doc_strategy, min_size=1, max_size=5),
)
@settings(**SETTINGS)
def test_decontaminate_matches_bruteforce(spark, train, bench):
    tdf = spark.createDataFrame(list(enumerate(train)), "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_hits for r in tx.decontaminate(tdf, bdf, n=3).collect()}

    bench_sh = set()
    for t in bench:
        bench_sh |= set(dd._shingle_set(t, 3))
    want = {}
    for i, t in enumerate(train):
        hits = len(set(dd._shingle_set(t, 3)) & bench_sh)
        if hits >= 1:
            want[i] = hits
    assert got == want


def test_results_invariant_under_shuffle_partitioning(spark):
    """Representative queries must produce identical rows regardless of
    spark.sql.shuffle.partitions — the property that makes results stable
    across cluster sizes. Covers a window chain, a bucket-join dedup, a
    sessionization, and the packing operator."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = ["sensor_daily_avg", "doc_ngram_jaccard", "sensor_sessionize", "doc_pack_sequences"]
    sf = "/root/testdata/sf0.001"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n in ("5", "37"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results[n] = {
                name: sorted(map(tuple, qs[name](spark, sf).collect()))
                for name in names
            }
        for name in names:
            assert results["5"][name] == results["37"][name], name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),           # group
            st.one_of(st.none(), st.integers(0, 20)),  # value (ties + NULLs)
        ),
        min_size=1,
        max_size=60,
    ),
    n_buckets=st.sampled_from([1, 2, 5, 16]),
)
@settings(**SETTINGS)
def test_distributed_rank_property(spark, rows, n_buckets):
    """Bucketed two-phase ranking == per-group sort position, for any
    group/value distribution (heavy ties, single bucket, more buckets than
    values, NULL order values — which must rank FIRST, Spark's default
    window NULL ordering, not be dropped)."""
    from satsure_agri_datapipeline_spark.operators.joins import distributed_rank

    data = [
        (i, f"g{g}", float(v) if v is not None else None)
        for i, (g, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "id long, grp string, v double")
    got = {
        r.id: r.rank
        for r in distributed_rank(
            df, "v", ["grp"], ["id"], n_buckets=n_buckets
        ).collect()
    }
    want = {}
    by_grp: dict = {}
    for i, g, v in data:
        by_grp.setdefault(g, []).append((v, i))
    for g, vals in by_grp.items():
        ordered = sorted(vals, key=lambda t: (t[0] is not None, t[0] or 0.0, t[1]))
        for pos, (_, i) in enumerate(ordered, start=1):
            want[i] = pos
    assert got == want


@given(
    texts=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=30),
    split=st.integers(0, 29),
)
@settings(**SETTINGS)
def test_incremental_dedup_equals_global_dedup(spark, texts, split):
    """Splitting a corpus into (history, batch) and deduping incrementally
    must accept exactly the batch docs whose text is globally first-seen
    in the batch (lowest batch id), for ANY split point."""
    data = list(enumerate(texts))
    hist, batch = data[:split], data[split:]
    if not batch:
        return
    hist_df = spark.createDataFrame(hist, "doc_id long, text string") if hist else None
    batch_df = spark.createDataFrame(batch, "doc_id long, text string")
    hist_digests = (
        hist_df.select(F.sha2("text", 256).alias("digest")).distinct()
        if hist_df is not None
        else None
    )
    acc, _ = dd.incremental_exact_dedup(batch_df, hist_digests)
    got = {r.doc_id for r in acc.collect()}
    hist_texts = {t for _, t in hist}
    seen, want = set(), set()
    for i, t in batch:
        if t not in hist_texts and t not in seen:
            want.add(i)
            seen.add(t)
    assert got == want


@given(
    vals=st.lists(
        st.one_of(
            # 2-decimal money values, the catalog contract
            st.integers(min_value=0, max_value=10_000_000).map(lambda k: k / 100),
            # adversarial: values whose *100 product strays furthest from
            # an integer in IEEE (e.g. x.x5 / x.x35 patterns)
            st.integers(min_value=0, max_value=2_000_000).map(lambda k: k / 200),
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(**SETTINGS)
def test_floor_cents_matches_duckdb_round(spark, vals):
    """cents()/half_cents() floor form (r7 perf rework of Round's
    per-value BigDecimal codegen) must remain cell-identical to the oracle
    side's ROUND(x*100)/ROUND(x*200) for every non-negative input the
    catalog feeds it — including exact half-cent midpoints (k/200), the
    closest representable values to the .5 rounding boundary."""
    import duckdb

    from satsure_agri_datapipeline_spark.plans.catalog import cents, half_cents

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(
        cents(F.col("x")).alias("c"), half_cents(F.col("x")).alias("hc")
    ).collect()
    want = duckdb.sql(
        "SELECT CAST(ROUND(x*100) AS BIGINT), CAST(ROUND(x*200) AS BIGINT) "
        "FROM (SELECT UNNEST(?::DOUBLE[]) AS x)",
        params=[vals],
    ).fetchall()
    assert [(r.c, r.hc) for r in got] == [tuple(w) for w in want]


@given(
    vals=st.lists(
        st.one_of(
            # signed 2-decimal values and exact half-cent midpoints (k/200):
            # the domain where the floor form and ROUND diverge
            st.integers(min_value=-10_000_000, max_value=10_000_000).map(
                lambda k: k / 100
            ),
            st.integers(min_value=-2_000_000, max_value=2_000_000).map(
                lambda k: k / 200
            ),
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(**SETTINGS)
def test_floor_cents_negative_midpoint_fence(spark, vals):
    """r8 fence for the cents() non-negativity contract: (a) signed_cents
    matches DuckDB ROUND on the FULL signed domain including negative exact
    midpoints, and (b) the plain floor form is pinned to its CHOSEN half-up
    semantics — floor(x*100+0.5) — computed here in exact integer
    arithmetic, so any silent change to either helper fails loudly."""
    import math

    import duckdb

    from satsure_agri_datapipeline_spark.plans.catalog import cents, signed_cents

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(
        signed_cents(F.col("x")).alias("sc"), cents(F.col("x")).alias("c")
    ).collect()
    want_round = duckdb.sql(
        "SELECT CAST(ROUND(x*100) AS BIGINT) "
        "FROM (SELECT UNNEST(?::DOUBLE[]) AS x)",
        params=[vals],
    ).fetchall()
    # (a) signed form == ROUND everywhere
    assert [r.sc for r in got] == [w[0] for w in want_round]
    # (b) floor form == half-up everywhere (and == ROUND iff non-negative
    # or not an exact negative midpoint)
    assert [r.c for r in got] == [math.floor(v * 100 + 0.5) for v in vals]


def test_round_half_up_6_matches_spark_round_on_midpoints(spark):
    """r8 ADVICE (similarity.py): the vectorized decontamination's 6-dp
    rounding must match Spark's F.round (BigDecimal HALF_UP on the exact
    binary double) bit-for-bit — including 6-dp midpoints, negatives,
    signed zero, and values a half-ulp off a midpoint, where np.round's
    half-to-even + scaling error used to diverge."""
    import math

    import numpy as np

    from satsure_agri_datapipeline_spark.operators.similarity import (
        _round_half_up_6,
    )

    vals = []
    for k in range(-25, 26):
        base = k / 1e6
        mid = (2 * k + 1) / 2e6  # exact decimal midpoint (as a double)
        vals += [base, mid, math.nextafter(mid, -2.0), math.nextafter(mid, 2.0)]
    vals += [0.0, -0.0, 1.0, -1.0, 0.9999995, -0.9999995, 0.1234565,
             -0.1234565, 2.5e-7, -2.5e-7, 123.4567895, -123.4567895]
    rng = np.random.default_rng(7)
    vals += [float(v) for v in rng.uniform(-1, 1, 500)]
    vals += [float((2 * k + 1) / 2e6) for k in rng.integers(-10**6, 10**6, 200)]

    got = _round_half_up_6(np.array(vals, dtype=np.float64))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    want = [r.r for r in df.select(F.round("x", 6).alias("r")).collect()]
    diffs = [
        (v, g, w)
        for v, g, w in zip(vals, got.tolist(), want)
        if not (g == w and math.copysign(1, g) == math.copysign(1, w))
    ]
    assert not diffs, f"{len(diffs)} divergences, first 5: {diffs[:5]}"
