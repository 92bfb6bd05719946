"""Deduplication operators for large-scale training-data pipelines:
exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

Execution model (r2 redesign, r5 split): VERDICT r1 measured the original
pure-relational formulation at 150 s / 143 s for jaccard / minhash at
sf0.1 — the killer was per-(shingle, seed) ``md5``+``conv`` expression
trees recomputed for EVERY consumer of the shingle subtree (k seeds × two
join sides), not higher-order functions per se:

- Where hash VALUES never surface in results (n-gram jaccard — only set
  cardinalities matter), shingling is **pure JVM expressions** (split →
  slice/concat → xxhash64 → array_distinct): computed once, no Python hop
  at all (r5; see ``shingle_hash_arrays``).
- Where hash values must match the DuckDB oracle bit-for-bit (MinHash
  signatures, SimHash fingerprints), per-document work runs in
  **Arrow-vectorized ``pandas_udf``s** — one Python hop per batch,
  whole-batch numpy vectorization, and exactly one portable md5 per
  shingle.
- MinHash signatures and SimHash fingerprints become **map-only**
  projections (text in → fixed-width signature out): zero shuffles, perfect
  linear scaling at 100 TB. Cross-doc work (the LSH band join, the Jaccard
  bucket join) still shuffles on bounded fixed-width keys, never text.
- The O(docs) signature / shingle-array relations are ``persist()``-ed
  before fan-out to their join consumers — the r1 claim that shuffle-stage
  reuse covers the recompute was measured false (the pre-shuffle explode +
  hash work re-ran per consumer). A signature row is ~
  ``num_hashes * 8`` bytes, so even 1e9 docs fit MEMORY_AND_DISK per
  executor comfortably.

The portable 60-bit hash ``h(seed, s) = int(md5(seed || ':' || s)[:15], 16)``
is engine-agnostic (identical in Python hashlib, Spark ``md5``, DuckDB
``md5``), which is what makes the DuckDB oracle exact rather than
statistical.

At 100 TB: shingle explosion is the dominant cost — it's a flatMap (no
shuffle) followed by one shuffle per self-join; skewed shingles
(stop-phrases) can be dropped with a document-frequency cap
(``max_shingle_df``).
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.storagelevel import StorageLevel

# ---------------------------------------------------------------------------
# Portable hash family (shared with the DuckDB oracles — see plans/catalog_llm)
# ---------------------------------------------------------------------------


# 60-bit portable hash of a string column, parameterized by an integer seed
# (column-expression form; kept for the SQL/expression code path and tests).
def portable_hash(col, seed: int):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def _h60(s: str, seed: int) -> int:
    """Python twin of ``portable_hash`` — bit-identical by construction."""
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def minhash_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """The MinHash affine family's (a_k, b_k) constants: one 60-bit base md5
    per shingle, then ``h_k = ((a_k·h + b_k) mod 2^64) mod 2^63`` per seed.

    This replaces k independent seeded md5 passes (k·N digest calls measured
    as the dominant signature cost) with ONE digest + k numpy-vectorized
    uint64 multiply-adds — the standard universal-hashing MinHash
    construction. mod 2^64 is the native uint64 wraparound; the 2^63 mask
    keeps values in a signed BIGINT for engine portability. Constants derive
    from fixed md5 strings so every engine regenerates them identically
    (a_k forced odd → the multiply is a bijection mod 2^64)."""
    a = [
        int(hashlib.md5(f"minhash-a-{k}".encode()).hexdigest()[:16], 16) | 1
        for k in range(num_hashes)
    ]
    b = [
        int(hashlib.md5(f"minhash-b-{k}".encode()).hexdigest()[:16], 16)
        for k in range(num_hashes)
    ]
    return a, b


def _shingle_set(text: str, n: int, unit: str = "word") -> list[str]:
    """Distinct n-gram shingles. ``unit="word"`` mirrors the expression
    form exactly: ``split(text, ' ')`` keeps empty tokens (consecutive
    spaces), docs with fewer than n words yield no shingles.
    ``unit="char"`` shingles raw character n-grams (n≈5 typical) — the
    standard choice for code and CJK text, where word tokenization is
    meaningless; same too-short contract (len < n → no shingles)."""
    if text is None:
        return []
    if unit == "char":
        if len(text) < n:
            return []
        return list({text[i : i + n] for i in range(len(text) - n + 1)})
    w = text.split(" ")
    if len(w) < n:
        return []
    return list({" ".join(w[i : i + n]) for i in range(len(w) - n + 1)})


def release(df: DataFrame) -> None:
    """Unpersist the cached relations backing an operator result.

    ``ngram_jaccard_pairs`` / ``minhash_lsh_pairs`` persist their O(docs)
    signature relations before fanning them out to multiple join consumers;
    Spark has no hook to auto-release a cache when the consuming *action*
    finishes, so the caller owns the lifecycle: run the terminal action, then
    ``release(result)``. Harmless no-op for results without cached deps."""
    for dep in getattr(df, "_cached_deps", []):
        dep.unpersist()


# Module-global mirror of every persist the operators mark. Python-side
# DataFrame attributes (``_cached_deps``) do NOT survive .select()/.orderBy()
# wrappers (each returns a fresh Python object), so a caller holding a
# *derived* frame — e.g. the query catalog's aliased/ordered projections —
# cannot reach the persisted deps through the attribute. Harnesses that must
# drop-and-rearm caches between timed runs (bench.py) snapshot this registry
# around query construction instead; it is the authoritative record.
CACHE_REGISTRY: list[DataFrame] = []


def _register_cache(result: DataFrame, *deps: DataFrame) -> DataFrame:
    result._cached_deps = list(deps)  # type: ignore[attr-defined]
    CACHE_REGISTRY.extend(deps)
    return result


def _repartitioned(df: DataFrame, id_col: str) -> DataFrame:
    """Spread the per-doc UDF work across cores: a few-file source would
    otherwise pin the whole Python stage to a few tasks (r1 measured one
    thread burning 170 s on a single-file table). O(docs) shuffle — cheap.

    ``SPARK_GRAFT_UDF_PARTITIONS`` overrides the width (default
    defaultParallelism). Rationale: per-task Arrow/python-worker dispatch
    has a fixed cost, so at SMALL corpus sizes fewer, fatter tasks win —
    measured at sf0.1 best-of-6: simhash 1.20 s @32 → 0.67 s @8, minhash
    signatures 1.31 s → 0.75 s, with far less straggler variance (one
    preempted worker among 32 sets the stage wall time). bench.py sets 8
    for sub-64 MB inputs; at real scale the default saturates the cluster
    and each task carries thousands of documents anyway.

    Optimization-r13 note (examined, deliberately unchanged): this
    repartition exchanges FULL DOCUMENT TEXT by id. That was load-bearing
    when every consumer was a Python UDF pinned to a few-file scan; the
    hot consumers are pure-JVM expression pipelines now
    (``shingle_hash_arrays``, ``simhash``, ``span_hash_arrays``), so on a
    corpus whose scan is already wide (dense multi-row-group files at real
    scale) the exchange is a corpus-payload shuffle bought for nothing —
    guide §8's central sin. A partition-count gate
    (``df.rdd.getNumPartitions() >= parallelism`` → skip) was prototyped
    and REVERTED this round: ``getNumPartitions`` overcounts effective
    scan parallelism on row-group-sparse layouts (splits beyond row
    groups schedule empty tasks), and the isolating measurement — the
    shingle-hash stage over a 64-file/500k-doc corpus, forced vs skipped,
    alternating — returned only host-stall noise (77 vs 234 s on
    IDENTICAL forced runs; see OPTIMIZATION_r13.md). Until a quiet box
    can measure it, the known-good behavior stays; see "Not yet
    optimized".
    """
    import os  # noqa: PLC0415

    parallelism = int(
        os.environ.get("SPARK_GRAFT_UDF_PARTITIONS", "0")
    ) or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parallelism, F.col(id_col))


def _shuffle_partitions(df: DataFrame) -> int:
    """``spark.sql.shuffle.partitions`` as an int, falling back to the
    cluster's default parallelism when the conf is unset or non-numeric
    (ADVICE r12: some distributions set it to ``"auto"``, which would
    crash plan construction outside this repo's get_spark() sessions)."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return df.sparkSession.sparkContext.defaultParallelism


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Exact dedup via content digest: one row per distinct content with its
    keeper id (min id) and multiplicity. Shuffles on the 128-bit digest, not
    the document body. Pure JVM expressions — no Python."""
    content = F.lower(F.trim(F.col(text_col))) if normalize else F.col(text_col)
    return (
        df.select(F.col(id_col), F.md5(content).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Shingles
# ---------------------------------------------------------------------------


def word_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle) — Arrow
    batch generation, exploded to rows. Kept as the string-level view for
    tests / ad-hoc use; the dedup operators below go straight to hashes."""

    @pandas_udf("array<string>")
    def _shingles(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _shingle_set(t, n))

    return (
        _repartitioned(df, id_col)
        .select(F.col(id_col), F.explode(_shingles(F.col(text_col))).alias("shingle"))
    )


def shingle_hash_arrays(
    df: DataFrame,
    n: int = 3,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "word",
) -> DataFrame:
    """(id, shs array<long>) — distinct 64-bit shingle hashes per document,
    computed ENTIRELY in JVM expressions (split → slice/concat n-grams →
    xxhash64 → array_distinct), inside whole-stage codegen. Map-only; the
    array row is a compact fixed-cost representation downstream consumers
    explode.

    The previous Arrow-batch form paid ~1M Python ``hashlib.md5`` calls per
    run at sf0.1 (the dominant cost once the r4 warm-cache bench bias was
    fixed); hash VALUES never surface in any consumer's output — only set
    cardinalities do (jaccard counts) — so the JVM hash function needs no
    cross-engine twin. Collision risk at 64 bits over 1e6 shingles:
    ~1e12/2^65 ≈ 3e-8 per corpus.

    r11: the word path materializes ``split(text)`` in its OWN projection
    before the gram transform — interpreted higher-order lambdas get no
    common-subexpression elimination, so the inline form re-split the text
    once per gram (the same fanout the span-hash race measured at 2.4×;
    values are unchanged — same strings, same hashes).
    """
    base = _repartitioned(df, id_col)

    def _gram_hashes(grams: F.Column, k: F.Column) -> F.Column:
        hashed = F.array_distinct(
            F.transform(grams, lambda g: F.xxhash64(F.lit(seed), g))
        )
        # k < 1 (too-short doc) must yield [] — sequence(1, k) would DESCEND.
        # NULL text likewise yields [] (the pandas form returned []).
        return F.when(k >= 1, hashed).otherwise(F.array().cast("array<bigint>"))

    if unit == "char":
        text = F.col(text_col)  # plain attribute — nothing to materialize
        k = F.length(text) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), k), lambda i: F.substring(text, i, n)
        )
        return base.select(F.col(id_col), _gram_hashes(grams, k).alias("shs"))
    toks_df = base.select(
        F.col(id_col),
        # keeps empty tokens, like str.split(' ')
        F.split(F.col(text_col), " ", -1).alias("__toks"),
    )
    toks = F.col("__toks")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return toks_df.select(F.col(id_col), _gram_hashes(grams, k).alias("shs"))


# ---------------------------------------------------------------------------
# N-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
    unit: str = "word",
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard: explode shingle hashes,
    self-join on the hash (bucket join — only docs sharing a shingle meet),
    count intersection, |A∪B| = |A|+|B|−|A∩B|.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.

    A prefix-filtered AllPairs/PPJoin formulation (sort hashes, explode
    only the first |A|−⌈t·|A|⌉+1 per doc, verify candidates with
    array_intersect) was implemented and MEASURED WORSE at 100× bench
    scale (r6: 118 s vs 52 s for this bucket join): under a hash-value
    global order the prefixes still contain hot shingles, so candidate
    generation keeps its quadratic blowup while losing map-side partial
    aggregation (distinct beats count only with rare-first ordering), and
    verification re-shuffles kilobyte shingle arrays per candidate. The
    literature's df-ascending order fix needs a full df pass + per-doc
    array rebuild — reintroducing the exchange it is meant to save. The
    bucket join stays.

    Execution notes:
    - per-doc set sizes ride along as a column of the exploded relation
      (``n_sh``), so there is no separate sizes groupBy and no post-join
      size lookups — one self-join + one groupBy total;
    - the hashed-array relation is persisted before the fan-out into the two
      join sides (the two sides project different column names, so their
      exchanges are NOT deduped by ReuseExchange — measured in r1); callers
      owning a long-lived session should call :func:`release` on the result
      after their terminal action to drop the cache;
    - the self-join carries NO strategy hint: AQE picks broadcast when the
      exploded relation is small and shuffled-hash/sort-merge (plus skew
      splitting) when it isn't. A forced ``shuffle_hash`` hint measured
      2.5 s vs 0.4 s for the identical join at sf0.1 (r5) — the hint blocked
      AQE's broadcast choice; at 100 TB AQE falls back to the shuffled
      strategies by itself;
    - ``max_shingle_df`` drops shingles appearing in more than N docs — the
      standard stop-shingle cap for skew (a shingle shared by half the
      corpus contributes quadratic join output while carrying ~no near-dup
      signal). Changes results by definition; off by default.
    """
    arr = shingle_hash_arrays(
        df, n=n, seed=0, text_col=text_col, id_col=id_col, unit=unit
    )
    arr = arr.persist(StorageLevel.MEMORY_AND_DISK)
    sh = arr.select(
        F.col(id_col),
        F.size("shs").alias("n_sh"),
        F.explode("shs").alias("sh"),
    )
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").count().where(F.col("count") > max_shingle_df).select("sh")
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
        # sizes must reflect the capped sets, or jaccard denominators skew
        sh = sh.withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    out = jaccard_pairs_from_exploded(sh, threshold, id_col=id_col)
    return _register_cache(out, arr)


def jaccard_pairs_from_exploded(
    sh: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """The pair-generation tail of :func:`ngram_jaccard_pairs`, operating on
    an already-exploded ``(id, n_sh, sh)`` relation: self-join on the
    shingle hash, count intersections, Jaccard via
    |A∪B| = |A|+|B|−|A∩B|. Factored out so the bucketed shingle store
    (``sources/shingle_store.py``) can feed it a relation whose bucketing
    makes BOTH self-join exchanges vanish."""
    a = sh.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "sh")
    inter = (
        a.join(b, ["sh"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
    )
    return inter.select(
        "id_a",
        "id_b",
        (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias(
            "jaccard"
        ),
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature_arrays(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per document: (id, sig array<long>[num_hashes]), k-ordered.

    MAP-ONLY: the whole signature (k affine-mixed mins over the doc's
    distinct shingles, :func:`minhash_params`) is computed per document
    inside one Arrow batch — no shingle explode, no groupBy, zero shuffles,
    one md5 per shingle. This is the 100 TB shape: signature cost is linear
    in corpus size and embarrassingly parallel. Documents with no shingles
    (fewer than n words) are dropped, matching the relational form where
    they produce no rows to aggregate.
    """
    a_list, b_list = minhash_params(num_hashes)

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        a_col = np.array(a_list, dtype=np.uint64)[:, None]
        b_col = np.array(b_list, dtype=np.uint64)[:, None]
        mask63 = np.uint64((1 << 63) - 1)

        # Whole-batch vectorization: one flat hash array + segment-mins via
        # ``np.minimum.reduceat`` — the per-doc formulation paid ~100 µs of
        # numpy call overhead per document (r5 profile: half the signature
        # stage), which dominates at ~50 shingles/doc.
        sets = [_shingle_set(t, n) for t in texts]
        lens = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
        flat = [s for ss in sets for s in ss]
        if not flat:
            return pd.Series([None] * len(sets), dtype=object)
        hs = np.fromiter(
            (int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in flat),
            dtype=np.uint64,
            count=len(flat),
        )
        # uint64 arithmetic wraps mod 2^64 by definition; mask to 63 bits
        hk = (a_col * hs[None, :] + b_col) & mask63  # (k, N)
        nonempty = lens > 0
        offsets = np.zeros(len(sets), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        mins = np.minimum.reduceat(hk, offsets[nonempty], axis=1)  # (k, n_nonempty)
        out: list[list[int] | None] = [None] * len(sets)
        for j, i in enumerate(np.flatnonzero(nonempty)):
            out[i] = [int(x) for x in mins[:, j]]
        return pd.Series(out, dtype=object)

    return (
        _repartitioned(df, id_col)
        .select(F.col(id_col), _sig(F.col(text_col)).alias("sig"))
        .where(F.col("sig").isNotNull())
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature rows (id, k, min_hash) — row-form view of
    ``minhash_signature_arrays`` for consumers that want one row per hash."""
    arrays = minhash_signature_arrays(df, num_hashes, n, text_col, id_col)
    return arrays.select(
        F.col(id_col), F.posexplode("sig").alias("k", "min_hash")
    )


def band_rows_from_signatures(
    sig: DataFrame, band_size: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Explode a ``(id, sig array<long>)`` relation into LSH band rows
    ``(id, sig, band, band_sig)`` — num_bands rows per doc, signature
    riding along so downstream match counting never back-joins. This is
    also the STORAGE schema of the bucketed band store
    (``sources/band_store.py``). The band count is derived per row as
    ``size(sig) / band_size`` so the relation needs no side parameter."""
    return _band_rows(sig, band_size, id_col)


def _band_rows(sig: DataFrame, band_size: int, id_col: str) -> DataFrame:
    # NULL/short-sig guard (r8 ADVICE): size(NULL) is -1 under non-ANSI
    # mode, so an unfiltered NULL row would explode F.sequence(0, -2)'s
    # descending junk into phantom bands. minhash_signature_arrays never
    # emits them, but this is a public composition point
    # (band_rows_from_signatures) — enforce the precondition here.
    sig = sig.where(F.col("sig").isNotNull() & (F.size("sig") >= band_size))
    n_bands_expr = (F.size("sig") / band_size).cast("int")
    return sig.select(
        F.col(id_col),
        "sig",
        F.explode(F.sequence(F.lit(0), n_bands_expr - 1)).alias("band"),
    ).select(
        id_col,
        "sig",
        "band",
        F.array_join(
            F.transform(
                F.slice(F.col("sig"), F.col("band") * band_size + 1, band_size),
                lambda h: h.cast("string"),
            ),
            ",",
        ).alias("band_sig"),
    )


def lsh_match_counts_from_bands(
    bands: DataFrame, id_col: str = "doc_id", band_size: int = 4
) -> DataFrame:
    """The pair-generation tail of the LSH pipeline, operating on an
    already-exploded band relation ``(id, sig, band, band_sig)``:
    self-equi-join on (band, band_sig), raw integer signature match count
    per candidate pair. Factored out so the bucketed band store
    (``sources/band_store.py``) can feed it a relation whose bucketing
    makes BOTH self-join exchanges vanish — the Jaccard-store pattern
    (``jaccard_pairs_from_exploded``) applied to MinHash.

    Pair dedup (a pair agreeing on k bands meets k times) is the
    lowest-agreeing-band predicate (r11, same as the simhash join): emit
    only from the lowest band on which the signature slices agree —
    per-row array compares in codegen instead of a groupBy(id_a, id_b)
    exchange over the whole candidate-pair relation. ``band_size`` must
    match the relation's banding (callers thread it through).

    Mismatch guard (r12 ADVICE): a wrong ``band_size`` makes the
    lowest-band slice comparison silently drop valid candidate pairs, so
    band rows are checked against the claimed banding before the join —
    ``size(sig)`` must be a multiple of ``band_size``, ``band`` must index
    a real band (both integer ops, every row), and the stored ``band_sig``
    must equal the slice it claims to be (the exact ``_band_rows`` build
    expression — this is what catches a multiple-but-wrong band_size,
    e.g. 8 against a 4-banded relation). Raises on the first bad row
    instead of returning a wrong pair set.

    r13 (ADVICE r12): the string-rebuild comparison runs on BAND-0 ROWS
    ONLY — every document emits a band-0 row, and any wrong band_size
    changes band 0's slice, so per-document coverage is preserved while
    the per-row guard cost on the hottest LSH relation drops to the two
    integer ops for the other num_bands−1 of rows. Measured at 100× (band
    store serving, steady state): every-row guard 1.24–1.55 s vs 0.53–
    0.59 s unguarded on the banded join; band-0-only restores most of the
    gap (PERF.md r13)."""
    rebuilt = F.array_join(
        F.transform(
            F.slice(F.col("sig"), F.col("band") * band_size + 1, band_size),
            lambda h: h.cast("string"),
        ),
        ",",
    )
    banding_ok = (
        (F.size("sig") % band_size == 0)
        & (F.col("band") * band_size < F.size("sig"))
        & F.when(F.col("band") == 0, F.col("band_sig") == rebuilt).otherwise(
            F.lit(True)
        )
    )
    bands = bands.where(
        F.when(banding_ok, F.lit(True)).otherwise(
            F.raise_error(
                F.lit(
                    f"lsh_match_counts_from_bands: band rows do not match "
                    f"band_size={band_size} — thread the banding the "
                    f"relation was built with"
                )
            )
        )
    )
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band", "band_sig"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band", "band_sig"
    )
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    # guard band == 0: sequence(0, -1) would DESCEND
    lowest_band = F.when(F.col("band") == 0, F.lit(True)).otherwise(
        F.forall(
            F.sequence(F.lit(0), F.col("band") - 1),
            lambda j: F.slice(F.col("sig_a"), j * band_size + 1, band_size)
            != F.slice(F.col("sig_b"), j * band_size + 1, band_size),
        )
    )
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(lowest_band)
        .select("id_a", "id_b", matches.alias("__matches"))
    )


def _minhash_lsh_match_counts(
    df: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Band-join candidate pairs with RAW integer match counts:
    ``(pairs(id_a, id_b, __matches), sig)``. Shared core of
    :func:`minhash_lsh_pairs` (display rounding) and
    :func:`lsh_dedup_eval` (exact integer threshold compare). Does NOT
    register the ``sig`` persist — callers do, exactly once."""
    sig = minhash_signature_arrays(df, num_hashes, n, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands = _band_rows(sig, band_size, id_col)
    return lsh_match_counts_from_bands(bands, id_col, band_size=band_size), sig


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + LSH banding: docs agreeing on ALL hashes of any band become
    candidates; estimated Jaccard = fraction of equal minhashes.

    Returns (id_a, id_b, est_jaccard). The band join is the scale path: a
    self-equi-join on (band, band_signature) — no all-pairs comparison.
    ``est_jaccard`` is rounded to 4 dp FOR DISPLAY; threshold decisions
    downstream (``lsh_dedup_eval``) use the raw integer match count so the
    rounding can never flip a ``>= threshold`` compare (for num_hashes
    whose binary fractions need >4 decimals, e.g. 32 → 1/32 = 0.03125,
    the rounded value diverges from the exact fraction).

    The full signature rides along through the band join, so the estimated
    Jaccard is computed directly on the joined pair — no back-joins to a
    signature lookup (two fewer shuffles than the lookup formulation). The
    shuffle carries num_bands copies of each signature (num_hashes × 8 B per
    copy — for 16 hashes that's 128 B, comparable to the text's own keys);
    the multi-band duplicate pairs collapse in the final groupBy. The
    signature relation is persisted across its two join-side consumers —
    O(docs × num_hashes × 8 B), trivially cacheable at any scale."""
    raw, sig = _minhash_lsh_match_counts(
        df, num_hashes, band_size, n, text_col, id_col
    )
    out = raw.select(
        "id_a",
        "id_b",
        F.round(
            F.col("__matches") / F.lit(float(num_hashes)), 4
        ).alias("est_jaccard"),
    )
    return _register_cache(out, sig)


def lsh_dedup_eval(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_pairs: DataFrame | None = None,
    band_rows: DataFrame | None = None,
) -> DataFrame:
    """Measure-don't-guess harness for approximate dedup: precision/recall
    of the MinHash-LSH pairs (``est_jaccard >= threshold``) against EXACT
    n-gram Jaccard ground truth at the same threshold.

    Returns ONE row: (n_exact, n_lsh, true_pos, precision_e4, recall_e4) —
    the quality report a pipeline owner checks before trusting the
    approximate path on a new corpus (the standard LSH tuning loop: pick
    bands/rows, measure recall on a sample, then run approximate-only at
    full scale).

    Scale shape: both pair relations come from the operators' own bucket
    joins (never all-pairs); the comparison is a full outer join on the
    pair key — O(pairs), output-bounded. At 100 TB run this on a sampled
    corpus (``sampling.bernoulli_sample``) — ground truth costs the exact
    join; the measured recall transfers to the full corpus because LSH
    collision probability depends only on pair similarity, not corpus
    size. The threshold compare runs on the RAW integer match count
    (``matches / num_hashes >= threshold`` in double — the division is
    exact for power-of-two num_hashes and matches the oracle's unrounded
    ``AVG(...)`` for any count), never on the 4-dp display rounding of
    ``est_jaccard``, which for num_hashes like 32 (1/32 = 0.03125 →
    0.0313) could flip the compare relative to the oracle.
    """
    # ``exact_pairs`` / ``band_rows`` (r9): pre-built relations — e.g. the
    # bucketed shingle/band stores — replace the per-run ground-truth
    # shingle join and the signature recompute; the caller owns parameter
    # consistency (n/threshold and num_hashes/band_size must match).
    if exact_pairs is None:
        exact_pairs = ngram_jaccard_pairs(
            df, n=n, threshold=threshold, text_col=text_col, id_col=id_col
        )
    exact = exact_pairs.select("id_a", "id_b").withColumn("__e", F.lit(1))
    if band_rows is not None:
        raw = lsh_match_counts_from_bands(band_rows, id_col, band_size=band_size)
    else:
        raw, sig = _minhash_lsh_match_counts(
            df,
            num_hashes=num_hashes,
            band_size=band_size,
            n=n,
            text_col=text_col,
            id_col=id_col,
        )
        _register_cache(raw, sig)
    lsh = (
        raw.where(
            F.col("__matches") / F.lit(float(num_hashes)) >= F.lit(threshold)
        )
        .select("id_a", "id_b")
        .withColumn("__l", F.lit(1))
    )
    joined = exact.join(lsh, ["id_a", "id_b"], "full")
    return (
        joined.agg(
            F.count("__e").alias("n_exact"),
            F.count("__l").alias("n_lsh"),
            F.coalesce(
                F.sum(
                    (F.col("__e").isNotNull() & F.col("__l").isNotNull()).cast("long")
                ),
                F.lit(0),
            ).alias("true_pos"),
        )
        .select(
            "n_exact",
            "n_lsh",
            "true_pos",
            F.expr("true_pos * 10000 div greatest(n_lsh, 1)").alias("precision_e4"),
            F.expr("true_pos * 10000 div greatest(n_exact, 1)").alias("recall_e4"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash fingerprint over distinct tokens: bit j of the fingerprint is
    the sign of Σ_tokens (±1 by token-hash bit j). Hamming-close fingerprints
    ⇒ similar token sets. Returns (id, simhash as bigint).

    MAP-ONLY Arrow projection: per doc, hash the distinct tokens (32-bit md5
    prefix — the same ``('0x' || substr(md5(tok),1,8))::BIGINT`` family the
    oracle uses), accumulate the ±1 bit sums with one numpy broadcast, and
    take signs. No token explode, no ``bits``-wide aggregation, zero
    shuffles. Docs with no non-empty tokens are dropped (parity with the
    relational groupBy form). At scale prefer ``bit_count``-based banding on
    the fingerprint for candidate generation (same bucket-join pattern as
    LSH)."""
    if not 1 <= bits <= 62:
        # bit 63 would need the sign bit of the int64 fingerprint (the
        # (signs>=0)<<j assembly wraps negative); the relational 2**j form
        # differs at 63 too — keep the supported range explicit.
        raise ValueError(f"simhash bits must be in [1, 62], got {bits}")
    # Token-hash width must COVER the fingerprint width: with the 8-hex
    # (32-bit) md5 prefix, hash bits 32..61 are constant zero, so every
    # fingerprint bit ≥ 32 collapses to 0 and any band over those bits puts
    # the WHOLE corpus in one bucket (caught at 100× scale: the 60-bit
    # banded join's probe volume measured 313 B vs ~130 M with a real hash —
    # one straggler task ran 30+ min before the r10 fix). bits ≤ 32 keeps
    # the 8-hex prefix (the DuckDB-portable form the doc_simhash oracles
    # pin); bits ≤ 60 takes the 15-hex prefix (60 bits — the same
    # BIGINT-safe convention as the MinHash oracle family); 61-62 need the
    # 16-hex prefix masked into the non-negative int64 range (no portable
    # oracle — DuckDB BIGINT can't hold 64 hex bits).
    if bits <= 32:
        hex_chars, hash_mask = 8, (1 << 32) - 1
    elif bits <= 60:
        hex_chars, hash_mask = 15, (1 << 60) - 1
    else:
        hex_chars, hash_mask = 16, (1 << 62) - 1

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        js = np.arange(bits, dtype=np.int64)

        # Whole-batch vectorization (one flat hash array + per-doc segment
        # sums via ``np.add.reduceat``) — the per-doc numpy formulation paid
        # ~100 µs of call overhead per document, comparable to its compute.
        sets = [
            ({x for x in t.split(" ") if x} if t is not None else set())
            for t in texts
        ]
        lens = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
        flat = [x for s in sets for x in s]
        if not flat:
            return pd.Series([None] * len(sets), dtype=object)
        hs = np.fromiter(
            (
                int(hashlib.md5(x.encode()).hexdigest()[:hex_chars], 16)
                & hash_mask
                for x in flat
            ),
            dtype=np.int64,
            count=len(flat),
        )
        pm = ((hs[:, None] >> js) & 1) * 2 - 1  # (N, bits) of ±1
        nonempty = lens > 0
        offsets = np.zeros(len(sets), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        sums = np.add.reduceat(pm, offsets[nonempty], axis=0)  # (n_nonempty, bits)
        fps = ((sums >= 0).astype(np.int64) << js).sum(axis=1)
        out: list[int | None] = [None] * len(sets)
        for j, i in enumerate(np.flatnonzero(nonempty)):
            out[i] = int(fps[j])
        return pd.Series(out, dtype=object)

    return (
        _repartitioned(df, id_col)
        .select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))
        .where(F.col("simhash").isNotNull())
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation is the banded bucket join (the same pattern as
    MinHash LSH): split the ``bits``-wide fingerprint into ``n_bands``
    equal-width bands and self-join on (band, band_bits). By pigeonhole this
    is EXACT — not approximate — whenever ``max_hamming < n_bands``: a pair
    with ≤ max_hamming differing bits cannot differ in every band. The
    verification predicate is one JVM ``bit_count(a ^ b)`` — no array math.

    Returns (id_a, id_b, hamming), id_a < id_b. At 100 TB the join shuffles
    a (band_key, fingerprint) pair per band copy — 8 B × n_bands per doc —
    and only fingerprints sharing a band meet; no all-pairs stage exists.
    """
    sh = simhash(df, bits=bits, text_col=text_col, id_col=id_col)
    return hamming_pairs_from_fingerprints(
        sh, bits=bits, n_bands=n_bands, max_hamming=max_hamming, id_col=id_col
    )


def hamming_pairs_from_fingerprints(
    sh: DataFrame,
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """The banded Hamming self-join over an EXISTING fingerprint relation
    ``(id_col, simhash)`` — the candidate-generation core of
    ``simhash_near_dup_pairs``, factored out (r11) so callers can feed it
    derived fingerprint sets: store-served fingerprints, exact-dedup
    survivors, or fingerprint-cluster representatives (one row per
    DISTINCT fingerprint — the form that deletes the hamming-0 quadratic
    cluster mass from the join entirely)."""
    if bits % n_bands != 0:
        raise ValueError(f"bits={bits} must be divisible by n_bands={n_bands}")
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands>{max_hamming} for the "
            "banded join to be exhaustive (pigeonhole)"
        )
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = sh.select(
        F.col(id_col),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_key", F.expr(f"shiftright(simhash, band * {band_bits}) & {mask}")
    )
    # Pin the join's parallelism with an EXPLICIT repartition on the join
    # keys (AQE honors user repartition(n)): the band relation is tiny in
    # BYTES (≤12 B/row) but the self-join is QUADRATIC in CPU, and AQE's
    # size-based coalescing collapsed the post-aggregation exchange to ~3
    # partitions at 100× — 749 M probes on 3 cores, 91 s for a 13 s job
    # (r11 stage_probe measurement; same failure mode as the r6
    # parallelismFirst finding: size is the wrong proxy for dense compute).
    n_part = _shuffle_partitions(sh)
    bands = bands.repartition(n_part, "band", "band_key")
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "band", "band_key"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "band", "band_key"
    )
    # A close pair agreeing on several bands meets once per agreeing band.
    # Dedup by emitting each pair ONLY from its LOWEST agreeing band — a
    # per-row bitwise predicate (for every band j < this one, the two
    # fingerprints' j-th band keys must differ), which is n_bands−1 shift/
    # mask comparisons inside whole-stage codegen. This replaces the
    # previous groupBy(id_a, id_b) dedup, whose exchange shuffled the
    # ENTIRE close-pair relation (≥12.3 M hamming-0 pairs × agreeing-band
    # multiplicity at 100× on this corpus) just to drop duplicates.
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(lowest_agreeing_band_predicate(band_bits, n_bands))
        .select("id_a", "id_b", F.expr("bit_count(sim_a ^ sim_b)").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def lowest_agreeing_band_predicate(band_bits: int, n_bands: int) -> F.Column:
    """True iff the current ``band`` is the LOWEST band on which ``sim_a``
    and ``sim_b`` agree — for every band j < band, their j-th band keys
    must differ. n_bands−1 shift/mask comparisons in whole-stage codegen;
    used by the banded Hamming joins (here and in the simhash store) to
    emit each candidate pair exactly once WITHOUT a groupBy(id_a, id_b)
    exchange over the full close-pair relation."""
    mask = (1 << band_bits) - 1
    return functools.reduce(
        lambda acc, j: acc
        & F.when(
            F.col("band") > j,
            F.expr(
                f"(shiftright(sim_a, {j * band_bits}) & {mask}) != "
                f"(shiftright(sim_b, {j * band_bits}) & {mask})"
            ),
        ).otherwise(F.lit(True)),
        range(n_bands - 1),
        F.lit(True),
    )


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components) and canonical dedup
# ---------------------------------------------------------------------------


def _driver_union_find(edge_rows, spark):
    """Min-label union-find over a collected edge list. Result is identical
    to the distributed propagation (component id = min node id — a property
    of the component, independent of traversal order).

    The returned relation carries a BROADCAST hint (optimization r13): its
    exact row count is known HERE on the driver (≤ 2×driver_threshold nodes,
    two longs each — ≤ ~32 MB at the 1M-edge default), and every consumer
    joins it against a corpus-sized relation (``dedup_keep_canonical``'s
    anti-join). Unhinted, that join planned as SortMergeJoin — an Exchange +
    Sort over the SURVIVING CORPUS to avoid shuffling a relation we just
    held in a Python dict. The distributed CC path returns no hint (its
    result is corpus-scaled; AQE owns the choice there)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the min label is always the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    return F.broadcast(
        spark.createDataFrame(rows, "node_id long, component_id long")
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 50,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over an undirected pair relation — the step that
    turns near-dup PAIRS into dedup CLUSTERS. Returns (node_id, component_id)
    with component_id = min node id in the component, one row per node that
    appears in any edge.

    Iterative min-label propagation: each round every node takes the minimum
    label among itself and its neighbors; converges in O(graph diameter)
    rounds. Near-dup graphs are unions of small dense cliques (diameter ≲ 3),
    so a handful of rounds suffice; the loop is a driver-side *control* loop
    only — each round is one distributed join + aggregate, and
    ``localCheckpoint`` truncates the plan so lineage doesn't grow with
    iterations. Each round ends with a pointer-shortcut step
    (``comp(v) ← comp(comp(v))``, one label-to-label join) — the
    pointer-doubling trick that collapses adversarial long chains in
    O(log² n) rounds instead of O(n), at the cost of one extra O(nodes)
    join per round.

    Size-gated hybrid: the edge list is a DERIVED graph (candidate pairs),
    orders of magnitude smaller than the corpus. When it fits comfortably
    on the driver (≤ ``driver_threshold`` edges) a local union-find beats
    several distributed rounds of joins by seconds of pure scheduling; the
    distributed loop remains the path for genuinely large graphs. Both
    paths produce the identical (node, min-id component) labeling.

    The driver path collects via Arrow (``toPandas`` → two int64 numpy
    arrays, 16 bytes/edge) rather than ``collect()``'s per-edge ``Row``
    objects (~200+ bytes each incl. Python ints) — at the 1M-edge default
    threshold that is ~16 MB of driver memory instead of hundreds of MB,
    which is what makes the threshold safe to size by edge count alone.
    """
    # Size gate and collect in ONE job (optimization r13): probe with
    # limit(threshold+1) instead of a separate count() — if the probe comes
    # back with ≤ threshold rows the limit did not truncate and the frame IS
    # the full edge list, so the count job (a second full execution of the
    # pair lineage through the cache) disappears; if it comes back with
    # threshold+1 rows the graph is big and the distributed path below
    # proceeds (it never needed the exact count). At scale the probe is
    # CHEAPER than the count it replaces: CollectLimit stops scheduling
    # once threshold+1 rows are in hand, while count() always runs every
    # partition. Collected via Arrow (``toPandas`` → two int64 numpy
    # arrays, 16 bytes/edge ≈ 16 MB at the 1M default threshold).
    #
    # The probe runs UNPERSISTED (optimization r13, second pass): since the
    # one-job gate landed, the driver path consumes ``edges`` exactly once,
    # so the MEMORY_AND_DISK cache build inside the probe job (row
    # serialization into storage memory for a relation nobody reads again)
    # was pure overhead on the common path. The distributed path persists
    # AFTER the probe, before ``sym`` fans the relation out into its two
    # consuming selects — it re-executes the pair lineage once to populate
    # the cache, which is no worse than before: at >threshold edges the
    # probe's CollectLimit stopped early, so the old pre-probe persist had
    # only cached whatever partial prefix the probe happened to schedule.
    pdf = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .limit(driver_threshold + 1)
        .toPandas()
    )
    if len(pdf) <= driver_threshold:
        pairs = zip(pdf["src"].to_numpy().tolist(), pdf["dst"].to_numpy().tolist())
        return _driver_union_find(pairs, edges.sparkSession)
    del pdf
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    # seed: every node labeled with min(itself, its direct neighbors)
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("comp"))
        .select(F.col("src").alias("node"), "comp")
        .localCheckpoint()
    )
    sym = sym.localCheckpoint()
    edges.unpersist()
    for _ in range(max_iterations):
        neigh = (
            sym.join(labels, sym.dst == labels.node)
            .select(F.col("src").alias("node"), F.col("comp").alias("neigh_comp"))
        )
        merged = (
            labels.union(neigh.select("node", F.col("neigh_comp").alias("comp")))
            .groupBy("node")
            .agg(F.min("comp").alias("new_comp"))
        )
        progress = (
            labels.join(merged, "node")
            .agg(
                F.max((F.col("new_comp") < F.col("comp")).cast("int")).alias("chg")
            )
            .collect()[0]["chg"]
        )
        labels = labels.join(merged, "node").select(
            "node", F.col("new_comp").alias("comp")
        )
        # pointer shortcut: jump to the label's own label (comp values are
        # node ids, so they resolve in the same relation)
        l2 = labels.select(
            F.col("node").alias("__n2"), F.col("comp").alias("__c2")
        )
        labels = (
            labels.join(l2, labels.comp == F.col("__n2"), "left")
            .select("node", F.coalesce("__c2", "comp").alias("comp"))
            .localCheckpoint()
        )
        if not progress:
            break
    return labels.select(F.col("node").alias("node_id"), F.col("comp").alias("component_id"))


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Drop every near-duplicate except the canonical (min-id) member of its
    cluster: pairs → connected components → anti-join the non-canonical ids.
    The anti-join side is O(docs-in-any-pair); join strategy is left to
    AQE — it broadcasts when the dup set is small and falls back to a
    shuffled anti-join when the dup rate is high (30% of a 100 TB corpus
    must NOT be force-broadcast)."""
    comps = connected_components(pairs, src_col, dst_col)
    losers = comps.where(F.col("node_id") != F.col("component_id")).select(
        F.col("node_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Duplicated-span removal (line/paragraph-level dedup)
# ---------------------------------------------------------------------------


def dedup_spans(
    df: DataFrame,
    span_tokens: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level duplicated-span removal, the C4/CCNet "line dedup" pattern
    (C4 drops any three-sentence span seen more than once; CCNet dedups on
    paragraph hashes): chunk each document into consecutive non-overlapping
    ``span_tokens``-word spans, drop every span that occurs in >= ``min_docs``
    distinct documents (boilerplate: headers, navigation, license blurbs),
    and reassemble the survivors in order.

    Pure built-in pipeline (no Python in the hot path): ``split`` →
    ``transform(sequence(...))`` builds the span array map-side, ``posexplode``
    fans out to one row per span, the corpus-wide occurrence count is a
    hash-aggregate on the span's md5 (fixed-width shuffle key — document text
    never shuffles beyond its own span rows), and documents reassemble with a
    ``sort_array(collect_list(struct(pos, span)))`` group — partial aggregation
    applies on the count side, and the rebuild shuffle is keyed by doc id.

    Returns (id, text_clean, n_spans_kept); documents whose every span was
    boilerplate drop out entirely (same convention as quality filtering).
    """
    toks = F.split(F.col(text_col), " ")
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.when(F.size(toks) > 0, F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * span_tokens + 1, span_tokens)
        ),
    )).otherwise(F.array().cast("array<string>"))
    exploded = df.select(
        F.col(id_col), F.posexplode(spans).alias("pos", "span")
    ).withColumn("span_h", F.md5(F.col("span")))
    counts = exploded.groupBy("span_h").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    kept = (
        exploded.join(counts.where(F.col("n_docs") < min_docs), "span_h")
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "span"))).alias("__ps"),
            F.count(F.lit(1)).alias("n_spans_kept"),
        )
    )
    return kept.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.transform(F.col("__ps"), lambda s: s.getField("span"))
        ).alias("text_clean"),
        "n_spans_kept",
    )


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Near-dup dedup keeping the BEST-scoring member of each cluster
    (highest ``score_col``, ties to the higher id) — the production
    refinement of ``dedup_keep_canonical``: when duplicates differ (truncated
    copies, boilerplate-injected mirrors), you keep the longest/highest-
    quality version, not the lowest id.

    Same shape as the canonical variant plus one aggregate: components →
    join member scores (the component relation is O(docs-in-any-pair), far
    smaller than the corpus) → per-cluster ``max_by`` picks winners → losers
    anti-join the corpus. Every join is keyed and dimension-sized except the
    final anti-join, which AQE broadcasts when the dup set is small."""
    comps = connected_components(pairs, src_col, dst_col)
    members = comps.join(
        df.select(F.col(id_col).alias("node_id"), F.col(score_col).alias("__s")),
        "node_id",
    )
    winners = members.groupBy("component_id").agg(
        F.max_by(
            F.col("node_id"), F.struct(F.col("__s"), F.col("node_id"))
        ).alias("__winner")
    )
    losers = (
        members.join(winners, "component_id")
        .where(F.col("node_id") != F.col("__winner"))
        .select(F.col("node_id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold_e4: int = 8000,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "word",
    exploded: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by max-containment: ``inter / min(|A|, |B|)`` —
    the asymmetric-duplication detector symmetric Jaccard misses: a short
    document wholly embedded in a long one (quote farms, truncated mirrors,
    article+boilerplate wrappers) has low Jaccard (union is large) but
    containment ≈ 1. RefinedWeb/CCNet-style pipelines run BOTH signals.

    Same execution shape as :func:`ngram_jaccard_pairs` (shingle-hash bucket
    self-join, shuffled-hash, set sizes riding the exploded relation); the
    score is kept in exact integer basis points (``inter * 1e4 div min``),
    so thresholds and outputs are engine-exact. Returns
    (id_a, id_b, inter, n_a, n_b, containment_e4), id_a < id_b.

    ``exploded`` (r9): a pre-built ``(id, n_sh, sh)`` relation — the
    bucketed shingle store — replaces the per-run shingling AND both
    self-join exchanges (the caller owns parameter consistency).
    """
    if exploded is not None:
        arr = None
        sh = exploded.select(F.col(id_col), "n_sh", "sh")
    else:
        arr = shingle_hash_arrays(
            df, n=n, seed=0, text_col=text_col, id_col=id_col, unit=unit
        ).persist(StorageLevel.MEMORY_AND_DISK)
        sh = arr.select(
            F.col(id_col),
            F.size("shs").alias("n_sh"),
            F.explode("shs").alias("sh"),
        )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "sh")
    inter = (
        a.join(b, ["sh"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
    )
    out = inter.withColumn(
        "containment_e4",
        F.expr("inter * 10000L div least(n_a, n_b)"),
    ).where(F.col("containment_e4") >= threshold_e4)
    return _register_cache(out, arr) if arr is not None else out


def containment_pairs_capped(
    df: DataFrame,
    n: int = 3,
    threshold_e4: int = 8000,
    max_shingle_df: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "word",
    exploded: DataFrame | None = None,
) -> DataFrame:
    """:func:`containment_pairs` over DF-CAPPED shingles — the bounded-state
    scale form (r12, verdict task 1). Shingles appearing in more than
    ``max_shingle_df`` documents are dropped BEFORE pair generation and
    containment is computed over the capped sets (sizes recomputed, so the
    scores are self-consistent — this is its own query semantics with its
    own oracle, not an approximation of the uncapped one).

    Why it exists: the uncapped pair aggregate's state is one entry per
    candidate pair, and the r10 1000× accounting measured that state
    spilling 415 GiB on a 19 GiB shuffle — volume-inherent, no plan fix.
    The candidate mass is dominated by NOISE pairs sharing a single mid-df
    shingle (measured at sf0.1: 1.13 M distinct candidate pairs for a
    256-pair answer, mean shared shingles per candidate 1.12; shingles
    with df > 10 carry 61% of the pair state while df maxes at 25). The
    cap deletes exactly that reducible mass — the same discipline as the
    r11 simhash rep-pairs form, applied to the containment family.

    Plan shape (differs from the uncapped operator deliberately): sizes
    are joined AFTER the pair aggregate, oracle-style, instead of riding
    the exploded relation — recomputing ``n_sh`` post-cap with a window
    would repartition the relation by id and destroy the shingle store's
    (sh)-bucketing right before the self-join that needs it. With a store
    serving, the df pass, the anti-join against the hot set, and both
    self-join sides all stay on the bucket layout; the post-agg size joins
    touch only the ~0.4 pair rows per candidate-row aggregate output.

    Two 1000×-measured refinements (r12 probe, /tmp/sf100):
    - the HOT SET is persisted: the plan consumes it on four legs (both
      self-join sides + both size relations), and uncached each leg
      re-runs the full-store frequency aggregate — 4× the scan CPU for a
      relation that is small by construction (shingles hotter than the
      cap). Caller releases via :func:`release`/the bench rearm registry.
    - the pair-aggregate exchange is PINNED to 2× the session's shuffle
      partitions: AQE's byte-based coalesce folded the 436 M-pair
      aggregate to 43 tasks (state is row-driven, not byte-driven — the
      session's parallelismFirst note) and each task spilled; map-side
      partials combine almost nothing here anyway (1.12 candidate rows
      per distinct pair at sf0.1), so the explicit repartition costs the
      partial combine nothing and buys per-task state that fits. Same
      discipline as the hamming-join repartition pin.
    """
    counted, deps = _df_capped_pair_counts(
        df, n, max_shingle_df, text_col, id_col, unit, exploded
    )
    out = (
        counted.withColumn(
            "containment_e4", F.expr("inter * 10000L div least(n_a, n_b)")
        )
        .where(F.col("containment_e4") >= threshold_e4)
        .select("id_a", "id_b", "inter", "n_a", "n_b", "containment_e4")
    )
    return _register_cache(out, *deps)


def ngram_jaccard_pairs_capped(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "word",
    exploded: DataFrame | None = None,
) -> DataFrame:
    """:func:`ngram_jaccard_pairs` over DF-CAPPED shingle sets — the
    Jaccard sibling of :func:`containment_pairs_capped`, sharing its
    bounded-state pair pipeline (r12). Motivation is identical and
    measured: the uncapped Jaccard pair aggregate spilled 403 GiB at 1000×
    on this box (same noise-pair candidate mass — the two queries share
    the candidate relation, only the score differs). Returns
    (id_a, id_b, jaccard) over the capped sets with jaccard ≥ threshold —
    its own query semantics with its own oracle, like every capped form.
    """
    counted, deps = _df_capped_pair_counts(
        df, n, max_shingle_df, text_col, id_col, unit, exploded
    )
    out = (
        counted.withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _register_cache(out, *deps)


def _df_capped_pair_counts(
    df: DataFrame,
    n: int,
    max_shingle_df: int,
    text_col: str,
    id_col: str,
    unit: str,
    exploded: DataFrame | None,
) -> tuple[DataFrame, list[DataFrame]]:
    """Shared bounded-state pair pipeline of the capped containment /
    Jaccard forms: df-cap the shingles, self-join, count intersections,
    attach post-cap sizes. Returns ``((id_a, id_b, inter, n_a, n_b),
    persisted deps)`` — callers project their score, filter, and register
    the deps. Every plan decision here is 1000×-measured (see
    :func:`containment_pairs_capped`'s docstring)."""
    if exploded is not None:
        arr = None
        sh = exploded.select(F.col(id_col), "sh")
    else:
        arr = shingle_hash_arrays(
            df, n=n, seed=0, text_col=text_col, id_col=id_col, unit=unit
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # explode_outer + generated-column null filter, NOT plain explode:
        # InferFiltersFromGenerate would inline the full shingle expression
        # below the exchange (the r11 span-family trap)
        sh = arr.select(
            F.col(id_col), F.explode_outer("shs").alias("sh")
        ).where(F.col("sh").isNotNull())
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > max_shingle_df)
        .select("sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    capped = sh.join(hot, "sh", "left_anti")
    sizes = capped.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = capped.select(F.col(id_col).alias("id_a"), "sh")
    b = capped.select(F.col(id_col).alias("id_b"), "sh")
    n_agg = 2 * _shuffle_partitions(sh)
    inter = (
        a.join(b, ["sh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .repartition(n_agg, "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # shuffle_hash hints on the size sides: Catalyst inherits a multi-GB
    # size estimate for the aggregate (child-scaled), so the planner AND
    # AQE's localMapThreshold conversion both leave these joins SMJ — and
    # each SMJ sorts the full candidate-pair relation (r12 1000× probe:
    # two 12 GiB sort spills for build sides that are ~1 MB/partition).
    # The hint costs a possible AQE broadcast at tiny SF (sub-second
    # relation); measured neutral at sf0.1.
    counted = inter.join(
        sizes.select(
            F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
        ).hint("shuffle_hash"),
        "id_a",
    ).join(
        sizes.select(
            F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
        ).hint("shuffle_hash"),
        "id_b",
    )
    deps = [hot] if arr is None else [hot, arr]
    return counted, deps


def rare_term_pairs(
    df: DataFrame,
    n: int = 3,
    max_df: int = 10,
    top_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocking for record linkage / near-dup candidate generation through
    RARE attributes: documents sharing low-document-frequency word
    ``n``-grams are paired and scored by an integer inverse-df weight
    (``1e6 div df²`` per shared gram) — the classic "block on distinctive
    attributes" pattern (ids, rare phrases, boilerplate-free quotes). On a
    natural corpus single rare tokens work too; n-grams keep the attribute
    distinctive even when the vocabulary is small.

    The df cap is the scale guarantee: an attribute with df ≤ ``max_df``
    yields at most df·(df−1)/2 pairs, so join fan-out is bounded per
    attribute by construction — common phrases can NEVER explode the join
    (they're filtered before it, not after). Scores are pure integers:
    engine-exact ranking. Returns the ``top_n`` pairs by (score, id_a, id_b).
    """
    pairs_rel = word_shingles(df, n=n, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("shingle").alias("tok")
    )
    dfreq = pairs_rel.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    rare = dfreq.where((F.col("df") >= 2) & (F.col("df") <= max_df)).withColumn(
        "w", F.expr("1000000 div (df * df)")
    )
    keyed = pairs_rel.join(F.broadcast(rare), "tok")
    a = keyed.select(F.col(id_col).alias("id_a"), "tok", "w")
    b = keyed.select(F.col(id_col).alias("id_b"), "tok")
    scored = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum("w").alias("score"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
    )
    w_rank = Window.orderBy(F.col("score").desc(), F.col("id_a"), F.col("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= top_n)
        .select("id_a", "id_b", "shared_terms", "score", "rank")
    )


def triangle_count(
    pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b"
) -> DataFrame:
    """Count triangles in an undirected edge set — the clique-density signal
    for a near-dup graph (LSH/Jaccard edge sets over true duplicate groups
    are near-cliques; sparse triangle counts suggest chained false
    positives instead). Standard distributed algorithm: orient every edge
    low→high id, then two hash-joins find wedges (a→b, b→c) and close them
    against a→c — join fan-out is bounded by per-node degree, never
    all-pairs, and only the (distinct, oriented) edge relation shuffles.
    Returns one row: (n_edges, n_wedges, n_triangles).

    The oriented edge relation is PERSISTED (r9): the plan consumes it
    five times (ab/bc/ac projections + the edge count + the wedge join's
    both sides), and when ``pairs`` is an expensive derivation (the
    3-gram Jaccard self-join) each un-cached consumption re-executes it —
    the r9 1000× sweep measured the uncached form at 153 s/100× with the
    pair pipeline as the whole cost. O(near-dup pairs) rows, tiny vs the
    corpus; caller releases via ``release()``/bench rearm registry."""
    e = (
        pairs.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = ab.join(bc, "b").where(F.col("a") < F.col("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = wedges.join(ac, ["a", "c"])
    return _register_cache(
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(wedges.agg(F.count(F.lit(1)).alias("n_wedges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles"))),
        e,
    )


# ---------------------------------------------------------------------------
# Incremental dedup against a standing digest store
# ---------------------------------------------------------------------------


def incremental_exact_dedup(
    new_docs: DataFrame,
    history_digests: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest_col: str = "digest",
) -> tuple[DataFrame, DataFrame]:
    """Dedupe a NEW ingest batch against everything ever accepted — the
    standing-store pattern of a continuously-crawling pipeline, where
    "have we seen this document?" must not rescan the corpus.

    ``history_digests`` is the store: one ``digest`` (sha256 hex) per
    previously-accepted document — 64 bytes/doc regardless of document
    size, the ONLY state the pipeline keeps. Returns ``(accepted,
    new_digests)``:

    - ``accepted``: new-batch rows surviving (a) within-batch exact dedup
      (lowest id per digest wins) and (b) the anti-join against history;
    - ``new_digests``: the accepted batch's digests — append/merge into the
      store; next batch's cost is again ∝ batch size, not corpus size
      (the same contract as ``maintenance.merge_upsert``).

    Scale shape (r11 rewrite): ALL dedup logic runs on the narrow
    ``(id, digest)`` projection — one ~72 B/row shuffle for the
    within-batch groupBy, one anti-join against the store on the digest —
    and the batch's text re-enters only as the FINAL map-side semi-join
    filter on the id set (AQE broadcasts it: the surviving ids of a batch
    are 8 B each). The r11 100× probe caught the previous form shuffling
    the full text rows through the within-batch semi-join — ~60× the
    bytes for the same answer. The documents' text never shuffles.
    """
    ids = new_docs.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias(digest_col)
    )
    keep = ids.groupBy(digest_col).agg(F.min(id_col).alias(id_col))
    if history_digests is not None:
        keep = keep.join(
            history_digests.select(digest_col), digest_col, "left_anti"
        )
    accepted = new_docs.join(keep.select(id_col), id_col, "left_semi")
    new_digests = keep.select(digest_col)
    return accepted, new_digests


def minhash_bands(
    df: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_sig) — the LSH band relation, num_bands fixed-width
    rows per document (docs with no shingles produce none). This is both a
    join key for candidate generation and the STORE format for incremental
    near-dup (:func:`incremental_minhash_dedup`)."""
    sig = minhash_signature_arrays(df, num_hashes, n, text_col, id_col)
    return _band_rows(sig, band_size, id_col).select(id_col, "band", "band_sig")


def incremental_minhash_dedup(
    new_docs: DataFrame,
    band_store: DataFrame | None,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_bands: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """NEAR-dup companion of :func:`incremental_exact_dedup`: dedupe a new
    ingest batch against the standing LSH band store of everything already
    accepted. The store holds (band, band_sig) — num_bands fixed-width rows
    per accepted doc, no text, no signatures of rejected docs.

    A batch doc is dropped when any of its bands collides with the store
    (≈ near-dup of an accepted historical doc at the LSH operating point)
    or with a LOWER-id batch doc. The within-batch rule is the greedy
    one-pass approximation — doc b is dropped even if the lower-id doc a
    it collides with was itself dropped against history; this keeps the
    batch pass ONE band self-join (transitive-closure semantics would need
    the connected-components round loop) and errs toward dropping, never
    toward accepting a near-dup. Returns (accepted, new_bands); append
    ``new_bands`` to the store — update cost ∝ batch, like the exact form.

    ``batch_bands`` (optional) short-circuits the per-run signature
    computation: a precomputed ``(id, band, band_sig)`` relation for the
    batch — e.g. served from the bucketed band store
    (``sources/band_store.py``) when the batch was already ingested there.
    The caller owns its parameter consistency (num_hashes/band_size/n must
    match the store's, as the manifest guarantees).
    """
    if batch_bands is not None:
        bands = batch_bands.select(id_col, "band", "band_sig")
    else:
        bands = minhash_bands(new_docs, num_hashes, band_size, n, text_col, id_col)
    bands = bands.persist(StorageLevel.MEMORY_AND_DISK)
    dropped = bands.join(
        bands.select(F.col(id_col).alias("__lower"), "band", "band_sig"),
        ["band", "band_sig"],
    ).where(F.col("__lower") < F.col(id_col)).select(id_col)
    if band_store is not None:
        dropped = dropped.union(
            bands.join(
                band_store.select("band", "band_sig"), ["band", "band_sig"], "left_semi"
            ).select(id_col)
        )
    accepted = new_docs.join(dropped.distinct(), id_col, "left_anti")
    new_bands = bands.join(
        accepted.select(id_col), id_col, "left_semi"
    ).select("band", "band_sig")
    return _register_cache(accepted, bands), new_bands


# ---------------------------------------------------------------------------
# Exact substring duplication at span granularity (Lee et al. 2021 family)
# ---------------------------------------------------------------------------


def span_hash_arrays(
    df: DataFrame,
    span_words: int = 15,
    stride: int = 1,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, spans array<long>) — distinct 64-bit hashes of every
    ``span_words``-word window starting at token positions 1, 1+stride, …
    The span-granularity sibling of :func:`shingle_hash_arrays`: entirely
    JVM expressions (split → slice/concat → xxhash64 → array_distinct)
    inside whole-stage codegen, map-only.

    ``stride`` trades exactness for cost at scale: stride=1 is the exact
    substring-dedup form (every window), stride=s cuts span volume s× and
    still catches duplicated regions ≥ span_words+s-1 words. Hash values
    never surface in consumer output (only per-doc counts do), so no
    cross-engine hash twin is needed — the DuckDB oracle groups on the raw
    span string and yields identical counts (64-bit collision odds ~1e-8
    per corpus, same argument as shingle_hash_arrays).

    Formulation (r11 race at 100×, /tmp/sf10): hash each WORD once into a
    per-doc long array, then each span hash is xxhash64 over span_words
    ``element_at`` lookups — 3.2 s vs 17.5 s for the naive
    split→slice→concat_ws-per-span form. Two effects, both measured:
    (1) the inline ``split(text)`` subtree is re-evaluated per span inside
    an interpreted higher-order lambda (materializing tokens in a prior
    projection alone: 17.5→7.3 s — the same expression-tree-fanout killer
    as the r5 per-(shingle, seed) md5 finding, module header); (2) hashing
    span_words pre-hashed longs beats allocating+hashing a ~100-byte span
    string per position (7.3→3.2 s). The word-hash and span arrays are
    separate PROJECTIONS so CollapseProject cannot inline the word-hash
    transform back into the per-span lambda (non-cheap expr referenced
    many times — verified by the race timings).
    """
    if stride < 1:
        # stride=0 would reach F.sequence(1, k, 0) and die at runtime with
        # an opaque illegal-sequence-step error (r12 ADVICE)
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = (
        _repartitioned(df, id_col)
        .select(F.col(id_col), F.split(F.col(text_col), " ", -1).alias("__toks"))
        .select(
            F.col(id_col),
            F.transform(
                F.col("__toks"), lambda w: F.xxhash64(F.lit(seed), w)
            ).alias("__wh"),
        )
        .withColumn("__k", F.size("__wh") - (span_words - 1))
    )
    starts = F.sequence(F.lit(1), F.col("__k"), F.lit(stride))
    hashed = F.array_distinct(
        F.transform(
            starts,
            lambda i: F.xxhash64(
                *[F.element_at(F.col("__wh"), i + j) for j in range(span_words)]
            ),
        )
    )
    # __k < 1 (too-short doc) must yield [] — sequence(1, k) would DESCEND.
    spans = F.when(F.col("__k") >= 1, hashed).otherwise(
        F.array().cast("array<bigint>")
    )
    return toks.select(F.col(id_col), spans.alias("spans"))


def duplicated_span_stats(
    df: DataFrame,
    span_words: int = 15,
    stride: int = 1,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    exploded: DataFrame | None = None,
    skew_safe: bool = False,
) -> DataFrame:
    """Per-document duplicated-span statistics — the detection half of
    exact SUBSTRING dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better"): a span is duplicated when it appears in
    ≥ ``min_docs`` distinct documents; each doc reports how much of it is
    made of duplicated spans.

    Output: (id, n_spans, n_dup_spans, dup_permyriad) for EVERY input doc
    (short docs get zeros); dup_permyriad = n_dup_spans·10⁴ DIV n_spans —
    integer floor division, exact in both engines (no float rounding
    divergence).

    Shape at scale (r11 race, 100×): the exploded (id, span-hash) relation
    is consumed ONCE — a count window over the span-hash partition flags
    each row's corpus frequency in the same pass that feeds the per-doc
    rollup (one wide shuffle on sp + one narrow on id; 10.8–12.7 s cold vs
    16–24 s for groupBy-dupes + flag-join formulations, whose two
    consumers either race to fill a cache or recompute the span hashing).
    Skew note: a boilerplate span shared by M docs puts M rows in one
    window group — window partitions CANNOT be split, so one straggler
    task carries the whole hot span. ``skew_safe=True`` (r12, verdict
    task 3) switches to the groupBy+flag-join variant: the frequency pass
    is a hash aggregate (map-side partials absorb the hot key — each task
    emits one partial row per span) and the flag join's hot probe key is
    either broadcast (no probe shuffle at all) or AQE-skew-split; the
    cost is a second consumption of the exploded relation (persisted on
    the raw path — caller releases via :func:`release`; a bucketed store
    re-scan is cheap). On near-dup-shaped corpora group sizes are
    cluster-sized and the single-consumption window form dominates — the
    measured crossover lives in PERF.md (r12). Text never enters any
    shuffle in either form.

    explode_OUTER + post-generate null filter, NOT plain explode: plain
    explode lets InferFiltersFromGenerate derive size(spans) > 0 and push
    it below the repartition with the WHOLE span expression
    alias-substituted — each of the span_words element_at args then
    re-evaluates the full word-hash transform, O(W·n·W) per doc in the
    scan stage (measured: a 100× run that never finishes vs ~4 s).
    explode_outer infers nothing; the residual filter runs on the
    GENERATED column, which cannot be pushed below the Generate.

    ``exploded`` (optional): a pre-exploded ``(id, n_sh, sh)`` span-hash
    relation — a span IS a word shingle at n=span_words, so the bucketed
    shingle store (``sources/shingle_store.py`` with ``n=span_words``)
    serves this operator with ZERO new storage code: its distinct-per-doc
    hashes yield identical counts (the hash function differs from the raw
    path's word-hash composition, but hash values never surface — only
    per-doc counts do), and its CLUSTERED BY (sh) bucketing feeds the
    count window without re-hashing the corpus. Requires stride == 1
    (the store explodes every position), and ``df`` must be the store's
    FULL corpus: the window counts span frequencies store-wide, so a
    filtered ``df`` subset would inherit frequencies (and inflated
    ``n_dup_spans``) from documents it no longer contains — semi-join the
    exploded relation on ``df``'s ids first if subset semantics are wanted
    (r12 ADVICE; all in-repo callers pass the full corpus).
    """
    if exploded is not None:
        if stride != 1:
            raise ValueError("a span store serves stride=1 only")
        spans = exploded.select(F.col(id_col), F.col("sh").alias("sp"))
    else:
        spans = (
            span_hash_arrays(
                df, span_words=span_words, stride=stride, text_col=text_col,
                id_col=id_col,
            )
            .select(F.col(id_col), F.explode_outer("spans").alias("sp"))
            .where(F.col("sp").isNotNull())
        )
    cached: DataFrame | None = None
    if skew_safe:
        # groupBy + flag-join: skew-immune (see docstring) at the cost of a
        # second consumption of the exploded relation.
        if exploded is None:
            spans = spans.persist(StorageLevel.MEMORY_AND_DISK)
            cached = spans
        dup = (
            spans.groupBy("sp")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") >= min_docs)
            .select("sp", F.lit(1).alias("__dup"))
        )
        per_doc = (
            spans.join(dup, "sp", "left")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_spans"),
                F.count("__dup").alias("n_dup_spans"),
            )
        )
    else:
        # per-doc distinct ⇒ window count over sp = #docs carrying the span
        ndocs = F.count(F.lit(1)).over(Window.partitionBy("sp"))
        per_doc = (
            spans.withColumn("ndocs", ndocs)
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_spans"),
                F.count_if(F.col("ndocs") >= min_docs).alias("n_dup_spans"),
            )
        )
    out = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_spans"), F.lit(0).cast("long")).alias("n_spans"),
            F.coalesce(F.col("n_dup_spans"), F.lit(0).cast("long")).alias(
                "n_dup_spans"
            ),
        )
        .withColumn(
            "dup_permyriad",
            F.when(
                F.col("n_spans") > 0,
                F.expr("n_dup_spans * 10000 DIV n_spans"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    return _register_cache(out, cached) if cached is not None else out


def span_dedup(
    df: DataFrame,
    max_permyriad: int = 2000,
    span_words: int = 15,
    stride: int = 1,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    exploded: DataFrame | None = None,
) -> DataFrame:
    """Drop documents whose duplicated-span share exceeds ``max_permyriad``
    (default 20%) — the document-level removal policy over
    :func:`duplicated_span_stats` (the RefinedWeb-style policy: rather than
    cutting duplicated bytes out of documents, drop documents that are
    mostly duplicated material). Returns survivors with original schema;
    the anti-join's small side is the flagged-id set.
    """
    stats = duplicated_span_stats(
        df,
        span_words=span_words,
        stride=stride,
        min_docs=min_docs,
        text_col=text_col,
        id_col=id_col,
        exploded=exploded,
    )
    bad = stats.where(F.col("dup_permyriad") > max_permyriad).select(id_col)
    return df.join(bad, id_col, "left_anti")
