"""Deterministic sampling operators for training-data curation.

Random sampling via ``F.rand`` is irreproducible across engines, partition
layouts, and re-runs; these operators derive sampling decisions from a
portable keyed hash (md5 of ``seed:id``) instead, so a sample is a pure
function of (row identity, seed) — stable under repartitioning, retries,
incremental reprocessing, and exactly reproducible in the DuckDB oracles.

- ``hash_sample``: Bernoulli p-sampling — a per-row predicate, fully pushed
  into the scan (no shuffle at all).
- ``stratified_sample``: exact k-per-stratum — one window over the stratum
  key; the shuffle is keyed by stratum and each partition streams, so skewed
  strata cost sort time, not memory. At 100 TB prefer hash_sample when an
  *approximate* per-stratum rate suffices (zero-shuffle); use the exact
  variant when the contract is "exactly k per class" (eval sets, balanced
  fine-tuning mixes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_hash(id_col, seed: int):
    """Portable 60-bit sampling hash of a row id (same md5 family as
    operators/dedup): ``int(md5(seed || ':' || id)[:15], 16)``."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose sampling-hash bucket
    (mod 10⁶) falls below ``fraction``. Map-only — the predicate evaluates
    inside the scan stage; complementary seeds give disjoint-ish splits
    (train/val carve-outs) without any shuffle or state."""
    cut = int(fraction * 1_000_000)
    return df.where(sample_hash(id_col, seed) % 1_000_000 < cut)


def quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int = 4,
    approx: bool = False,
) -> DataFrame:
    """Assign each row a quantile bucket (1..n) of ``col`` WITHOUT a global
    sort: one aggregate computes the n−1 thresholds (exact ``percentile``,
    or ``percentile_approx`` at scale), then a broadcast join + map-side
    comparison buckets every row. This is the 100 TB replacement for
    ``NTILE(n) OVER (ORDER BY col)`` — whose total order forces a single
    partition — when bucket boundaries (not exact equal counts) are the
    contract: ties and interpolation land boundary rows differently than
    NTILE's row-number split. Used for percentile-band filtering (e.g. drop
    the bottom length decile of a corpus)."""
    ps = [i / n_buckets for i in range(1, n_buckets)]
    fn = F.percentile_approx if approx else F.percentile
    th = df.agg(
        fn(F.col(col), F.array(*[F.lit(p) for p in ps])).alias("__th")
    )
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + (F.col(col) > F.element_at("__th", i + 1)).cast("int")
    return df.crossJoin(F.broadcast(th)).withColumn("bucket", bucket).drop("__th")


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by sampling-hash
    order (deterministic "random"): ``row_number`` over the stratum window
    ordered by (hash, id). One shuffle keyed by the strata columns."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_hash(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic concat-and-chunk sequence packing (the GPT-style
    pretraining discipline): documents are virtually concatenated per shard
    in a deterministic shuffled order and the token stream is cut every
    ``seq_len`` tokens; each doc gets the (shard, bin, offset) where it
    STARTS (docs crossing a boundary continue into the next bin — zero
    padding waste, the training sequences are exactly full).

    Distributed shape: docs hash into ``n_shards`` independent shards (the
    parallelism unit — packing never needs a global order); within a shard
    one running token cumsum over the deterministic (hash, id) order yields
    ``bin = floor((cumsum − tokens) / seq_len)`` and
    ``offset = (cumsum − tokens) mod seq_len`` — no per-bin state, and the
    result depends only on (hash, id): stable under repartitioning,
    retries, and cluster size. Hashes are the portable md5 family, so the
    assignment is engine-reproducible (DuckDB oracle).
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    shard = F.pmod(sample_hash(id_col, 7), F.lit(n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy("order_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        shard.alias("shard"),
        sample_hash(id_col, 13).alias("order_h"),
    )
    packed = base.withColumn("cum", F.sum("n_tokens").over(w)).select(
        id_col,
        "shard",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / seq_len).cast("long").alias("bin"),
        ((F.col("cum") - F.col("n_tokens")) % seq_len).cast("long").alias("offset"),
    )
    return packed


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weight-biased top-k selection: each row gets priority
    ``sampling_hash div weight`` (pure integer division) and the k lowest
    priorities win — heavier rows draw systematically smaller priorities, so
    selection probability grows with weight, and the whole draw is a pure
    function of (ids, weights, seed): reproducible across engines, retries,
    and repartitioning, unlike ``F.rand``-based weighted sampling.

    Contract: weights must be positive integers (>= 1). Rows whose weight is
    NULL or < 1 are excluded from the draw — a weight below one cannot bias
    selection upward, and integer ``div`` would otherwise truncate fractional
    weights to 0 (NULL priority → NULLS FIRST → the inverse of the intended
    bias). The filter makes that contract explicit instead of silent.

    (Exact Efraimidis–Spirakis A-ES uses ``u^(1/w)`` keys — floating pow,
    which drifts across libm implementations; integer ``hash div w`` keeps
    the monotone weight bias with none of the drift.) ``orderBy(...).limit(k)``
    lowers to one TakeOrderedAndProject — a per-partition local top-k merged
    on the driver, never a single-partition global sort."""
    wc = F.col(weight_col).cast("bigint")
    return (
        df.where(wc.isNotNull() & (wc >= 1))
        .withColumn("__pri", F.expr(
            f"CAST({_sample_hash_sql(id_col, seed)} div CAST({weight_col} AS BIGINT) AS BIGINT)"
        ))
        .orderBy(F.col("__pri").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__pri")
    )


def _sample_hash_sql(id_col: str, seed: int) -> str:
    """SQL text of sample_hash (kept in sync with the Column version)."""
    return (
        f"CAST(conv(substring(md5(concat('{seed}:', CAST({id_col} AS STRING))), 1, 15),"
        " 16, 10) AS BIGINT)"
    )
