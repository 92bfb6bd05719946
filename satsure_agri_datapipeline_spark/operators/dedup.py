"""Deduplication operators for large-scale training-data pipelines:
exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

All are pure DataFrame compositions (no UDFs) so they stay inside
whole-stage codegen and scale by shuffle on content-derived keys:

- exact dedup shuffles on a fixed-width digest, never the full text;
- near-dup operators shuffle on shingles / band signatures — bounded keys —
  and the candidate-pair join is self-equi-join on those keys, which is the
  standard LSH "bucket join" (only docs sharing a bucket ever meet);
- the portable 60-bit hash ``h(seed, s) = int(md5(seed || ':' || s)[:15], 16)``
  is engine-agnostic (identical in Spark and any SQL engine with md5), which
  is what makes the DuckDB oracle exact rather than statistical.

At 100 TB: shingle explosion is the dominant cost — it's a flatMap (no
shuffle) followed by one shuffle per groupBy; skewed shingles (stop-phrases)
can be dropped with a document-frequency cap (``max_shingle_df``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 60-bit portable hash of a string, parameterized by an integer seed.
def portable_hash(col, seed: int):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Exact dedup via content digest: one row per distinct content with its
    keeper id (min id) and multiplicity. Shuffles on the 128-bit digest, not
    the document body."""
    content = F.lower(F.trim(F.col(text_col))) if normalize else F.col(text_col)
    return (
        df.select(F.col(id_col), F.md5(content).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with ``element_at`` indexing (``w[i]``) instead of ``slice`` +
    ``concat_ws`` — O(1) lookups per shingle rather than per-shingle array
    copies (measured ~3× faster; higher-order transforms are interpreted, so
    per-element work matters).

    The input is repartitioned BEFORE the explode: downstream per-shingle
    hashing (MinHash evaluates num_hashes md5s per shingle) runs map-side in
    the same stage, and a few-file source would pin all of it to a few tasks
    (observed: one thread burning 170s CPU on a single-file table). The
    pre-explode shuffle is tiny — O(docs) rows.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    words = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("w")
    )
    parts = ", ' ', ".join(f"w[i+{j}]" for j in range(n))
    # guard short docs: sequence(0, negative) would run DESCENDING in Spark
    shingle_expr = F.expr(
        f"CASE WHEN size(w) >= {n} THEN "
        f"transform(sequence(0, size(w) - {n}), i -> concat({parts})) "
        f"ELSE array() END"
    )
    return (
        words.select(F.col(id_col), F.explode(shingle_expr).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard: explode shingles,
    self-join on shingle (bucket join — only docs sharing a shingle meet),
    count intersection, |A∪B| = |A|+|B|−|A∩B|.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.

    Execution notes:
    - shingles are keyed by their portable 60-bit hash, so the hot self-join
      shuffles/compares fixed-width longs, never strings (collision odds at
      2^60 are negligible and identical across engines);
    - the self-join carries a ``merge`` hint: Catalyst's size estimate wants
      to broadcast one side, but both sides are the same relation and the
      sort-merge path measured ~3× faster (and is the only strategy that
      scales when the corpus no longer fits a broadcast);
    - the shingle subtree feeds three branches (sizes + both join sides) —
      deliberately NOT persisted: Spark's shuffle-stage reuse already covers
      the repeats, and joining out of an InMemoryRelation measured slower
      than recomputing;
    - ``max_shingle_df`` drops shingles appearing in more than N docs — the
      standard stop-shingle cap for skew (a shingle shared by half the corpus
      contributes quadratic join output while carrying ~no near-dup signal).
      Changes results by definition; off by default.
    """
    sh = word_shingles(df, n=n, text_col=text_col, id_col=id_col).select(
        F.col(id_col), portable_hash(F.col("shingle"), 0).alias("sh")
    )
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").count().where(F.col("count") > max_shingle_df).select("sh")
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        a.hint("merge")
        .join(b, ["sh"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signature_arrays(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per document: (id, sig array<long>[num_hashes]), k-ordered.

    Wide aggregation — ``num_hashes`` MIN columns over the shingle relation in
    ONE groupBy (each row evaluates the k seeded hashes inline, all codegen'd
    with literal seeds). The explode-by-seed alternative multiplies the
    shuffle volume by ``num_hashes`` and adds a (id, k) shuffle; measured
    several times slower at every scale.
    """
    sh = word_shingles(df, n=n, text_col=text_col, id_col=id_col)
    aggs = [
        F.min(portable_hash(F.col("shingle"), k)).alias(f"__h{k}")
        for k in range(num_hashes)
    ]
    wide = sh.groupBy(id_col).agg(*aggs)
    return wide.select(
        F.col(id_col), F.array(*[f"__h{k}" for k in range(num_hashes)]).alias("sig")
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

    Execution shape: signatures are collapsed to ONE ROW PER DOC (a
    num_hashes-long array) — the array relation is tiny (O(docs)), feeds the
    band explode and both sides of the estimate join, and makes the estimate
    a zip_with over two arrays instead of a (pair × k) join. Shuffle-stage
    reuse covers the three consumers of the signature subtree.
    """
    sig = minhash_signature_arrays(df, num_hashes, n, text_col, id_col)
    n_bands = num_hashes // band_size
    bands = sig.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        "sig",
    ).select(
        id_col,
        "band",
        F.array_join(
            F.transform(
                F.slice(F.col("sig"), F.col("band") * band_size + 1, band_size),
                lambda h: h.cast("string"),
            ),
            ",",
        ).alias("band_sig"),
    )
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    candidates = (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(matches / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
        )
    )


def simhash(
    df: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash fingerprint over distinct tokens: bit j of the fingerprint is
    the sign of Σ_tokens (±1 by token-hash bit j). Hamming-close fingerprints
    ⇒ similar token sets. Returns (id, simhash as bigint).

    Fully relational wide aggregation: one SUM column per bit position
    (literal shifts, codegen'd), ONE groupBy — no bit-position explode, which
    would multiply shuffle volume by ``bits``. At scale prefer
    ``bit_count``-based banding on the fingerprint for candidate generation
    (same bucket-join pattern as LSH).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.repartition(parallelism, F.col(id_col))
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
        .withColumn(
            "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        )
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"__s{j}")
        for j in range(bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*bit_sums)
    fingerprint = None
    for j in range(bits):
        term = F.when(F.col(f"__s{j}") >= 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return per_doc.select(F.col(id_col), fingerprint.alias("simhash"))
