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
    """Distinct word n-gram shingles per document: (id, shingle)."""
    words = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("w"))
    # n-gram i covers words [i, i+n-1], 1-based; generated with a sequence
    # transform — array ops, no UDF.
    shingle_expr = F.expr(
        f"transform(sequence(1, greatest(size(w) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', slice(w, i, {n})))"
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
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard: explode shingles,
    self-join on shingle (bucket join — only docs sharing a shingle meet),
    count intersection, |A∪B| = |A|+|B|−|A∩B|.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    """
    sh = word_shingles(df, n=n, text_col=text_col, id_col=id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, ["shingle"])
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


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature rows (id, k, min_hash) — min over shingles of the
    k-seeded portable hash. One groupBy shuffle on (id, k)."""
    sh = word_shingles(df, n=n, text_col=text_col, id_col=id_col)
    seeded = sh.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("k"),
        "shingle",
    )
    hashed = seeded.select(
        id_col,
        "k",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("k").cast("string"), F.lit(":"), F.col("shingle"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    return hashed.groupBy(id_col, "k").agg(F.min("h").alias("min_hash"))


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
    """
    sig = minhash_signatures(df, num_hashes, n, text_col, id_col)
    bands = (
        sig.withColumn("band", (F.col("k") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "min_hash"))),
                    lambda s: s["min_hash"].cast("string"),
                ),
                ",",
            ).alias("band_sig")
        )
    )
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    candidates = (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), "k", F.col("min_hash").alias("h_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), "k", F.col("min_hash").alias("h_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "k"])
        .groupBy("id_a", "id_b")
        .agg(
            F.round(F.avg((F.col("h_a") == F.col("h_b")).cast("double")), 4).alias(
                "est_jaccard"
            )
        )
    )


def simhash(
    df: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash fingerprint over distinct tokens: bit j of the fingerprint is
    the sign of Σ_tokens (±1 by token-hash bit j). Hamming-close fingerprints
    ⇒ similar token sets. Returns (id, simhash as bigint).

    Fully relational: explode tokens × bit positions, one groupBy. At scale
    prefer ``bit_count``-based banding on the fingerprint for candidate
    generation (same bucket-join pattern as LSH).
    """
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
        .withColumn(
            "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        )
    )
    # shiftright/shiftleft take a literal bit count in the Python API; the
    # column-by-column shift goes through SQL expressions instead.
    expanded = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        "h",
    ).withColumn(
        "contrib",
        F.when(F.expr("(h >> j) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    return (
        expanded.groupBy(id_col, "j")
        .agg(F.sum("contrib").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)"))
                .otherwise(F.lit(0))
            ).alias("simhash")
        )
    )
