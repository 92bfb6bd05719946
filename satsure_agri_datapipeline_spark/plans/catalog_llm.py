"""LLM-training-data query family: deduplication, similarity search, text
analysis, multimodal plumbing — over the ``documents`` and ``embeddings``
tables. Each query exercises the real operator implementations in
``operators/dedup.py`` / ``operators/text.py`` / ``operators/similarity.py``
/ ``operators/multimodal.py``; oracles re-derive the same algorithm in
ANSI SQL (portable md5-based hashing makes MinHash/SimHash exactly —
not statistically — comparable).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

from pyspark.sql import functions as F

from satsure_agri_datapipeline_spark.operators import dedup as dd
from satsure_agri_datapipeline_spark.operators import multimodal as mm
from satsure_agri_datapipeline_spark.operators import sampling as sp
from satsure_agri_datapipeline_spark.operators import similarity as sim
from satsure_agri_datapipeline_spark.operators import text as tx
from satsure_agri_datapipeline_spark.plans.catalog import query
from satsure_agri_datapipeline_spark.sources.tables import load_table

# Shared SQL fragment: distinct word 3-gram shingles per document.
SHINGLES_SQL = """
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 2, 0))) AS i FROM words),
    shingles AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle FROM idx)
"""

# Shared SQL fragment (extends SHINGLES_SQL): 3-gram Jaccard >= 0.5 near-dup
# pairs — the edge relation the clustering / canonical-dedup oracles build on.
JACCARD_PAIRS_SQL = f"""
    {SHINGLES_SQL},
    jp_hashed AS (
        SELECT doc_id, ('0x' || substr(md5('0:' || shingle), 1, 15))::BIGINT AS sh
        FROM shingles
    ),
    jp_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM jp_hashed GROUP BY doc_id),
    jp_inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM jp_hashed a JOIN jp_hashed b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM jp_inter
        JOIN jp_sizes sa ON jp_inter.id_a = sa.doc_id
        JOIN jp_sizes sb ON jp_inter.id_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
    )
"""


@query(
    "doc_exact_dedup",
    """
    WITH hashed AS (
        SELECT doc_id, md5(lower(trim(text))) AS content_hash FROM documents
    )
    SELECT content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM hashed GROUP BY content_hash ORDER BY keeper_id
    """,
)
def doc_exact_dedup(spark, sf_dir):
    """Exact dedup via content digest (hash-groupBy; operators/dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_duplicate_groups(docs)


NGRAM_JACCARD_SQL = f"""
    WITH {SHINGLES_SQL},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5('0:' || shingle), 1, 15))::BIGINT AS sh
        FROM shingles
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM hashed GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM hashed a JOIN hashed b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.id_a = sa.doc_id
    JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
    ORDER BY id_a, id_b
    """


def _jaccard_display(pairs):
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


# --- Pair-family size gate (r13, verdict task 1) -------------------------
#
# The uncapped all-candidate pair pipelines are quadratic in hot-shingle
# document frequency: measured on this box they spill 403-415 GiB
# (word-gram jaccard/containment, 1000x = 421 MiB source, PERF.md r10/r12)
# or GC-die outright (char-gram at 100x = 42 MiB, PERF.md r5). The raw
# names stay byte-identical to their oracles below the gate and degrade to
# the bounded-state ``_capped`` pipelines above it, with the decision
# logged — the ``plans/curation.py:broadcast_id_limit`` /
# ``dedup.py:driver_threshold`` measured-degrade pattern applied one level
# up, at the catalog entry itself. Thresholds sit one step below each
# family's measured cliff: word-gram raw is healthy at 100x/42 MiB
# (containment 28.6 s) and spills at 1000x/421 MiB -> 256 MiB; char-gram
# GC-dies already at 100x/42 MiB -> 32 MiB. ``SPARK_GRAFT_PAIR_GATE``
# overrides: ``off``/``none`` disables (always raw), an integer replaces
# BOTH thresholds (tests use 1 to force the capped route at any SF).
PAIR_GATE_WORD_BYTES = 256 * 1024**2
PAIR_GATE_CHAR_BYTES = 32 * 1024**2

_PAIR_GATE_LOG = logging.getLogger("satsure_agri_datapipeline_spark.pair_gate")


def _pair_family_degrade(sf_dir, name: str, default_bytes: int) -> bool:
    """True when ``name``'s uncapped pipeline is in its measured spill/GC
    regime for this corpus size (documents parquet bytes >= gate). Logging
    the routing decision either way would be too chatty — only the degrade
    is logged, at warning, with both numbers, so a production run shows
    exactly why the edge set is the capped one."""
    from satsure_agri_datapipeline_spark.sources.store_util import (
        source_total_bytes,
    )

    env = os.environ.get("SPARK_GRAFT_PAIR_GATE", "")
    if env.lower() in ("off", "0", "none"):
        return False
    gate = default_bytes
    if env:
        try:
            gate = int(env)
        except ValueError:
            pass
    size = source_total_bytes(Path(sf_dir) / "documents.parquet")
    if size < gate:
        return False
    _PAIR_GATE_LOG.warning(
        "%s: documents source is %.1f MiB >= %.1f MiB gate — serving the "
        "bounded-state capped pipeline (df-capped edge set; the oracle-"
        "pinned uncapped semantics live below the gate). "
        "SPARK_GRAFT_PAIR_GATE=off forces the uncapped form.",
        name,
        size / 1024**2,
        gate / 1024**2,
    )
    return True


# --- Quality-kernel size gate (optimization r14) --------------------------
#
# The curation stage-1 quality score has two value-identical serving
# shapes: the JVM three-regex-pass expression (text.quality_score_col) and
# the one-pass Arrow kernel (text.quality_score_kernel_col). The kernel
# pays a fixed Python-worker round-trip that only amortizes with corpus
# bytes: raced −45% at 100× (1.2 GiB), ~tie at 10× (115 MiB), +35% at
# sf0.1 (17 MiB) — tools/race_quality_kernel.py. Unlike the pair-family
# gate this is pure routing: BOTH sides produce identical scores (the
# curation oracle pins the composition either way), so the threshold only
# has to sit near the measured break-even. ``SPARK_GRAFT_QUALITY_KERNEL``
# overrides: on/1 forces the kernel, off/0/none forces the expression.
QUALITY_KERNEL_GATE_BYTES = 64 * 1024**2


def _quality_kernel_gate(sf_dir) -> bool:
    from satsure_agri_datapipeline_spark.sources.store_util import (
        source_total_bytes,
    )

    env = os.environ.get("SPARK_GRAFT_QUALITY_KERNEL", "").lower()
    if env in ("on", "1", "kernel"):
        return True
    if env in ("off", "0", "none", "expr"):
        return False
    size = source_total_bytes(Path(sf_dir) / "documents.parquet")
    return size >= QUALITY_KERNEL_GATE_BYTES


def _jaccard_pairs_default(spark, sf_dir, docs, threshold=0.5, gate_name=None):
    """3-gram word Jaccard pairs for ALL downstream consumers (clusters,
    canonical dedup, edit-distance verify, triangles, keep-best): served
    from a fresh bucketed shingle store when one exists (r9 — the raw
    names get the zero-Exchange plan by default, like the r8 fact
    layout), identical-result raw shingle self-join otherwise. Store
    params are pinned to the catalog's (n=3, word, seed=0) so the served
    relation is bit-identical to the recompute.

    r13: consumers pass their query name as ``gate_name`` to ride the
    pair-family size gate — the DOWNSTREAM names (clusters, canonical,
    keep-best, edit-distance) consume the same uncapped pair aggregate
    that spilled 403 GiB at 1000×, so above the gate they get the
    bounded-state df-capped edge set (logged). doc_lsh_eval deliberately
    does NOT gate: exact pairs are its ground truth — an eval against a
    capped truth would measure a different question."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    sh = shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
    if gate_name is not None and _pair_family_degrade(
        sf_dir, gate_name, PAIR_GATE_WORD_BYTES
    ):
        return dd.ngram_jaccard_pairs_capped(
            docs, n=3, threshold=threshold, max_shingle_df=10, exploded=sh
        )
    if sh is not None:
        return dd.jaccard_pairs_from_exploded(sh, threshold=threshold)
    return dd.ngram_jaccard_pairs(docs, n=3, threshold=threshold)


def _lsh_pairs_default(spark, sf_dir, docs):
    """MinHash(16)/LSH(4×4) candidate pairs with 4-dp est_jaccard, served
    from a fresh bucketed band store when one exists, raw signature
    recompute otherwise — the store carries the full signature per band
    row, so the match count (and therefore the rounded estimate) is
    bit-identical to ``dd.minhash_lsh_pairs``."""
    from satsure_agri_datapipeline_spark.sources.band_store import band_store_or_none

    bands = band_store_or_none(spark, sf_dir, num_hashes=16, band_size=4, n=3)
    if bands is not None:
        raw = dd.lsh_match_counts_from_bands(bands)
        return raw.select(
            "id_a",
            "id_b",
            F.round(F.col("__matches") / F.lit(16.0), 4).alias("est_jaccard"),
        )
    return dd.minhash_lsh_pairs(docs, num_hashes=16, band_size=4, n=3)


@query("doc_ngram_jaccard", NGRAM_JACCARD_SQL)
def doc_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.5 (shingle bucket join).

    r9: serves the bucketed shingle store BY DEFAULT when a fresh one
    exists (the r8 fact-layout pattern — the raw name is what users call,
    so it gets the zero-Exchange plan once any stored query or ingest run
    has paid the store build; ``SPARK_GRAFT_SHINGLE_STORE=none`` opts
    out). Store absent or stale → identical-result raw recompute.

    r13: above the measured spill gate (PAIR_GATE_WORD_BYTES — the
    uncapped aggregate spilled 403 GiB at 1000×) the raw name degrades to
    ``doc_ngram_jaccard_capped``'s bounded-state pipeline, logged."""
    if _pair_family_degrade(sf_dir, "doc_ngram_jaccard", PAIR_GATE_WORD_BYTES):
        return doc_ngram_jaccard_capped(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return _jaccard_display(_jaccard_pairs_default(spark, sf_dir, docs, 0.5))


@query("doc_ngram_jaccard_stored", NGRAM_JACCARD_SQL)
def doc_ngram_jaccard_stored(spark, sf_dir):
    """The SAME Jaccard query served from the bucketed shingle store
    (``sources/shingle_store.py``): the exploded (doc, shingle) relation is
    pre-hashed and CLUSTERED BY the shingle hash at ingest, so both
    self-join exchanges AND the per-run shingle hashing vanish — only the
    inherent pair-counting groupBy remains. Identical oracle to
    ``doc_ngram_jaccard``, so the store itself is hash-pinned by the
    correctness gate."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        ensure_shingle_store,
    )

    sh = ensure_shingle_store(spark, sf_dir, n=3, unit="word", seed=0)
    return _jaccard_display(dd.jaccard_pairs_from_exploded(sh, threshold=0.5))


# MinHash affine-family constants, regenerated exactly like the operator's
# minhash_params(16) and inlined as HUGEINT literals.
def _minhash_seed_values() -> str:
    from satsure_agri_datapipeline_spark.operators.dedup import minhash_params

    a, b = minhash_params(16)
    return ", ".join(f"({k}, {a[k]}::HUGEINT, {b[k]}::HUGEINT)" for k in range(16))


MINHASH_LSH_SQL = f"""
    WITH {SHINGLES_SQL},
    seeds(k, a, b) AS (VALUES {_minhash_seed_values()}),
    hashed AS (
        SELECT doc_id,
               (('0x' || substr(md5(shingle), 1, 15))::BIGINT)::HUGEINT AS h
        FROM shingles
    ),
    mixed AS (
        SELECT doc_id, k,
               CAST(((a * h + b) % 18446744073709551616::HUGEINT)
                    % 9223372036854775808::HUGEINT AS BIGINT) AS hk
        FROM hashed CROSS JOIN seeds
    ),
    sig AS (SELECT doc_id, k, MIN(hk) AS min_hash FROM mixed GROUP BY doc_id, k),
    bands AS (
        SELECT doc_id, k // 4 AS band,
               STRING_AGG(CAST(min_hash AS VARCHAR), ',' ORDER BY k) AS band_sig
        FROM sig GROUP BY doc_id, k // 4
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           ROUND(AVG(CASE WHEN sa.min_hash = sb.min_hash THEN 1.0 ELSE 0.0 END), 4) AS est_jaccard
    FROM cands c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b AND sb.k = sa.k
    GROUP BY c.id_a, c.id_b
    ORDER BY c.id_a, c.id_b
    """


def _lsh_display_from_bands(bands):
    raw = dd.lsh_match_counts_from_bands(bands)
    return raw.select(
        "id_a",
        "id_b",
        F.round(F.col("__matches") / F.lit(16.0), 4).alias("est_jaccard"),
    ).orderBy("id_a", "id_b")


@query("doc_minhash_lsh", MINHASH_LSH_SQL)
def doc_minhash_lsh(spark, sf_dir):
    """MinHash(16) + LSH(4 bands × 4 rows) candidate pairs with estimated
    Jaccard — the one-md5 + affine-mix family (dedup.minhash_params) is
    engine-portable, so the oracle is exact, not statistical.

    r9: serves the bucketed band store BY DEFAULT when a fresh one exists
    (signature CPU and both band self-join exchanges gone; the measured
    135→6.5 s/1000× plan now answers the name users actually call).
    ``SPARK_GRAFT_BAND_STORE=none`` opts out; store absent or stale →
    identical-result raw recompute."""
    docs = load_table(spark, sf_dir, "documents")
    return _lsh_pairs_default(spark, sf_dir, docs).orderBy("id_a", "id_b")


@query("doc_minhash_lsh_stored", MINHASH_LSH_SQL)
def doc_minhash_lsh_stored(spark, sf_dir):
    """The SAME MinHash-LSH query served from the bucketed band store
    (``sources/band_store.py``): signatures and band rows are computed once
    at ingest and written CLUSTERED BY (band, band_sig), so the per-run
    signature CPU (16 hashes × every shingle) AND both band self-join
    exchanges vanish — only the inherent pair groupBy remains. Identical
    oracle to ``doc_minhash_lsh``, so the store itself is hash-pinned by
    the correctness gate."""
    from satsure_agri_datapipeline_spark.sources.band_store import ensure_band_store

    bands = ensure_band_store(spark, sf_dir, num_hashes=16, band_size=4, n=3)
    return _lsh_display_from_bands(bands)


@query(
    "doc_lsh_eval",
    f"""
    WITH {JACCARD_PAIRS_SQL},
    seeds(k, a, b) AS (VALUES {_minhash_seed_values()}),
    mh_hashed AS (
        SELECT doc_id,
               (('0x' || substr(md5(shingle), 1, 15))::BIGINT)::HUGEINT AS h
        FROM shingles
    ),
    mh_mixed AS (
        SELECT doc_id, k,
               CAST(((a * h + b) % 18446744073709551616::HUGEINT)
                    % 9223372036854775808::HUGEINT AS BIGINT) AS hk
        FROM mh_hashed CROSS JOIN seeds
    ),
    mh_sig AS (SELECT doc_id, k, MIN(hk) AS min_hash FROM mh_mixed GROUP BY doc_id, k),
    mh_bands AS (
        SELECT doc_id, k // 4 AS band,
               STRING_AGG(CAST(min_hash AS VARCHAR), ',' ORDER BY k) AS band_sig
        FROM mh_sig GROUP BY doc_id, k // 4
    ),
    mh_cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM mh_bands a JOIN mh_bands b
          ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    lsh_pairs AS (
        SELECT c.id_a, c.id_b
        FROM mh_cands c
        JOIN mh_sig sa ON sa.doc_id = c.id_a
        JOIN mh_sig sb ON sb.doc_id = c.id_b AND sb.k = sa.k
        GROUP BY c.id_a, c.id_b
        HAVING AVG(CASE WHEN sa.min_hash = sb.min_hash THEN 1.0 ELSE 0.0 END) >= 0.5
    )
    SELECT n_exact, n_lsh, true_pos,
           true_pos * 10000 // GREATEST(n_lsh, 1) AS precision_e4,
           true_pos * 10000 // GREATEST(n_exact, 1) AS recall_e4
    FROM (
        SELECT (SELECT COUNT(*) FROM pairs) AS n_exact,
               (SELECT COUNT(*) FROM lsh_pairs) AS n_lsh,
               (SELECT COUNT(*) FROM pairs p
                JOIN lsh_pairs l ON p.id_a = l.id_a AND p.id_b = l.id_b) AS true_pos
    ) t
    """,
)
def doc_lsh_eval(spark, sf_dir):
    """Approximate-dedup quality report (operators/dedup.py lsh_dedup_eval):
    precision/recall of MinHash-LSH pairs vs exact 3-gram Jaccard ground
    truth at threshold 0.5 — the measure-don't-guess gate before trusting
    the approximate path on a corpus.

    r9: BOTH legs ride the stores when fresh ones exist — ground truth
    from the shingle store, match counts from the band store — so the
    tuning-loop query costs only the two pair joins."""
    from satsure_agri_datapipeline_spark.sources.band_store import band_store_or_none

    docs = load_table(spark, sf_dir, "documents")
    return dd.lsh_dedup_eval(
        docs,
        threshold=0.5,
        num_hashes=16,
        band_size=4,
        n=3,
        exact_pairs=_jaccard_pairs_default(spark, sf_dir, docs, 0.5),
        band_rows=band_store_or_none(spark, sf_dir, num_hashes=16, band_size=4, n=3),
    )


SIMHASH_SQL = """
    WITH toks AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        FROM toks WHERE tok <> ''
    ),
    bits AS (
        SELECT doc_id, UNNEST(generate_series(0, 31)) AS j, h FROM hashed
    ),
    sums AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM bits GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM sums GROUP BY doc_id ORDER BY doc_id
    """


def _simhash_store_default(spark, sf_dir):
    """Fresh bucketed simhash store or None (r10 — the last dedup family
    that was still re-paying its signature pass per run gets the r9
    default-serving pattern; ``SPARK_GRAFT_SIMHASH_STORE=none`` opts
    out). Params pinned to the catalog's (bits=32, n_bands=4) so the
    served relation is bit-identical to the recompute."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        simhash_store_or_none,
    )

    return simhash_store_or_none(spark, sf_dir, bits=32, n_bands=4)


@query("doc_simhash", SIMHASH_SQL)
def doc_simhash(spark, sf_dir):
    """32-bit SimHash fingerprint per document (operators/dedup.py).

    r10: serves the bucketed simhash store BY DEFAULT when a fresh one
    exists — the fingerprint rides every stored band row, so this is the
    ``band = 0`` pruned bucketed scan instead of the md5-per-token Arrow
    UDF pass (the workload DuckDB is kernel-OOM-killed on at 1000×)."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        fingerprints_from_store,
    )

    store = _simhash_store_default(spark, sf_dir)
    if store is not None:
        return fingerprints_from_store(store)
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash(docs, bits=32)


@query("doc_simhash_stored", SIMHASH_SQL)
def doc_simhash_stored(spark, sf_dir):
    """The SAME fingerprint query served from the bucketed simhash store
    (``sources/simhash_store.py``), building it on first use. Identical
    oracle to ``doc_simhash``, so the store itself is hash-pinned by the
    correctness gate."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        ensure_simhash_store,
        fingerprints_from_store,
    )

    return fingerprints_from_store(
        ensure_simhash_store(spark, sf_dir, bits=32, n_bands=4)
    )


@query(
    "doc_simhash_wide",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        FROM toks WHERE tok <> ''
    ),
    bits AS (
        SELECT doc_id, UNNEST(generate_series(0, 59)) AS j, h FROM hashed
    ),
    sums AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM bits GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM sums GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_simhash_wide(spark, sf_dir):
    """60-bit SimHash — the SCALE operating point for the banded Hamming
    join. 8-bit band keys (the 32-bit form) stop partitioning once the
    corpus outgrows ~256 keys/band: at 100× (500 k docs) the measured
    candidate probe volume is 5.7 B at 32/4 vs ~130 M at 60/4 (15-bit
    keys), and the r10 scale sweep caught the wide form producing
    constant-zero high bits from a 32-bit token hash (313 B probe volume,
    one straggler task >30 min) — fixed in dedup.simhash and pinned here
    with a 15-hex (BIGINT-safe, MinHash-convention) oracle. Band keys must
    grow with corpus size exactly like LSH band tuning.

    r11: serves the 60-bit simhash store by default when a fresh one
    exists (same hook as the 32-bit family; the bench pre-ensures it)."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        fingerprints_from_store,
        simhash_store_or_none,
    )

    store = simhash_store_or_none(spark, sf_dir, bits=60, n_bands=4)
    if store is not None:
        return fingerprints_from_store(store)
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash(docs, bits=60)


SIMHASH_PAIRS_SQL = """
    WITH toks AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        FROM toks WHERE tok <> ''
    ),
    bits AS (
        SELECT doc_id, UNNEST(generate_series(0, 31)) AS j, h FROM hashed
    ),
    sums AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM bits GROUP BY doc_id, j
    ),
    sh AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        FROM sums GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS band_key
        FROM sh, UNNEST(generate_series(0, 3)) AS t(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 3
    ORDER BY id_a, id_b
    """


@query("doc_simhash_pairs", SIMHASH_PAIRS_SQL)
def doc_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: banded bucket join on 8-bit fingerprint bands,
    Hamming ≤ 3 — exhaustive by pigeonhole, never all-pairs
    (operators/dedup.py simhash_near_dup_pairs).

    r10: serves the bucketed simhash store BY DEFAULT when a fresh one
    exists — per-run fingerprint CPU AND both band self-join exchanges
    vanish; only the inherent pair groupBy remains."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        pairs_from_store,
    )

    store = _simhash_store_default(spark, sf_dir)
    if store is not None:
        return pairs_from_store(store, max_hamming=3).orderBy("id_a", "id_b")
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_near_dup_pairs(
        docs, bits=32, n_bands=4, max_hamming=3
    ).orderBy("id_a", "id_b")


@query("doc_simhash_pairs_stored", SIMHASH_PAIRS_SQL)
def doc_simhash_pairs_stored(spark, sf_dir):
    """The SAME Hamming-pairs query served from the bucketed simhash store,
    building it on first use — identical oracle to ``doc_simhash_pairs``,
    so the store content is hash-pinned by the correctness gate."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        ensure_simhash_store,
        pairs_from_store,
    )

    store = ensure_simhash_store(spark, sf_dir, bits=32, n_bands=4)
    return pairs_from_store(store, max_hamming=3).orderBy("id_a", "id_b")


# The production dedup ORDER, pinned as a composed query (r11): exact dedup
# first, THEN banded Hamming over the survivors. PERF.md's 100×/1000× sweeps
# showed the pairs cost at scale is dominated by identical-fingerprint
# megaclusters (≥12.3 M hamming-0 pairs at 100×) — candidate volume quadratic
# in cluster mass that no band split can divide, and that exact dedup removes
# for free. The oracle restates both steps: keep MIN(doc_id) per sha256(text),
# then the identical banded-Hamming pipeline over the kept rows.
SIMHASH_PAIRS_DEDUPED_SQL = """
    WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    toks AS (
        SELECT DISTINCT d.doc_id, UNNEST(string_split(d.text, ' ')) AS tok
        FROM documents d JOIN keep USING (doc_id)
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        FROM toks WHERE tok <> ''
    ),
    bits AS (
        SELECT doc_id, UNNEST(generate_series(0, 31)) AS j, h FROM hashed
    ),
    sums AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM bits GROUP BY doc_id, j
    ),
    sh AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        FROM sums GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS band_key
        FROM sh, UNNEST(generate_series(0, 3)) AS t(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 3
    ORDER BY id_a, id_b
    """


@query("doc_simhash_pairs_deduped", SIMHASH_PAIRS_DEDUPED_SQL)
def doc_simhash_pairs_deduped(spark, sf_dir):
    """Composed production dedup order: exact dedup (lowest-doc_id survivor
    per sha256(text) group) THEN banded Hamming pairs among survivors —
    the order PERF.md derives from the 100×/1000× sweeps, where
    identical-text megaclusters make raw simhash-pairs cost quadratic in
    cluster mass. The banded-join side serves the bucketed simhash store
    by default (full-corpus band rows, semi-filtered to survivors with a
    BROADCAST hint so the zero-Exchange (band, band_key) self-join plan
    survives the filter); the survivor set itself is one linear
    sha256+groupBy pass — it cannot come from the digest store, whose
    digest-only layout serves existence anti-joins, not per-digest
    representative selection. At 100 TB the broadcast becomes a shuffled
    semi-join (survivors outgrow the driver) and remains ∝ corpus — noise
    against the quadratic pair volume it removes."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        pairs_from_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    survivors = (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    store = _simhash_store_default(spark, sf_dir)
    if store is not None:
        bands = store.join(F.broadcast(survivors), "doc_id", "left_semi")
        return pairs_from_store(bands, max_hamming=3).orderBy("id_a", "id_b")
    deduped = docs.join(F.broadcast(survivors), "doc_id", "left_semi")
    return dd.simhash_near_dup_pairs(
        deduped, bits=32, n_bands=4, max_hamming=3
    ).orderBy("id_a", "id_b")


# Fingerprint-cluster REPRESENTATIVE pairs — the composed form that actually
# removes the quadratic cluster mass on THIS corpus (r11 measurement):
# exact-text dedup is a no-op here by construction (4992/5000 distinct texts
# at sf0.1; make_scaled_sf word-suffixes every copy, so scaling adds ZERO
# byte dups), and the ≥12.3 M hamming-0 pairs at 100× come from
# byte-DISTINCT texts with EQUAL fingerprints. Collapsing each distinct
# fingerprint to its lowest-doc_id representative before the band join
# deletes the hamming-0 component entirely (equal fingerprints can't cross
# representatives), leaving pairs with hamming ∈ [1, max_hamming] among
# cluster representatives — the fingerprint-granularity dedup shape a
# production pipeline runs. Membership (doc → representative) is the
# store's fingerprint relation grouped by simhash; it needs no join here.
SIMHASH_REP_PAIRS_SQL = """
    WITH toks AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        FROM toks WHERE tok <> ''
    ),
    bits AS (
        SELECT doc_id, UNNEST(generate_series(0, 31)) AS j, h FROM hashed
    ),
    sums AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM bits GROUP BY doc_id, j
    ),
    sh AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        FROM sums GROUP BY doc_id
    ),
    rep AS (SELECT simhash, MIN(doc_id) AS doc_id FROM sh GROUP BY simhash),
    bands AS (
        SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS band_key
        FROM rep, UNNEST(generate_series(0, 3)) AS t(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 3
    ORDER BY id_a, id_b
    """


@query("doc_simhash_rep_pairs", SIMHASH_REP_PAIRS_SQL)
def doc_simhash_rep_pairs(spark, sf_dir):
    """SimHash near-dup pairs at FINGERPRINT granularity: one lowest-doc_id
    representative per distinct fingerprint, then the banded Hamming join
    among representatives (hamming-0 pairs are eliminated by definition —
    equal fingerprints share a representative). Serves the simhash store
    by default: representatives come from one band-pruned bucketed scan
    (``band = 0``) + a groupBy on the fingerprint — the text is never
    touched. This is the scale path when identical-fingerprint clusters
    dominate pair volume (this corpus: ≥12.3 M hamming-0 pairs at 100×,
    all intra-cluster, all gone here)."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        fingerprints_from_store,
    )

    store = _simhash_store_default(spark, sf_dir)
    if store is not None:
        sh = fingerprints_from_store(store)
    else:
        docs = load_table(spark, sf_dir, "documents")
        sh = dd.simhash(docs, bits=32)
    reps = sh.groupBy("simhash").agg(F.min("doc_id").alias("doc_id"))
    return dd.hamming_pairs_from_fingerprints(
        reps, bits=32, n_bands=4, max_hamming=3
    ).orderBy("id_a", "id_b")


@query(
    "doc_simhash_rep_pairs_wide",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        FROM toks WHERE tok <> ''
    ),
    bits AS (
        SELECT doc_id, UNNEST(generate_series(0, 59)) AS j, h FROM hashed
    ),
    sums AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM bits GROUP BY doc_id, j
    ),
    sh AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        FROM sums GROUP BY doc_id
    ),
    rep AS (SELECT simhash, MIN(doc_id) AS doc_id FROM sh GROUP BY simhash),
    bands AS (
        SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS band_key
        FROM rep, UNNEST(generate_series(0, 3)) AS t(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 3
    ORDER BY id_a, id_b
    """,
)
def doc_simhash_rep_pairs_wide(spark, sf_dir):
    """The PRODUCTION near-dup pair configuration at the 100-TB design
    point: 60-bit fingerprints (15-bit band keys — keys that keep
    partitioning past ~256 fingerprints/band), fingerprint-canonical
    representatives (hamming-0 cluster mass deleted), banded Hamming ≤ 3.
    Serves the 60-bit simhash store by default. This exact composition
    measured 9.09 s at 1000× (5 M docs) where the all-pairs form takes
    57.1 s and DuckDB is kernel-OOM-killed (PERF.md r11)."""
    from satsure_agri_datapipeline_spark.sources.simhash_store import (
        fingerprints_from_store,
        simhash_store_or_none,
    )

    store = simhash_store_or_none(spark, sf_dir, bits=60, n_bands=4)
    if store is not None:
        sh = fingerprints_from_store(store)
    else:
        docs = load_table(spark, sf_dir, "documents")
        sh = dd.simhash(docs, bits=60)
    reps = sh.groupBy("simhash").agg(F.min("doc_id").alias("doc_id"))
    return dd.hamming_pairs_from_fingerprints(
        reps, bits=60, n_bands=4, max_hamming=3
    ).orderBy("id_a", "id_b")


@query(
    "doc_near_dup_clusters",
    f"""
    WITH RECURSIVE {JACCARD_PAIRS_SQL},
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
    )
    SELECT node AS doc_id, MIN(lbl) AS cluster_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def doc_near_dup_clusters(spark, sf_dir):
    """Near-dup pairs → clusters: iterative min-label propagation (connected
    components, operators/dedup.py) over the 3-gram-Jaccard ≥ 0.5 edge set.
    The oracle re-derives components with a recursive CTE — the iterative
    operator is still exactly SQL-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_default(
        spark, sf_dir, docs, threshold=0.5, gate_name="doc_near_dup_clusters"
    )
    return (
        dd.connected_components(pairs)
        .select(
            F.col("node_id").alias("doc_id"),
            F.col("component_id").alias("cluster_id"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_dedup_canonical",
    f"""
    WITH RECURSIVE {JACCARD_PAIRS_SQL},
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
    ),
    losers AS (
        SELECT node FROM (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node)
        WHERE node <> cluster
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT node FROM losers)
    ORDER BY doc_id
    """,
)
def doc_dedup_canonical(spark, sf_dir):
    """End-to-end near-dedup: keep only each cluster's canonical (min-id)
    member (operators/dedup.py dedup_keep_canonical). The survivors' id set
    is the corpus a training run would actually consume."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_default(
        spark, sf_dir, docs, threshold=0.5, gate_name="doc_dedup_canonical"
    )
    return dd.dedup_keep_canonical(docs, pairs).select("doc_id").orderBy("doc_id")


@query(
    "doc_token_stats",
    r"""
    SELECT doc_id,
           LENGTH(text) AS n_chars_measured,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT) AS bpe_regex_tokens,
           CAST(CEIL(LENGTH(regexp_replace(text, '[^0-9A-Za-z]', '', 'g')) / 4.0) AS BIGINT) AS est_bpe_tokens,
           ROUND(LENGTH(text) * 1.0 / GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1), 4) AS avg_token_len
    FROM documents ORDER BY doc_id
    """,
)
def doc_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish estimate (operators/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.token_stats(docs)


@query(
    "doc_bm25_topk",
    r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    dls AS (SELECT doc_id, len(toks) AS dl FROM base),
    corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dls),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
        FROM (SELECT d.doc_id, d.dl, unnest(b.toks) AS term
              FROM base b JOIN dls d USING (doc_id))
        WHERE term IN ('dup', 'spark', 'vector')
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
    scored AS (
        SELECT t.doc_id, t.term,
               -- CAST(1.2 AS DOUBLE): bare 1.2 is DECIMAL in DuckDB (exact
               -- 12/10) while Spark folds it as the nearest double — the
               -- 1-ulp gap can flip ROUND(.,6) at boundaries. 0.5/0.25/0.75
               -- convert decimal->double exactly, so only 1.2 needs the pin.
               ((n_docs - df_docs + 0.5) / (df_docs + 0.5))
               * ((t.tf * (CAST(1.2 AS DOUBLE) + 1.0))
                  / (t.tf + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75)
                     + 0.75 * (t.dl / (CAST(total_tokens AS DOUBLE) / n_docs))))) AS s
        FROM tf t JOIN dfreq USING (term) CROSS JOIN corpus
    ),
    piv AS (
        SELECT doc_id, COUNT(*) AS n_terms_matched,
               COALESCE(MAX(CASE WHEN term = 'dup' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN term = 'spark' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN term = 'vector' THEN s END), 0.0) AS score
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_terms_matched, ROUND(score, 6) AS bm25_score
    FROM piv ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 10
    """,
)
def doc_bm25_topk(spark, sf_dir):
    """BM25 lexical retrieval (operators/text.py bm25_topk): top-10 docs for
    the query {dup, spark, vector} — one rare term (df≈5% of docs in the
    synthetic corpus) and two common ones, so the ranking exercises the idf
    mixing, not just tf. Log-free rational idf + fixed-order pivot sum keep
    the doubles bit-identical across engines (see the operator docstring).
    The lexical half of hybrid retrieval; the vector half is emb_cosine_topk
    / the ANN stores.

    Optimization r14 (VERDICT r13 item 3): the corpus N/avgdl leg — the
    retrieval family's last full-corpus text scan — serves the standing
    token-stats store BY DEFAULT when fresh (the r9 raw-names rule);
    SPARK_GRAFT_TOKEN_STATS_STORE=none exercises the raw path."""
    from satsure_agri_datapipeline_spark.sources.token_stats_store import (
        token_stats_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = token_stats_store_or_none(spark, sf_dir)
    return tx.bm25_topk(docs, ["dup", "spark", "vector"], k=10, stats=stats)


@query(
    "hybrid_rrf_topk",
    r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    dls AS (SELECT doc_id, len(toks) AS dl FROM base),
    corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dls),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
        FROM (SELECT d.doc_id, d.dl, unnest(b.toks) AS term
              FROM base b JOIN dls d USING (doc_id))
        WHERE term IN ('dup', 'spark', 'vector')
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
    scored AS (
        SELECT t.doc_id, t.term,
               ((n_docs - df_docs + 0.5) / (df_docs + 0.5))
               * ((t.tf * (CAST(1.2 AS DOUBLE) + 1.0))
                  / (t.tf + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75)
                     + 0.75 * (t.dl / (CAST(total_tokens AS DOUBLE) / n_docs))))) AS s
        FROM tf t JOIN dfreq USING (term) CROSS JOIN corpus
    ),
    piv AS (
        SELECT doc_id, COUNT(*) AS n_terms_matched,
               COALESCE(MAX(CASE WHEN term = 'dup' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN term = 'spark' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN term = 'vector' THEN s END), 0.0) AS score
        FROM scored GROUP BY doc_id
    ),
    lex AS (
        SELECT doc_id AS id,
               ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS r_lex
        FROM piv ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 50
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    prods AS (
        SELECT e.vec_id,
               list_sum(list_transform(list_zip(e.embedding, q.qv),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
               sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
               sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
    ),
    sem AS (
        SELECT vec_id AS id,
               ROW_NUMBER() OVER (ORDER BY ROUND(dot / (na * nb), 6) DESC, vec_id) AS r_sem
        FROM prods ORDER BY ROUND(dot / (na * nb), 6) DESC, vec_id LIMIT 50
    )
    SELECT COALESCE(l.id, s.id) AS doc_id,
           COALESCE(r_lex, 0) AS r_lex,
           COALESCE(r_sem, 0) AS r_sem,
           ROUND(COALESCE(1.0 / (60 + r_lex), 0.0)
                 + COALESCE(1.0 / (60 + r_sem), 0.0), 6) AS rrf_score
    FROM lex l FULL OUTER JOIN sem s ON l.id = s.id
    ORDER BY ROUND(COALESCE(1.0 / (60 + r_lex), 0.0)
                   + COALESCE(1.0 / (60 + r_sem), 0.0), 6) DESC,
             COALESCE(l.id, s.id)
    LIMIT 10
    """,
)
def hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval (operators/similarity.py hybrid_rrf_topk): BM25
    lexical top-50 fused with cosine semantic top-50 by Reciprocal Rank
    Fusion (1/(60+rank), ranks over the rounded scores with id tie-break) —
    the standard RAG two-system retrieval stack over ids shared between the
    document corpus and the vector store. Both candidate sets are
    depth-bounded before the fusion join, so fusion cost is O(depth)
    regardless of corpus size."""
    from satsure_agri_datapipeline_spark.sources.token_stats_store import (
        token_stats_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.hybrid_rrf_topk(
        docs, emb, ["dup", "spark", "vector"], query_vec_id=0, k=10, depth=50,
        bm25_stats=token_stats_store_or_none(spark, sf_dir),
    )


@query(
    "doc_quality_score",
    r"""
    WITH feats AS (
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1) AS n_tokens,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens_raw,
               LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the', 'and', 'of', 'to', 'in'))) AS stop_hits
        FROM documents
    ),
    scaled AS (
        SELECT doc_id, n_chars, n_tokens_raw,
               CAST(FLOOR(n_punct * 10000.0 / GREATEST(n_chars, 1) + 0.5) AS BIGINT) AS punct_e4,
               CAST(FLOOR(stop_hits * 10000.0 / n_tokens + 0.5) AS BIGINT) AS stop_e4
        FROM feats
    )
    SELECT doc_id,
           n_chars AS n_chars_measured,
           n_tokens_raw AS n_tokens,
           punct_e4 AS punct_ratio_e4,
           stop_e4 AS stopword_ratio_e4,
           CAST(FLOOR((0.5 * LEAST(n_chars / 500.0, 1.0)
                 + 0.3 * LEAST(stop_e4 / 2000.0, 1.0)
                 + 0.2 * (1.0 - LEAST(punct_e4 / 1000.0, 1.0))) * 10000 + 0.5) AS BIGINT) AS quality_score_e4
    FROM scaled ORDER BY doc_id
    """,
)
def doc_quality_score(spark, sf_dir):
    """Heuristic quality scoring (length/punct/stopword; operators/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.quality_score(docs)


@query(
    "doc_language_id",
    r"""
    WITH toks AS (
        SELECT doc_id, lang AS true_lang, regexp_split_to_array(lower(text), '\s+') AS t
        FROM documents
    ),
    hits AS (
        SELECT doc_id, true_lang,
               len(list_filter(t, x -> x IN ('the','and','of','to','in'))) AS hits_en,
               len(list_filter(t, x -> x IN ('der','die','und','das','ist'))) AS hits_de,
               len(list_filter(t, x -> x IN ('el','la','de','que','los'))) AS hits_es,
               len(list_filter(t, x -> x IN ('le','la','et','les','des'))) AS hits_fr,
               len(list_filter(t, x -> x IN ('的','是','了','在','我'))) AS hits_zh
        FROM toks
    ),
    pred AS (
        SELECT doc_id, true_lang,
               CASE
                   WHEN hits_zh > GREATEST(hits_en, hits_de, hits_es, hits_fr, 0) THEN 'zh'
                   WHEN hits_fr > GREATEST(hits_en, hits_de, hits_es, 0) THEN 'fr'
                   WHEN hits_es > GREATEST(hits_en, hits_de, 0) THEN 'es'
                   WHEN hits_en > GREATEST(hits_de, 0) THEN 'en'
                   WHEN hits_de > 0 THEN 'de'
                   ELSE 'en'
               END AS predicted_lang
        FROM hits
    )
    SELECT true_lang, predicted_lang, COUNT(*) AS n
    FROM pred GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def doc_language_id(spark, sf_dir):
    """Marker-word language ID confusion counts vs the ground-truth lang
    column (operators/text.py). Argmax ties resolve identically in both
    engines: later language in sorted order wins only on strict >."""
    docs = load_table(spark, sf_dir, "documents")
    pred = tx.language_id(docs)
    return (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "predicted_lang")
    )


@query(
    "doc_fingerprint",
    """
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 3, 1))) AS i FROM words),
    shingles AS (SELECT doc_id, array_to_string(w[i:i+3], ' ') AS sh FROM idx),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM shingles
    )
    SELECT doc_id, MIN(h) AS fingerprint FROM hashed GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Min-hash document fingerprint over 4-gram shingles (operators/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.fingerprint(docs)


@query(
    "emb_cosine_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    prods AS (
        SELECT e.vec_id,
               list_sum(list_transform(list_zip(e.embedding, q.qv),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
               sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
               sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, ROUND(dot / (na * nb), 6) AS cosine_sim
    FROM prods
    ORDER BY ROUND(dot / (na * nb), 6) DESC, vec_id
    LIMIT 10
    """,
)
def emb_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vec_id=0 — the exact ANN
    baseline (operators/similarity.py, zip_with/aggregate dot product)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk_to(emb, query_id=0, k=10)


_QUANTIZED_TOPK_ORACLE = """
    WITH deq AS (
        SELECT vec_id,
               list_transform(
                   list_transform(embedding,
                       x -> FLOOR(CAST(x AS DOUBLE)
                                  / (list_max(list_transform(embedding,
                                         y -> abs(CAST(y AS DOUBLE)))) / 127.0)
                              + 0.5)),
                   v -> v * (list_max(list_transform(embedding,
                                y -> abs(CAST(y AS DOUBLE)))) / 127.0)) AS dv
        FROM embeddings
        WHERE list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0
    ),
    q AS (SELECT dv AS qv FROM deq WHERE vec_id = 0),
    prods AS (
        SELECT d.vec_id,
               list_sum(list_transform(list_zip(d.dv, q.qv),
                        p -> p[1] * p[2])) AS dot,
               sqrt(list_sum(list_transform(d.dv, x -> x * x))) AS na,
               sqrt(list_sum(list_transform(q.qv, x -> x * x))) AS nb
        FROM deq d CROSS JOIN q
        WHERE d.vec_id <> 0
    )
    SELECT vec_id, ROUND(dot / (na * nb), 6) AS cosine_sim_q
    FROM prods
    ORDER BY ROUND(dot / (na * nb), 6) DESC, vec_id
    LIMIT 10
    """


@query("emb_quantized_topk", _QUANTIZED_TOPK_ORACLE)
def emb_quantized_topk(spark, sf_dir):
    """Cosine top-10 of vec_id=0 over INT8-quantized-then-dequantized
    embeddings — the vectors-at-rest-quantized serving path; divergence
    from emb_cosine_topk is the measured quantization error. Serves the
    Arrow/numpy kernel (operators/similarity.py
    quantized_topk_to_vectorized — the fold form's five interpreted
    lambda passes per row ran 76 s at 2M vectors vs 2.6 s for the plain
    float scan; the kernel preserves the fold's exact IEEE op sequence).
    The Catalyst-fold twin emb_quantized_topk_fold shares this oracle as
    the JVM-side hash pin — the decontaminate r12→r13 precedent."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.quantized_topk_to_vectorized(emb, query_id=0, k=10)


@query("emb_quantized_topk_fold", _QUANTIZED_TOPK_ORACLE)
def emb_quantized_topk_fold(spark, sf_dir):
    """The SAME quantized-serving top-10 via the pure Catalyst HOF folds
    (operators/similarity.py quantized_topk_to) — kept oracle-shared so
    the expression form and the Arrow kernel are both hash-pinned to the
    same DuckDB recompute every round."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.quantized_topk_to(emb, query_id=0, k=10)


@query(
    "emb_centroid_norms",
    """
    WITH pos AS (
        SELECT vec_id, label, UNNEST(generate_series(1, len(embedding))) AS pos
        FROM embeddings
    ),
    comp AS (
        SELECT e.label, p.pos, AVG(CAST(e.embedding[p.pos] AS DOUBLE)) AS c
        FROM pos p JOIN embeddings e ON p.vec_id = e.vec_id
        GROUP BY e.label, p.pos
    ),
    norms AS (
        SELECT label, ROUND(sqrt(SUM(c * c)), 6) AS centroid_norm FROM comp GROUP BY label
    ),
    counts AS (
        SELECT label, CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors FROM embeddings GROUP BY label
    )
    SELECT CAST(counts.label AS BIGINT) AS label, n_vectors, centroid_norm
    FROM counts JOIN norms ON counts.label = norms.label
    ORDER BY label
    """,
)
def emb_centroid_norms(spark, sf_dir):
    """Per-label centroid (positional mean via posexplode) — distributed
    vector averaging with no collect (operators/similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.centroid_norms(emb).orderBy("label")


# The sign-bit quantizer is fully deterministic (cell = Σ 2^j over components
# with embedding[j+1] >= 0), so the "approximate" ANN is still exactly
# reproducible in SQL — approximate relative to brute force, not to the spec.
_CELL_SQL = " + ".join(
    f"(CASE WHEN CAST(embedding[{j + 1}] AS DOUBLE) >= 0 THEN {2**j} ELSE 0 END)"
    for j in range(8)
)


@query(
    "emb_ann_ivf",
    f"""
    WITH cells AS (
        SELECT vec_id, embedding, {_CELL_SQL} AS cell FROM embeddings
    ),
    q AS (SELECT embedding AS qv, cell AS qcell FROM cells WHERE vec_id = 0),
    cand AS (
        SELECT c.vec_id, c.embedding, q.qv
        FROM cells c CROSS JOIN q
        WHERE c.vec_id <> 0
          AND bit_count(CAST(xor(c.cell, q.qcell) AS BIGINT)) <= 2
    ),
    prods AS (
        SELECT vec_id,
               list_sum(list_transform(list_zip(embedding, qv),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
               sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        FROM cand
    )
    SELECT vec_id, ROUND(dot / (na * nb), 6) AS cosine_sim
    FROM prods
    ORDER BY ROUND(dot / (na * nb), 6) DESC, vec_id
    LIMIT 10
    """,
)
def emb_ann_ivf(spark, sf_dir):
    """IVF/LSH-bucketed approximate top-k: sign-bit coarse quantizer,
    Hamming-probed cells only (operators/similarity.py). Approximate vs the
    brute-force baseline (recall-tested in tests/), but deterministic — the
    oracle re-derives the same cell predicate + cosine in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_topk_to(emb, query_id=0, k=10, n_bits=8, hamming_probe=2)


@query(
    "emb_near_dup",
    f"""
    WITH cells AS (
        SELECT vec_id, embedding, {_CELL_SQL} AS cell FROM embeddings
    ),
    prods AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
               sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
               sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(dot / (na * nb), 6) AS cosine_sim
    FROM prods
    WHERE ROUND(dot / (na * nb), 6) >= 0.3
    ORDER BY id_a, id_b
    """,
)
def emb_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs: sign-LSH bucket join + exact cosine
    verification (operators/similarity.py embedding_near_dup_pairs). The
    synthetic embeddings carry no true near-dups, so the query's threshold
    (0.3) is set where the data has stable mass; the operator's production
    default is 0.95."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_near_dup_pairs(emb, threshold=0.3, n_bits=8, dim=64).orderBy(
        "id_a", "id_b"
    )


@query(
    "doc_chunks",
    r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    ),
    sized AS (
        SELECT doc_id, w,
               GREATEST(CAST(CEIL((len(w) - 16) / 48.0) AS INT), 1) AS n_chunks
        FROM t
    ),
    idx AS (
        SELECT doc_id, w, UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx
        FROM sized
    )
    SELECT doc_id, chunk_idx,
           len(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS n_chunk_tokens,
           array_to_string(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text
    FROM idx ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunks(spark, sf_dir):
    """Token-window chunking (64-token windows, 16-token overlap) — the
    pre-tokenization splitting step (operators/text.py chunk_documents)."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.chunk_documents(docs, chunk_tokens=64, overlap=16).orderBy(
        "doc_id", "chunk_idx"
    )


@query(
    "doc_top_ngrams",
    r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    ),
    grams AS (
        SELECT doc_id, array_to_string(w[i:i+1], ' ') AS ngram
        FROM t, UNNEST(generate_series(1, len(w) - 1)) AS s(i)
    )
    SELECT ngram,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM grams GROUP BY ngram
    ORDER BY n_docs DESC, n_occurrences DESC, ngram
    LIMIT 20
    """,
)
def doc_top_ngrams(spark, sf_dir):
    """Corpus top-20 word bigrams by document frequency — vocabulary /
    boilerplate mining (operators/text.py top_ngrams)."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.top_ngrams(docs, n=2, k=20)


@query(
    "doc_sample_bernoulli",
    """
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1000000 < 100000
    ORDER BY doc_id
    """,
)
def doc_sample_bernoulli(spark, sf_dir):
    """Deterministic 10% Bernoulli sample via portable keyed hash — map-only,
    scan-pushed predicate (operators/sampling.py hash_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sp.hash_sample(docs, fraction=0.1, seed=7)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "doc_sample_stratified",
    """
    SELECT doc_id, lang FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY lang
        ORDER BY ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                 doc_id
    ) <= 20
    ORDER BY doc_id
    """,
)
def doc_sample_stratified(spark, sf_dir):
    """Exact 20-docs-per-language stratified sample, hash-ordered so the
    choice is deterministic (operators/sampling.py stratified_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sp.stratified_sample(docs, ["lang"], k=20)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# One k-means round in DuckDB SQL: assign to nearest centroid (squared
# euclidean, ties -> min cluster_id), then per-position rounded means;
# empty clusters keep the previous centroid. Unrolled below for 2 rounds.
def _kmeans_round_sql(i: int) -> str:
    prev = f"cent{i - 1}"
    return f"""
    d{i} AS (
        SELECT b.vec_id, b.v, c.cluster_id,
               list_sum(list_transform(list_zip(b.v, c.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
        FROM base b CROSS JOIN {prev} c
    ),
    a{i} AS (
        SELECT d{i}.vec_id, d{i}.v, MIN(cluster_id) AS cluster_id
        FROM d{i}
        JOIN (SELECT vec_id AS vid, MIN(dist) AS md FROM d{i} GROUP BY 1) m
          ON d{i}.vec_id = m.vid AND d{i}.dist = m.md
        GROUP BY d{i}.vec_id, d{i}.v
    ),
    comp{i} AS (
        SELECT cluster_id, pos, ROUND(AVG(v[pos]), 9) AS c
        FROM (SELECT cluster_id, v, UNNEST(generate_series(1, len(v))) AS pos FROM a{i})
        GROUP BY 1, 2
    ),
    upd{i} AS (SELECT cluster_id, list(c ORDER BY pos) AS c FROM comp{i} GROUP BY 1),
    cent{i} AS (
        SELECT p.cluster_id, COALESCE(u.c, p.c) AS c
        FROM {prev} p LEFT JOIN upd{i} u USING (cluster_id)
    )"""


@query(
    "emb_kmeans",
    f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    seeded AS (
        SELECT vec_id, v,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                            vec_id
               ) AS rn
        FROM base
    ),
    cent0 AS (
        SELECT rn - 1 AS cluster_id, list_transform(v, x -> ROUND(x, 9)) AS c
        FROM seeded WHERE rn <= 8
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    {_kmeans_round_sql(3)},
    -- round 3's assign (a3) is the index assignment against the TRAINED
    -- quantizer cent2; its update CTEs are never referenced -> never run
    counts AS (SELECT cluster_id, COUNT(*) AS n FROM a3 GROUP BY 1)
    SELECT c.cluster_id,
           CAST(COALESCE(counts.n, 0) AS BIGINT) AS n_vectors,
           ROUND(sqrt(list_sum(list_transform(c.c, x -> x * x))), 6) AS centroid_norm
    FROM cent2 c LEFT JOIN counts USING (cluster_id)
    ORDER BY c.cluster_id
    """,
)
def emb_kmeans(spark, sf_dir):
    """IVF coarse quantizer trained with 2 rounds of deterministic Lloyd's
    k-means (operators/similarity.py kmeans_fit): hash-seeded init, rounded
    centroids, tie-broken argmin — the iterative algorithm is exactly
    reproduced by the oracle's unrolled recursion. Reports final cluster
    sizes and centroid norms."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("__v"),
    )
    cent = sim.kmeans_fit(emb, k=8, iterations=2)
    assigned = sim.kmeans_assign(base, cent, vec_col="__v", id_col="vec_id")
    counts = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
    norm = F.round(
        F.sqrt(
            F.aggregate(
                F.transform("centroid", lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
        6,
    )
    return (
        cent.join(counts, "cluster_id", "left")
        .select(
            "cluster_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_vectors"),
            norm.alias("centroid_norm"),
        )
        .orderBy("cluster_id")
    )


@query(
    "emb_ann_ivf_kmeans",
    f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    seeded AS (
        SELECT vec_id, v,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                            vec_id
               ) AS rn
        FROM base
    ),
    cent0 AS (
        SELECT rn - 1 AS cluster_id, list_transform(v, x -> ROUND(x, 9)) AS c
        FROM seeded WHERE rn <= 8
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    {_kmeans_round_sql(3)},
    qv AS (SELECT v AS q FROM base WHERE vec_id = 0),
    probes AS (
        SELECT c.cluster_id
        FROM cent2 c CROSS JOIN qv
        ORDER BY list_sum(list_transform(list_zip(qv.q, c.c),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                 c.cluster_id ASC
        LIMIT 2
    ),
    cand AS (
        SELECT a.vec_id, a.v, qv.q
        FROM a3 a JOIN probes USING (cluster_id) CROSS JOIN qv
        WHERE a.vec_id <> 0
    ),
    prods AS (
        SELECT vec_id,
               list_sum(list_transform(list_zip(v, q), p -> p[1] * p[2])) AS dot,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS na,
               sqrt(list_sum(list_transform(q, x -> x * x))) AS nb
        FROM cand
    )
    SELECT vec_id, ROUND(dot / (na * nb), 6) AS cosine_sim
    FROM prods
    ORDER BY ROUND(dot / (na * nb), 6) DESC, vec_id
    LIMIT 10
    """,
)
def emb_ann_ivf_kmeans(spark, sf_dir):
    """IVF ANN over the LEARNED k-means quantizer (operators/similarity.py
    ivf_topk_kmeans): assign to trained cells, probe the 2 nearest cells,
    exact cosine within them. Deterministic end to end — the oracle unrolls
    the same training recursion and probe selection.

    r12: serves the standing IVF store by default when a fresh,
    never-delta'd one exists (sources/ivf_store.py) — the fit and the
    full-corpus assignment vanish; the probe becomes partition pruning on
    the cluster_id-partitioned layout. A delta'd store is pinned-centroid
    semantics and is NOT served here (it would diverge from this oracle)."""
    from satsure_agri_datapipeline_spark.sources.ivf_store import (
        ann_topk_from_store,
        ivf_store_or_none,
    )

    store = ivf_store_or_none(spark, sf_dir, k=8, iterations=2, seed=0)
    if store is not None:
        cent, asg = store
        return ann_topk_from_store(cent, asg, query_id=0, k=10, nprobe=2)
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_topk_kmeans(
        emb, query_id=0, k=10, n_clusters=8, nprobe=2, iterations=2
    )


@query("emb_ann_ivf_kmeans_stored", None)
def emb_ann_ivf_kmeans_stored(spark, sf_dir):
    """The SAME IVF ANN query served from the standing index, building it
    on first use — shares ``emb_ann_ivf_kmeans``'s oracle (assigned below),
    so the store's centroids AND assignments are hash-pinned by the
    correctness gate every round."""
    from satsure_agri_datapipeline_spark.sources.ivf_store import (
        ann_topk_from_store,
        ensure_ivf_store,
    )

    cent, asg = ensure_ivf_store(spark, sf_dir, k=8, iterations=2, seed=0)
    return ann_topk_from_store(cent, asg, query_id=0, k=10, nprobe=2)


@query(
    "emb_ivf_eval",
    f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    seeded AS (
        SELECT vec_id, v,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                            vec_id
               ) AS rn
        FROM base
    ),
    cent0 AS (
        SELECT rn - 1 AS cluster_id, list_transform(v, x -> ROUND(x, 9)) AS c
        FROM seeded WHERE rn <= 8
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    {_kmeans_round_sql(3)},
    qv AS (SELECT v AS q FROM base WHERE vec_id = 0),
    pranked AS (
        SELECT c.cluster_id,
               ROW_NUMBER() OVER (
                   ORDER BY list_sum(list_transform(list_zip(qv.q, c.c),
                            p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                            c.cluster_id ASC
               ) AS prank
        FROM cent2 c CROSS JOIN qv
    ),
    scored AS (
        SELECT a.vec_id, pr.prank,
               ROUND(
                 list_sum(list_transform(list_zip(a.v, qv.q), p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                    * sqrt(list_sum(list_transform(qv.q, x -> x * x)))),
                 6) AS cos
        FROM a3 a JOIN pranked pr USING (cluster_id) CROSS JOIN qv
        WHERE a.vec_id <> 0
    ),
    truth AS (SELECT vec_id FROM scored ORDER BY cos DESC, vec_id LIMIT 10),
    plist(nprobe) AS (VALUES (1), (2), (4)),
    cand AS (
        SELECT pl.nprobe, s.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY pl.nprobe ORDER BY s.cos DESC, s.vec_id
               ) AS rn
        FROM scored s JOIN plist pl ON s.prank <= pl.nprobe
    ),
    hits AS (
        SELECT c.nprobe, COUNT(*) AS n_hits
        FROM cand c JOIN truth t USING (vec_id)
        WHERE c.rn <= 10 GROUP BY c.nprobe
    )
    SELECT CAST(pl.nprobe AS BIGINT) AS nprobe,
           (SELECT COUNT(*) FROM truth) AS n_truth,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_hits, 0) * 10000 // (SELECT COUNT(*) FROM truth)
               AS recall_e4
    FROM plist pl LEFT JOIN hits h USING (nprobe) ORDER BY nprobe
    """,
)
def emb_ivf_eval(spark, sf_dir):
    """Recall@10 of the IVF ANN path vs brute-force cosine ground truth at
    nprobe in (1, 2, 4) (similarity.ivf_recall_eval) — the ``doc_lsh_eval``
    measure-don't-guess gate applied to the embedding index (r13, verdict
    task 3). One fit + assignment feeds the whole sweep: every nprobe row
    is a TakeOrdered over one persisted (id, probe_rank, cosine) relation,
    not a fresh IVF pipeline. The oracle unrolls the same deterministic
    fit and ranks cells/candidates with identical tie-breaks, so the
    recall numbers are exact-regime checked, not approximated.

    Serves the standing IVF store under the raw-name rule (fresh AND
    never-delta'd, ``sources/ivf_store.py``) — the sweep then starts from
    the stored assignment and the fit cost vanishes."""
    from satsure_agri_datapipeline_spark.sources.ivf_store import (
        ivf_store_or_none,
    )

    store = ivf_store_or_none(spark, sf_dir, k=8, iterations=2, seed=0)
    if store is not None:
        return sim.ivf_recall_eval(
            None, query_id=0, k=10, n_clusters=8, nprobes=(1, 2, 4),
            fitted=store,
        )
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_recall_eval(
        emb, query_id=0, k=10, n_clusters=8, nprobes=(1, 2, 4), iterations=2
    )


# Product-quantization training, unrolled in SQL: an independent k-means per
# subspace — _kmeans_round_sql with the subspace in every join/group key.
# m=8 subspaces, 16 codewords, 2 rounds; pa3 is the final code assignment
# against the trained codebooks pcent2 (its update CTEs are never referenced).
_PQ_M, _PQ_K = 8, 16


def _pq_round_sql(i: int) -> str:
    prev = f"pcent{i - 1}"
    return f"""
    pd{i} AS (
        SELECT b.vec_id, b.subspace, b.sv, c.cluster_id,
               list_sum(list_transform(list_zip(b.sv, c.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
        FROM pbase b JOIN {prev} c ON b.subspace = c.subspace
    ),
    pa{i} AS (
        SELECT pd{i}.vec_id, pd{i}.subspace, pd{i}.sv, MIN(cluster_id) AS cluster_id
        FROM pd{i}
        JOIN (SELECT vec_id AS vid, subspace AS ss, MIN(dist) AS md
              FROM pd{i} GROUP BY 1, 2) mm
          ON pd{i}.vec_id = mm.vid AND pd{i}.subspace = mm.ss AND pd{i}.dist = mm.md
        GROUP BY pd{i}.vec_id, pd{i}.subspace, pd{i}.sv
    ),
    pcomp{i} AS (
        SELECT subspace, cluster_id, pos, ROUND(AVG(sv[pos]), 9) AS c
        FROM (SELECT subspace, cluster_id, sv,
                     UNNEST(generate_series(1, len(sv))) AS pos FROM pa{i})
        GROUP BY 1, 2, 3
    ),
    pupd{i} AS (
        SELECT subspace, cluster_id, list(c ORDER BY pos) AS c
        FROM pcomp{i} GROUP BY 1, 2
    ),
    pcent{i} AS (
        SELECT p.subspace, p.cluster_id, COALESCE(u.c, p.c) AS c
        FROM {prev} p LEFT JOIN pupd{i} u
          ON p.subspace = u.subspace AND p.cluster_id = u.cluster_id
    )"""


_PQ_TRAIN_SQL = f"""
    v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    pbase AS (
        SELECT vec_id, j AS subspace,
               list_slice(v, j * (len(v) // {_PQ_M}) + 1,
                          (j + 1) * (len(v) // {_PQ_M})) AS sv
        FROM (SELECT vec_id, v,
                     UNNEST(generate_series(0, {_PQ_M - 1})) AS j FROM v)
    ),
    pseeded AS (
        SELECT vec_id,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                            vec_id
               ) AS rn
        FROM v
    ),
    pcent0 AS (
        SELECT b.subspace, s.rn - 1 AS cluster_id,
               list_transform(b.sv, x -> ROUND(x, 9)) AS c
        FROM pseeded s JOIN pbase b USING (vec_id)
        WHERE s.rn <= {_PQ_K}
    ),
    {_pq_round_sql(1)},
    {_pq_round_sql(2)},
    {_pq_round_sql(3)}
"""

# ADC readout over the trained codebooks: LUT = per-(subspace, codeword)
# squared distance from query 0's sub-vector; a vector's approximate
# distance sums its m LUT entries IN SUBSPACE ORDER (list ORDER BY subspace
# then list_sum — the same left-to-right fold the Spark side runs).
_PQ_ADC_SQL = """
    qsub AS (SELECT subspace, sv AS qsv FROM pbase WHERE vec_id = 0),
    lut AS (
        SELECT c.subspace, c.cluster_id,
               list_sum(list_transform(list_zip(q.qsv, c.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
        FROM pcent2 c JOIN qsub q ON c.subspace = q.subspace
    ),
    adc AS (
        SELECT a.vec_id, list_sum(list(l.d ORDER BY a.subspace)) AS dist
        FROM pa3 a JOIN lut l
          ON a.subspace = l.subspace AND a.cluster_id = l.cluster_id
        WHERE a.vec_id <> 0
        GROUP BY a.vec_id
    )
"""


_PQ_CODEBOOK_ORACLE = f"""
    WITH {_PQ_TRAIN_SQL},
    counts AS (
        SELECT subspace, cluster_id, COUNT(*) AS n FROM pa3 GROUP BY 1, 2
    )
    SELECT c.subspace, c.cluster_id,
           CAST(COALESCE(counts.n, 0) AS BIGINT) AS n_vectors,
           ROUND(sqrt(list_sum(list_transform(c.c, x -> x * x))), 6) AS centroid_norm
    FROM pcent2 c
    LEFT JOIN counts ON c.subspace = counts.subspace AND c.cluster_id = counts.cluster_id
    ORDER BY c.subspace, c.cluster_id
    """

_PQ_TOPK_ORACLE = f"""
    WITH {_PQ_TRAIN_SQL},
    {_PQ_ADC_SQL}
    SELECT vec_id, ROUND(dist, 6) AS adc_dist
    FROM adc
    ORDER BY ROUND(dist, 6) ASC, vec_id ASC
    LIMIT 10
    """


@query("emb_pq_codebook", _PQ_CODEBOOK_ORACLE)
def emb_pq_codebook(spark, sf_dir):
    """Product-quantization codebooks (operators/similarity.py pq_fit): an
    independent deterministic Lloyd's k-means per subspace, trained as one
    set of jobs with subspace in every key. Reports per-codeword assignment
    counts and norms; the oracle unrolls the same recursion per subspace.
    PQ is the ANN memory path: dim-64 float32 = 256 B/vector vs 8 small
    ints — at 100 B vectors the codes relation is ~50× smaller than the
    raw embeddings and ADC search never touches the floats.

    Serves the standing PQ store under the raw-name rule (fresh AND
    never-delta'd, ``sources/pq_store.py``): counts then come from one
    posexplode over the stored codes — zero fit, zero distance math."""
    from satsure_agri_datapipeline_spark.sources.pq_store import (
        codebook_report_from_store,
        pq_store_or_none,
    )

    store = pq_store_or_none(spark, sf_dir, m=_PQ_M, k=_PQ_K, iterations=2, seed=0)
    if store is not None:
        return codebook_report_from_store(*store)
    emb = load_table(spark, sf_dir, "embeddings")
    cb = sim.pq_fit(emb, m=_PQ_M, k=_PQ_K, iterations=2)
    counts = (
        sim.pq_encode(emb, cb, m=_PQ_M)
        .select(F.posexplode("codes").alias("subspace", "cluster_id"))
        .groupBy("subspace", "cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = F.round(
        F.sqrt(
            F.aggregate(
                F.transform("centroid", lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
        6,
    )
    return (
        cb.join(counts, ["subspace", "cluster_id"], "left")
        .select(
            "subspace",
            "cluster_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_vectors"),
            norm.alias("centroid_norm"),
        )
        .orderBy("subspace", "cluster_id")
    )


@query("emb_pq_codebook_stored", _PQ_CODEBOOK_ORACLE)
def emb_pq_codebook_stored(spark, sf_dir):
    """The SAME codebook report served from the standing PQ store, building
    it on first use — shares ``emb_pq_codebook``'s oracle, so the store's
    codebooks AND codes are hash-pinned by the correctness gate every
    round."""
    from satsure_agri_datapipeline_spark.sources.pq_store import (
        codebook_report_from_store,
        ensure_pq_store,
    )

    cb, codes = ensure_pq_store(
        spark, sf_dir, m=_PQ_M, k=_PQ_K, iterations=2, seed=0
    )
    return codebook_report_from_store(cb, codes)


@query("emb_pq_topk", _PQ_TOPK_ORACLE)
def emb_pq_topk(spark, sf_dir):
    """Asymmetric-distance top-10 over PQ codes (operators/similarity.py
    pq_topk_adc): the corpus side of the search touches only the m-int
    codes — distances are read out of a broadcast m×k lookup table with a
    left-to-right fold, so the scan is map-only and the only shuffle is
    the final TakeOrdered. The oracle trains the same codebooks and sums
    the same LUT entries in the same subspace order.

    Serves the standing PQ store under the raw-name rule (fresh AND
    never-delta'd): fit + full-corpus encode vanish; the corpus-side scan
    reads only the codes relation (the embeddings source is touched for
    the single query row, a pushed-down point filter)."""
    from satsure_agri_datapipeline_spark.sources.pq_store import pq_store_or_none

    emb = load_table(spark, sf_dir, "embeddings")
    store = pq_store_or_none(spark, sf_dir, m=_PQ_M, k=_PQ_K, iterations=2, seed=0)
    if store is not None:
        return sim.pq_topk_adc(
            emb, query_id=0, k=10, m=_PQ_M, n_codes=_PQ_K, fitted=store
        )
    return sim.pq_topk_adc(
        emb, query_id=0, k=10, m=_PQ_M, n_codes=_PQ_K, iterations=2
    )


@query("emb_pq_topk_stored", _PQ_TOPK_ORACLE)
def emb_pq_topk_stored(spark, sf_dir):
    """The SAME ADC search served from the standing PQ store, building it
    on first use — shares ``emb_pq_topk``'s oracle."""
    from satsure_agri_datapipeline_spark.sources.pq_store import ensure_pq_store

    emb = load_table(spark, sf_dir, "embeddings")
    store = ensure_pq_store(spark, sf_dir, m=_PQ_M, k=_PQ_K, iterations=2, seed=0)
    return sim.pq_topk_adc(
        emb, query_id=0, k=10, m=_PQ_M, n_codes=_PQ_K, fitted=store
    )


# IVF-PQ composition: the IVF training recursion (base/seeded/cent0 +
# d/a/cent rounds) and the PQ training recursion (v/pbase/pseeded/pcent0 +
# pd/pa/pcent rounds) use disjoint CTE prefixes BY DESIGN, so the composed
# oracle is their concatenation plus a probe-restricted ADC readout.
_IVFPQ_ORACLE = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    seeded AS (
        SELECT vec_id, v,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                            vec_id
               ) AS rn
        FROM base
    ),
    cent0 AS (
        SELECT rn - 1 AS cluster_id, list_transform(v, x -> ROUND(x, 9)) AS c
        FROM seeded WHERE rn <= 8
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    {_kmeans_round_sql(3)},
    {_PQ_TRAIN_SQL},
    {_PQ_ADC_SQL},
    qv AS (SELECT v AS q FROM base WHERE vec_id = 0),
    probes AS (
        SELECT c.cluster_id
        FROM cent2 c CROSS JOIN qv
        ORDER BY list_sum(list_transform(list_zip(qv.q, c.c),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                 c.cluster_id ASC
        LIMIT 2
    ),
    cand AS (
        SELECT a.vec_id
        FROM a3 a JOIN probes USING (cluster_id)
        WHERE a.vec_id <> 0
    )
    SELECT adc.vec_id, ROUND(adc.dist, 6) AS adc_dist
    FROM adc JOIN cand USING (vec_id)
    ORDER BY ROUND(adc.dist, 6) ASC, adc.vec_id ASC
    LIMIT 10
    """


# Recall gate for the composition: same training/probe/candidate CTEs as
# _IVFPQ_ORACLE, final select replaced by the got/truth intersection count
# (the emb_pq_eval tail). IVFPQ loses recall two ways — an unprobed cell
# holding a true neighbor, and ADC quantization reordering — and only the
# composed measurement exposes their joint effect.
_IVFPQ_EVAL_ORACLE = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    seeded AS (
        SELECT vec_id, v,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                            vec_id
               ) AS rn
        FROM base
    ),
    cent0 AS (
        SELECT rn - 1 AS cluster_id, list_transform(v, x -> ROUND(x, 9)) AS c
        FROM seeded WHERE rn <= 8
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    {_kmeans_round_sql(3)},
    {_PQ_TRAIN_SQL},
    {_PQ_ADC_SQL},
    qv AS (SELECT v AS q FROM base WHERE vec_id = 0),
    probes AS (
        SELECT c.cluster_id
        FROM cent2 c CROSS JOIN qv
        ORDER BY list_sum(list_transform(list_zip(qv.q, c.c),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                 c.cluster_id ASC
        LIMIT 2
    ),
    cand AS (
        SELECT a.vec_id
        FROM a3 a JOIN probes USING (cluster_id)
        WHERE a.vec_id <> 0
    ),
    got AS (
        SELECT adc.vec_id
        FROM adc JOIN cand USING (vec_id)
        ORDER BY ROUND(adc.dist, 6) ASC, adc.vec_id ASC
        LIMIT 10
    ),
    truth AS (
        SELECT vec_id FROM (
            SELECT b.vec_id,
                   ROUND(list_sum(list_transform(list_zip(b.v, qv.q),
                         p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS d
            FROM base b CROSS JOIN qv
            WHERE b.vec_id <> 0
        )
        ORDER BY d ASC, vec_id ASC
        LIMIT 10
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
           (SELECT COUNT(*) FROM got JOIN truth USING (vec_id)) AS n_hits,
           (SELECT COUNT(*) FROM got JOIN truth USING (vec_id)) * 10000
               // (SELECT COUNT(*) FROM truth) AS recall_e4
    """


@query("emb_ann_ivfpq", _IVFPQ_ORACLE)
def emb_ann_ivfpq(spark, sf_dir):
    """IVF-PQ composed ANN (operators/similarity.py ivfpq_topk — the FAISS
    IVFPQ shape over this repo's two standing ANN stores): probe the 2
    k-means cells nearest the query, ADC-rank only those cells' vectors
    over their PQ codes. Cell pruning cuts the candidate scan to
    nprobe/n_clusters of the corpus AND the pruned scan reads the
    ~50×-compressed codes. Serves whichever of the IVF / PQ stores is
    fresh-and-never-delta'd (each half independently); the oracle
    concatenates the two unrolled training recursions."""
    from satsure_agri_datapipeline_spark.sources.ivf_store import (
        ivf_store_or_none,
    )
    from satsure_agri_datapipeline_spark.sources.pq_store import pq_store_or_none

    emb = load_table(spark, sf_dir, "embeddings")
    ivf = ivf_store_or_none(spark, sf_dir, k=8, iterations=2, seed=0)
    pq = pq_store_or_none(spark, sf_dir, m=_PQ_M, k=_PQ_K, iterations=2, seed=0)
    return sim.ivfpq_topk(
        emb, query_id=0, k=10, n_clusters=8, nprobe=2, m=_PQ_M, n_codes=_PQ_K,
        iterations=2, fitted_ivf=ivf, fitted_pq=pq,
    )


@query("emb_ann_ivfpq_stored", _IVFPQ_ORACLE)
def emb_ann_ivfpq_stored(spark, sf_dir):
    """The SAME IVF-PQ search with both standing stores ensured (built on
    first use) — shares ``emb_ann_ivfpq``'s oracle, so both stores'
    artifacts are hash-pinned through the composition every round."""
    from satsure_agri_datapipeline_spark.sources.ivf_store import ensure_ivf_store
    from satsure_agri_datapipeline_spark.sources.pq_store import ensure_pq_store

    emb = load_table(spark, sf_dir, "embeddings")
    ivf = ensure_ivf_store(spark, sf_dir, k=8, iterations=2, seed=0)
    pq = ensure_pq_store(spark, sf_dir, m=_PQ_M, k=_PQ_K, iterations=2, seed=0)
    return sim.ivfpq_topk(
        emb, query_id=0, k=10, n_clusters=8, nprobe=2, m=_PQ_M, n_codes=_PQ_K,
        iterations=2, fitted_ivf=ivf, fitted_pq=pq,
    )


@query("emb_ann_ivfpq_colocated", _IVFPQ_ORACLE)
def emb_ann_ivfpq_colocated(spark, sf_dir):
    """The SAME IVF-PQ search from the CO-LOCATED store
    (sources/ivfpq_store.py — FAISS's inverted-list-of-codes layout,
    built on first use): codes live hive-partitioned by cluster_id, so
    the probe partition-prunes the codes scan directly and the per-query
    candidate id-shuffle of the two-store composition is gone. Shares
    ``emb_ann_ivfpq``'s oracle: the lists are written by the same
    deterministic fits, so the hash pins all three artifacts."""
    from satsure_agri_datapipeline_spark.sources.ivfpq_store import (
        ensure_ivfpq_store,
        ivfpq_topk_from_lists,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent, cb, lists = ensure_ivfpq_store(
        spark, sf_dir, n_clusters=8, m=_PQ_M, k=_PQ_K, iterations=2, seed=0
    )
    return ivfpq_topk_from_lists(
        emb, cent, cb, lists, query_id=0, k=10, nprobe=2, m=_PQ_M
    )


@query("emb_ivfpq_eval", _IVFPQ_EVAL_ORACLE)
def emb_ivfpq_eval(spark, sf_dir):
    """Recall@10 of the composed IVF-PQ search vs exact squared-L2 ground
    truth (operators/similarity.py ivfpq_recall_eval) — the
    measure-don't-guess gate applied to the COMPOSITION: cell-miss and
    quantization-reorder recall losses only show up measured jointly.
    Serves both standing ANN stores (built on first use)."""
    from satsure_agri_datapipeline_spark.sources.ivf_store import ensure_ivf_store
    from satsure_agri_datapipeline_spark.sources.pq_store import ensure_pq_store

    emb = load_table(spark, sf_dir, "embeddings")
    ivf = ensure_ivf_store(spark, sf_dir, k=8, iterations=2, seed=0)
    pq = ensure_pq_store(spark, sf_dir, m=_PQ_M, k=_PQ_K, iterations=2, seed=0)
    return sim.ivfpq_recall_eval(
        emb, query_id=0, k=10, n_clusters=8, nprobe=2, m=_PQ_M, n_codes=_PQ_K,
        iterations=2, fitted_ivf=ivf, fitted_pq=pq,
    )


@query(
    "emb_pq_eval",
    f"""
    WITH {_PQ_TRAIN_SQL},
    {_PQ_ADC_SQL},
    got AS (
        SELECT vec_id FROM adc
        ORDER BY ROUND(dist, 6) ASC, vec_id ASC
        LIMIT 10
    ),
    qv AS (SELECT v AS q FROM v WHERE vec_id = 0),
    truth AS (
        SELECT vec_id FROM (
            SELECT b.vec_id,
                   ROUND(list_sum(list_transform(list_zip(b.v, qv.q),
                         p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS d
            FROM v b CROSS JOIN qv
            WHERE b.vec_id <> 0
        )
        ORDER BY d ASC, vec_id ASC
        LIMIT 10
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
           (SELECT COUNT(*) FROM got JOIN truth USING (vec_id)) AS n_hits,
           (SELECT COUNT(*) FROM got JOIN truth USING (vec_id)) * 10000
               // (SELECT COUNT(*) FROM truth) AS recall_e4
    """,
)
def emb_pq_eval(spark, sf_dir):
    """Recall@10 of ADC-over-codes vs exact squared-L2 ground truth
    (operators/similarity.py pq_recall_eval) — the measure-don't-guess gate
    (doc_lsh_eval r5, emb_ivf_eval r13) applied to the PQ path:
    quantization error is a per-corpus property, so it is measured on THIS
    corpus, fully oracle-checked (both rankings and the intersection are
    deterministic). Serves the standing PQ store for the ADC side under
    the raw-name rule; the exact ground truth always scans the floats."""
    from satsure_agri_datapipeline_spark.sources.pq_store import pq_store_or_none

    emb = load_table(spark, sf_dir, "embeddings")
    store = pq_store_or_none(spark, sf_dir, m=_PQ_M, k=_PQ_K, iterations=2, seed=0)
    return sim.pq_recall_eval(
        emb, query_id=0, k=10, m=_PQ_M, n_codes=_PQ_K, iterations=2, fitted=store
    )


@query(
    "emb_normalize",
    """
    WITH norms AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    )
    SELECT vec_id,
           ROUND(nrm, 6) AS l2_norm,
           ROUND(CAST(embedding[1] AS DOUBLE) / nrm, 6) AS u1,
           ROUND(CAST(embedding[2] AS DOUBLE) / nrm, 6) AS u2,
           ROUND(CAST(embedding[3] AS DOUBLE) / nrm, 6) AS u3
    FROM norms ORDER BY vec_id
    """,
)
def emb_normalize(spark, sf_dir):
    """L2 normalization (operators/similarity.py l2_normalize) — unit-vector
    precondition for dot-product retrieval; first three components checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.l2_normalize(emb)
    return out.select(
        "vec_id",
        "l2_norm",
        *[
            F.round(F.element_at("unit_vec", i), 6).alias(f"u{i}")
            for i in (1, 2, 3)
        ],
    ).orderBy("vec_id")


@query(
    "emb_quantize",
    """
    WITH scaled AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, scale,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) / scale + 0.5) AS INT)) AS qv
        FROM scaled
    )
    SELECT vec_id,
           CAST(FLOOR(scale * 1000000000 + 0.5) AS BIGINT) AS scale_e9,
           qv[1] AS q1,
           CAST(list_sum(list_transform(qv, v -> CAST(v AS BIGINT) * v)) AS BIGINT) AS q_norm2
    FROM q ORDER BY vec_id
    """,
)
def emb_quantize(spark, sf_dir):
    """Symmetric int8 quantization (operators/similarity.py quantize_int8):
    per-vector scale, first quantized component, and the quantized squared
    norm — all integers, so the cross-engine hash is exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.quantize_int8(emb)
    q_norm2 = F.aggregate(
        F.transform("q", lambda v: v.cast("long") * v.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return out.select(
        "vec_id",
        F.floor(F.col("scale") * 1_000_000_000 + F.lit(0.5))
        .cast("long")
        .alias("scale_e9"),
        F.element_at("q", 1).alias("q1"),
        q_norm2.alias("q_norm2"),
    ).orderBy("vec_id")


@query(
    "doc_normalize_text",
    r"""
    WITH cleaned AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^0-9a-z\s]', '', 'g'),
                                   '\s+', ' ', 'g')) AS norm_text
        FROM documents
    )
    SELECT doc_id, norm_text,
           CASE WHEN LENGTH(norm_text) > 0
                THEN len(string_split(norm_text, ' ')) ELSE 0 END AS n_tokens_norm
    FROM cleaned ORDER BY doc_id
    """,
)
def doc_normalize_text(spark, sf_dir):
    """Canonical lowercase/strip/collapse normalization
    (operators/text.py normalize_text)."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.normalize_text(docs).orderBy("doc_id")


@query(
    "doc_redact_pii",
    r"""
    WITH red AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
                       '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                   '\+?[0-9][0-9() .-]{7,}[0-9]', '<PHONE>', 'g') AS redacted_text
        FROM documents
    )
    SELECT doc_id, redacted_text,
           CAST(len(regexp_extract_all(redacted_text, '<EMAIL>'))
              + len(regexp_extract_all(redacted_text, '<IP>'))
              + len(regexp_extract_all(redacted_text, '<PHONE>')) AS BIGINT) AS n_redactions
    FROM red ORDER BY doc_id
    """,
)
def doc_redact_pii(spark, sf_dir):
    """Rule-based PII redaction (operators/text.py redact_pii): emails,
    IPv4s, phone-like digit runs → placeholder tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.redact_pii(docs).select(
        "doc_id", "redacted_text", "n_redactions"
    ).orderBy("doc_id")


@query(
    "corpus_mix",
    r"""
    WITH agg AS (
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens,
           CAST(FLOOR(n_tokens * 1000000.0 / SUM(n_tokens) OVER () + 0.5) AS BIGINT) AS token_share_e6
    FROM agg ORDER BY lang, source
    """,
)
def corpus_mix(spark, sf_dir):
    """Training-mix report: per (lang, source) doc/token counts and token
    share of corpus (operators/text.py corpus_mix_report)."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.corpus_mix_report(docs).orderBy("lang", "source")


@query(
    "multimodal_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           'application/octet-stream' AS media_type
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_metadata(spark, sf_dir):
    """Binary-column metadata plumbing: documents' text bytes as an opaque
    payload → size + sniffed media type (operators/multimodal.py). The digest
    and decode stages are exercised in tests; the oracle checks the
    byte-length and sniff paths."""
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    withmeta = mm.attach_binary_metadata(payload)
    return withmeta.select(
        "doc_id",
        F.col("media_meta.n_bytes").cast("int").alias("n_bytes"),
        F.col("media_meta.media_type").alias("media_type"),
    )


@query(
    "multimodal_features",
    """
    WITH payload AS (
        SELECT doc_id, encode(text) AS b, octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    idx AS (
        SELECT doc_id, n_bytes, b, UNNEST(generate_series(1, n_bytes)) AS i
        FROM payload
    ),
    hist AS (
        SELECT doc_id,
               SUM(CASE WHEN ('0x' || substr(hex(b), 2 * i - 1, 2))::INT % 8 = 0
                        THEN 1 ELSE 0 END) AS cnt0
        FROM idx GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_bytes AS INT) AS n_bytes,
           CAST(FLOOR(CAST(CAST(COALESCE(h.cnt0, 0) * 1.0 / GREATEST(p.n_bytes, 1) AS REAL) AS DOUBLE)
                      * 10000 + 0.5) AS BIGINT) AS f0_e4
    FROM payload p LEFT JOIN hist h USING (doc_id)
    ORDER BY doc_id
    """,
)
def multimodal_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (deterministic fake featurizer standing in for a real decoder). The fake
    is a byte histogram folded mod 8 (multimodal.py:74-81) — SQL-expressible,
    so bucket 0's share is oracle-checked as a half-up ×10⁴ integer; the
    float32 round-trip (Arrow declares array<float>) is mirrored by
    CAST(... AS REAL) in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    feats = mm.decode_image_features(payload)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.floor(F.element_at("feature", 1).cast("double") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("f0_e4"),
    )


@query(
    "doc_pair_edit_distance",
    f"""
    WITH {JACCARD_PAIRS_SQL}
    SELECT p.id_a, p.id_b,
           levenshtein(substr(da.text, 1, 120), substr(db.text, 1, 120)) AS lev_120
    FROM pairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    ORDER BY p.id_a, p.id_b
    """,
)
def doc_pair_edit_distance(spark, sf_dir):
    """Edit-distance verify stage over near-dup CANDIDATES — the standard
    two-phase dedup shape: a cheap set-similarity recall pass (shingle
    bucket join) proposes pairs, an O(len²) precision metric runs only on
    those pairs, never all-pairs. The length cap (first 120 chars) bounds
    per-pair cost; the text join is two broadcast-able probes keyed by
    doc_id. Levenshtein is exact integer — engine-agnostic."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_default(
        spark, sf_dir, docs, threshold=0.5, gate_name="doc_pair_edit_distance"
    )
    prefix = docs.select("doc_id", F.substring("text", 1, 120).alias("prefix"))
    a = prefix.withColumnsRenamed({"doc_id": "id_a", "prefix": "pa"})
    b = prefix.withColumnsRenamed({"doc_id": "id_b", "prefix": "pb"})
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.levenshtein("pa", "pb").alias("lev_120"))
        .orderBy("id_a", "id_b")
    )


@query(
    "doc_decontaminate",
    """
    WITH bench AS (SELECT text FROM documents WHERE doc_id % 97 = 0),
    train AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
    tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM train),
    ti AS (SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 3, 0))) AS i FROM tw),
    tsh AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5('0:' || array_to_string(w[i:i+3], ' ')), 1, 15))::BIGINT AS sh
        FROM ti
    ),
    bw AS (SELECT string_split(text, ' ') AS w FROM bench),
    bi AS (SELECT w, UNNEST(generate_series(1, GREATEST(len(w) - 3, 0))) AS i FROM bw),
    bsh AS (
        SELECT DISTINCT
               ('0x' || substr(md5('0:' || array_to_string(w[i:i+3], ' ')), 1, 15))::BIGINT AS sh
        FROM bi
    )
    SELECT t.doc_id, COUNT(*) AS n_hits
    FROM tsh t JOIN bsh b ON t.sh = b.sh
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def doc_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs sharing ≥1 distinct 8-gram
    with the benchmark slice (here doc_id % 97 == 0 stands in for an eval
    set; n=4 because the synthetic word-salad corpus barely repeats longer
    spans — real corpora use the operator's default 8-13). The benchmark's distinct shingle hashes broadcast against the
    exploded train shingles (operators/text.py:decontaminate).

    r12: serves a fresh n=4 shingle store by default — the train side
    becomes a FILTER on the bucketed relation (doc_id % 97 <> 0, exact)
    instead of a per-run 4-gram hashing pass, the single largest stage of
    the 1000× curation profile."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    store = shingle_store_or_none(spark, sf_dir, n=4, unit="word", seed=0)
    exploded = (
        store.where(F.col("doc_id") % 97 != 0) if store is not None else None
    )
    return tx.decontaminate(
        train, bench, n=4, min_hits=1, exploded=exploded
    ).orderBy("doc_id")


@query(
    "doc_repetition",
    """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    tok AS (
        SELECT doc_id, w, UNNEST(generate_series(1, len(w))) AS i FROM words
    ),
    pairs AS (
        SELECT doc_id, w[i] AS tok,
               CASE WHEN i < len(w) THEN w[i] || ' ' || w[i+1] END AS bigram
        FROM tok
    ),
    per_tok AS (
        SELECT doc_id, tok, COUNT(*) AS c,
               COUNT(DISTINCT bigram) AS d_bi,
               SUM(CASE WHEN bigram IS NOT NULL THEN 1 ELSE 0 END) AS n_bi
        FROM pairs GROUP BY doc_id, tok
    ),
    agg AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_distinct,
               MAX(c) AS top_c,
               SUM(d_bi) AS d_bigrams,
               SUM(n_bi) AS n_bigrams
        FROM per_tok GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(FLOOR(CAST(n_distinct AS DOUBLE) / n_tokens * 10000 + 0.5) AS BIGINT) AS distinct_ratio_e4,
           CAST(FLOOR(CAST(top_c AS DOUBLE) / n_tokens * 10000 + 0.5) AS BIGINT) AS top_token_ratio_e4,
           CASE WHEN n_bigrams > 0
                THEN CAST(FLOOR((1 - CAST(d_bigrams AS DOUBLE) / n_bigrams) * 10000 + 0.5) AS BIGINT)
                ELSE 0 END AS dup_bigram_ratio_e4,
           (CAST(top_c AS DOUBLE) / n_tokens > 0.20
            OR (n_bigrams > 0 AND 1 - CAST(d_bigrams AS DOUBLE) / n_bigrams > 0.50)) AS repetitive
    FROM agg
    ORDER BY doc_id
    """,
)
def doc_repetition(spark, sf_dir):
    """Gopher/C4-style repetition quality signals (operators/text.py:
    repetition_stats): distinct-token, top-token and duplicate-bigram
    shares as ×10⁴ ints plus the threshold flag."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.repetition_stats(docs).orderBy("doc_id")


@query(
    "multimodal_frames",
    """
    WITH frames AS (
        SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes, text,
               UNNEST(generate_series(0, 3)) AS frame_no
        FROM documents
    )
    SELECT doc_id, frame_no,
           md5(SUBSTRING(text, frame_no * 64 + 1, 64)) AS frame_md5
    FROM frames
    WHERE frame_no * 64 < n_bytes
    ORDER BY doc_id, frame_no
    """,
)
def multimodal_frames(spark, sf_dir):
    """Frame-sampling plumbing oracle-checked end to end: fixed-offset
    64-byte windows sliced from each binary payload (multimodal.py:
    sample_frames), emitted as md5 hex so the binary frames themselves are
    value-compared across engines. DuckDB's substring is VARCHAR-only, so
    the oracle slices characters — equivalent to the Spark side's byte
    slicing because the corpus is pure ASCII (octet_length == length
    verified). Pure column expressions — explode + binary substring;
    map-only besides the output sort."""
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    frames = mm.sample_frames(payload, every_n_bytes=64, max_frames=4)
    return frames.select(
        "doc_id", "frame_no", F.md5("frame_bytes").alias("frame_md5")
    ).orderBy("doc_id", "frame_no")


@query(
    "doc_curation_pipeline",
    r"""
    WITH RECURSIVE feats AS (
        SELECT doc_id, LENGTH(text) AS n_chars,
               GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1) AS n_tokens,
               LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the', 'and', 'of', 'to', 'in'))) AS stop_hits
        FROM documents
    ),
    scaled AS (
        SELECT doc_id, n_chars,
               CAST(FLOOR(n_punct * 10000.0 / GREATEST(n_chars, 1) + 0.5) AS BIGINT) AS punct_e4,
               CAST(FLOOR(stop_hits * 10000.0 / n_tokens + 0.5) AS BIGINT) AS stop_e4
        FROM feats
    ),
    q AS (
        SELECT d.doc_id, d.text
        FROM documents d JOIN scaled s ON d.doc_id = s.doc_id
        WHERE CAST(FLOOR((0.5 * LEAST(s.n_chars / 500.0, 1.0)
                    + 0.3 * LEAST(s.stop_e4 / 2000.0, 1.0)
                    + 0.2 * (1.0 - LEAST(s.punct_e4 / 1000.0, 1.0))) * 10000 + 0.5) AS BIGINT) >= 5000
    ),
    ex AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(lower(trim(text)))),
    d2 AS (SELECT q.doc_id, q.text FROM q JOIN ex USING (doc_id)),
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM d2),
    idx2 AS (SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 2, 0))) AS i FROM words),
    sh2 AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5('0:' || array_to_string(w[i:i+2], ' ')), 1, 15))::BIGINT AS sh
        FROM idx2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs2 AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON inter.id_a = sa.doc_id
        JOIN sizes sb ON inter.id_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM pairs2
        UNION ALL SELECT id_b, id_a FROM pairs2
    ),
    reach(node, lbl) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
    ),
    losers AS (
        SELECT node FROM (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node)
        WHERE node <> cluster
    ),
    d3 AS (SELECT doc_id, text FROM d2 WHERE doc_id NOT IN (SELECT node FROM losers)),
    bw AS (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 = 0),
    bi AS (SELECT w, UNNEST(generate_series(1, GREATEST(len(w) - 3, 0))) AS i FROM bw),
    bsh AS (
        SELECT DISTINCT
               ('0x' || substr(md5('0:' || array_to_string(w[i:i+3], ' ')), 1, 15))::BIGINT AS sh
        FROM bi
    ),
    tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM d3),
    ti AS (SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 3, 0))) AS i FROM tw),
    tsh AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5('0:' || array_to_string(w[i:i+3], ' ')), 1, 15))::BIGINT AS sh
        FROM ti
    ),
    contaminated AS (SELECT DISTINCT t.doc_id FROM tsh t JOIN bsh b ON t.sh = b.sh)
    SELECT doc_id FROM d3
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ORDER BY doc_id
    """,
)
def doc_curation_pipeline(spark, sf_dir):
    """The composed corpus-curation pipeline (plans/curation.py): quality
    gate (score ≥ 0.5) → exact dedup keepers → near-dup canonical members
    (3-gram Jaccard ≥ 0.5 clusters) → drop docs sharing any 4-gram with
    the benchmark slice (doc_id % 97 = 0). One lazy lineage end to end —
    the survivors' id set is what a training run would consume.

    r9: the near-dup stage rides the bucketed shingle store BY DEFAULT
    when a fresh one exists (same composition as
    ``doc_curation_pipeline_stored``)."""
    from satsure_agri_datapipeline_spark.plans.curation import curate_corpus
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    store = shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
    # Optimization r13: serve the n=4 decon store by default too (the r9
    # raw-names-serve-stores rule applied to stage 4) — per-run 4-gram
    # hashing of the kept corpus becomes a store restriction, exactly as
    # in the _capped production form. Identical result: the restriction is
    # a superset of stage 4's input ids and the consumer is an anti-join
    # (the r12 safety argument); the shared oracle stays hash-pinned.
    decon = (
        shingle_store_or_none(spark, sf_dir, n=4, unit="word", seed=0)
        if store is not None
        else None
    )
    kept = curate_corpus(
        docs, bench, min_quality_e4=5000, jaccard_threshold=0.5,
        shingle_n=3, decon_n=4, shingle_store=store, decon_store=decon,
        # the benchmark is BY CONSTRUCTION the doc_id%97 slice of the same
        # corpus the store covers, so the store serves its hashes too --
        # a pushed-down predicate on the store scan replaces a full docs
        # scan + per-run 4-gram hashing of the benchmark slice
        decon_bench_exploded=(
            decon.where(F.col("doc_id") % 97 == 0) if decon is not None else None
        ),
        quality_kernel=_quality_kernel_gate(sf_dir),
    )
    return kept.select("doc_id").orderBy("doc_id")


@query(
    "doc_curation_pipeline_capped",
    r"""
    WITH RECURSIVE feats AS (
        SELECT doc_id, LENGTH(text) AS n_chars,
               GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1) AS n_tokens,
               LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the', 'and', 'of', 'to', 'in'))) AS stop_hits
        FROM documents
    ),
    scaled AS (
        SELECT doc_id, n_chars,
               CAST(FLOOR(n_punct * 10000.0 / GREATEST(n_chars, 1) + 0.5) AS BIGINT) AS punct_e4,
               CAST(FLOOR(stop_hits * 10000.0 / n_tokens + 0.5) AS BIGINT) AS stop_e4
        FROM feats
    ),
    q AS (
        SELECT d.doc_id, d.text
        FROM documents d JOIN scaled s ON d.doc_id = s.doc_id
        WHERE CAST(FLOOR((0.5 * LEAST(s.n_chars / 500.0, 1.0)
                    + 0.3 * LEAST(s.stop_e4 / 2000.0, 1.0)
                    + 0.2 * (1.0 - LEAST(s.punct_e4 / 1000.0, 1.0))) * 10000 + 0.5) AS BIGINT) >= 5000
    ),
    ex AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(lower(trim(text)))),
    d2 AS (SELECT q.doc_id, q.text FROM q JOIN ex USING (doc_id)),
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM d2),
    idx2 AS (SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 2, 0))) AS i FROM words),
    sh2 AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5('0:' || array_to_string(w[i:i+2], ' ')), 1, 15))::BIGINT AS sh
        FROM idx2
    ),
    -- r12: df cap over the SURVIVOR corpus — the bounded-state near-dup
    dfreq2 AS (SELECT sh, COUNT(*) AS df FROM sh2 GROUP BY sh),
    capped2 AS (SELECT s.doc_id, s.sh FROM sh2 s JOIN dfreq2 USING (sh) WHERE df <= 10),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped2 GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM capped2 a JOIN capped2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs2 AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON inter.id_a = sa.doc_id
        JOIN sizes sb ON inter.id_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM pairs2
        UNION ALL SELECT id_b, id_a FROM pairs2
    ),
    reach(node, lbl) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
    ),
    losers AS (
        SELECT node FROM (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node)
        WHERE node <> cluster
    ),
    d3 AS (SELECT doc_id, text FROM d2 WHERE doc_id NOT IN (SELECT node FROM losers)),
    bw AS (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 = 0),
    bi AS (SELECT w, UNNEST(generate_series(1, GREATEST(len(w) - 3, 0))) AS i FROM bw),
    bsh AS (
        SELECT DISTINCT
               ('0x' || substr(md5('0:' || array_to_string(w[i:i+3], ' ')), 1, 15))::BIGINT AS sh
        FROM bi
    ),
    tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM d3),
    ti AS (SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 3, 0))) AS i FROM tw),
    tsh AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5('0:' || array_to_string(w[i:i+3], ' ')), 1, 15))::BIGINT AS sh
        FROM ti
    ),
    contaminated AS (SELECT DISTINCT t.doc_id FROM tsh t JOIN bsh b ON t.sh = b.sh)
    SELECT doc_id FROM d3
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ORDER BY doc_id
    """,
)
def doc_curation_pipeline_capped(spark, sf_dir):
    """The PRODUCTION-SCALE composed curation pipeline (r12): identical
    stages to ``doc_curation_pipeline`` except the near-dup stage runs the
    bounded-state df-capped Jaccard (df ≤ 10 computed over the stage's
    survivor corpus) — the configuration that runs spill-free where the
    uncapped pair aggregate is 400 GiB-class state at 1000×. Its own
    recursive-CTE oracle replicates the cap; serves the n=3 shingle store
    for the near-dup stage AND the n=4 store for the decontaminate stage
    when fresh (the 1000× profile's largest stage — per-run 4-gram
    hashing — becomes a store restriction)."""
    from satsure_agri_datapipeline_spark.plans.curation import curate_corpus
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    store = shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
    decon = shingle_store_or_none(spark, sf_dir, n=4, unit="word", seed=0)
    kept = curate_corpus(
        docs, bench, min_quality_e4=5000, jaccard_threshold=0.5,
        shingle_n=3, decon_n=4, shingle_store=store, max_shingle_df=10,
        decon_store=decon,
        decon_bench_exploded=(
            decon.where(F.col("doc_id") % 97 == 0) if decon is not None else None
        ),
        quality_kernel=_quality_kernel_gate(sf_dir),
    )
    return kept.select("doc_id").orderBy("doc_id")


@query("doc_curation_pipeline_stored", None)
def doc_curation_pipeline_stored(spark, sf_dir):
    """The SAME curation pipeline with the near-dup stage served from the
    bucketed shingle store: survivors of quality+exact filtering restrict
    the pre-exploded relation via a broadcast semi-join (bucketing
    preserved → the Jaccard self-join still plans zero Exchange) instead
    of re-shingling the filtered corpus per run. Shares
    ``doc_curation_pipeline``'s oracle — the store-fed composition is
    hash-pinned end to end."""
    from satsure_agri_datapipeline_spark.plans.curation import curate_corpus
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        ensure_shingle_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    store = ensure_shingle_store(spark, sf_dir, n=3, unit="word", seed=0)
    # Optimization r13: stage 4 likewise serves the n=4 store (built on
    # first use, like the n=3 one) — see doc_curation_pipeline's note.
    decon = ensure_shingle_store(spark, sf_dir, n=4, unit="word", seed=0)
    kept = curate_corpus(
        docs, bench, min_quality_e4=5000, jaccard_threshold=0.5,
        shingle_n=3, decon_n=4, shingle_store=store, decon_store=decon,
        decon_bench_exploded=decon.where(F.col("doc_id") % 97 == 0),
        quality_kernel=_quality_kernel_gate(sf_dir),
    )
    return kept.select("doc_id").orderBy("doc_id")


from satsure_agri_datapipeline_spark.plans.catalog import (  # noqa: E402
    ORACLES as _ORACLES_EARLY,
)

_ORACLES_EARLY["doc_curation_pipeline_stored"] = _ORACLES_EARLY[
    "doc_curation_pipeline"
]


@query(
    "doc_pack_sequences",
    r"""
    WITH base AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
               ('0x' || substr(md5('13:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS order_h
        FROM documents
    ),
    packed AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY order_h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM base
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
           CAST((cum - n_tokens) % 512 AS BIGINT) AS offset
    FROM packed
    ORDER BY doc_id
    """,
)
def doc_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (operators/sampling.py:
    pack_sequences): every doc's (shard, bin, offset) start position in the
    512-token training stream, 8 shards. One window sum per shard."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sp.pack_sequences(docs, seq_len=512, n_shards=8)
        .select(
            "doc_id",
            F.col("shard").cast("long").alias("shard"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "bin",
            "offset",
        )
        .orderBy("doc_id")
    )


@query(
    "doc_emb_quality_rank",
    r"""
    WITH feats AS (
        SELECT doc_id, LENGTH(text) AS n_chars,
               GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1) AS n_tokens,
               LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> t IN ('the', 'and', 'of', 'to', 'in'))) AS stop_hits
        FROM documents
    ),
    scaled AS (
        SELECT doc_id, n_chars,
               CAST(FLOOR(n_punct * 10000.0 / GREATEST(n_chars, 1) + 0.5) AS BIGINT) AS punct_e4,
               CAST(FLOOR(stop_hits * 10000.0 / n_tokens + 0.5) AS BIGINT) AS stop_e4
        FROM feats
    ),
    q AS (
        SELECT doc_id,
               CAST(FLOOR((0.5 * LEAST(n_chars / 500.0, 1.0)
                     + 0.3 * LEAST(stop_e4 / 2000.0, 1.0)
                     + 0.2 * (1.0 - LEAST(punct_e4 / 1000.0, 1.0))) * 10000 + 0.5) AS BIGINT) AS quality_score_e4
        FROM scaled
    ),
    n AS (
        SELECT vec_id,
               ROUND(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS emb_norm
        FROM embeddings
    )
    SELECT q.doc_id, q.quality_score_e4, n.emb_norm
    FROM q JOIN n ON q.doc_id = n.vec_id
    ORDER BY q.quality_score_e4 DESC, q.doc_id
    LIMIT 20
    """,
)
def doc_emb_quality_rank(spark, sf_dir):
    """Cross-modal curation ranking: join the text-quality signal with the
    embedding-norm signal (documents ⋈ embeddings on id) and take the
    top-20 — the multi-signal selection shape of data curation. Join is a
    1:1 id equi-join; top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    quality = tx.quality_score(docs).select("doc_id", "quality_score_e4")
    norm = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            6,
        ).alias("emb_norm"),
    )
    return (
        quality.join(norm, "doc_id")
        .orderBy(F.desc("quality_score_e4"), "doc_id")
        .limit(20)
    )


@query(
    "multimodal_resize",
    """
    WITH dims AS (
        SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n,
               UNNEST(generate_series(0, 63)) AS i
        FROM documents
    )
    SELECT doc_id, CAST(MAX(n) AS INT) AS n_bytes_in,
           md5(string_agg(text[(i * n) // 64 + 1], '' ORDER BY i)) AS resized_md5
    FROM dims
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_resize(spark, sf_dir):
    """Resize plumbing oracle-checked end to end: the deterministic
    nearest-neighbor byte-sampling fake (multimodal.py:_fake_resize) to an
    8×8 byte grid, value-compared via md5. The oracle reassembles the same
    sample character-wise (valid on the verified pure-ASCII corpus, as in
    multimodal_frames)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    resized = mm.resize_images(payload, width=8, height=8)
    return resized.select(
        "doc_id", "n_bytes_in", F.md5("resized").alias("resized_md5")
    ).orderBy("doc_id")


@query(
    "doc_tfidf_terms",
    r"""
    WITH base AS (
        SELECT doc_id, lower(trim(text)) AS t FROM documents
        WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    toks AS (
        SELECT doc_id, UNNEST(regexp_split_to_array(t, '\s+')) AS term FROM base
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_total FROM base),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
               (tf.tf * 1000000 * n.n_total) // dfreq.df_docs AS score_ppm
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df_docs, score_ppm
    FROM scored
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_ppm DESC, term
    ) <= 3
    ORDER BY doc_id, score_ppm DESC, term
    """,
)
def doc_tfidf_terms(spark, sf_dir):
    """Per-document top-3 TF-IDF keywords with an engine-portable
    scaled-integer linear idf (operators/text.py tf_idf_top_terms) — the
    keyword-extraction pass of a corpus-understanding pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.tf_idf_top_terms(docs, k=3).orderBy(
        "doc_id", F.desc("score_ppm"), "term"
    )


@query(
    "emb_semantic_dedup",
    f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    seeded AS (
        SELECT vec_id, v,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                            vec_id
               ) AS rn
        FROM base
    ),
    cent0 AS (
        SELECT rn - 1 AS cluster_id, list_transform(v, x -> ROUND(x, 9)) AS c
        FROM seeded WHERE rn <= 8
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    {_kmeans_round_sql(3)},
    -- d3 = distances against the TRAINED quantizer cent2; keep the argmin
    -- assignment WITH its distance this time
    m3 AS (SELECT vec_id AS vid, MIN(dist) AS md FROM d3 GROUP BY 1),
    asg AS (
        SELECT d3.vec_id, MIN(d3.cluster_id) AS cluster_id, MIN(m3.md) AS dist
        FROM d3 JOIN m3 ON d3.vec_id = m3.vid AND d3.dist = m3.md
        GROUP BY d3.vec_id
    ),
    keeper AS (
        SELECT cluster_id, vec_id AS keeper_vec_id, ROUND(dist, 6) AS keeper_dist
        FROM asg
        QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY dist, vec_id) = 1
    )
    SELECT k.cluster_id, k.keeper_vec_id, CAST(c.n AS BIGINT) AS n_vectors,
           k.keeper_dist
    FROM keeper k
    JOIN (SELECT cluster_id, COUNT(*) AS n FROM asg GROUP BY 1) c USING (cluster_id)
    ORDER BY k.cluster_id
    """,
)
def emb_semantic_dedup(spark, sf_dir):
    """SemDeDup semantic deduplication: one surviving representative per
    k-means cluster, chosen as nearest-to-centroid
    (operators/similarity.py semantic_dedup). The oracle replays the
    deterministic 2-round fit via unrolled recursion, then re-derives the
    keeper choice.

    r12: serves the standing IVF store by default when a fresh,
    never-delta'd one exists — keeper selection becomes ONE aggregate over
    the stored (vec_id, dist, cluster_id) rows, zero vector math."""
    from satsure_agri_datapipeline_spark.sources.ivf_store import (
        ivf_store_or_none,
        semantic_dedup_from_store,
    )

    store = ivf_store_or_none(spark, sf_dir, k=8, iterations=2, seed=0)
    if store is not None:
        return semantic_dedup_from_store(store[1]).orderBy("cluster_id")
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(emb, k=8, iterations=2).orderBy("cluster_id")


@query("emb_semantic_dedup_stored", None)
def emb_semantic_dedup_stored(spark, sf_dir):
    """The SAME SemDeDup query served from the standing IVF index, building
    it on first use — shares ``emb_semantic_dedup``'s oracle (assigned
    below), pinning the store's distance column against the recompute."""
    from satsure_agri_datapipeline_spark.sources.ivf_store import (
        ensure_ivf_store,
        semantic_dedup_from_store,
    )

    _, asg = ensure_ivf_store(spark, sf_dir, k=8, iterations=2, seed=0)
    return semantic_dedup_from_store(asg).orderBy("cluster_id")


@query(
    "corpus_domain_weights",
    r"""
    WITH agg AS (
        SELECT lang, source, COUNT(*) AS n_docs,
               SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS n_tokens
        FROM documents
        GROUP BY lang, source
    )
    SELECT lang, source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0
                / SUM(sqrt(CAST(n_tokens AS DOUBLE))) OVER () + 0.5) AS BIGINT)
               AS weight_e6
    FROM agg
    ORDER BY lang, source
    """,
)
def corpus_domain_weights(spark, sf_dir):
    """Temperature-scaled (T=2) domain mixing weights
    (operators/text.py domain_mix_weights): sqrt-damped token shares per
    (lang, source) — the corpus-reweighting step before sampling a
    training mixture."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.domain_mix_weights(docs, temperature=2.0).orderBy("lang", "source")


# Composed oracle: reuse the registered doc_minhash_lsh SQL as a CTE (the
# decorator stores every oracle in ORACLES at import time, earlier in this
# module) and verify each text-candidate pair in embedding space.
from satsure_agri_datapipeline_spark.plans.catalog import ORACLES as _ORACLES  # noqa: E402


@query(
    "doc_near_dup_crossmodal",
    f"""
    WITH mh AS ({_ORACLES["doc_minhash_lsh"]}),
    prods AS (
        SELECT mh.id_a, mh.id_b, mh.est_jaccard,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
               sqrt(list_sum(list_transform(a.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
               sqrt(list_sum(list_transform(b.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        FROM mh
        JOIN embeddings a ON mh.id_a = a.vec_id
        JOIN embeddings b ON mh.id_b = b.vec_id
    )
    SELECT id_a, id_b, est_jaccard, ROUND(dot / (na * nb), 6) AS cosine_sim
    FROM prods
    ORDER BY id_a, id_b
    """,
)
def doc_near_dup_crossmodal(spark, sf_dir):
    """Cross-modal near-dup verification: MinHash/LSH text candidates
    re-scored with exact embedding cosine (documents ⋈ embeddings on id) —
    the ensemble pattern where a cheap lexical recall stage feeds a
    semantic precision stage. Scale shape: the candidate-pair relation is
    tiny next to the corpus, so both embedding joins broadcast the pair
    side and the full-corpus embedding table is never self-joined."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = _lsh_pairs_default(spark, sf_dir, docs)
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    cos = sim.cosine_similarity_col(F.col("__va"), F.col("__vb"))
    return (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            F.round(cos, 6).alias("cosine_sim"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "doc_dedup_spans",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    spans AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS span
        FROM w, UNNEST(generate_series(0, CAST(CEIL(len(toks)/10.0) AS INT) - 1)) AS t(i)
    ),
    counts AS (
        SELECT md5(span) AS span_h, COUNT(DISTINCT doc_id) AS n_docs
        FROM spans GROUP BY md5(span)
    ),
    kept AS (
        SELECT s.doc_id, s.pos, s.span
        FROM spans s JOIN counts c ON md5(s.span) = c.span_h
        WHERE c.n_docs < 2
    )
    SELECT doc_id,
           string_agg(span, ' ' ORDER BY pos) AS text_clean,
           COUNT(*) AS n_spans_kept
    FROM kept GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_dedup_spans(spark, sf_dir):
    """C4/CCNet-style duplicated-span removal (dedup.dedup_spans): drop every
    10-token span occurring in >= 2 distinct docs, reassemble survivors.
    Counts shuffle md5 keys only; rebuild shuffles (id, pos, span) rows."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.dedup_spans(docs, span_tokens=10, min_docs=2).orderBy("doc_id")


@query(
    "doc_tokenize_ids",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    counts AS (
        SELECT tok, COUNT(*) AS cnt
        FROM (SELECT UNNEST(toks) AS tok FROM w)
        WHERE tok <> '' GROUP BY tok
    ),
    vocab AS (
        SELECT tok, tok_id FROM (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS tok_id
            FROM counts
        ) WHERE tok_id <= 100
    ),
    tk AS (
        SELECT doc_id, i - 1 AS pos, toks[i] AS tok
        FROM w, UNNEST(generate_series(1, LEAST(len(toks), 30))) AS t(i)
    ),
    enc AS (
        SELECT tk.doc_id, tk.pos, COALESCE(v.tok_id, 0) AS tid
        FROM tk LEFT JOIN vocab v ON tk.tok = v.tok
    )
    SELECT doc_id,
           string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS token_ids,
           COUNT(*) AS n_tokens
    FROM enc GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_tokenize_ids(spark, sf_dir):
    """Vocab build + tokenize-to-ids (text.build_vocab / text.encode_ids):
    top-100 tokens by (count DESC, token ASC) get dense ids; each doc's first
    30 tokens encode against the broadcast vocab (OOV -> 0)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = tx.build_vocab(docs, vocab_size=100)
    return tx.encode_ids(docs, vocab, max_len=30).orderBy("doc_id")


@query(
    "doc_inverted_index",
    """
    WITH pairs AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
        ) WHERE tok <> ''
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM pairs GROUP BY tok),
    top AS (
        SELECT tok, df FROM (
            SELECT tok, df, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS r
            FROM dfreq
        ) WHERE r <= 50
    ),
    ranked AS (
        SELECT p.tok, t.df, p.doc_id,
               ROW_NUMBER() OVER (PARTITION BY p.tok ORDER BY p.doc_id) AS rn
        FROM pairs p JOIN top t ON p.tok = t.tok
    )
    SELECT tok, df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM ranked WHERE rn <= 20 GROUP BY tok, df ORDER BY tok
    """,
)
def doc_inverted_index(spark, sf_dir):
    """Bounded inverted index (text.inverted_index): top-50 tokens by doc
    frequency, posting lists capped at 20 BEFORE collection — no unbounded
    per-group state."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.inverted_index(docs, top_tokens=50, max_postings=20).orderBy("tok")


@query(
    "doc_collocations",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    uni AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT UNNEST(toks) AS tok FROM w)
        WHERE tok <> '' GROUP BY tok
    ),
    bi AS (
        SELECT toks[i] || ' ' || toks[i+1] AS bigram, COUNT(*) AS c_ab
        FROM w, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
        GROUP BY 1 HAVING COUNT(*) >= 5
    ),
    scored AS (
        SELECT bigram, c_ab, a.c AS c_a, b.c AS c_b,
               c_ab * 1000000 // (a.c * b.c) AS lift_e6
        FROM bi
        JOIN uni a ON string_split(bigram, ' ')[1] = a.tok
        JOIN uni b ON string_split(bigram, ' ')[2] = b.tok
    )
    SELECT bigram, c_ab, c_a, c_b, CAST(lift_e6 AS BIGINT) AS lift_e6,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY lift_e6 DESC, bigram) AS rank
        FROM scored
    ) WHERE rank <= 20 ORDER BY rank
    """,
)
def doc_collocations(spark, sf_dir):
    """Collocation mining by exact integer lift (text.collocations):
    zip_with adjacent-token bigrams, broadcast unigram counts, integer
    ``div`` scoring — rank-equivalent to PMI without libm drift."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.collocations(docs, min_count=5, top_n=20).orderBy("rank")


@query(
    "doc_dedup_best_quality",
    f"""
    WITH RECURSIVE {JACCARD_PAIRS_SQL},
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node
    ),
    members AS (
        SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node
    ),
    ranked AS (
        SELECT m.node,
               ROW_NUMBER() OVER (
                   PARTITION BY m.cluster
                   ORDER BY d.n_chars DESC, m.node DESC
               ) AS rn
        FROM members m JOIN documents d ON m.node = d.doc_id
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT node FROM ranked WHERE rn > 1)
    ORDER BY doc_id
    """,
)
def doc_dedup_best_quality(spark, sf_dir):
    """Quality-priority near-dedup (dedup.dedup_keep_best): each Jaccard
    cluster keeps its LONGEST member (n_chars, ties to higher id) instead of
    the min id — truncated copies lose to the full document. Oracle
    re-derives clusters with a recursive CTE and picks winners by window
    rank; Spark picks them with a per-cluster max_by aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_default(
        spark, sf_dir, docs, threshold=0.5, gate_name="doc_dedup_best_quality"
    )
    return (
        dd.dedup_keep_best(docs, pairs, score_col="n_chars")
        .select("doc_id")
        .orderBy("doc_id")
    )


@query(
    "doc_containment_pairs",
    f"""
    WITH {SHINGLES_SQL},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5('0:' || shingle), 1, 15))::BIGINT AS sh
        FROM shingles
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM hashed GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM hashed a JOIN hashed b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(inter * 10000 // LEAST(sa.n_sh, sb.n_sh) AS BIGINT) AS containment_e4
    FROM inter
    JOIN sizes sa ON inter.id_a = sa.doc_id
    JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE inter * 10000 // LEAST(sa.n_sh, sb.n_sh) >= 8000
    ORDER BY id_a, id_b
    """,
)
def doc_containment_pairs(spark, sf_dir):
    """Max-containment near-dup pairs (dedup.containment_pairs): catches a
    short doc embedded in a long one, which symmetric Jaccard misses; score
    in exact integer basis points.

    r9: served from the bucketed shingle store when a fresh one exists —
    same (n=3, word, seed=0) shingling, so the pre-exploded relation
    replaces the per-run hashing and both self-join exchanges.

    r13: above PAIR_GATE_WORD_BYTES (415 GiB of spill at 1000×, PERF.md
    r10) degrades to ``doc_containment_pairs_capped``, logged."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    if _pair_family_degrade(
        sf_dir, "doc_containment_pairs", PAIR_GATE_WORD_BYTES
    ):
        return doc_containment_pairs_capped(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    store = shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
    return dd.containment_pairs(
        docs, n=3, threshold_e4=8000, exploded=store
    ).orderBy("id_a", "id_b")


# Shared fragment: df-capped (df <= 10) word-3-gram pair counts with
# post-cap sizes — the bounded-state pipeline's oracle shape (r12), reused
# by the capped Jaccard and capped-triangles oracles.
CAPPED_PAIR_COUNTS_SQL = f"""
    {SHINGLES_SQL},
    dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
    capped AS (
        SELECT s.doc_id, s.shingle FROM shingles s JOIN dfreq USING (shingle)
        WHERE df <= 10
    ),
    cp_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
    cp_inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    cp_counted AS (
        SELECT id_a, id_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b
        FROM cp_inter
        JOIN cp_sizes sa ON cp_inter.id_a = sa.doc_id
        JOIN cp_sizes sb ON cp_inter.id_b = sb.doc_id
    )
"""


@query(
    "doc_ngram_jaccard_capped",
    f"""
    WITH {CAPPED_PAIR_COUNTS_SQL}
    SELECT id_a, id_b,
           ROUND(inter * 1.0 / (n_a + n_b - inter), 4) AS jaccard
    FROM cp_counted
    WHERE inter * 1.0 / (n_a + n_b - inter) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def doc_ngram_jaccard_capped(spark, sf_dir):
    """Bounded-state word-3-gram Jaccard (dedup.ngram_jaccard_pairs_capped):
    the Jaccard sibling of ``doc_containment_pairs_capped``, sharing its
    measured pair pipeline. The uncapped Jaccard aggregate spilled 403 GiB
    at 1000× on this box (same noise-pair candidate mass as containment —
    the r12 probe re-measured it after the 128-bucket store change);
    the capped form runs the zero-spill plan. Serves the bucketed shingle
    store when fresh."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
    pairs = dd.ngram_jaccard_pairs_capped(
        docs, n=3, threshold=0.5, max_shingle_df=10, exploded=store
    )
    return _jaccard_display(pairs)


@query(
    "doc_containment_pairs_capped",
    f"""
    WITH {SHINGLES_SQL},
    dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
    capped AS (
        SELECT s.doc_id, s.shingle FROM shingles s JOIN dfreq USING (shingle)
        WHERE df <= 10
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(inter * 10000 // LEAST(sa.n_sh, sb.n_sh) AS BIGINT) AS containment_e4
    FROM inter
    JOIN sizes sa ON inter.id_a = sa.doc_id
    JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE inter * 10000 // LEAST(sa.n_sh, sb.n_sh) >= 8000
    ORDER BY id_a, id_b
    """,
)
def doc_containment_pairs_capped(spark, sf_dir):
    """Bounded-state containment (dedup.containment_pairs_capped): drop
    shingles with document frequency > 10 before pair generation, compute
    max-containment over the capped sets. This is the 100-TB form of the
    containment family — the uncapped pair aggregate's state is one entry
    per candidate pair and measured 415 GiB of single-box spill at 1000×
    (r10), dominated by noise pairs sharing one mid-df shingle; the cap
    deletes that reducible mass before the join (61% of pair state at
    sf0.1) the same way the r11 rep-pairs form deleted the simhash
    hamming-0 clusters. Serves the bucketed shingle store when fresh —
    df pass, hot-set anti-join, and both self-join sides all stay on the
    (sh)-bucket layout."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
    return dd.containment_pairs_capped(
        docs, n=3, threshold_e4=8000, max_shingle_df=10, exploded=store
    ).orderBy("id_a", "id_b")


@query(
    "doc_blocking_pairs",
    f"""
    WITH {SHINGLES_SQL},
    pairs_rel AS (SELECT doc_id, shingle AS tok FROM shingles),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM pairs_rel GROUP BY tok),
    rare AS (
        SELECT tok, 1000000 // (df * df) AS w
        FROM dfreq WHERE df >= 2 AND df <= 10
    ),
    keyed AS (SELECT p.doc_id, p.tok, r.w FROM pairs_rel p JOIN rare r ON p.tok = r.tok),
    scored AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS shared_terms,
               CAST(SUM(a.w) AS BIGINT) AS score
        FROM keyed a JOIN keyed b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, shared_terms, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, id_a, id_b) AS rank
        FROM scored
    ) WHERE rank <= 20 ORDER BY rank
    """,
)
def doc_blocking_pairs(spark, sf_dir):
    """Rare-attribute blocking (dedup.rare_term_pairs): candidate pairs
    through low-df word 3-grams with integer inverse-df² scores — join
    fan-out bounded per attribute by the df cap itself, so common phrases
    can never explode the join."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.rare_term_pairs(docs, n=3, max_df=10, top_n=20).orderBy("rank")


@query(
    "doc_sample_weighted",
    """
    WITH pri AS (
        SELECT doc_id, n_chars,
               ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   // n_chars AS p
        FROM documents
        WHERE n_chars IS NOT NULL AND CAST(n_chars AS BIGINT) >= 1
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM (
        SELECT doc_id, n_chars, ROW_NUMBER() OVER (ORDER BY p, doc_id) AS rn
        FROM pri
    ) WHERE rn <= 25 ORDER BY doc_id
    """,
)
def doc_sample_weighted(spark, sf_dir):
    """Deterministic weight-biased sampling (sampling.weighted_sample):
    integer hash-div-weight priorities, k lowest win — longer docs
    systematically favored, zero float drift, reproducible across engines
    and retries."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sp.weighted_sample(docs, weight_col="n_chars", k=25, seed=7)
        .select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


@query(
    "doc_cap_per_source",
    """
    WITH ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def doc_cap_per_source(spark, sf_dir):
    """Per-source quota enforcement (the anti-domination rule every corpus
    mix applies: no single domain may flood the training set): one window
    keyed by source caps membership at N docs, deterministic by id order;
    reported as kept-vs-total per source. The window streams each source
    partition — no per-group buffering beyond the running count."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("source").orderBy("doc_id"))
    return (
        docs.withColumn("__rn", rn)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("__rn") <= 20).cast("long")).alias("n_kept"),
        )
        .orderBy("source")
    )


@query(
    "corpus_diversity",
    """
    WITH toks AS (
        SELECT source, tok FROM (
            SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
        ) WHERE tok <> ''
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types,
           CAST(COUNT(DISTINCT tok) * 1000000 // COUNT(*) AS BIGINT) AS ttr_e6
    FROM toks GROUP BY source ORDER BY source
    """,
)
def corpus_diversity(spark, sf_dir):
    """Type-token ratio per source — the standard lexical-diversity signal
    for corpus mix reporting (low TTR = repetitive/template-heavy source).
    One hash-aggregate; the exact distinct is per (source, token) partials.
    Emitted as an exact integer ratio (e6)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct(F.col("tok")).alias("n_types"),
            F.expr("CAST(count(DISTINCT tok) * 1000000 div count(1) AS BIGINT)").alias(
                "ttr_e6"
            ),
        )
        .orderBy("source")
    )


@query(
    "doc_dup_triangles",
    f"""
    WITH {JACCARD_PAIRS_SQL},
    e AS (
        SELECT DISTINCT LEAST(id_a, id_b) AS u, GREATEST(id_a, id_b) AS v
        FROM pairs WHERE id_a <> id_b
    ),
    wedges AS (
        SELECT ab.u AS a, ab.v AS b, bc.v AS c
        FROM e ab JOIN e bc ON ab.v = bc.u
        WHERE ab.u < bc.v
    ),
    tri AS (
        SELECT w.a, w.b, w.c
        FROM wedges w JOIN e ac ON w.a = ac.u AND w.c = ac.v
    )
    SELECT (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT COUNT(*) FROM wedges) AS n_wedges,
           (SELECT COUNT(*) FROM tri) AS n_triangles
    """,
)
def doc_dup_triangles(spark, sf_dir):
    """Triangle count over the 3-gram-Jaccard near-dup graph
    (dedup.triangle_count): oriented-edge wedge closure via two hash-joins —
    clique-density diagnostic for duplicate clusters (true dup groups are
    near-cliques; low triangle density flags chained false positives).

    r13: above PAIR_GATE_WORD_BYTES (the consumed uncapped pair pipeline
    spilled 288 GiB at 1000×, PERF.md r10) degrades to
    ``doc_dup_triangles_capped``, logged."""
    if _pair_family_degrade(sf_dir, "doc_dup_triangles", PAIR_GATE_WORD_BYTES):
        return doc_dup_triangles_capped(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_default(spark, sf_dir, docs, threshold=0.5)
    return dd.triangle_count(pairs)


@query(
    "doc_dup_triangles_capped",
    f"""
    WITH {CAPPED_PAIR_COUNTS_SQL},
    pairs AS (
        SELECT id_a, id_b FROM cp_counted
        WHERE inter * 1.0 / (n_a + n_b - inter) >= 0.5
    ),
    e AS (
        SELECT DISTINCT LEAST(id_a, id_b) AS u, GREATEST(id_a, id_b) AS v
        FROM pairs WHERE id_a <> id_b
    ),
    wedges AS (
        SELECT ab.u AS a, ab.v AS b, bc.v AS c
        FROM e ab JOIN e bc ON ab.v = bc.u
        WHERE ab.u < bc.v
    ),
    tri AS (
        SELECT w.a, w.b, w.c
        FROM wedges w JOIN e ac ON w.a = ac.u AND w.c = ac.v
    )
    SELECT (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT COUNT(*) FROM wedges) AS n_wedges,
           (SELECT COUNT(*) FROM tri) AS n_triangles
    """,
)
def doc_dup_triangles_capped(spark, sf_dir):
    """Triangle count over the DF-CAPPED Jaccard graph — the third member
    of the r10 1000× spill family (triangles spilled 288 GiB: its cost IS
    the uncapped pair pipeline it consumes, r9/r10). Same wedge-closure
    algorithm over the bounded-state capped pair relation; its own oracle
    (the cap changes the edge set by definition). Serves the shingle store
    when fresh."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = shingle_store_or_none(spark, sf_dir, n=3, unit="word", seed=0)
    pairs = dd.ngram_jaccard_pairs_capped(
        docs, n=3, threshold=0.5, max_shingle_df=10, exploded=store
    )
    return dd.triangle_count(pairs)


@query(
    "emb_centroid_separation",
    """
    WITH pos AS (
        SELECT vec_id, label, UNNEST(generate_series(1, len(embedding))) AS pos
        FROM embeddings
    ),
    comp AS (
        SELECT e.label, p.pos, AVG(CAST(e.embedding[p.pos] AS DOUBLE)) AS c
        FROM pos p JOIN embeddings e ON p.vec_id = e.vec_id
        GROUP BY e.label, p.pos
    )
    SELECT CAST(a.label AS BIGINT) AS label_a,
           CAST(b.label AS BIGINT) AS label_b,
           ROUND(sqrt(SUM((a.c - b.c) * (a.c - b.c))), 6) AS dist
    FROM comp a JOIN comp b ON a.pos = b.pos AND a.label < b.label
    GROUP BY a.label, b.label
    ORDER BY label_a, label_b
    """,
)
def emb_centroid_separation(spark, sf_dir):
    """Inter-centroid euclidean distances between all label pairs
    (similarity.centroid_pairwise_distances): geometric separability
    diagnostic; pairwise math runs on the labels×dim component relation,
    never on raw vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        sim.centroid_pairwise_distances(emb)
        .select(
            F.col("label_a").cast("long").alias("label_a"),
            F.col("label_b").cast("long").alias("label_b"),
            "dist",
        )
        .orderBy("label_a", "label_b")
    )


@query(
    "emb_semantic_decontaminate",
    """
    WITH ev AS (
        SELECT vec_id AS eid, embedding AS vec FROM embeddings
        WHERE vec_id % 50 = 0
    ),
    corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0
    ),
    pairs AS (
        SELECT c.vec_id, e.eid,
               ROUND(
                 list_sum(list_transform(list_zip(c.embedding, e.vec),
                          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(c.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(e.vec,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 6) AS cos
        FROM corpus c CROSS JOIN ev e
    ),
    best AS (
        SELECT vec_id, MAX(cos) AS max_cosine FROM pairs GROUP BY vec_id
    )
    SELECT b.vec_id,
           CAST(MIN(p.eid) AS BIGINT) AS matched_eval_id,
           b.max_cosine,
           b.max_cosine >= 0.99 AS contaminated
    FROM best b JOIN pairs p
      ON p.vec_id = b.vec_id AND p.cos = b.max_cosine
    GROUP BY b.vec_id, b.max_cosine
    ORDER BY b.vec_id
    """,
)
def emb_semantic_decontaminate(spark, sf_dir):
    """Semantic eval-set decontamination (similarity.py
    semantic_decontaminate_vectorized) — the production default (r13,
    verdict task 2): the eval set ships as a broadcast float64 matrix and
    each Arrow batch computes all its cosines as one matmul, so the cost
    per corpus row is one BLAS-ish numpy call per batch instead of the
    expression fold's eval_count × dim interpreted lambda ops (minutes at
    100×, DNF-shaped at 1000×). Map-only: no corpus shuffle, no k-times
    row fan-out. The oracle restates it relationally (cross join +
    per-row max + lowest tying eval id). Eval subset: vec_id % 50 = 0;
    threshold 0.99 sits inside the synthetic data's cosine mass so both
    flag values appear."""
    from satsure_agri_datapipeline_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.where(F.col("vec_id") % 50 == 0)
    corpus = emb.where(F.col("vec_id") % 50 != 0)
    # report_sort, not orderBy: the decon plan is map-only and scan-rooted,
    # so orderBy's range-boundary SAMPLING pass re-executes the whole
    # (expensive) map before the real shuffle runs it again — measured at
    # 1000×: compute 193.6 s, orderBy tail re-ran it at reduced width.
    # The total order exists only for the oracle compare.
    from satsure_agri_datapipeline_spark.operators.joins import report_sort

    return report_sort(
        sim.semantic_decontaminate_vectorized(corpus, ev, threshold=0.99),
        "vec_id",
    )


@query("emb_semantic_decontaminate_fold", None)
def emb_semantic_decontaminate_fold(spark, sf_dir):
    """The SAME decontamination on the pure-Catalyst expression fold
    (similarity.semantic_decontaminate): kept as the oracle-shared
    checked twin of the raw name so the Arrow fast path above stays
    hash-pinned against a JVM-side formulation, including the round-6 /
    lowest-eid-tie / NULL-propagation rules. Not the serving default —
    the fold interprets eval_count × dim lambda ops per corpus row
    (PERF.md r9: killed at >2100 s at 1000×)."""
    from satsure_agri_datapipeline_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.where(F.col("vec_id") % 50 == 0)
    corpus = emb.where(F.col("vec_id") % 50 != 0)
    from satsure_agri_datapipeline_spark.operators.joins import report_sort

    return report_sort(
        sim.semantic_decontaminate(corpus, ev, threshold=0.99), "vec_id"
    )


_ORACLES_EARLY["emb_semantic_decontaminate_fold"] = _ORACLES_EARLY[
    "emb_semantic_decontaminate"
]

# The _stored IVF names share the raw names' oracles: the store is only a
# layout, and the fit it persists is deterministic — identical results are
# the whole contract (r12, verdict task 4).
_ORACLES_EARLY["emb_ann_ivf_kmeans_stored"] = _ORACLES_EARLY["emb_ann_ivf_kmeans"]
_ORACLES_EARLY["emb_semantic_dedup_stored"] = _ORACLES_EARLY["emb_semantic_dedup"]


# The catalog's demo history definition, part of the digest-store key: a
# store built for a different notion of "accepted history" is never served.
INCR_HISTORY_SUBSET = "doc_id % 5 < 2"


@query(
    "doc_incremental_dedup",
    """
    WITH hist AS (
        SELECT DISTINCT sha256(text) AS digest FROM documents
        WHERE doc_id % 5 < 2
    ),
    new_batch AS (SELECT * FROM documents WHERE doc_id % 5 >= 2),
    keep AS (
        SELECT MIN(doc_id) AS doc_id FROM new_batch GROUP BY sha256(text)
    )
    SELECT n.doc_id, n.lang, n.source, n.n_chars
    FROM new_batch n JOIN keep USING (doc_id)
    WHERE sha256(n.text) NOT IN (SELECT digest FROM hist)
    ORDER BY n.doc_id
    """,
)
def doc_incremental_dedup(spark, sf_dir):
    """Incremental exact dedup of a new ingest batch against the standing
    digest store (operators/dedup.py incremental_exact_dedup): history =
    docs with doc_id % 5 < 2 reduced to 64-byte sha256 digests, new batch
    = the rest. Within-batch lowest-id-wins plus an anti-join on the
    digest; text never joins. Oracle restates both steps relationally.

    r10: the history side serves the standing bucketed digest store
    (``sources/digest_store.py``) by default when a fresh one exists —
    the anti-join's huge side plans zero Exchange and the per-run digest
    recompute of the whole history vanishes.
    ``SPARK_GRAFT_DIGEST_STORE=none`` opts out."""
    from satsure_agri_datapipeline_spark.operators import dedup as dd
    from satsure_agri_datapipeline_spark.sources.digest_store import (
        digest_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    hist = digest_store_or_none(spark, sf_dir, subset=INCR_HISTORY_SUBSET)
    if hist is None:
        hist = (
            docs.where(F.col("doc_id") % 5 < 2)
            .select(F.sha2(F.col("text"), 256).alias("digest"))
            .distinct()
        )
    new_batch = docs.where(F.col("doc_id") % 5 >= 2)
    accepted, _ = dd.incremental_exact_dedup(new_batch, hist)
    return accepted.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")



@query("doc_incremental_dedup_stored", None)
def doc_incremental_dedup_stored(spark, sf_dir):
    """The SAME incremental exact dedup with the history side served from
    the standing bucketed digest store, building it on first use (r9
    verdict task 4 — the 64 B/doc history gets the full
    ensure/fingerprint/append-delta/compaction lifecycle instead of being
    caller-owned). Identical oracle to ``doc_incremental_dedup``, so the
    store content is hash-pinned by the correctness gate."""
    from satsure_agri_datapipeline_spark.operators import dedup as dd
    from satsure_agri_datapipeline_spark.sources.digest_store import (
        ensure_digest_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    hist = ensure_digest_store(spark, sf_dir, subset=INCR_HISTORY_SUBSET)
    new_batch = docs.where(F.col("doc_id") % 5 >= 2)
    accepted, _ = dd.incremental_exact_dedup(new_batch, hist)
    return accepted.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


@query(
    "doc_char_jaccard",
    """
    WITH idx AS (
        SELECT doc_id, text,
               UNNEST(generate_series(1, GREATEST(len(text) - 4, 0))) AS i
        FROM documents
    ),
    cshingles AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle FROM idx),
    chashed AS (
        SELECT doc_id, ('0x' || substr(md5('0:' || shingle), 1, 15))::BIGINT AS sh
        FROM cshingles
    ),
    csizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM chashed GROUP BY doc_id),
    cinter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM chashed a JOIN chashed b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
    FROM cinter
    JOIN csizes sa ON cinter.id_a = sa.doc_id
    JOIN csizes sb ON cinter.id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.6
    ORDER BY id_a, id_b
    """,
)
def doc_char_jaccard(spark, sf_dir):
    """Near-dup pairs by exact character 5-gram Jaccard ≥ 0.6
    (dd.ngram_jaccard_pairs with unit="char") — the shingling unit for
    code and CJK corpora where word splitting carries no signal. Same
    bucket-join execution as the word form.

    SCALE GUARDRAIL (verified r5): char-gram document frequency is far
    heavier-tailed than word-gram DF — common 5-char substrings land in a
    large fraction of all documents, and each such hot shingle contributes
    a QUADRATIC bucket-join blowup. The uncapped query GC-died at 100×
    bench scale; with the operator's ``max_shingle_df=200`` stop-shingle
    cap the identical corpus completes in 18 s. Production char-unit runs
    must set the cap (it changes results by definition, so this
    oracle-pinned query stays uncapped at its small SF).

    r9: serves a char-unit shingle store when one exists (params are
    store-keyed, so a corpus ingested with
    ``ensure_shingle_store(n=5, unit="char")`` gets the zero-Exchange
    plan under this raw name too); raw recompute otherwise.

    r13: the guardrail above is now ENFORCED, not advisory — above
    PAIR_GATE_CHAR_BYTES (char-gram DF tails GC-died the uncapped query
    already at 100×/42 MiB) the raw name degrades to
    ``doc_char_jaccard_capped``'s max_shingle_df=200 pipeline, logged."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    if _pair_family_degrade(sf_dir, "doc_char_jaccard", PAIR_GATE_CHAR_BYTES):
        return doc_char_jaccard_capped(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_store_or_none(spark, sf_dir, n=5, unit="char", seed=0)
    if sh is not None:
        return _jaccard_display(dd.jaccard_pairs_from_exploded(sh, threshold=0.6))
    pairs = dd.ngram_jaccard_pairs(docs, n=5, threshold=0.6, unit="char")
    return _jaccard_display(pairs)


@query(
    "doc_char_jaccard_capped",
    """
    WITH idx AS (
        SELECT doc_id, text,
               UNNEST(generate_series(1, GREATEST(len(text) - 4, 0))) AS i
        FROM documents
    ),
    cshingles AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle FROM idx),
    -- the df-cap CTE: drop shingles appearing in more than 200 documents
    -- BEFORE the pair join (the operator's max_shingle_df semantics)
    kept AS (
        SELECT doc_id, shingle FROM cshingles
        WHERE shingle IN (
            SELECT shingle FROM cshingles GROUP BY shingle HAVING COUNT(*) <= 200
        )
    ),
    csizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    cinter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
    FROM cinter
    JOIN csizes sa ON cinter.id_a = sa.doc_id
    JOIN csizes sb ON cinter.id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.6
    ORDER BY id_a, id_b
    """,
)
def doc_char_jaccard_capped(spark, sf_dir):
    """The SCALE-SAFE char-jaccard configuration, hash-pinned: identical to
    ``doc_char_jaccard`` but with the ``max_shingle_df=200`` stop-shingle
    cap that is MANDATORY at scale (uncapped GC-died at 100× bench scale;
    capped completes in 18 s — PERF.md r5 dedup audit). The cap changes
    results by definition — hot shingles leave both the intersection AND
    each document's set size (jaccard denominators reflect the capped
    sets) — so it gets its OWN oracle rather than riding the uncapped
    pin. At sf0.01 the cap binds on 76 of 1981 shingles, so the oracle
    genuinely exercises the df-filter path, not a no-op configuration.
    Only set CARDINALITIES cross engines (the operator hashes with JVM
    xxhash64, the oracle compares shingle strings) — equal up to a
    ~1e-8 64-bit collision, exactly like the uncapped query."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        docs, n=5, threshold=0.6, unit="char", max_shingle_df=200
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


@query(
    "doc_incremental_near_dup",
    f"""
    WITH {SHINGLES_SQL},
    seeds(k, a, b) AS (VALUES {_minhash_seed_values()}),
    nhashed AS (
        SELECT doc_id,
               (('0x' || substr(md5(shingle), 1, 15))::BIGINT)::HUGEINT AS h
        FROM shingles
    ),
    nmixed AS (
        SELECT doc_id, k,
               CAST(((a * h + b) % 18446744073709551616::HUGEINT)
                    % 9223372036854775808::HUGEINT AS BIGINT) AS hk
        FROM nhashed CROSS JOIN seeds
    ),
    nsig AS (SELECT doc_id, k, MIN(hk) AS min_hash FROM nmixed GROUP BY doc_id, k),
    nbands AS (
        SELECT doc_id, k // 4 AS band,
               STRING_AGG(CAST(min_hash AS VARCHAR), ',' ORDER BY k) AS band_sig
        FROM nsig GROUP BY doc_id, k // 4
    ),
    hist_bands AS (
        SELECT DISTINCT band, band_sig FROM nbands WHERE doc_id % 5 < 2
    ),
    batch_bands AS (SELECT * FROM nbands WHERE doc_id % 5 >= 2),
    hit AS (
        SELECT DISTINCT b.doc_id
        FROM batch_bands b JOIN hist_bands h USING (band, band_sig)
        UNION
        SELECT DISTINCT b.doc_id
        FROM batch_bands b JOIN batch_bands a
          ON a.band = b.band AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id % 5 >= 2 AND d.doc_id NOT IN (SELECT doc_id FROM hit)
    ORDER BY d.doc_id
    """,
)
def doc_incremental_near_dup(spark, sf_dir):
    """Incremental NEAR-dup dedup of a new batch vs the standing LSH band
    store (dedup.incremental_minhash_dedup): history = doc_id % 5 < 2
    reduced to its (band, band_sig) rows, batch = the rest. Band collision
    with history or a lower-id batch doc drops the doc (greedy one-pass
    within-batch rule — see the operator docstring). The oracle restates
    the whole chain: portable minhash family, banding, both collision
    joins.

    r9: served from the bucketed band store BY DEFAULT when a fresh one
    exists (same plan as ``doc_incremental_near_dup_stored``; the raw
    recompute below otherwise)."""
    from satsure_agri_datapipeline_spark.sources.band_store import band_store_or_none

    docs = load_table(spark, sf_dir, "documents")
    store = band_store_or_none(spark, sf_dir, num_hashes=16, band_size=4, n=3)
    if store is not None:
        hist_bands = (
            store.where(F.col("doc_id") % 5 < 2).select("band", "band_sig").distinct()
        )
        batch_bands = store.where(F.col("doc_id") % 5 >= 2).select(
            "doc_id", "band", "band_sig"
        )
        batch = docs.where(F.col("doc_id") % 5 >= 2)
        accepted, _ = dd.incremental_minhash_dedup(
            batch, hist_bands, batch_bands=batch_bands
        )
        return accepted.select("doc_id", "lang", "source", "n_chars").orderBy(
            "doc_id"
        )
    hist_bands = dd.minhash_bands(docs.where(F.col("doc_id") % 5 < 2)).select(
        "band", "band_sig"
    ).distinct()
    batch = docs.where(F.col("doc_id") % 5 >= 2)
    accepted, _ = dd.incremental_minhash_dedup(batch, hist_bands)
    return accepted.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


@query("doc_incremental_near_dup_stored", None)
def doc_incremental_near_dup_stored(spark, sf_dir):
    """The SAME incremental near-dup served from the bucketed band store
    (``sources/band_store.py``): history bands, the batch's own bands, and
    both collision joins (batch⋈history semi, within-batch self-join) all
    read the one CLUSTERED BY (band, band_sig) relation — zero signature
    recompute and zero exchange on every band-keyed operation; only the
    final anti-join on doc_id shuffles. Shares
    ``doc_incremental_near_dup``'s oracle (registered below), so the
    store-served path is hash-pinned by the correctness gate."""
    from satsure_agri_datapipeline_spark.sources.band_store import ensure_band_store

    docs = load_table(spark, sf_dir, "documents")
    store = ensure_band_store(spark, sf_dir, num_hashes=16, band_size=4, n=3)
    hist_bands = (
        store.where(F.col("doc_id") % 5 < 2).select("band", "band_sig").distinct()
    )
    batch_bands = store.where(F.col("doc_id") % 5 >= 2).select(
        "doc_id", "band", "band_sig"
    )
    batch = docs.where(F.col("doc_id") % 5 >= 2)
    accepted, _ = dd.incremental_minhash_dedup(
        batch, hist_bands, batch_bands=batch_bands
    )
    return accepted.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


# Register the shared oracle now that doc_incremental_near_dup's SQL is in
# ORACLES (the stored variant is defined adjacent for readability).
_ORACLES["doc_incremental_near_dup_stored"] = _ORACLES["doc_incremental_near_dup"]
_ORACLES["doc_incremental_dedup_stored"] = _ORACLES["doc_incremental_dedup"]


@query(
    "doc_incremental_curation",
    f"""
    WITH feats AS (
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1) AS n_toks,
               LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   t -> t IN ('the', 'and', 'of', 'to', 'in'))) AS stop_hits
        FROM documents
    ),
    qual AS (
        SELECT doc_id,
               CAST(FLOOR((0.5 * LEAST(n_chars / 500.0, 1.0)
                     + 0.3 * LEAST(CAST(FLOOR(stop_hits * 10000.0 / n_toks + 0.5) AS BIGINT) / 2000.0, 1.0)
                     + 0.2 * (1.0 - LEAST(CAST(FLOOR(n_punct * 10000.0 / GREATEST(n_chars, 1) + 0.5) AS BIGINT) / 1000.0, 1.0)))
                    * 10000 + 0.5) AS BIGINT) AS qs
        FROM feats
    ),
    gated AS (
        SELECT d.* FROM documents d JOIN qual q USING (doc_id)
        WHERE d.doc_id % 5 >= 2 AND q.qs >= 5000
    ),
    ex_keep AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY sha256(text)),
    hist_digests AS (
        SELECT DISTINCT sha256(text) AS digest FROM documents WHERE doc_id % 5 < 2
    ),
    ex_ok AS (
        SELECT g.* FROM gated g JOIN ex_keep USING (doc_id)
        WHERE sha256(g.text) NOT IN (SELECT digest FROM hist_digests)
    ),
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    widx AS (SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 2, 0))) AS i FROM words),
    wshingles AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle FROM widx),
    seeds(k, a, b) AS (VALUES {_minhash_seed_values()}),
    chashed AS (
        SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT)::HUGEINT AS h
        FROM wshingles
    ),
    cmixed AS (
        SELECT doc_id, k,
               CAST(((a * h + b) % 18446744073709551616::HUGEINT)
                    % 9223372036854775808::HUGEINT AS BIGINT) AS hk
        FROM chashed CROSS JOIN seeds
    ),
    csig AS (SELECT doc_id, k, MIN(hk) AS min_hash FROM cmixed GROUP BY doc_id, k),
    cbands AS (
        SELECT doc_id, k // 4 AS band,
               STRING_AGG(CAST(min_hash AS VARCHAR), ',' ORDER BY k) AS band_sig
        FROM csig GROUP BY doc_id, k // 4
    ),
    hist_bands AS (
        SELECT DISTINCT band, band_sig FROM cbands WHERE doc_id % 5 < 2
    ),
    batch_bands AS (
        SELECT c.* FROM cbands c JOIN ex_ok e USING (doc_id)
    ),
    hit AS (
        SELECT DISTINCT b.doc_id
        FROM batch_bands b JOIN hist_bands h USING (band, band_sig)
        UNION
        SELECT DISTINCT b.doc_id
        FROM batch_bands b JOIN batch_bands a
          ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    )
    SELECT e.doc_id, e.lang, e.source, e.n_chars
    FROM ex_ok e WHERE e.doc_id NOT IN (SELECT doc_id FROM hit)
    ORDER BY e.doc_id
    """,
)
def doc_incremental_curation(spark, sf_dir):
    """The COMPOSED incremental curation pipeline (plans/curation.py
    curate_incremental): quality gate → exact dedup vs the history digest
    store → near-dup dedup vs the history band store, history = doc_id % 5
    < 2 ingested wholesale as stores, batch = the rest, default quality
    threshold 5000 (the sf median is ~5500, so the gate really cuts). The
    oracle chains every stage's already-validated SQL form."""
    from satsure_agri_datapipeline_spark.plans.curation import curate_incremental

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.where(F.col("doc_id") % 5 < 2)
    digest_store = hist.select(F.sha2("text", 256).alias("digest")).distinct()
    band_store = dd.minhash_bands(hist).select("band", "band_sig").distinct()
    batch = docs.where(F.col("doc_id") % 5 >= 2)
    accepted, _, _ = curate_incremental(batch, digest_store, band_store)
    return accepted.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


# Shared SQL fragment: per-doc duplicated-span statistics (15-word spans,
# stride 1, duplicated = appears in >= 2 distinct docs). DuckDB groups on
# the raw span STRING; the Spark side groups on xxhash64 of it — only
# counts surface, so the hash function needs no cross-engine twin.
DUP_SPAN_STATS_SQL = """
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idx AS (
        SELECT doc_id, w, UNNEST(generate_series(1, GREATEST(len(w) - 14, 0))) AS i
        FROM words
    ),
    spans AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+14], ' ') AS span FROM idx),
    cnt AS (SELECT span, COUNT(*) AS ndocs FROM spans GROUP BY span),
    per_doc AS (
        SELECT s.doc_id, COUNT(*) AS n_spans,
               COUNT(*) FILTER (c.ndocs >= 2) AS n_dup_spans
        FROM spans s JOIN cnt c ON s.span = c.span
        GROUP BY s.doc_id
    ),
    span_stats AS (
        SELECT d.doc_id,
               COALESCE(p.n_spans, 0) AS n_spans,
               COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
               COALESCE(p.n_dup_spans * 10000 // NULLIF(p.n_spans, 0), 0) AS dup_permyriad
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    )
"""


@query(
    "doc_dup_spans",
    f"""
    WITH {DUP_SPAN_STATS_SQL}
    SELECT doc_id, n_spans, n_dup_spans, dup_permyriad
    FROM span_stats ORDER BY doc_id
    """,
)
def doc_dup_spans(spark, sf_dir):
    """Exact SUBSTRING duplication at span granularity (Lee et al. 2021):
    per-doc count + permyriad share of 15-word spans that appear in >= 2
    distinct documents (operators/dedup.py duplicated_span_stats — one
    corpus shuffle on span hash, text never shuffled).

    r11: a span IS a word shingle at n=15, so a fresh bucketed shingle
    store at n=15 serves this by default with zero new storage code —
    the count window reads the CLUSTERED BY (sh) relation and the
    per-run span hashing vanishes (SPARK_GRAFT_SHINGLE_STORE=none opts
    out, same knob as every shingle consumer)."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = shingle_store_or_none(spark, sf_dir, n=15, unit="word", seed=0)
    return dd.duplicated_span_stats(
        docs, span_words=15, exploded=store
    ).orderBy("doc_id")


@query(
    "doc_dup_spans_skewsafe",
    f"""
    WITH {DUP_SPAN_STATS_SQL}
    SELECT doc_id, n_spans, n_dup_spans, dup_permyriad
    FROM span_stats ORDER BY doc_id
    """,
)
def doc_dup_spans_skewsafe(spark, sf_dir):
    """The SAME span statistics computed by the skew-safe groupBy+flag-join
    formulation (r12, verdict task 3): the frequency pass is a hash
    aggregate whose map-side partials absorb a boilerplate span shared by
    millions of docs — the window form would put all of them in ONE
    unsplittable window partition. Identical oracle to ``doc_dup_spans``,
    so both formulations are hash-pinned against each other every round."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = shingle_store_or_none(spark, sf_dir, n=15, unit="word", seed=0)
    return dd.duplicated_span_stats(
        docs, span_words=15, exploded=store, skew_safe=True
    ).orderBy("doc_id")


@query(
    "doc_span_dedup",
    f"""
    WITH {DUP_SPAN_STATS_SQL}
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM span_stats WHERE dup_permyriad > 2000)
    ORDER BY d.doc_id
    """,
)
def doc_span_dedup(spark, sf_dir):
    """Document-level removal policy over duplicated spans (RefinedWeb
    style): drop docs whose duplicated-span share exceeds 20%
    (operators/dedup.py span_dedup). Survivors, original schema. Serves a
    fresh n=15 shingle store by default (see doc_dup_spans)."""
    from satsure_agri_datapipeline_spark.sources.shingle_store import (
        shingle_store_or_none,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = shingle_store_or_none(spark, sf_dir, n=15, unit="word", seed=0)
    return (
        dd.span_dedup(docs, max_permyriad=2000, span_words=15, exploded=store)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )
