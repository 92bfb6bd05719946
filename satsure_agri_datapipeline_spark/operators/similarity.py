"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline: one scan, no shuffle until
the final top-k (TakeOrderedAndProject). The IVF variant is the scale path:
cluster by a deterministic coarse quantizer, search only the probed cells —
at 100 TB this turns a full scan into a partition-pruned scan when the data
is written partitioned by cell id.

Dot products use ``F.zip_with`` + ``F.aggregate`` (JVM array expressions) —
no Python UDF, no driver loops. Computation in double precision so results
are engine-comparable bit-for-bit at reasonable rounding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _round_half_up_6(a):
    """Vectorized 6-dp rounding matching Spark's ``F.round`` on doubles
    EXACTLY (r8 ADVICE): Spark converts the binary double to BigDecimal
    and rounds HALF_UP (away from zero); ``np.round`` is half-to-even
    after a 10^6 scaling with its own fp error — the two can disagree on
    6-dp midpoints. Spark's Round calls ``BigDecimal.valueOf(double)`` =
    ``new BigDecimal(Double.toString(d))`` — it rounds the SHORTEST
    decimal repr of the double, not its exact binary expansion (so
    -2.45e-05, binary ≈ -2.44999…e-05, still rounds AWAY to -2.5e-05).
    Fast path: away-from-zero via floor(|x|·10⁶+0.5). Elements whose
    scaled form lands near a .5 boundary (where scaling error could flip
    the fast path) are re-rounded through ``Decimal(repr(x))`` — Python's
    repr is the same shortest round-trip repr as Double.toString — so
    every element matches Spark bit-for-bit. -0.0 is
    normalized to +0.0 (BigDecimal has no signed zero). Pinned against
    ``F.round`` on adversarial midpoints in
    ``tests/test_properties.py``."""
    import numpy as np

    scaled = np.abs(a) * 1e6
    out = np.copysign(np.floor(scaled + 0.5) / 1e6, a)
    near_mid = np.abs(scaled - np.floor(scaled) - 0.5) < 1e-6
    near_mid &= np.isfinite(a)
    if near_mid.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.000001")
        flat_out, flat_in = out.ravel(), a.ravel()
        for i in np.flatnonzero(near_mid.ravel()):
            flat_out[i] = float(
                Decimal(repr(float(flat_in[i]))).quantize(
                    q, rounding=ROUND_HALF_UP
                )
            )
    return out + 0.0  # BigDecimal has no -0.0; neither may we


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _dot_flat(a, b, dim: int):
    """Dot product as a FLAT chained multiply-add over a statically-known
    dimension: left-to-right association is IDENTICAL to the sequential
    ``F.aggregate`` fold (and to DuckDB's ``list_sum``), so results are
    bit-exact with the HOF form — but the flat expression compiles under
    whole-stage codegen while higher-order lambdas are interpreted
    (~10× per-pair difference measured on the 100×-scale near-dup verify,
    r5). The leading ``lit(0.0)`` keeps even the -0.0 corner identical to
    the fold's initial accumulator.

    Ragged-input contract (matches the HOF form): a vector whose length is
    not exactly ``dim`` yields NULL — ``try_element_at`` never raises under
    ANSI, and the explicit size guard also NULLs the too-long case that
    plain truncation would silently mis-score. Guard cost is two integer
    compares per pair — noise next to the ``dim`` multiply-adds."""
    e = F.lit(0.0)
    for i in range(1, dim + 1):
        e = e + (
            F.try_element_at(a, F.lit(i)).cast("double")
            * F.try_element_at(b, F.lit(i)).cast("double")
        )
    return F.when((F.size(a) == dim) & (F.size(b) == dim), e)


def _norm_flat(a, dim: int):
    """See :func:`_dot_flat` — same flat fold, same NULL-on-ragged contract."""
    e = F.lit(0.0)
    for i in range(1, dim + 1):
        x = F.try_element_at(a, F.lit(i)).cast("double")
        e = e + x * x
    return F.when(F.size(a) == dim, F.sqrt(e))


def cosine_similarity_col(a, b):
    # try_divide: a zero-norm vector has no defined cosine — surface NULL
    # rather than raising DIVIDE_BY_ZERO under ANSI mode (Spark 4 default)
    # or producing NaN under non-ANSI (which Spark orders above every
    # double, poisoning max/top-k comparisons).
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. Deterministic
    tiebreak on id. Returns (id, cosine_sim)."""
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    sim = cosine_similarity_col(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def brute_force_topk_to(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k neighbors of an in-table vector (excluding itself), via a
    broadcast 1-row cross join — no driver round-trip for the query vector."""
    q = df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("__q"))
    sim = cosine_similarity_col(F.col(vec_col), F.col("__q"))
    return (
        df.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def sign_lsh_cell(vec_col, n_bits: int = 8):
    """Deterministic coarse quantizer: sign bits of the first ``n_bits``
    components → integer cell id in [0, 2^n_bits). Hyperplane-LSH with
    axis-aligned planes — seedless and reproducible across engines."""
    cell = F.lit(0).cast("long")
    for j in range(n_bits):
        bit = F.when(F.element_at(vec_col, j + 1).cast("double") >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        cell = cell + (bit.cast("long") * F.lit(2**j).cast("long"))
    return cell


def ivf_topk_to(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_bits: int = 8,
    hamming_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: search only vectors whose LSH cell is within
    ``hamming_probe`` bits of the query's cell. Recall < 1 by design; the
    candidate filter is a cheap integer predicate the scan can evaluate
    before any array math (and a partition-pruning key when the table is
    written bucketed by cell)."""
    with_cell = df.withColumn("__cell", sign_lsh_cell(F.col(vec_col), n_bits))
    q = with_cell.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q"), F.col("__cell").alias("__qcell")
    )
    joined = with_cell.crossJoin(F.broadcast(q)).where(F.col(id_col) != query_id)
    # Hamming distance between cells via popcount of XOR (bit_count in Spark SQL)
    ham = F.expr("bit_count(__cell ^ __qcell)")
    sim = cosine_similarity_col(F.col(vec_col), F.col("__q"))
    return (
        joined.where(ham <= hamming_probe)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Unit-normalize embeddings (the precondition for cosine ≡ dot-product
    retrieval): v / ‖v‖₂ as ``array<double>``, zero vectors passed through
    as nulls. Map-only JVM array expressions — linear, no shuffle."""
    norm = _norm(F.col(vec_col))
    unit = F.when(
        norm > 0, F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    )
    return df.select(
        F.col(id_col), unit.alias("unit_vec"), F.round(norm, 6).alias("l2_norm")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization (embedding storage/serving
    compression): scale = max|xᵢ|/127, qᵢ = floor(xᵢ/scale + 0.5) ∈ [−127,128].
    4× smaller than float32 at ~0.4% max relative error; map-only, no Python.
    Returns (id, q array<int>, scale). Half-up floor keeps the rounding rule
    engine-portable (banker's rounding differs between engines)."""
    absmax = F.aggregate(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    scale = absmax / F.lit(127.0)
    q = F.when(
        absmax > 0,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
        ),
    )
    return df.select(F.col(id_col), q.alias("q"), scale.alias("scale"))


def quantized_topk_to(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine top-k over the INT8-QUANTIZED embeddings (quantize →
    dequantize → exact cosine): the serving-path ANN shape where vectors
    live quantized at rest (4× smaller scans) and search runs on the
    dequantized values. Pairs with :func:`quantize_int8`; the gap between
    this ranking and :func:`brute_force_topk_to` IS the quantization error,
    measurable per corpus the same way :func:`dedup.lsh_dedup_eval`
    measures LSH quality.

    Deterministic cross-engine: floor-half-up quantization, q·scale
    dequantization, and a left-to-right fold dot product are identical
    IEEE-754 op sequences in any engine; zero-norm vectors are excluded
    (their quantized form carries no direction). Map-only except the final
    TakeOrderedAndProject."""
    q8 = quantize_int8(df, vec_col=vec_col, id_col=id_col).where(
        F.col("q").isNotNull()
    )
    deq = q8.select(
        F.col(id_col),
        F.transform(
            "q", lambda x: x.cast("double") * F.col("scale")
        ).alias("__dv"),
    )
    qv = deq.where(F.col(id_col) == query_id).select(F.col("__dv").alias("__q"))
    sim = cosine_similarity_col(F.col("__dv"), F.col("__q"))
    return (
        deq.crossJoin(F.broadcast(qv))
        .where(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine_sim_q"))
        .orderBy(F.desc("cosine_sim_q"), id_col)
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket join + exact
    cosine verification. Returns (id_a, id_b, cosine_sim) with id_a < id_b
    and round(cosine, 6) ≥ threshold.

    The scale path is the bucket join: vectors meet only when their
    ``n_bits``-bit sign cell matches (hyperplane LSH — near-identical vectors
    agree on every sign, so recall for true near-dups is ~1 at high
    thresholds; lower ``n_bits`` trades join fan-out for recall on looser
    thresholds). The shuffle key is one integer; the full vector rides along
    once per side — never an all-pairs stage. The threshold compares the
    6-dp *rounded* cosine so the predicate is reproducible across engines
    (sum-order-sensitive double ulps don't flip membership)."""
    # Norms are computed ONCE per vector BEFORE the join and ride through it
    # — the naive per-pair cosine re-evaluated both interpreted norm folds
    # for every candidate (r5: 2/3 of a 305 s 100×-scale run was norm
    # recomputation across ~20M candidates). The value is bit-identical
    # (same fold, evaluated once), so the 6-dp threshold stays oracle-exact.
    norm_fn = (lambda v: _norm_flat(v, dim)) if dim else _norm
    dot_fn = (lambda x, y: _dot_flat(x, y, dim)) if dim else _dot
    cells = df.select(
        F.col(id_col),
        F.col(vec_col),
        sign_lsh_cell(F.col(vec_col), n_bits).alias("__cell"),
        norm_fn(F.col(vec_col)).alias("__n"),
    )
    a = cells.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        "__cell",
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        "__cell",
        F.col("__n").alias("__nb"),
    )
    cos = F.round(
        F.try_divide(
            dot_fn(F.col("__va"), F.col("__vb")), F.col("__na") * F.col("__nb")
        ),
        6,
    )
    return (
        a.join(b, "__cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """Distributed Lloyd's k-means for an IVF coarse quantizer. Returns
    (cluster_id, centroid array<double>) after ``iterations`` rounds of
    assign → update.

    Deterministic by construction — and therefore exactly SQL-checkable even
    though the algorithm is iterative:
    - seeds are the k vectors with the smallest portable keyed hash of their
      id (no RNG);
    - centroid components are ROUNDED (9 dp) after init and after every
      update, absorbing the summation-order ulp noise of distributed AVG so
      every engine computes distances from bit-identical centroids;
    - argmin ties break on cluster_id.

    Scale shape per iteration: one broadcast of k×dim doubles, one map-side
    distance computation, one groupBy(id) argmin, one posexplode mean —
    shuffles bounded by rows × dim, no driver-side data. The iteration count
    is a fixed hyperparameter (driver control loop only)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("__id"), v.alias("__v"))

    from satsure_agri_datapipeline_spark.operators.sampling import sample_hash

    # distributed top-k (TakeOrdered) first; the row_number window then runs
    # over the k-row result only — never a single-partition sort of all rows
    seeds = base.orderBy(sample_hash("__id", seed).asc(), F.col("__id").asc()).limit(k)
    w = Window.orderBy(sample_hash("__id", seed).asc(), F.col("__id").asc())
    cent = seeds.select(
        (F.row_number().over(w) - 1).alias("cluster_id"),
        F.transform("__v", lambda x: F.round(x, 9)).alias("centroid"),
    )
    for _ in range(iterations):
        assigned = kmeans_assign(base, cent, vec_col="__v", id_col="__id")
        comp = (
            assigned.select(
                "cluster_id", F.posexplode("__v").alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg("x"), 9).alias("c"))
        )
        updated = comp.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
        # empty clusters keep their previous centroid (deterministic)
        cent = (
            cent.select("cluster_id", F.col("centroid").alias("__prev"))
            .join(updated, "cluster_id", "left")
            .select(
                "cluster_id", F.coalesce("centroid", "__prev").alias("centroid")
            )
            .localCheckpoint()
        )
    return cent


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared euclidean,
    ties → smallest cluster_id). Returns the input columns + cluster_id.
    Broadcast cross-join against the k-row centroid relation, then a
    struct-min argmin — one shuffle keyed by id."""
    dist = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    d = df.crossJoin(F.broadcast(centroids)).select(
        *df.columns, F.col("cluster_id").alias("__c"), dist.alias("__dist")
    )
    best = d.groupBy(id_col).agg(
        F.min(F.struct(F.col("__dist"), F.col("__c"))).alias("__m"),
        *[F.first(c).alias(c) for c in df.columns if c != id_col],
    )
    return best.select(
        *df.columns, F.col("__m.__c").alias("cluster_id")
    )


def ivf_topk_kmeans(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN with a LEARNED coarse quantizer: k-means cells
    (:func:`kmeans_fit`), search only the ``nprobe`` cells whose centroids
    are nearest the query. Recall < 1 by design but every step is
    deterministic, so the result is exactly reproducible.

    At scale the assignment is computed once at ingest and the table is
    written partitioned by cluster_id — the probe predicate then becomes
    partition pruning and the scan reads nprobe/n_clusters of the data. The
    probe selection runs on the k-row centroid relation (driver-free
    broadcast joins throughout)."""
    cent = kmeans_fit(
        df, k=n_clusters, iterations=iterations, vec_col=vec_col, id_col=id_col
    )
    assigned = kmeans_assign(df, cent, vec_col=vec_col, id_col=id_col)
    q = df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("__q"))
    qdist = F.aggregate(
        F.zip_with(
            F.col("__q"),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probes = (
        cent.crossJoin(F.broadcast(q))
        .select("cluster_id", qdist.alias("__d"))
        .orderBy(F.col("__d").asc(), F.col("cluster_id").asc())
        .limit(nprobe)
        .select("cluster_id")
    )
    sim_col = cosine_similarity_col(F.col(vec_col), F.col("__q"))
    return (
        assigned.join(F.broadcast(probes), "cluster_id")
        .crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(sim_col, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def ivf_recall_eval(
    df: DataFrame | None,
    query_id: int,
    k: int = 10,
    n_clusters: int = 8,
    nprobes: tuple[int, ...] = (1, 2, 4),
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fitted: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Recall@k of the IVF ANN path vs brute-force cosine ground truth,
    swept over ``nprobes`` — the ``doc_lsh_eval`` measure-don't-guess gate
    (r5) applied to the embedding index (r13, verdict task 3): before
    trusting ``ivf_topk_kmeans`` on a corpus, measure what its cell
    pruning costs in recall at each probe budget. Returns one row per
    nprobe: (nprobe, n_truth, n_hits, recall_e4), recall in exact integer
    basis points so the result is engine-comparable.

    Everything derives from ONE persisted per-vector relation
    (id, probe_rank of its cell, 6-dp cosine to the query) built from a
    single fit + assignment: ground truth is the top-k over ALL rows
    (probe_rank ≤ n_clusters ⇒ unfiltered), and the nprobe=p result is
    the top-k over rows with probe_rank ≤ p — so the sweep adds one
    distributed TakeOrdered per p over the persisted relation instead of
    p full IVF pipelines. ``fitted=(centroids, assignment)`` serves the
    standing IVF store (``sources/ivf_store.py``); None refits exactly
    like :func:`ivf_topk_kmeans`. Caller releases via ``dedup.release``.
    Determinism inherits from kmeans_fit; top-k ties break on id over the
    ROUNDED cosine, identical to ``ivf_topk_kmeans``'s display order."""
    from pyspark import StorageLevel

    from satsure_agri_datapipeline_spark.operators.dedup import _register_cache

    if fitted is not None:
        cent, assigned = fitted
    else:
        cent = kmeans_fit(
            df, k=n_clusters, iterations=iterations, vec_col=vec_col, id_col=id_col
        )
        assigned = kmeans_assign(df, cent, vec_col=vec_col, id_col=id_col)
    q = assigned.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q")
    )
    qdist = F.aggregate(
        F.zip_with(
            F.col("__q"),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # probe rank of every cell: row_number over the k-row centroid
    # relation (single-partition window is fine — k rows, never the corpus)
    prank_w = Window.orderBy(F.col("__d").asc(), F.col("cluster_id").asc())
    pranked = (
        cent.crossJoin(F.broadcast(q))
        .select("cluster_id", qdist.alias("__d"))
        .select("cluster_id", F.row_number().over(prank_w).alias("__prank"))
    )
    sims = (
        assigned.join(F.broadcast(pranked), "cluster_id")
        .crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            "__prank",
            F.round(
                cosine_similarity_col(F.col(vec_col), F.col("__q")), 6
            ).alias("__cos"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    truth = sims.orderBy(F.desc("__cos"), F.col(id_col).asc()).limit(k).select(
        id_col
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    out = None
    for p in sorted(nprobes):
        got = (
            sims.where(F.col("__prank") <= p)
            .orderBy(F.desc("__cos"), F.col(id_col).asc())
            .limit(k)
            .select(id_col)
        )
        hits = got.join(F.broadcast(truth), id_col, "left_semi").agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        row = hits.crossJoin(n_truth).select(
            F.lit(p).cast("long").alias("nprobe"),
            F.col("n_truth"),
            F.col("n_hits"),
            F.expr("n_hits * 10000 div n_truth").alias("recall_e4"),
        )
        out = row if out is None else out.unionAll(row)
    return _register_cache(out.orderBy("nprobe"), sims)


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ memory path)
# ---------------------------------------------------------------------------


def _pq_explode(
    df: DataFrame, m: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """One row per (vector, subspace): split each dim-d embedding into ``m``
    contiguous sub-vectors of d/m doubles. The sub-vector array is built in
    ONE projection expression (the §4.4 trap-1 rule: codegen subexpression
    elimination evaluates the cast/split once per row, never once per
    generated row). A per-row guard on the subspace-0 row (the band-0 guard
    precedent, operators/dedup.py) raises if d is not divisible by m —
    a silent truncation here would corrupt every downstream distance."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sub = (F.size(v) / m).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.slice(v, j * sub + 1, sub),
    )
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.size(v).alias("__dim"),
        F.posexplode(subs).alias("subspace", "__sv"),
    )
    dim_ok = (F.col("subspace") != 0) | (F.col("__dim") % m == 0)
    return exploded.where(
        F.when(dim_ok, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"pq: embedding dim not divisible by m={m}: dim="),
                    F.col("__dim").cast("string"),
                )
            )
        )
    ).select("__id", "subspace", "__sv")


def _pq_codebook_map(codebook: DataFrame) -> dict[int, list[tuple[int, list[float]]]]:
    """Collect the m×k codebook into ``{subspace: [(cluster_id, centroid),
    ...]}`` sorted by cluster_id. The codebook is broadcast-sized BY
    CONSTRUCTION (m·k·d/m doubles — 1 KiB at the defaults), so this is the
    decon eval-set precedent: one tiny collect at plan-build time that buys
    a zero-shuffle assignment expression. float() round-trips the stored
    doubles bit-exactly."""
    out: dict[int, list[tuple[int, list[float]]]] = {}
    for r in codebook.select("subspace", "cluster_id", "centroid").collect():
        out.setdefault(int(r.subspace), []).append(
            (int(r.cluster_id), [float(x) for x in r.centroid])
        )
    for j in out:
        out[j].sort()
    return out


def _pq_codes_df(
    df: DataFrame,
    cb: dict,
    vec_col: str,
    id_col: str,
    keep_vec: bool = False,
) -> DataFrame:
    """(id, codes array<int>) via MAP-SIDE Arrow-vectorized argmin against
    the collected codebook — ZERO join, zero shuffle. This is the r13
    rewrite of the join+groupBy argmin (which shuffled the full exploded
    relation once per pass: 246 s to build the store at 2M vectors), and
    the numpy path is deliberate: the Catalyst HOF form (transform/
    zip_with folds over literal codeword arrays) evaluates interpreted
    lambdas with per-codeword allocations and pinned 31 cores for >26 min
    at 2M vectors, while a fully UNROLLED scalar expression tree (~5 K
    nodes) stalled janino codegen for minutes per stage. The
    ``semantic_decontaminate_vectorized`` precedent applies: Arrow batch
    in, one numpy kernel, Arrow batch out.

    Bit-parity with the SQL oracle is preserved by construction:
    - X is float32→float64 (exact), codewords are the collected rounded
      doubles (exact);
    - per-codeword distance accumulates (x−w)² SEQUENTIALLY in ascending
      position order (an explicit python loop over positions issuing one
      vectorized float64 add per step — the same ((0+d₀²)+d₁²)+… IEEE op
      sequence as the zip_with fold; np.sum's pairwise summation would
      NOT match and is not used);
    - np.argmin returns the FIRST minimum ⇒ exact-tie → smaller
      cluster_id, identical to min(struct(dist, cluster_id)).
    Null embeddings are filtered out (the explode form dropped them);
    a row whose dimension does not match the codebook raises."""
    import numpy as np

    m = len(cb)
    sub = len(cb[0][0][1])
    dim = m * sub
    W = np.array(
        [[w for _, w in cb[j]] for j in sorted(cb)], dtype=np.float64
    )  # (m, k, sub)
    cids = np.array(
        [[c for c, _ in cb[j]] for j in sorted(cb)], dtype=np.int32
    )

    @pandas_udf("array<int>")
    def codes_udf(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        lens = col.map(len)
        if (lens != dim).any():
            bad = int(lens[lens != dim].iloc[0])
            raise ValueError(
                f"pq: embedding dim not divisible into the codebook's "
                f"{m}x{sub} layout (expected {dim}): dim={bad}"
            )
        X = np.stack(col.map(np.asarray).values).astype(np.float64)
        n = X.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            base = j * sub
            acc = np.zeros((n, W.shape[1]), dtype=np.float64)
            for p in range(sub):
                d = X[:, base + p, None] - W[j, None, :, p]
                acc = acc + d * d
            codes[:, j] = cids[j][np.argmin(acc, axis=1)]
        return pd.Series(list(codes))

    keep = [F.col(vec_col)] if keep_vec else []
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), *keep, codes_udf(F.col(vec_col)).alias("codes")
    )


def pq_fit(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """Product-quantization codebooks: an independent deterministic Lloyd's
    k-means per subspace (:func:`kmeans_fit` generalized — subspace joins
    every group key, so the m trainings run as ONE set of jobs, not m
    sequential fits). Returns (subspace, cluster_id, centroid array<double>),
    m×k rows.

    PQ is the ANN memory path the int8 path can't reach: a dim-64 float32
    vector is 256 B; its PQ code at m=8, k=16 is 8 SMALL ints — the codes
    relation for 100 B vectors fits in ~1.6 TB instead of 25 TB, and ADC
    search (:func:`pq_topk_adc`) never touches the raw vectors. Same
    determinism contract as kmeans_fit: hash-seeded init (smallest portable
    keyed hash of the id — the SAME k seed vectors supply every subspace's
    initial codewords), 9-dp rounding after init and every update, argmin
    ties to the smaller cluster_id, empty codewords keep their previous
    value. Exactly SQL-checkable despite being iterative.

    Scale shape (r13 rewrite — measured: the join+groupBy argmin form
    shuffled the full exploded relation once per pass, 246 s to build the
    store at 2M vectors): assignment is a MAP-SIDE expression against the
    collected codebook (tiny by construction), so each iteration is one
    narrow scan whose only shuffle is the m·k·(d/m)-key partial aggregate
    of the means — the update statistics, ~1 K keys regardless of corpus
    size. The per-iteration collect moves m×k rounded doubles, the same
    driver traffic the previous eager localCheckpoint form already paid."""
    from satsure_agri_datapipeline_spark.operators.sampling import sample_hash

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("__id"), v.alias("__v"))
    seeds = (
        df.select(F.col(id_col).alias("__id"))
        .orderBy(sample_hash("__id", seed).asc(), F.col("__id").asc())
        .limit(k)
    )
    w = Window.orderBy(sample_hash("__id", seed).asc(), F.col("__id").asc())
    seed_ids = seeds.select(
        "__id", (F.row_number().over(w) - 1).alias("cluster_id")
    )
    cent0 = _pq_explode(
        base.join(F.broadcast(seed_ids), "__id"), m, vec_col="__v", id_col="__id"
    ).join(F.broadcast(seed_ids), "__id").select(
        "subspace",
        "cluster_id",
        F.transform("__sv", lambda x: F.round(x, 9)).alias("centroid"),
    )
    # {(subspace, cluster_id): centroid} — rounded IN SPARK (9 dp, F.round
    # half-up) before every collect, so the driver only ferries bytes and
    # never rounds; values stay bit-identical to the oracle's ROUND(x, 9).
    cur: dict[tuple[int, int], list[float]] = {
        (int(r.subspace), int(r.cluster_id)): [float(x) for x in r.centroid]
        for r in cent0.collect()
    }
    for _ in range(iterations):
        cb = _rows_to_cb_map(cur)
        sub = len(next(iter(cur.values())))
        codes_df = _pq_codes_df(
            base, cb, vec_col="__v", id_col="__id", keep_vec=True
        )
        pairs = codes_df.select(
            "__v", F.posexplode("codes").alias("subspace", "cluster_id")
        )
        comp = (
            pairs.select(
                "subspace",
                "cluster_id",
                F.posexplode(
                    F.slice(F.col("__v"), F.col("subspace") * sub + 1, sub)
                ).alias("pos", "x"),
            )
            .groupBy("subspace", "cluster_id", "pos")
            .agg(F.round(F.avg("x"), 9).alias("c"))
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in comp.collect():
            upd.setdefault((int(r.subspace), int(r.cluster_id)), {})[
                int(r.pos)
            ] = float(r.c)
        # empty codewords keep their previous value (deterministic)
        cur = {
            key: (
                [upd[key][p] for p in sorted(upd[key])] if key in upd else prev
            )
            for key, prev in cur.items()
        }
    spark = df.sparkSession
    return spark.createDataFrame(
        [(j, c, wv) for (j, c), wv in sorted(cur.items())],
        "subspace int, cluster_id int, centroid array<double>",
    )


def _rows_to_cb_map(
    cur: dict[tuple[int, int], list[float]],
) -> dict[int, list[tuple[int, list[float]]]]:
    out: dict[int, list[tuple[int, list[float]]]] = {}
    for (j, c), wv in sorted(cur.items()):
        out.setdefault(j, []).append((c, wv))
    return out


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ codes per vector: nearest codeword in each subspace, packed into
    an m-element int array ordered by subspace. Returns (id, codes
    array<int>) — the at-rest representation ADC search runs on. ZERO
    shuffle (r13 rewrite): the argmin runs map-side against the collected
    broadcast-sized codebook (:func:`_pq_codes_df`); the raw vector never
    leaves its scan task. ``m`` is taken from the codebook itself; the
    parameter is kept for call-site clarity."""
    cb = _pq_codebook_map(codebook)
    if m != len(cb):
        raise ValueError(
            f"pq_encode: codebook has {len(cb)} subspaces, caller claims {m}"
        )
    return _pq_codes_df(df, cb, vec_col=vec_col, id_col=id_col)


def _pq_lut(codebook: DataFrame, query_subs: DataFrame) -> DataFrame:
    """ADC lookup table as ONE nested-array row: lut[subspace][code] =
    squared euclidean distance from the query's sub-vector to that codeword.
    m×k doubles — broadcast-sized at any corpus scale."""
    d = F.aggregate(
        F.zip_with(
            F.col("__qsv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    rows = codebook.join(F.broadcast(query_subs), "subspace").select(
        "subspace", "cluster_id", d.alias("__d")
    )
    per_sub = rows.groupBy("subspace").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("cluster_id", "__d"))),
            lambda s: s["__d"],
        ).alias("__lrow")
    )
    return per_sub.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "__lrow"))),
            lambda s: s["__lrow"],
        ).alias("__lut")
    )


def pq_topk_adc(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fitted: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (the IVF-PQ serving path):
    distances are read out of an m×k lookup table — the corpus side touches
    ONLY the 8-int codes, never the float vectors. Returns (id, adc_dist)
    ascending (approximate squared L2), ties → smaller id.

    Shape at scale: the LUT build is O(m·k·d/m) on one broadcast row; the
    scan is map-only over the codes relation (zip_with the code array
    against the LUT row, left-to-right fold — deterministic summation
    order, engine-comparable); the only shuffle is the final TakeOrdered.
    ``fitted=(codebook, codes)`` skips training/encoding (a standing codes
    relation is the production layout); None fits and encodes in-query."""
    if fitted is not None:
        codebook, codes = fitted
    else:
        codebook = pq_fit(
            df, m=m, k=n_codes, iterations=iterations, vec_col=vec_col, id_col=id_col
        )
        codes = pq_encode(df, codebook, m=m, vec_col=vec_col, id_col=id_col)
    query_subs = (
        _pq_explode(
            df.where(F.col(id_col) == query_id), m, vec_col=vec_col, id_col=id_col
        )
        .select("subspace", F.col("__sv").alias("__qsv"))
    )
    lut = _pq_lut(codebook, query_subs)
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("__lut"),
            lambda c, lrow: F.element_at(lrow, c + 1),
        ),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    return (
        codes.crossJoin(F.broadcast(lut))
        .where(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(adc, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fitted_ivf: tuple[DataFrame, DataFrame] | None = None,
    fitted_pq: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-PQ composed search (the FAISS IVFPQ shape, both halves this
    repo's standing stores): route the query to the ``nprobe`` nearest
    k-means cells, then ADC-rank ONLY the vectors in those cells over
    their PQ codes — cell pruning cuts the candidate scan to nprobe/k of
    the corpus AND the scan reads the ~50×-compressed codes. No residual
    encoding (codewords are trained on the raw vectors, not per-cell
    residuals — simpler, and every stage stays oracle-checkable against
    the two existing unrolled recursions).

    Plan shape: probe selection on the k-row centroid relation; the
    candidate filter is a broadcast semi-join of the probed cluster_ids
    against the assignment (partition PRUNING when the IVF store serves
    it); candidates then semi-join the codes relation on id. On one box
    that id-join is a shuffle of the pruned fraction; at 100 TB the
    production layout co-partitions codes INTO the IVF lists (exactly
    FAISS's inverted-list-of-codes layout) so the join disappears — the
    stores already persist both halves, the co-partitioned composition is
    one extra write away. Returns (id, adc_dist) ascending, ties → id."""
    if fitted_ivf is not None:
        cent, assigned = fitted_ivf
    else:
        cent = kmeans_fit(
            df, k=n_clusters, iterations=iterations, vec_col=vec_col, id_col=id_col
        )
        assigned = kmeans_assign(df, cent, vec_col=vec_col, id_col=id_col)
    if fitted_pq is not None:
        codebook, codes = fitted_pq
    else:
        codebook = pq_fit(
            df, m=m, k=n_codes, iterations=iterations, vec_col=vec_col, id_col=id_col
        )
        codes = pq_encode(df, codebook, m=m, vec_col=vec_col, id_col=id_col)
    q = df.where(F.col(id_col) == query_id).select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__q")
    )
    qdist = F.aggregate(
        F.zip_with(
            F.col("__q"),
            F.col("centroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probes = (
        cent.crossJoin(F.broadcast(q))
        .select("cluster_id", qdist.alias("__d"))
        .orderBy(F.col("__d").asc(), F.col("cluster_id").asc())
        .limit(nprobe)
        .select("cluster_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), "cluster_id")
        .where(F.col(id_col) != query_id)
        .select(id_col)
    )
    query_subs = _pq_explode(
        df.where(F.col(id_col) == query_id), m, vec_col=vec_col, id_col=id_col
    ).select("subspace", F.col("__sv").alias("__qsv"))
    lut = _pq_lut(codebook, query_subs)
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("__lut"),
            lambda c, lrow: F.element_at(lrow, c + 1),
        ),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    return (
        codes.join(cand, id_col, "left_semi")
        .crossJoin(F.broadcast(lut))
        .select(F.col(id_col), F.round(adc, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.col(id_col).asc())
        .limit(k)
    )


def pq_recall_eval(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fitted: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Recall@k of ADC-over-codes vs exact squared-L2 ground truth — the
    measure-don't-guess gate (doc_lsh_eval r5, emb_ivf_eval r13) applied to
    the PQ path: quantization error is a per-corpus property, so measure it
    on THIS corpus before trusting the codes. One row:
    (n_truth, n_hits, recall_e4), recall in integer basis points. Fully
    oracle-checkable — both rankings and the intersection are deterministic
    (rounded distances, id tie-breaks). ``fitted=(codebook, codes)`` serves
    a standing PQ store for the ADC side; the exact ground truth always
    scans the float corpus (that is the point of the comparison)."""
    truth = (
        df.crossJoin(
            F.broadcast(
                df.where(F.col(id_col) == query_id).select(
                    F.transform(
                        F.col(vec_col), lambda x: x.cast("double")
                    ).alias("__q")
                )
            )
        )
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.col("__q"),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, val: acc + val,
                ),
                6,
            ).alias("__d"),
        )
        .orderBy(F.asc("__d"), F.col(id_col).asc())
        .limit(k)
        .select(id_col)
    )
    got = pq_topk_adc(
        df,
        query_id,
        k=k,
        m=m,
        n_codes=n_codes,
        iterations=iterations,
        vec_col=vec_col,
        id_col=id_col,
        fitted=fitted,
    ).select(id_col)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    hits = got.join(F.broadcast(truth), id_col, "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return hits.crossJoin(n_truth).select(
        "n_truth",
        "n_hits",
        F.expr("n_hits * 10000 div n_truth").alias("recall_e4"),
    )


def centroid_norms(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-label centroid via posexplode + positional mean — the distributed
    way to average vectors (no collect, no UDF). Returns (label, n_vectors,
    centroid_norm)."""
    pos = df.select(
        F.col(label_col), F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    comp = pos.groupBy(label_col, "pos").agg(F.avg(F.col("v").cast("double")).alias("c"))
    counts = df.groupBy(label_col).agg(F.countDistinct(id_col).alias("n_vectors"))
    norms = comp.groupBy(label_col).agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm")
    )
    return counts.join(norms, label_col).select(
        F.col(label_col).cast("long").alias(label_col),
        F.col("n_vectors").cast("long").alias("n_vectors"),
        "centroid_norm",
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv:2303.09540): cluster the embedding space with the deterministic
    k-means quantizer, then keep ONE representative per cluster — the vector
    closest to its centroid (ties → smallest id). Returns
    (cluster_id, keeper_vec_id, n_vectors, keeper_dist) — callers semi-join
    the keepers against the corpus to drop the n_vectors−1 semantic
    near-copies per cluster.

    Determinism inherits from kmeans_fit (hash-seeded init, 9-dp-rounded
    centroids) so the whole pass — including which document survives — is
    exactly SQL-checkable despite the iterative fit.

    Scale shape: the fit is the kmeans_fit loop (broadcast k×dim centroids,
    shuffles bounded by rows × dim); the keeper pass is one broadcast
    cross-join distance projection and TWO hash aggregates (argmin per
    vector, then argmin + count per cluster) — no all-pairs comparison,
    which is the whole point of SemDeDup versus pairwise near-dup at
    100 TB scale."""
    cent = kmeans_fit(
        df, k=k, iterations=iterations, vec_col=vec_col, id_col=id_col, seed=seed
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("__id"), v.alias("__v"))
    dist = F.aggregate(
        F.zip_with(
            F.col("__v"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    d = base.crossJoin(F.broadcast(cent)).select(
        "__id", F.col("cluster_id").alias("__c"), dist.alias("__dist")
    )
    asg = (
        d.groupBy("__id")
        .agg(F.min(F.struct(F.col("__dist"), F.col("__c"))).alias("__m"))
        .select(
            F.col("__id"),
            F.col("__m.__c").alias("cluster_id"),
            F.col("__m.__dist").alias("__dist"),
        )
    )
    return (
        asg.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(F.struct(F.col("__dist"), F.col("__id"))).alias("__k"),
        )
        .select(
            "cluster_id",
            F.col("__k.__id").alias("keeper_vec_id"),
            "n_vectors",
            F.round(F.col("__k.__dist"), 6).alias("keeper_dist"),
        )
    )


def centroid_pairwise_distances(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Inter-centroid separation report: euclidean distance between every
    pair of label centroids — the cluster-quality diagnostic that tells you
    whether labels are geometrically separable before training a classifier
    on them (centroids nearly coincide → the labels won't linearly
    separate).

    The heavy pass is one posexplode + hash-aggregate over the vectors
    (labels × dim component rows out); the pairwise join runs on that tiny
    component relation — labels² × dim rows — never on the vectors.
    Distances rounded to 6 dp (summation-order tolerance, same contract as
    the centroid-norm report)."""
    comp = (
        df.select(F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy(label_col, "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
    )
    a = comp.select(
        F.col(label_col).alias("label_a"), "pos", F.col("c").alias("ca")
    )
    b = comp.select(
        F.col(label_col).alias("label_b"), "pos", F.col("c").alias("cb")
    )
    return (
        a.join(b, "pos")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))),
                6,
            ).alias("dist")
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """Semantic eval-set decontamination: for every corpus vector, the max
    (round-6) cosine against ANY eval-set vector, plus the matching eval id
    — corpus rows at or above ``threshold`` are benchmark leakage the
    n-gram decontaminator (text.py) cannot see (paraphrases, translations,
    reformatted answers).

    100 TB shape: the eval set is benchmark-sized (thousands of vectors),
    so it collapses to ONE broadcast row holding an id-sorted struct array,
    and the max-cosine scan is a MAP-ONLY higher-order ``aggregate`` over
    that array — the corpus never shuffles, never fans out k× rows, and no
    join exchange exists. This is the argmin-per-vector SemDeDup pattern
    (similarity.py:367) pointed at an external reference set instead of
    cluster centroids.

    Ties on the rounded cosine resolve to the LOWEST eval id (the array is
    id-sorted and the fold keeps the incumbent on equality), making the
    result engine-exact. Returns (id, matched_eval_id, max_cosine,
    contaminated).
    """
    evals = eval_set.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(eval_id_col).cast("long").alias("eid"),
                    F.col(eval_vec_col).alias("vec"),
                )
            )
        ).alias("__evals")
    )
    emb = F.col(vec_col)

    def fold(acc, e):
        cos = F.round(cosine_similarity_col(e["vec"], emb), 6)
        # A NULL corpus/eval embedding yields a NULL cosine; a zero-norm
        # vector yields 0/0 = NaN — and Spark orders NaN GREATER than any
        # double, so an unguarded `cos > acc` would adopt NaN and flag
        # spurious contamination. Only valid cosines may beat the incumbent.
        valid = cos.isNotNull() & ~F.isnan(cos)
        return F.when(
            valid & (cos > acc["cos"]),
            F.struct(e["eid"].alias("eid"), cos.alias("cos")),
        ).otherwise(acc)

    best = F.aggregate(
        F.col("__evals"),
        F.struct(
            F.lit(None).cast("long").alias("eid"),
            F.lit(-2.0).alias("cos"),
        ),
        fold,
    )
    # eid stays NULL iff NO valid comparison happened (empty eval set, NULL
    # or zero-norm corpus vector, or every eval vector invalid) — in that
    # case surface NULL cosine / not contaminated, never the -2.0 sentinel.
    has_best = F.col("__best.eid").isNotNull()
    return (
        corpus.crossJoin(F.broadcast(evals))
        .withColumn("__best", best)
        .select(
            F.col(id_col),
            F.col("__best.eid").alias("matched_eval_id"),
            F.when(has_best, F.col("__best.cos")).alias("max_cosine"),
            F.coalesce(
                F.when(has_best, F.col("__best.cos") >= F.lit(threshold)),
                F.lit(False),
            ).alias("contaminated"),
        )
    )


def semantic_decontaminate_vectorized(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """:func:`semantic_decontaminate` on the Arrow/numpy fast path — same
    contract and output schema, ~50× the throughput at scale.

    The expression-fold form evaluates eval_count × dim Catalyst lambda
    ops PER CORPUS ROW (interpreted, never codegen'd): at 100× bench scale
    that is 784M interpreted cosines and the query runs minutes; at 1000×
    it is effectively a DNF. Here the benchmark-sized eval set (thousands
    of vectors — it must fit a broadcast either way) is collected once at
    plan build, shipped as a ``SparkContext.broadcast`` numpy matrix, and
    each Arrow batch computes ALL its cosines as one float64 matmul
    (``batch @ evals.T``) — the corpus still never shuffles and the scan
    stays map-only, exactly like the expression form.

    Exactness: float64 throughout, cosines rounded to 6 dp, ties resolve
    to the lowest eval id (evals are id-sorted and ``argmax`` takes the
    first maximum), zero-norm / null vectors surface NULL cosine and
    ``contaminated=false`` — the same rules as the expression form; the
    two paths are equality-tested and the catalog query shares the same
    DuckDB oracle hash gate. (Summation order inside a dot product can
    differ from the sequential fold by last-ulp; after 6-dp rounding no
    divergence has been observed across the test SFs — the gate would
    surface one loudly.)
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    evals = sorted(
        (
            (int(r[0]), np.asarray(r[1], dtype=np.float64))
            for r in eval_set.select(eval_id_col, eval_vec_col).collect()
            if r[1] is not None
        ),
        key=lambda t: t[0],
    )
    if evals:
        eids = np.array([e for e, _ in evals], dtype=np.int64)
        mat = np.stack([v for _, v in evals])  # (m, d)
        norms = np.sqrt((mat * mat).sum(axis=1))
        valid_evals = norms > 0.0
    else:
        eids = np.empty(0, dtype=np.int64)
        mat = np.empty((0, 0))
        norms = np.empty(0)
        valid_evals = np.empty(0, dtype=bool)
    bc = spark.sparkContext.broadcast((eids, mat, norms, valid_evals))

    id_field = corpus.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, "
        "matched_eval_id long, max_cosine double, contaminated boolean"
    )

    def compute(batches):
        b_eids, b_mat, b_norms, b_valid = bc.value
        any_valid = bool(b_valid.any())
        round_half_up_6 = _round_half_up_6  # F.round-exact (module helper)
        # Chunk BOTH dimensions so the cosine tile stays cache-resident:
        # an unchunked 10k-row Arrow batch against a 40k-vector eval set
        # materializes a 3.2 GB float64 matrix (then again for round) —
        # the 1000× profile showed pure memory traffic, not FLOPs. Tiles
        # of 2048×4096 are 64 MB; the running (best_cos, best_eid) merge
        # keeps the first-max/lowest-eid tie rule because eval chunks are
        # visited in ascending-eid order and only STRICTLY greater cosines
        # replace the incumbent.
        row_chunk, eval_chunk = 2048, 4096
        for pdf in batches:
            n = len(pdf)
            out_eid = np.full(n, np.nan)
            out_cos = np.full(n, np.nan)
            if n and any_valid:
                vecs = pdf["__vec"]
                ok_rows = np.fromiter(
                    (v is not None for v in vecs), dtype=bool, count=n
                )
                if ok_rows.any():
                    emb = np.stack(
                        [np.asarray(v, dtype=np.float64) for v in vecs[ok_rows]]
                    )
                    enorm = np.sqrt((emb * emb).sum(axis=1))
                    m_rows = emb.shape[0]
                    best_cos = np.full(m_rows, -np.inf)
                    best_idx = np.zeros(m_rows, dtype=np.int64)
                    for r0 in range(0, m_rows, row_chunk):
                        r1 = min(r0 + row_chunk, m_rows)
                        er = emb[r0:r1]
                        nr = enorm[r0:r1]
                        bc_cos = best_cos[r0:r1]
                        bc_idx = best_idx[r0:r1]
                        for e0 in range(0, len(b_eids), eval_chunk):
                            e1 = min(e0 + eval_chunk, len(b_eids))
                            with np.errstate(
                                divide="ignore", invalid="ignore"
                            ):
                                cos = (er @ b_mat[e0:e1].T) / (
                                    nr[:, None] * b_norms[None, e0:e1]
                                )
                            cos = round_half_up_6(cos)
                            cos[:, ~b_valid[e0:e1]] = -np.inf
                            loc = np.argmax(cos, axis=1)
                            loc_cos = cos[np.arange(len(loc)), loc]
                            better = loc_cos > bc_cos
                            bc_idx[better] = loc[better] + e0
                            bc_cos[better] = loc_cos[better]
                        best_cos[r0:r1] = bc_cos
                        best_idx[r0:r1] = bc_idx
                    best_cos[enorm == 0.0] = -np.inf
                    row_ok = np.isfinite(best_cos)
                    idx = np.flatnonzero(ok_rows)
                    out_eid[idx[row_ok]] = b_eids[best_idx[row_ok]]
                    out_cos[idx[row_ok]] = best_cos[row_ok]
            has = ~np.isnan(out_eid)
            # nullable dtypes: the expression form emits SQL NULL (not NaN)
            # for rows with no valid comparison — match it exactly
            eid_s = pd.Series(
                np.where(has, out_eid, 0).astype(np.int64), dtype="Int64"
            )
            eid_s[~has] = pd.NA
            cos_s = pd.Series(out_cos, dtype="Float64")
            cos_s[~has] = pd.NA
            yield pd.DataFrame(
                {
                    id_col: pdf["__id"].reset_index(drop=True),
                    "matched_eval_id": eid_s,
                    "max_cosine": cos_s,
                    "contaminated": np.where(has, out_cos >= threshold, False),
                }
            )

    src = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    )
    # CPU-dense map stage: scan partitioning is file/row-group bounded (the
    # 1000× embeddings dir is 8 files → 8 tasks on 32 cores). A round-robin
    # repartition of the narrow (id, vec) projection costs one exchange and
    # buys full-width parallelism for the matmuls — worth it whenever the
    # scan can't feed every core.
    want = src.sparkSession.sparkContext.defaultParallelism
    # Partition-count probe via the JVM QueryExecution's physical RDD —
    # df.rdd would wrap it in an extra Python-conversion stage per call
    # (r8 ADVICE): same planning cost, no serializer pipeline built.
    n_parts = src._jdf.queryExecution().toRdd().getNumPartitions()
    if n_parts < want:
        src = src.repartition(want)
    return src.mapInPandas(compute, out_schema)


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    depth: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    bm25_stats: DataFrame | None = None,
) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion: fuse the BM25 lexical
    top-``depth`` (:func:`text.bm25_topk`) with the cosine semantic
    top-``depth`` (:func:`brute_force_topk_to`) into one ranking —
    ``rrf = Σ_systems 1/(rrf_k + rank)`` — the standard score-free fusion
    for RAG retrieval stacks (ranks only, so the two systems' incomparable
    score scales never mix). Ids are shared between the lexical corpus and
    the vector store (``doc_id = vec_id``), the usual RAG layout.

    Determinism: ranks are ``row_number`` over each system's already-rounded
    score with id tie-break; ``1.0/(rrf_k + rank)`` divides the same
    integers in both engines; the two reciprocals add in fixed order.
    Missing-from-one-system ranks surface as 0 (never null) so the output
    hashes stably.

    Scale shape: each system's candidate relation is ``depth``-bounded
    BEFORE fusion, so the single-partition rank windows and the full-outer
    fusion join run on ≤ 2·``depth`` rows regardless of corpus size — the
    expensive work is inside the two systems, which keep their own scale
    paths (BM25's term-filtered aggregates; the ANN stores instead of the
    brute-force scan when an index is standing).
    """
    from .text import bm25_topk

    lex = bm25_topk(
        docs, query_terms, k=depth, text_col=text_col, id_col=doc_id_col,
        stats=bm25_stats,
    )
    wl = Window.orderBy(F.desc("bm25_score"), doc_id_col)
    lex_r = lex.select(
        F.col(doc_id_col).alias("__lid"), F.row_number().over(wl).alias("r_lex")
    )
    sem = brute_force_topk_to(
        emb, query_id=query_vec_id, k=depth, vec_col=vec_col, id_col=vec_id_col
    )
    ws = Window.orderBy(F.desc("cosine_sim"), vec_id_col)
    sem_r = sem.select(
        F.col(vec_id_col).alias("__sid"), F.row_number().over(ws).alias("r_sem")
    )
    fused = lex_r.join(sem_r, lex_r["__lid"] == sem_r["__sid"], "full_outer")
    rrf = F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("r_lex")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("r_sem")), F.lit(0.0)
    )
    return (
        fused.select(
            F.coalesce(F.col("__lid"), F.col("__sid")).alias(doc_id_col),
            F.coalesce(F.col("r_lex"), F.lit(0)).alias("r_lex"),
            F.coalesce(F.col("r_sem"), F.lit(0)).alias("r_sem"),
            F.round(rrf, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), doc_id_col)
        .limit(k)
    )


def quantized_topk_to_vectorized(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """:func:`quantized_topk_to` on the Arrow/numpy fast path — same
    contract and output schema. The fold form runs FIVE interpreted
    Catalyst lambda passes per row (absmax fold, quantize transform,
    dequantize transform, dot fold, norm fold): measured 76 s at 2M
    vectors where the plain float scan takes 2.6 s — the quantized
    serving path was 25× slower than the thing it approximates. The
    kernel computes the identical op sequence in one Arrow batch pass.

    Bit-parity is pinned the :func:`_pq_codes_df` way, not assumed:

    - float32→float64 casts are exact; absmax is an order-insensitive
      max; ``scale = absmax/127.0``, ``q = floor(x/scale + 0.5)``,
      ``deq = q·scale`` are elementwise IEEE ops identical to the
      expression form;
    - dot and squared-norm accumulate SEQUENTIALLY in ascending position
      order (explicit python loop over positions, one vectorized float64
      add per step — the same ((0+d₀)+d₁)+… op sequence as the
      ``F.aggregate`` fold; np.dot's pairwise summation would diverge in
      the last ulp and is NOT used);
    - rows with absmax ≤ 0 are dropped (the fold form's ``q IS NOT
      NULL`` filter), a zero dequantized norm surfaces NULL cosine
      exactly like ``try_divide`` (sorted last under the same DESC
      NULLS LAST), and the query row is excluded;
    - the kernel emits the RAW cosine; the 6-dp rounding and the
      (cosine DESC, id ASC) TakeOrdered run JVM-side through the very
      same expressions as the fold form.

    The query vector is one collected row (plan-build collect, the
    :func:`semantic_decontaminate_vectorized` precedent), dequantized by
    the same numpy steps. A row whose dimension differs from the query's
    raises (the PQ kernel's contract)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession

    def _deq(vec):
        v = np.asarray(vec, dtype=np.float64)
        absmax = float(np.max(np.abs(v))) if v.size else 0.0
        if not absmax > 0.0:
            return None
        scale = absmax / 127.0
        q = np.floor(v / scale + 0.5)
        return q * scale

    qrow = (
        df.where(F.col(id_col) == query_id).select(vec_col).limit(1).collect()
    )
    qv = _deq(qrow[0][0]) if qrow and qrow[0][0] is not None else None
    id_field = df.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, __cos double"
    )
    empty = spark.createDataFrame(
        [], f"`{id_col}` {id_field.dataType.simpleString()}, cosine_sim_q double"
    )
    if qv is None:
        # no query row / zero-direction query: the fold form's cross join
        # against an empty 1-row relation yields zero rows
        return empty
    dim = qv.shape[0]
    nb = 0.0
    for d in range(dim):
        nb += qv[d] * qv[d]
    nb = float(np.sqrt(nb))
    bc = spark.sparkContext.broadcast((qv, nb))

    def compute(batches):
        b_qv, b_nb = bc.value
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            vecs = pdf["__vec"]
            ok = np.fromiter(
                (v is not None for v in vecs), dtype=bool, count=n
            )
            ids = pdf["__id"].reset_index(drop=True)
            if not ok.any():
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[ok]])
            if X.shape[1] != dim:
                raise ValueError(
                    f"quantized_topk_vectorized: row dim {X.shape[1]} != "
                    f"query dim {dim}"
                )
            absmax = np.max(np.abs(X), axis=1)
            keep = absmax > 0.0
            if not keep.any():
                continue
            X = X[keep]
            scale = (absmax[keep] / 127.0)[:, None]
            DQ = np.floor(X / scale + 0.5) * scale
            m_rows = DQ.shape[0]
            dot = np.zeros(m_rows)
            na2 = np.zeros(m_rows)
            # sequential position order — the fold's exact IEEE sequence
            for d in range(dim):
                col = DQ[:, d]
                dot = dot + col * b_qv[d]
                na2 = na2 + col * col
            denom = np.sqrt(na2) * b_nb
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / denom
            cos_s = pd.Series(cos, dtype="Float64")
            cos_s[denom == 0.0] = pd.NA  # try_divide's NULL
            yield pd.DataFrame(
                {
                    "__id": ids[ok].reset_index(drop=True)[keep].reset_index(
                        drop=True
                    ),
                    "__cos": cos_s,
                }
            ).rename(columns={"__id": id_col})

    src = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    want = src.sparkSession.sparkContext.defaultParallelism
    n_parts = src._jdf.queryExecution().toRdd().getNumPartitions()
    if n_parts < want:
        src = src.repartition(want)
    scored = src.mapInPandas(compute, out_schema)
    return (
        scored.where(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(F.col("__cos"), 6).alias("cosine_sim_q"))
        .orderBy(F.desc("cosine_sim_q"), id_col)
        .limit(k)
    )


def ivfpq_recall_eval(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fitted_ivf: tuple[DataFrame, DataFrame] | None = None,
    fitted_pq: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Recall@k of the COMPOSED IVF-PQ search vs exact squared-L2 ground
    truth — the measure-don't-guess gate (doc_lsh_eval r5, emb_ivf_eval /
    pq_recall_eval r13) applied to the composition: IVFPQ loses recall two
    ways (a true neighbor's cell not probed; ADC quantization reordering),
    and only the composed measurement exposes their joint effect on THIS
    corpus at THIS nprobe. One row: (n_truth, n_hits, recall_e4). The
    exact ground truth always scans the float corpus; the candidate side
    is :func:`ivfpq_topk` with whatever store halves are supplied."""
    truth = (
        df.crossJoin(
            F.broadcast(
                df.where(F.col(id_col) == query_id).select(
                    F.transform(
                        F.col(vec_col), lambda x: x.cast("double")
                    ).alias("__q")
                )
            )
        )
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.col("__q"),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, val: acc + val,
                ),
                6,
            ).alias("__d"),
        )
        .orderBy(F.asc("__d"), F.col(id_col).asc())
        .limit(k)
        .select(id_col)
    )
    got = ivfpq_topk(
        df,
        query_id,
        k=k,
        n_clusters=n_clusters,
        nprobe=nprobe,
        m=m,
        n_codes=n_codes,
        iterations=iterations,
        vec_col=vec_col,
        id_col=id_col,
        fitted_ivf=fitted_ivf,
        fitted_pq=fitted_pq,
    ).select(id_col)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    hits = got.join(F.broadcast(truth), id_col, "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return hits.crossJoin(n_truth).select(
        "n_truth",
        "n_hits",
        F.expr("n_hits * 10000 div n_truth").alias("recall_e4"),
    )
