"""Graph analytics over derived pair/edge relations.

The near-dup pipeline already produces graphs (candidate pairs →
``dedup.connected_components`` clusters); this module adds rank-style
analytics over such derived graphs. Edges are ordinary DataFrames, so
everything here is joins + aggregates — the iteration count is a driver-side
control loop exactly like ``connected_components``/``kmeans_fit``, each round
one distributed join + aggregate with map-side partials.

Determinism: PageRank in floating point is summation-order-dependent (the
per-node contribution sum), so cross-engine comparison would be flaky. The
implementation is FIXED-POINT: ranks are e9-scaled BIGINTs, every division
is integer ``div``, and integer sums are order-independent — any engine
reproduces bit-identical ranks (same trick as the catalog's integer-cents
money aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: e9 fixed-point scale: initial rank = 1.0 → 1_000_000_000
SCALE = 1_000_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping_pct: int = 85,
    iterations: int = 3,
) -> DataFrame:
    """Weighted PageRank with integer fixed-point arithmetic. Returns
    (node_id, rank_e9), rank_e9 a BIGINT (1.0 → 1e9).

    Per iteration (unnormalized PageRank, ranks sum ≈ N·SCALE):

        contrib(u→v) = (damping_pct · r_u · w_uv) div (100 · W_u)
        r'_v         = (100−damping_pct)·SCALE div 100  +  Σ_u contrib(u→v)

    where W_u (column ``__ow``) is u's total out-weight. Dangling nodes keep the teleport
    term only (their rank leaks, the standard simple variant). Fixed
    iteration count — rank queries want a stable snapshot, not an
    ε-convergence loop whose round count varies with data.

    Scale shape: the edge relation shuffles once per iteration (join on
    src, aggregate on dst, both map-side-combinable); out-weights are
    computed once and ride the edges; ranks are O(nodes). Iteration plans
    are truncated with ``localCheckpoint`` so lineage doesn't grow.
    """
    teleport = (100 - damping_pct) * SCALE // 100
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("w"),
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("__ow"))
    e = e.join(out_w, "src")  # out-weight rides each edge
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn("rank_e9", F.lit(SCALE).cast("long"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                # The numerator is computed in DECIMAL(38,0): in BIGINT,
                # damping_pct * rank_e9 * w wraps silently (non-ANSI) once
                # ranks concentrate on hubs — rank_e9 is bounded by
                # N*SCALE ≈ N*1e9, so 85 * N*1e9 * w overflows 2^63 at
                # N*w ≳ 1e8. DECIMAL(38,0) holds up to ~1e38, i.e. safe to
                # N*w ≈ 1e27; `div` on decimals returns BIGINT and the
                # quotient is ≤ rank_e9, so the result fits long again.
                F.expr(
                    f"({damping_pct} * cast(rank_e9 as decimal(38,0)) * w)"
                    " div (100 * __ow)"
                ).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_rank"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce("in_rank", F.lit(0)))
                .cast("long")
                .alias("rank_e9"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("node").alias("node_id"), "rank_e9")
