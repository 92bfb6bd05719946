"""Skew-mitigation join utilities.

First line of defense at scale is AQE (`skewJoin.enabled` — on in
session.py), which splits oversized shuffle partitions at runtime. Explicit
salting below is for the cases AQE can't fix: a single join KEY so hot that
splitting its partition still leaves every split joining the same right-side
rows, or engines/paths where AQE is unavailable (e.g. inside
`foreachBatch`). Map-side partial aggregation already handles groupBy skew —
salting aggregations is unnecessary in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def report_sort(df: DataFrame, *cols) -> DataFrame:
    """Total order for REPORT-SIZED outputs without a range exchange.

    ``orderBy`` plans a RangePartitioning exchange whose partitioner SAMPLES
    the child RDD — when the sort sits directly over a scan-rooted plan (no
    intervening shuffle), that sampling pass re-executes every scan/join
    below the sort before the real shuffle runs it again. For outputs that
    are reports (O(groups) / filtered-small rows), a single-partition sort
    is the right physical plan at ANY scale — the rows fit on one node by
    construction, and the upstream plan executes exactly once. Outputs
    proportional to the fact table must keep ``orderBy`` (distributed range
    sort is the scalable path for big results).
    """
    return df.repartition(1).sortWithinPartitions(*cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Join with the hot-key shuffle spread over ``n_salts`` partitions:
    the (large, skewed) left side gets a deterministic row-hash salt in
    [0, n); the (smaller, but not broadcastable) right side replicates once
    per salt value; the join key becomes (on…, salt). Result is identical
    to ``left.join(right, on, how)`` — every left row still meets every
    matching right row exactly once — but a key holding 50% of the rows now
    occupies n_salts shuffle partitions instead of one straggler.

    Cost: right side shuffles n_salts× its size — use for dimension-ish
    right sides in the awkward band between broadcast threshold and fact
    scale. Supported: inner / left / left_semi / left_anti (right-preserving
    joins would need the mirror construction)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join supports left-preserving joins, got {how}")
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, [*on, "__salt"], how).drop("__salt")


def key_histogram(
    df: DataFrame, keys: list[str], top_n: int = 20
) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the ``top_n`` heaviest key values
    with their row counts and corpus share (basis points) — the measurement
    you run BEFORE deciding a join needs salting (``salted_join``) or AQE
    skew splitting.

    One hash-aggregate over the raw table (map-side partials compress to one
    row per distinct key). Top-N selection is ``orderBy().limit()`` —
    TakeOrderedAndProject, a per-partition heap + driver merge — and the
    corpus total is a broadcast 1-row aggregate, so NOTHING funnels the full
    per-key relation through a single partition (the distinct-key count can
    itself be billions at 100 TB; an empty-partition window or global
    row_number over it would be a serial bottleneck). The final rank
    window runs over ≤ top_n rows.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    order = [F.col("n_rows").desc(), *[F.col(k) for k in keys]]
    top = counts.orderBy(*order).limit(top_n)
    w_rank = Window.orderBy(*order)  # ≤ top_n rows by construction
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn(
            "share_bp",
            F.floor(F.col("n_rows") * 10000.0 / F.col("__total") + 0.5).cast("long"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .select(*keys, "n_rows", "share_bp", "rank")
    )


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 8,
    salt_src: str | None = None,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt for pathologically hot
    group keys: phase 1 aggregates by (keys, salt) — splitting each hot
    key's rows across ``n_salts`` reducers — phase 2 re-merges by keys.

    Spark's hash aggregate already does map-side partials, which covers most
    skew; the explicit salt matters when phase-1 state per key is large
    (collect/percentile-style aggregates) or when AQE is off. Only
    re-mergeable aggregates are legal here (`sum`, `count`, `min`, `max`):
    sum-of-sums = sum, min-of-mins = min. The salt derives from a stable row
    attribute (``salt_src``, default the first agg column) via a hash — NOT
    ``rand()``, so retries and replays land rows on the same salt.

    ``aggs`` maps column -> one of sum|count|min|max.
    """
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PHASE1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in _MERGE:
            raise ValueError(f"non-re-mergeable aggregate: {fn}")
    src = salt_src or next(iter(aggs))
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[_PHASE1[fn](F.col(c)).alias(f"__p1_{c}") for c, fn in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGE[fn](F.col(f"__p1_{c}")).alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def distributed_rank(
    df: DataFrame,
    order_col: str,
    group_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 64,
    rank_col: str = "rank",
    rel_error: float = 0.001,
) -> DataFrame:
    """Exact per-group ROW_NUMBER without a per-group window partition —
    the scalable replacement for ``Window.partitionBy(few_keys).orderBy(...)``
    ranking, whose shuffle funnels each group through ONE task (with 5
    groups over 100 TB, five tasks sort 20 TB each).

    Classic two-phase value-bucketed ranking:

    1. bucket boundaries from ``approxQuantile`` over ``order_col``
       (driver-side, O(n_buckets) values, deterministic for a fixed input);
    2. per-(group, bucket) counts — one algebraic aggregate with map-side
       partials (tiny shuffle);
    3. running offsets per group across buckets — a window over the
       O(groups × n_buckets) counts relation only, broadcast-joined back;
    4. local ROW_NUMBER within (group, bucket) — the window partition is
       now bounded by ~1/n_buckets of the data regardless of group skew;
    5. rank = offset + local rank.

    Equal ``order_col`` values always share a bucket (bucketing is by
    value), so ``tiebreak_cols`` ordering resolves entirely inside one
    window partition and the result equals
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY order, tiebreaks)``
    exactly. ``order_col`` must be numeric (the quantile probe's domain).

    GROUP-CARDINALITY CONTRACT: this operator exists for the FEW-group
    regime (a handful of giant window partitions). The ``offsets`` relation
    it broadcasts is O(groups × n_buckets) rows — with a million groups
    that silent broadcast is hundreds of MB per executor. When the probed
    group count exceeds ``max_groups`` (default 10k → ≤ ~640k offset rows,
    a few tens of MB), the operator falls back to the PLAIN per-group
    window, which is exactly right there: many groups ⇒ each window
    partition is small ⇒ no funnel to fix. The group-count probe shares
    ONE scan with the quantile probe (a single two-expression aggregate),
    so the guard adds no extra job.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    tiebreak_cols = tiebreak_cols or []
    max_groups = 10_000
    probes = [i / n_buckets for i in range(1, n_buckets)]
    # One driver action for BOTH probes: approximate bucket boundaries
    # (percentile_approx ≡ approxQuantile; boundary placement only affects
    # bucket balance, never rank values) and approximate group cardinality.
    # n_buckets=1 → no boundaries → one global bucket (degenerates to the
    # plain per-group window; still correct).
    # approxQuantile accepted rel_error=0 meaning "exact"; percentile_approx
    # takes an accuracy count instead, so map rel_error<=0 to a large fixed
    # accuracy rather than dividing by zero.
    accuracy = 1_000_000 if rel_error <= 0 else max(1, int(round(1.0 / rel_error)))
    aggs = []
    if probes:
        aggs.append(
            F.percentile_approx(
                order_col,
                F.array(*[F.lit(p) for p in probes]),
                F.lit(accuracy),
            ).alias("__bounds")
        )
    if group_cols:
        gkey = (
            F.struct(*group_cols) if len(group_cols) > 1 else F.col(group_cols[0])
        )
        aggs.append(F.approx_count_distinct(gkey).alias("__n_groups"))
    row = df.agg(*aggs).first() if aggs else None
    if group_cols and row["__n_groups"] > max_groups:
        w_plain = Window.partitionBy(*group_cols).orderBy(
            order_col, *tiebreak_cols
        )
        return df.withColumn(
            rank_col, F.row_number().over(w_plain).cast("long")
        )
    bounds = list(row["__bounds"] or []) if probes else []
    # strictly increasing boundaries (duplicates collapse buckets harmlessly)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    # Bucket index = #{boundaries < value} via a BALANCED binary-search CASE
    # tree: ≤ log2(n_buckets) comparisons per row. The r4 form summed a
    # CHAIN of n_buckets-1 comparisons per row; at 100× bench scale that
    # 63-deep expression evaluated at ~16× the cost of the plain window
    # this operator replaces (123 s vs 8 s, r5) — the tree form runs the
    # same query in seconds.
    def _search(lo: int, hi: int):
        # returns the bucket index within [lo, hi] for a non-null value
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2  # compare against boundary uniq[mid]
        return F.when(
            F.col(order_col) > F.lit(uniq[mid]), _search(mid + 1, hi)
        ).otherwise(_search(lo, mid))

    # NULL order values: a NULL comparison would poison the search and
    # silently drop the row at the inner bucket join below. Route NULLs to
    # a dedicated lowest bucket (-1) — Spark's default window ordering is
    # NULLS FIRST, so ranking them before every value bucket matches
    # ROW_NUMBER() OVER (ORDER BY order_col, tiebreaks) exactly (ties among
    # NULLs resolve via tiebreak_cols inside the -1 bucket).
    bucket = F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(
        _search(0, len(uniq))
    )
    d = df.withColumn("__bucket", bucket)

    counts = d.groupBy(*group_cols, "__bucket").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "__bucket",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__offset"),
    )
    join_cond = [d["__bucket"] == offsets["__bucket"]] + [
        d[c].eqNullSafe(offsets[c]) for c in group_cols
    ]
    joined = d.join(F.broadcast(offsets), join_cond, "inner").drop(
        *[offsets[c] for c in group_cols], offsets["__bucket"]
    )
    w_local = Window.partitionBy(*group_cols, "__bucket").orderBy(
        order_col, *tiebreak_cols
    )
    return (
        joined.withColumn(
            rank_col, (F.col("__offset") + F.row_number().over(w_local)).cast("long")
        )
        .drop("__bucket", "__offset")
    )


def distributed_ntile(
    df: DataFrame,
    n: int,
    order_col: str,
    group_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 64,
    tile_col: str = "tile",
) -> DataFrame:
    """Exact NTILE(n) per group at scale, derived from
    :func:`distributed_rank` plus per-group counts — no per-group window
    partition anywhere.

    NTILE semantics (ANSI): with c rows and n tiles, the first ``c mod n``
    tiles get ``c div n + 1`` rows, the rest ``c div n``. Given the exact
    rank r and group size c, the tile index is closed-form:

        base = c div n;  rem = c mod n;  cut = rem * (base + 1)
        tile = ceil(r / (base+1))              if r <= cut
             = rem + ceil((r - cut) / base)    otherwise

    Group counts are one algebraic aggregate broadcast back (O(groups)
    rows). Equals ``NTILE(n) OVER (PARTITION BY group ORDER BY order,
    tiebreaks)`` exactly.
    """
    group_cols = group_cols or []
    ranked = distributed_rank(
        df,
        order_col,
        group_cols=group_cols,
        tiebreak_cols=tiebreak_cols,
        n_buckets=n_buckets,
        rank_col="__r",
    )
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__c"))
    if group_cols:
        # rename the count-side keys: both frames descend from ``df``, so
        # joining on same-named attributes would be a self-join ambiguity
        counts = counts.select(
            *[F.col(c).alias(f"__cnt_{c}") for c in group_cols], "__c"
        )
        cond = [
            F.col(c).eqNullSafe(F.col(f"__cnt_{c}")) for c in group_cols
        ]
        withc = ranked.join(F.broadcast(counts), cond, "inner").drop(
            *[f"__cnt_{c}" for c in group_cols]
        )
    else:
        withc = ranked.crossJoin(F.broadcast(counts))
    base_i = F.expr(f"__c div {n}")
    rem = F.col("__c") % n
    cut = rem * (base_i + 1)
    r = F.col("__r")
    tile = F.when(
        r <= cut, F.ceil(r / (base_i + 1))
    ).otherwise(rem + F.ceil((r - cut) / F.greatest(base_i, F.lit(1))))
    return withc.withColumn(tile_col, tile.cast("long")).drop("__r", "__c")
