"""SparkSession factory tuned for the engine.

Defaults are sized for local[N] development; on a real cluster every one of
these is still a sane starting point (AQE on, shuffle partitions sized by the
cluster, zstd parquet). The session timezone is set from the pipeline config
(reference parity: ``config/default.yaml:6`` uses ``UTC+05:30``; Spark
timestamps are instants rendered in the session zone — see SURVEY.md §7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "satsure_agri_datapipeline_spark",
    master: str | None = None,
    timezone: str = "UTC",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    AQE handles runtime partition coalescing and skew-join splitting, which is
    the first line of defense at 100 TB; ``maxPartitionBytes`` keeps scan
    partitions memory-friendly.
    """
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    )
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    # Python worker daemon with numpy/pandas/pyarrow PRE-IMPORTED: a fresh
    # fork otherwise pays those imports inside the first Arrow-UDF task it
    # runs (~0.3-0.8 s straggler batches; see python_daemon.py). The package
    # dir must ride PYTHONPATH for the daemon subprocess to import it.
    # LOCAL-ONLY, FRESH-JVM-ONLY: the conf and env mutation only take effect
    # when this call launches the JVM; a getOrCreate() that reuses a live
    # gateway ignores them, and on a real cluster executors don't inherit
    # the driver's env — there, ship the module via ``spark.submit.pyFiles``
    # (or an archive) and set the conf in spark-defaults instead. Setting it
    # unconditionally would leave a non-local session with an unimportable
    # daemon module and EVERY Python-UDF stage failing to launch workers.
    from pyspark import SparkContext  # noqa: PLC0415

    fresh_jvm = SparkContext._active_spark_context is None
    use_daemon = fresh_jvm and master.startswith("local")
    if use_daemon:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        if pkg_root not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
            )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Keep Spark's default parallelismFirst=true: coalescing floors at
        # defaultParallelism instead of the 64 MB advisory size. r5 set this
        # false to kill the small-SF per-task scheduling floor, but r6
        # measured the cost at 100× bench scale: size-based coalescing
        # collapsed the CPU-DENSE exact-median aggregate (object hash maps,
        # cost ∝ rows not bytes) to TWO post-shuffle tasks — 5.8 s vs 2.1 s
        # with the parallelism floor. Size is the wrong proxy for dense
        # aggregates, and that misjudgment only grows with scale; the tiny-
        # input floor is handled where it belongs (bench.py runs small
        # inputs with static planning, and sub-second interactive runs don't
        # care). At 100 TB the advisory governs either way (shuffle bytes /
        # 64 MB ≫ cluster parallelism).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer shuffled-hash over sort-merge when the build side fits a
        # per-partition hash map (the planner's own fitness check still
        # gates it, and SMJ remains the fallback for giant builds): the
        # shingle-bucket self-join measured 538 s SMJ vs 74 s SHJ at 100×
        # bench scale (r5) — both sort passes are pure overhead on
        # fixed-width hash keys. AQE skew splitting bounds the per-partition
        # build; at bench scale AQE's runtime broadcast overrides either.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", timezone)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Shuffle/broadcast/spill codec, measured BOTH ways (r6): zstd wins
        # ~19% end-to-end on the exchange-bound dedup family at 100× bench
        # scale (ngram-jaccard 65.5 s vs 81.2 s lz4 — shuffle bytes
        # dominate), but LOSES ~19% on the small-shuffle sf0.1 headline set
        # (6.74 s vs 5.64 s total — compression CPU dominates). It is a
        # STATIC core conf (not per-query togglable), so the default stays
        # Spark's lz4; shuffle-heavy 100 TB deployments should launch with
        # SPARK_GRAFT_IO_CODEC=zstd.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if use_daemon:
        builder = builder.config(
            "spark.python.daemon.module",
            "satsure_agri_datapipeline_spark.python_daemon",
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def normalize_timezone(tz: str) -> str:
    """Translate the reference's ``UTC+05:30`` form into a Spark/Java zone id.

    Mirrors the parse in reference ``src/components/transformation.py:203-214``
    (``UTC±HH:MM`` → fixed-offset zone). Plain named zones pass through.
    """
    t = tz.strip()
    if t.upper().startswith("UTC") and len(t) > 3:
        return t[3:]  # "+05:30" — valid Java ZoneOffset id
    if t.upper() == "UTC":
        return "UTC"
    return t
