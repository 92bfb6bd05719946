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
        # Respect the advisory partition size when coalescing rather than
        # stopping at defaultParallelism (Spark's own docs recommend false
        # in production): a kB-sized shuffle collapses to ONE post-shuffle
        # partition instead of scheduling `defaultParallelism` near-empty
        # tasks — at 100 TB the advisory size governs anyway, while at small
        # SFs this removes a pure per-task scheduling floor (32 tasks × 2-4
        # stages for intermediates that fit in one).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
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
        .config(
            "spark.python.daemon.module",
            "satsure_agri_datapipeline_spark.python_daemon",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
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
