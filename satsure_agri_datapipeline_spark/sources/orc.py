"""ORC source/sink — columnar-format breadth beyond parquet.

ORC is the other first-class columnar format in Spark's built-in DataSource
V2 surface, with the same scan machinery parquet gets: vectorized reads,
predicate pushdown into stripe/row-group indexes, column pruning, and
Hive-style partition-dir pruning. The writer mirrors the parquet sink's
layout contract (``operators/loading.py``): partitioned, zstd-compressed,
dynamic-overwrite-aware.

When to choose which (documented trade, both supported): parquet for the
widest ecosystem interop (DuckDB/Arrow/pandas read it natively — our oracle
gate depends on that); ORC for Hive-heavy estates and its ACID/bloom-filter
stripe features. The engine's operators are format-agnostic — every
transform takes a DataFrame regardless of the scan that produced it.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from satsure_agri_datapipeline_spark.sources.parquet import build_struct_type


def write_orc_partitioned(
    df: DataFrame,
    path: str | Path,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Hive-partitioned ORC sink (parquet-sink parity: S8 shape).

    Repartitioning by the partition keys before write bounds file counts
    per partition exactly like the parquet sink does — without it, every
    task writes a file into every partition dir it touches.
    """
    out = df
    if partition_by:
        out = df.repartition(*partition_by)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(str(path))


def read_orc(
    spark: SparkSession,
    path: str | Path,
    types: dict[str, str] | None = None,
) -> DataFrame:
    """ORC scan, optionally schema-enforced (schema-on-read like the CSV/
    JSON sources; omit ``types`` to trust the file footers). Partition-dir
    equality filters prune directories before any stripe is opened."""
    reader = spark.read
    if types:
        reader = reader.schema(build_struct_type(types))
    return reader.orc(str(path))


def read_text_corpus(
    spark: SparkSession,
    path: str | Path,
    whole_files: bool = True,
) -> DataFrame:
    """Raw-text corpus source for the LLM-pipeline operators: returns
    (doc_path, text). ``whole_files=True`` gives one row per file (document
    = file, the common dump layout); ``False`` gives one row per line.

    Scale note: whole-file mode makes one task per file and holds a full
    file in memory — fine for the many-small-files corpus shape it exists
    for; for huge single files use line mode (splittable scan) plus a
    downstream reassembly key.
    """
    from pyspark.sql import functions as F

    df = spark.read.text(str(path), wholetext=whole_files)
    return df.select(
        F.input_file_name().alias("doc_path"), F.col("value").alias("text")
    )
