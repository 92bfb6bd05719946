"""Testdata table loader with nanosecond-timestamp normalization.

Parquet written by pandas/pyarrow defaults to TIMESTAMP(NANOS), which Spark's
parquet reader rejects for ``TimestampType`` ([PARQUET_TYPE_ILLEGAL]). The
loader inspects footers (driver-side, metadata only), reads NANOS columns as
longs (``spark.sql.legacy.parquet.nanosAsLong``), and converts with integer
division — ``div 1000`` then ``timestamp_micros`` — so no precision is lost
through doubles (ns-since-epoch exceeds double's 53-bit mantissa).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nanos_timestamp_columns(path: str | Path) -> list[str]:
    """Footer probe (driver-side, metadata only). ``path`` may be a single
    parquet file OR a directory dataset (e.g. a Spark-written table of
    part files) — for a directory the first part file is probed, which is
    sound because one writer produced a homogeneous schema; mixed-unit
    directories go through ``sources/parquet.py``'s per-file grouping
    instead."""
    p = Path(path)
    if p.is_dir():
        parts = sorted(p.glob("*.parquet")) or sorted(p.glob("part-*"))
        if not parts:
            return []
        p = parts[0]
    schema = pq.read_schema(str(p))
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str | Path, name: str) -> DataFrame:
    """Read one testdata table, normalizing ns timestamps to TimestampType.

    When ``SPARK_GRAFT_BUCKETED_LAYOUT`` points at a layout built from THIS
    ``sf_dir`` (see ``sources/bucketed.py``), the hot fact tables are served
    from their bucketed form — identical rows, exchange-free join/groupBy
    on the bucket key. Off (the default / driver path): raw parquet."""
    from .bucketed import bucketed_table_or_none  # noqa: PLC0415

    bkt = bucketed_table_or_none(spark, sf_dir, name)
    if bkt is not None:
        return bkt
    path = str(Path(sf_dir) / f"{name}.parquet")
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_parquet_files(
    spark: SparkSession, paths: list[str | Path]
) -> DataFrame:
    """Read an explicit list of parquet files with the same ns-timestamp
    normalization as ``load_table`` — the delta-maintenance read path for
    the ingest-time stores (``band_store``/``shingle_store``), which must
    process ONLY a data drop's new files, never rescan the standing
    corpus."""
    if not paths:
        raise ValueError("load_parquet_files: empty path list")
    str_paths = [str(p) for p in paths]
    ns_cols = _nanos_timestamp_columns(str_paths[0])
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(*str_paths)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | Path, names: list[str] | None = None
) -> dict[str, DataFrame]:
    out = {}
    for name in names or TABLE_NAMES:
        if (Path(sf_dir) / f"{name}.parquet").exists():
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str | Path) -> dict[str, DataFrame]:
    """Temp-view registration (S7 analog) for the SQL surface."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
