"""CSV and JSON-lines sources with declared schemas and row-level corruption
capture — format breadth beyond the reference's parquet-only ingest.

Parquet carries its schema in the footer, so its gate is file-level
(sources/parquet.py). Text formats have no trustworthy self-description, so
the contract here is schema-on-read (never inference — an inferred schema
silently drifts with the data) plus Spark's PERMISSIVE row-level handling:
malformed rows land in a ``_corrupt_record`` column instead of failing the
job or being dropped silently. ``split_corrupt`` separates them so the
pipeline can quarantine bad rows the way the parquet gate quarantines bad
files.

At scale both readers are plain distributed file scans: projection still
prunes (CSV/JSON must parse the full line but only materialize selected
columns), filters evaluate post-parse, and partition-dir layouts
(``date=.../sensor_id=...``) prune exactly like parquet.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from satsure_agri_datapipeline_spark.sources.parquet import build_struct_type

CORRUPT_COL = "_corrupt_record"


def _gated_schema(types: dict[str, str], expected_columns: list[str]) -> T.StructType:
    struct = build_struct_type({c: types[c] for c in expected_columns})
    return struct.add(T.StructField(CORRUPT_COL, T.StringType(), True))


def read_sensor_csv(
    spark: SparkSession,
    path: str | Path,
    expected_columns: list[str],
    types: dict[str, str],
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV scan with declared schema; malformed rows carry the raw line in
    ``_corrupt_record`` (PERMISSIVE), well-formed rows have it null."""
    reader = (
        spark.read.schema(_gated_schema(types, expected_columns))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(str(path))


def read_sensor_jsonl(
    spark: SparkSession,
    path: str | Path,
    expected_columns: list[str],
    types: dict[str, str],
) -> DataFrame:
    """JSON-lines scan with declared schema; same corruption contract as the
    CSV reader. Extra JSON keys are ignored (schema projection), missing
    keys read as null — the text-format analog of the parquet gate's
    missing/extra-column file rejection, but per row."""
    return (
        spark.read.schema(_gated_schema(types, expected_columns))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(str(path))
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_rows_with_raw_line). Cache
    the input if both sides get consumed — each side is a filter over the
    same scan."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt
