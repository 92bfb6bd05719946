"""Schema-gated Parquet ingestion (SURVEY.md §2.1 S1-S6).

Semantics mirrored from reference ``src/components/ingestion.py``:

- file discovery: sorted glob of ``*.parquet`` under the raw dir
  (``ingestion.py:110-141``);
- per-file pre-flight schema gate against the declared config schema using
  **footer metadata only** (no data scan, ``ingestion.py:214-218``): missing or
  extra columns ⇒ reject; column-order mismatch ⇒ warn only
  (``ingestion.py:224-236``); per-column type check with compatibility groups
  (``ingestion.py:268-292``);
- all accepted files are then read in ONE ``spark.read.schema(...).parquet(*files)``
  call — Spark's multi-file scan replaces the reference's per-file
  load-then-concat loop (``ingestion.py:91``), keeping the scan parallel and
  the plan a single relation Catalyst can prune/push into.

At 100 TB the footer pre-flight stays cheap: it reads O(files) footers on the
driver (a few KB each), never data pages. For very large file counts the gate
can be disabled (``validate=False``) in favor of ``spark.read.schema`` +
PERMISSIVE semantics.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

# DuckDB/ANSI type-name → compatibility group (reference ingestion.py:268-292).
_COMPAT_GROUPS: list[set[str]] = [
    {"TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP_S", "TIMESTAMP_US"},
    {"DOUBLE", "FLOAT64", "FLOAT", "REAL", "FLOAT32"},
    {"VARCHAR", "STRING", "TEXT"},
    {"BIGINT", "INT64", "LONG"},
    {"INTEGER", "INT", "INT32"},
    {"BOOLEAN", "BOOL"},
    {"DATE", "DATE32"},
]

_SQL_TO_SPARK: dict[str, T.DataType] = {
    "VARCHAR": T.StringType(),
    "STRING": T.StringType(),
    "TEXT": T.StringType(),
    "TIMESTAMP": T.TimestampType(),
    "TIMESTAMP_NS": T.TimestampType(),
    "TIMESTAMP_MS": T.TimestampType(),
    "TIMESTAMP_S": T.TimestampType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "FLOAT": T.FloatType(),
    "REAL": T.FloatType(),
    "BIGINT": T.LongType(),
    "INT64": T.LongType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "DATE": T.DateType(),
}

# pyarrow type → canonical SQL-ish name for compat checking
def _arrow_type_name(t) -> str:
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return f"TIMESTAMP_{t.unit.upper()}"
    if pa.types.is_float64(t):
        return "DOUBLE"
    if pa.types.is_float32(t):
        return "FLOAT"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "VARCHAR"
    if pa.types.is_int64(t):
        return "BIGINT"
    if pa.types.is_int32(t):
        return "INTEGER"
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_date(t):
        return "DATE"
    return str(t).upper()


def types_compatible(expected: str, actual: str) -> bool:
    """Type-compatibility check with groups (reference ``ingestion.py:268-292``)."""
    e, a = expected.strip().upper(), actual.strip().upper()
    if e == a:
        return True
    for group in _COMPAT_GROUPS:
        if e in group and a in group:
            return True
    return False


def build_struct_type(types: dict[str, str], nullable: bool = True) -> T.StructType:
    """Declared config schema → Spark ``StructType`` (schema-on-read, no inference)."""
    fields = []
    for name, sql_type in types.items():
        spark_type = _SQL_TO_SPARK.get(sql_type.strip().upper())
        if spark_type is None:
            raise ValueError(f"unsupported declared type {sql_type!r} for column {name!r}")
        fields.append(T.StructField(name, spark_type, nullable))
    return T.StructType(fields)


@dataclass
class SchemaGateResult:
    accepted: list[str] = field(default_factory=list)
    rejected: dict[str, str] = field(default_factory=dict)  # path -> reason
    warnings: dict[str, str] = field(default_factory=dict)


def validate_file_schema(
    path: str | Path, expected_columns: list[str], expected_types: dict[str, str]
) -> tuple[bool, str | None, str | None]:
    """Footer-only schema gate for one file.

    Returns ``(ok, reject_reason, warning)``. Mirrors reference
    ``ingestion.py:203-254``: missing cols ⇒ reject; extra cols ⇒ reject;
    order mismatch ⇒ warn; incompatible type ⇒ reject; unreadable ⇒ reject.
    """
    try:
        schema = pq.read_schema(str(path))
    except Exception as exc:  # corrupted / non-parquet file
        return False, f"unreadable parquet footer: {exc}", None

    actual_cols = list(schema.names)
    expected_set, actual_set = set(expected_columns), set(actual_cols)
    missing = expected_set - actual_set
    if missing:
        return False, f"missing columns: {sorted(missing)}", None
    extra = actual_set - expected_set
    if extra:
        return False, f"extra columns: {sorted(extra)}", None

    warning = None
    if actual_cols != expected_columns:
        warning = f"column order mismatch: {actual_cols} vs {expected_columns}"

    for col, declared in expected_types.items():
        actual_name = _arrow_type_name(schema.field(col).type)
        if not types_compatible(declared, actual_name):
            return False, f"incompatible type for {col!r}: expected {declared}, got {actual_name}", None
    return True, None, warning


def discover_files(raw_dir: str | Path) -> list[Path]:
    """Sorted ``*.parquet`` glob (reference ``ingestion.py:110-141``); a
    missing directory is an error, not an empty batch (``ingestion.py:123``)."""
    d = Path(raw_dir)
    if not d.is_dir():
        raise FileNotFoundError(f"Raw data directory does not exist: {d}")
    return sorted(d.glob("*.parquet"))


def read_sensor_parquet(
    spark: SparkSession,
    raw_dir: str | Path,
    expected_columns: list[str],
    expected_types: dict[str, str],
    files: list[Path] | None = None,
    validate: bool = True,
) -> tuple[DataFrame | None, SchemaGateResult]:
    """Discover → gate → single multi-file schema'd read.

    Returns ``(df, gate_result)``; df is None when no file passes the gate.
    Column-order differences between files are normalized by the declared
    schema (Spark matches parquet columns by name).
    """
    gate = SchemaGateResult()
    candidates = files if files is not None else discover_files(raw_dir)
    for f in candidates:
        if not validate:
            gate.accepted.append(str(f))
            continue
        ok, reason, warning = validate_file_schema(f, expected_columns, expected_types)
        if warning:
            gate.warnings[str(f)] = warning
            logger.warning("%s: %s", f, warning)
        if ok:
            gate.accepted.append(str(f))
        else:
            gate.rejected[str(f)] = reason or "rejected"
            logger.warning("rejected %s: %s", f, reason)

    if not gate.accepted:
        return None, gate

    # Group accepted files by their set of NANOS timestamp columns: Spark's
    # parquet reader rejects TIMESTAMP(NANOS) for TimestampType, so files with
    # ns columns are read with those columns declared as LongType
    # (nanosAsLong) and converted via integer division (precision-exact).
    ts_cols = [c for c in expected_columns if expected_types[c].strip().upper().startswith("TIMESTAMP")]
    groups: dict[frozenset[str], list[str]] = {}
    for f in gate.accepted:
        try:
            schema = pq.read_schema(f)
            import pyarrow as pa

            ns = frozenset(
                c
                for c in ts_cols
                if pa.types.is_timestamp(schema.field(c).type)
                and schema.field(c).type.unit == "ns"
            )
        except Exception:
            ns = frozenset()
        groups.setdefault(ns, []).append(f)

    parts: list[DataFrame] = []
    for ns_cols, paths in groups.items():
        types = dict(expected_types)
        if ns_cols:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            for c in ns_cols:
                types[c] = "BIGINT"
        struct = build_struct_type({c: types[c] for c in expected_columns})
        part = spark.read.schema(struct).parquet(*paths)
        for c in ns_cols:
            part = part.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        parts.append(part.select(*expected_columns))

    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df, gate
