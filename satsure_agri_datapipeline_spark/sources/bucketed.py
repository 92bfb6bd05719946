"""Bucketed storage layout for repeatedly-joined fact tables.

THE 100 TB lever the per-query planner cannot pull: a join or aggregation
key that is hot across the workload (orders/lineitem on orderkey, orders/
customer on custkey) pays its hash exchange ONCE, at ingest, by writing the
table bucketed on that key — every subsequent join/groupBy on the key reads
co-located buckets and plans ZERO Exchange on that side. The reference
(pandas, single process, ``loading.py:228-266``) has no analog; this is the
Spark-native equivalent of its partitioned-parquet sink taken to join keys.

Bucket-key choices, derived from the workload (see
``plans/catalog_relational.py``):

- ``lineitem``  CLUSTERED BY l_orderkey  — the single biggest exchange in
  the catalog (60M narrow rows at 100x bench scale, join_multiway_revenue);
- ``orders``    CLUSTERED BY o_custkey   — serves BOTH the segment-revenue
  groupBy(o_custkey) pre-aggregate and the multiway custkey join;
- ``customer``  CLUSTERED BY c_custkey   — same bucket count as orders, so
  orders ⋈ customer is exchange-free on both sides (broadcast-joined dims
  hanging off customer preserve its clustering).

Spark's default in-memory catalog does not survive the JVM, so the layout
directory is self-describing: ``build_bucketed_layout`` writes the bucketed
files plus a ``_layout_manifest.json`` (source sf_dir, bucket counts,
schemas), and ``register_bucketed_layout`` re-attaches the tables in any
later session with ``CREATE TABLE ... USING parquet CLUSTERED BY ...
LOCATION ...`` DDL — metadata-only, no data movement.

Opt-in wiring: when ``SPARK_GRAFT_BUCKETED_LAYOUT`` names a layout
directory, ``sources.tables.load_table`` serves ``orders``/``lineitem``/
``customer`` from the bucketed tables — IF the manifest's source sf_dir
matches the requested one (a layout built from sf0.1 silently ignored when
a query asks for sf0.01 — correctness can never depend on the env var).
Default path (env unset, the driver's configuration) is untouched raw
parquet.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_layout_manifest.json"

# table -> (bucket columns, per-bucket sort columns)
BUCKET_SPECS: dict[str, tuple[list[str], list[str]]] = {
    "lineitem": (["l_orderkey"], ["l_orderkey"]),
    "orders": (["o_custkey"], ["o_custkey"]),
    "customer": (["c_custkey"], ["c_custkey"]),
}


def _table_name(name: str) -> str:
    return f"bkt_{name}"


def build_bucketed_layout(
    spark: SparkSession,
    sf_dir: str | Path,
    layout_dir: str | Path,
    n_buckets: int = 32,
    tables: list[str] | None = None,
) -> dict:
    """One-time ingest: write the hot fact tables bucketed (and bucket-sorted)
    under ``layout_dir`` and stamp the manifest. Each table costs exactly the
    exchange it will save on every future query. Idempotent (overwrite)."""
    from .tables import load_table  # noqa: PLC0415 (cycle)

    layout = Path(layout_dir)
    layout.mkdir(parents=True, exist_ok=True)
    manifest: dict = {
        "sf_dir": str(Path(sf_dir).resolve()),
        "n_buckets": n_buckets,
        "tables": {},
    }
    for name in tables or list(BUCKET_SPECS):
        bucket_cols, sort_cols = BUCKET_SPECS[name]
        df = load_table(spark, sf_dir, name)
        tbl = _table_name(name)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.repartition(n_buckets, *bucket_cols)
            .write.format("parquet")
            .mode("overwrite")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*sort_cols)
            .option("path", str(layout / name))
            .saveAsTable(tbl)
        )
        manifest["tables"][name] = {
            "bucket_cols": bucket_cols,
            "sort_cols": sort_cols,
            "ddl_schema": ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
            ),
        }
    (layout / MANIFEST_NAME).write_text(json.dumps(manifest, indent=2))
    return manifest


def register_bucketed_layout(spark: SparkSession, layout_dir: str | Path) -> dict:
    """Re-attach a previously built layout in THIS session: metadata-only
    ``CREATE TABLE`` DDL per table (Spark's in-memory catalog forgets
    bucketing across JVMs; the files and manifest remember)."""
    layout = Path(layout_dir)
    manifest = json.loads((layout / MANIFEST_NAME).read_text())
    n = manifest["n_buckets"]
    for name, spec in manifest["tables"].items():
        tbl = _table_name(name)
        if spark.catalog.tableExists(tbl):
            continue
        bucket_cols = ", ".join(spec["bucket_cols"])
        sort_cols = ", ".join(spec["sort_cols"])
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['ddl_schema']}) USING parquet "
            f"CLUSTERED BY ({bucket_cols}) SORTED BY ({sort_cols}) "
            f"INTO {n} BUCKETS LOCATION '{layout / name}'"
        )
    return manifest


def bucketed_table_or_none(
    spark: SparkSession, sf_dir: str | Path, name: str
) -> DataFrame | None:
    """The ``load_table`` hook: serve ``name`` from the bucketed layout when
    ``SPARK_GRAFT_BUCKETED_LAYOUT`` is set AND its manifest was built from
    exactly the requested ``sf_dir``; ``None`` (caller reads raw parquet)
    otherwise. Registration is lazy and idempotent per session."""
    layout_dir = os.environ.get("SPARK_GRAFT_BUCKETED_LAYOUT")
    if not layout_dir or name not in BUCKET_SPECS:
        return None
    manifest_path = Path(layout_dir) / MANIFEST_NAME
    if not manifest_path.exists():
        return None
    manifest = json.loads(manifest_path.read_text())
    if manifest["sf_dir"] != str(Path(sf_dir).resolve()):
        return None
    if name not in manifest["tables"]:
        return None
    register_bucketed_layout(spark, layout_dir)
    return spark.table(_table_name(name))
