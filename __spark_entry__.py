"""Driver contract for the PySpark engine.

``entry(spark)`` — flagship query (full sensor-pipeline transform over the
events table mapped to the reference's reading shape) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-pipeline extensions) as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — matching DuckDB ANSI-SQL oracles (omitted only for
genuinely non-SQL-expressible ops; those get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference pipeline's transform stage (dedup → clean →
    impute → calibrate → tz → daily/rolling averages → anomaly flags) over
    sf0.001 events mapped to sensor-reading shape."""
    from satsure_agri_datapipeline_spark.config import PipelineConfig
    from satsure_agri_datapipeline_spark.operators.transformation import transform
    from satsure_agri_datapipeline_spark.plans.catalog import events_as_readings

    cfg = PipelineConfig()  # reference defaults: UTC+05:30, z=3.0, 7-day window
    readings = events_as_readings(spark, "/root/testdata/sf0.001").drop("event_id")
    return transform(readings, cfg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from satsure_agri_datapipeline_spark.plans import catalog  # noqa: F401
    from satsure_agri_datapipeline_spark.plans import catalog_relational  # noqa: F401
    from satsure_agri_datapipeline_spark.plans import catalog_llm  # noqa: F401
    from satsure_agri_datapipeline_spark.plans import catalog_temporal  # noqa: F401
    from satsure_agri_datapipeline_spark.plans.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from satsure_agri_datapipeline_spark.plans import catalog  # noqa: F401
    from satsure_agri_datapipeline_spark.plans import catalog_relational  # noqa: F401
    from satsure_agri_datapipeline_spark.plans import catalog_llm  # noqa: F401
    from satsure_agri_datapipeline_spark.plans import catalog_temporal  # noqa: F401
    from satsure_agri_datapipeline_spark.plans.catalog import ORACLES

    return dict(ORACLES)
