"""PySpark-native analytics engine with the capabilities of the
``vyomthakkar/satsure-agri-datapipeline`` reference (agricultural IoT sensor
ETL: ingest → transform → validate → load), rebuilt Spark-first.

Design stance (SURVEY.md §7.0): components are pure lazy
``DataFrame -> DataFrame`` transforms; the whole pipeline is one Catalyst
lineage with exactly two kinds of actions per run — the final partitioned
write and a handful of small metric aggregations. No driver-side
materialization of data-plane rows anywhere.
"""

from satsure_agri_datapipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
