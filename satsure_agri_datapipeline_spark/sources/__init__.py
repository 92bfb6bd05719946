from satsure_agri_datapipeline_spark.sources.parquet import (
    SchemaGateResult,
    build_struct_type,
    read_sensor_parquet,
    validate_file_schema,
)
from satsure_agri_datapipeline_spark.sources.checkpoint import FileCheckpoint

__all__ = [
    "SchemaGateResult",
    "build_struct_type",
    "read_sensor_parquet",
    "validate_file_schema",
    "FileCheckpoint",
]
