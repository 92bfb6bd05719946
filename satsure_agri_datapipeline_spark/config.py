"""Pipeline configuration — byte-compatible with the reference YAML.

A config file written for the reference (``/root/reference/config/default.yaml``)
parses unchanged here; shapes mirror reference ``src/config/models.py:48-141``
without copying its code (plain pydantic v2 models, defaults taken from the
published YAML).
"""

from __future__ import annotations

from pathlib import Path

import yaml
from pydantic import BaseModel, Field


class SchemaDefinition(BaseModel):
    expected_columns: list[str] = [
        "sensor_id",
        "timestamp",
        "reading_type",
        "value",
        "battery_level",
    ]
    types: dict[str, str] = {
        "sensor_id": "VARCHAR",
        "timestamp": "TIMESTAMP",
        "reading_type": "VARCHAR",
        "value": "DOUBLE",
        "battery_level": "DOUBLE",
    }


class RangeBound(BaseModel):
    min: float
    max: float


class Calibration(BaseModel):
    multiplier: float = 1.0
    offset: float = 0.0


class WriteConfig(BaseModel):
    compression: str = "zstd"
    partition_by: list[str] = ["date", "sensor_id"]
    mode: str = "overwrite"  # or "append"


class TransformationConfig(BaseModel):
    z_score_threshold: float = 3.0
    rolling_window_days: int = 7
    outlier_handling: str = "flag"  # "flag" or "remove"


class ValidationConfig(BaseModel):
    max_missing_percentage: float = 20.0
    # Driver-side report cap (r8 verdict task 5): validate() collects at
    # most this many gap rows / coverage sensors. The default comfortably
    # covers any human-readable report; at 10⁵–10⁶ sensors it bounds the
    # driver materialization that used to be O(sensors). Totals and
    # percentages stay exact — they are computed distributed.
    report_top_n: int = 10_000
    max_anomaly_percentage: float = 10.0
    expected_frequency_hours: int = 1
    max_gap_hours: float = 1.0


class IngestionConfig(BaseModel):
    incremental_mode: bool = True
    checkpoint_file: str = "data/.checkpoint"


class PathsConfig(BaseModel):
    data_raw: str = "data/raw"
    data_processed: str = "data/processed"
    reports_dir: str = "reports"
    dq_report_csv: str = "reports/data_quality_report.csv"


class ProjectConfig(BaseModel):
    timezone: str = "UTC+05:30"
    run_id: str | None = None


class PipelineMeta(BaseModel):
    name: str = "agricultural_sensor_pipeline"
    version: str = "1.0.0"


class PipelineConfig(BaseModel):
    pipeline: PipelineMeta = Field(default_factory=PipelineMeta)
    project: ProjectConfig = Field(default_factory=ProjectConfig)
    paths: PathsConfig = Field(default_factory=PathsConfig)
    schema_: SchemaDefinition = Field(default_factory=SchemaDefinition, alias="schema")
    ranges: dict[str, RangeBound] = {
        "temperature": RangeBound(min=-10, max=60),
        "humidity": RangeBound(min=0, max=100),
        "battery_level": RangeBound(min=0, max=100),
    }
    calibration: dict[str, Calibration] = {}
    write: WriteConfig = Field(default_factory=WriteConfig)
    transformation: TransformationConfig = Field(default_factory=TransformationConfig)
    validation: ValidationConfig = Field(default_factory=ValidationConfig)
    ingestion: IngestionConfig = Field(default_factory=IngestionConfig)

    model_config = {"populate_by_name": True}

    def get_calibration(self, reading_type: str) -> Calibration:
        """Identity calibration when a reading_type has no entry (reference
        ``src/config/models.py:147-149``)."""
        return self.calibration.get(reading_type, Calibration())

    def resolve_paths(self, base_dir: str | Path) -> "PipelineConfig":
        """Re-anchor relative paths under ``base_dir``."""
        base = Path(base_dir)
        p = self.paths
        updated = PathsConfig(
            data_raw=str(base / p.data_raw),
            data_processed=str(base / p.data_processed),
            reports_dir=str(base / p.reports_dir),
            dq_report_csv=str(base / p.dq_report_csv),
        )
        ing = IngestionConfig(
            incremental_mode=self.ingestion.incremental_mode,
            checkpoint_file=str(base / self.ingestion.checkpoint_file),
        )
        return self.model_copy(update={"paths": updated, "ingestion": ing})


def load_config(path: str | Path | None = None) -> PipelineConfig:
    """Load a reference-format YAML config; defaults mirror
    ``config/default.yaml`` when no file is given."""
    if path is None:
        return PipelineConfig()
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return PipelineConfig.model_validate(raw)
