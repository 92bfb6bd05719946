"""Shared fixtures (modeled on reference ``tests/conftest.py`` semantics)."""

from __future__ import annotations

from datetime import datetime

import pytest

from satsure_agri_datapipeline_spark.config import PipelineConfig
from satsure_agri_datapipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        timezone="UTC",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.default.parallelism": "8",
        },
    )
    yield s


@pytest.fixture
def config(tmp_path):
    return PipelineConfig().resolve_paths(tmp_path)


@pytest.fixture
def sample_sensor_data(spark):
    """5-row canonical frame mirroring reference ``tests/conftest.py:88-104``."""
    rows = [
        ("sensor_1", datetime(2023, 6, 1, 10, 0), "temperature", 20.0, 85.0),
        ("sensor_1", datetime(2023, 6, 1, 11, 0), "temperature", 25.0, 84.0),
        ("sensor_1", datetime(2023, 6, 1, 12, 0), "temperature", 30.0, 83.0),
        ("sensor_2", datetime(2023, 6, 1, 10, 0), "humidity", 60.0, 90.0),
        ("sensor_2", datetime(2023, 6, 1, 11, 0), "humidity", 65.0, None),
    ]
    return spark.createDataFrame(
        rows, "sensor_id string, timestamp timestamp, reading_type string, value double, battery_level double"
    )
