"""Operator surface: sensor-pipeline transforms plus the LLM-training-data
families (dedup, text analysis, similarity search, multimodal plumbing)."""

from satsure_agri_datapipeline_spark.operators import (  # noqa: F401
    dedup,
    graph,
    joins,
    maintenance,
    multimodal,
    sampling,
    similarity,
    temporal,
    text,
)
from satsure_agri_datapipeline_spark.operators.transformation import (
    calibrate,
    convert_timezone,
    derive_daily_average,
    derive_rolling_average,
    drop_exact_duplicates,
    drop_null_critical,
    flag_anomalies,
    handle_outliers,
    impute_battery_median,
    stage_counters,
    transform,
)

__all__ = [
    "calibrate",
    "convert_timezone",
    "dedup",
    "joins",
    "maintenance",
    "derive_daily_average",
    "derive_rolling_average",
    "drop_exact_duplicates",
    "drop_null_critical",
    "flag_anomalies",
    "handle_outliers",
    "impute_battery_median",
    "multimodal",
    "sampling",
    "similarity",
    "temporal",
    "stage_counters",
    "text",
    "transform",
]
