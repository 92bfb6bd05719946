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
    transform,
)

__all__ = [
    "calibrate",
    "convert_timezone",
    "derive_daily_average",
    "derive_rolling_average",
    "drop_exact_duplicates",
    "drop_null_critical",
    "flag_anomalies",
    "handle_outliers",
    "impute_battery_median",
    "transform",
]
