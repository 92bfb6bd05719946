"""Quality-report CSV sink (SURVEY.md §2.1 S10; reference
``src/components/validation.py:487-595``).

Long-format rows (category, metric, value, threshold, status, details) plus
``validation_timestamp`` / ``validator_version`` columns, identical to the
reference's ``reports/data_quality_report.csv``. The report is tiny by
construction (O(reading_types + sensors + issues) rows), so it is assembled
driver-side from already-collected metrics and written with pandas.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path
from typing import Any

import pandas as pd

from satsure_agri_datapipeline_spark.config import PipelineConfig

VALIDATOR_VERSION = "1.0.0"


def build_report_rows(
    quality_metrics: dict[str, Any],
    issues_found: list[str],
    config: PipelineConfig,
) -> list[dict[str, Any]]:
    v = config.validation
    rows: list[dict[str, Any]] = []
    overall = quality_metrics.get("overall_statistics", {})
    rows.append(
        {
            "category": "overall",
            "metric": "total_records",
            "value": overall.get("total_records", 0),
            "threshold": None,
            "status": "pass",
            "details": f"Total records processed: {overall.get('total_records', 0)}",
        }
    )
    rows.append(
        {
            "category": "overall",
            "metric": "unique_sensors",
            "value": overall.get("unique_sensors", 0),
            "threshold": None,
            "status": "info",
            "details": f"Unique sensors: {overall.get('unique_sensors', 0)}",
        }
    )
    for rt, m in quality_metrics.get("missing_values_by_type", {}).items():
        rows.append(
            {
                "category": "missing_values",
                "metric": f"{rt}_missing_percentage",
                "value": m["missing_percentage"],
                "threshold": v.max_missing_percentage,
                "status": "pass" if m["missing_percentage"] <= v.max_missing_percentage else "fail",
                "details": f"{m['missing_values']} out of {m['total_records']} records",
            }
        )
    for rt, m in quality_metrics.get("anomalies_by_type", {}).items():
        rows.append(
            {
                "category": "anomalies",
                "metric": f"{rt}_anomaly_percentage",
                "value": m["anomaly_percentage"],
                "threshold": v.max_anomaly_percentage,
                "status": "pass" if m["anomaly_percentage"] <= v.max_anomaly_percentage else "fail",
                "details": f"{m['anomalous_count']} out of {m['total_records']} records",
            }
        )
    if "total_missing_hours" in quality_metrics:
        tmh = quality_metrics["total_missing_hours"]
        rows.append(
            {
                "category": "time_gaps",
                "metric": "total_missing_hours",
                "value": tmh,
                "threshold": v.max_gap_hours,
                "status": "warning" if tmh > 0 else "pass",
                "details": f"Total missing hourly readings: {tmh}",
            }
        )
    for sensor_id, m in quality_metrics.get("sensor_coverage", {}).items():
        abl = m["avg_battery_level"]
        rows.append(
            {
                "category": "sensor_coverage",
                "metric": f"{sensor_id}_battery_level",
                "value": abl,
                "threshold": 30.0,
                "status": "warning" if (abl is not None and abl < 30) else "pass",
                "details": f"Average battery: {abl}%, {m['total_readings']} readings",
            }
        )
    for i, issue in enumerate(issues_found):
        rows.append(
            {
                "category": "issues",
                "metric": f"issue_{i + 1}",
                "value": None,
                "threshold": None,
                "status": "fail",
                "details": issue,
            }
        )
    return rows


def write_quality_report(
    quality_metrics: dict[str, Any],
    issues_found: list[str],
    config: PipelineConfig,
    path: str | Path | None = None,
) -> Path:
    rows = build_report_rows(quality_metrics, issues_found, config)
    report = pd.DataFrame(rows)
    report["validation_timestamp"] = datetime.now().isoformat()
    report["validator_version"] = VALIDATOR_VERSION
    out = Path(path or config.paths.dq_report_csv)
    out.parent.mkdir(parents=True, exist_ok=True)
    report.to_csv(out, index=False)
    return out
