"""Structured Streaming ingest: file source + watermarked hourly counts,
exactly-once via Spark's own checkpoint (replaces the reference's JSON
file-checkpoint, ingestion.py:143-201)."""

from datetime import datetime

import pandas as pd

from satsure_agri_datapipeline_spark.config import PipelineConfig
from satsure_agri_datapipeline_spark.streaming.ingest import run_streaming_ingest


def _write_raw(raw_dir, day, n_hours=24):
    raw_dir.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(
        {
            "sensor_id": ["s1"] * n_hours,
            "timestamp": [datetime(2023, 6, day, h) for h in range(n_hours)],
            "reading_type": ["temperature"] * n_hours,
            "value": [20.0 + h for h in range(n_hours)],
            "battery_level": [80.0] * n_hours,
        }
    )
    df.to_parquet(raw_dir / f"2023-06-0{day}.parquet", coerce_timestamps="us")


def test_streaming_ingest_nanos_parquet(spark, tmp_path):
    """pandas-default TIMESTAMP(NANOS) parquet must stream without the
    PARQUET_TYPE_ILLEGAL error (nanosAsLong + div-1000, like the batch
    reader)."""
    cfg = PipelineConfig().resolve_paths(tmp_path)
    raw = tmp_path / "data" / "raw"
    raw.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(
        {
            "sensor_id": ["s1"] * 24,
            "timestamp": [datetime(2023, 6, 1, h) for h in range(24)],
            "reading_type": ["temperature"] * 24,
            "value": [20.0 + h for h in range(24)],
            "battery_level": [80.0] * 24,
        }
    )
    df.to_parquet(raw / "2023-06-01.parquet")  # no coerce: ns unit

    q = run_streaming_ingest(
        spark, cfg, tmp_path / "ns_out", tmp_path / "ns_ckpt", once=True
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "ns_out"))
    # watermark-closed windows only (see exactly-once test): 21 of 24
    assert out.count() == 21
    assert dict(out.dtypes)["hour_start"] == "timestamp"


def test_streaming_ingest_exactly_once(spark, tmp_path):
    cfg = PipelineConfig().resolve_paths(tmp_path)
    raw = tmp_path / "data" / "raw"
    out = tmp_path / "stream_out"
    ckpt = tmp_path / "stream_ckpt"
    _write_raw(raw, day=1)

    q = run_streaming_ingest(spark, cfg, out, ckpt, once=True)
    q.awaitTermination(120)
    first = spark.read.parquet(str(out))
    # append mode emits only watermark-CLOSED windows: max ts 23:00 −2h
    # watermark ⇒ windows ending ≤21:00 ⇒ starts 00..20 = 21 of 24; the last
    # 3 stay open as state until later data advances the watermark.
    assert first.count() == 21

    # new file arrives; restart processes ONLY the new file (checkpoint):
    # day-1's open windows close (24 total) + day-2 closed windows (21).
    _write_raw(raw, day=2)
    q2 = run_streaming_ingest(spark, cfg, out, ckpt, once=True)
    q2.awaitTermination(120)
    both = spark.read.parquet(str(out))
    assert both.count() == 24 + 21
    # re-running with no new files adds nothing (exactly-once)
    q3 = run_streaming_ingest(spark, cfg, out, ckpt, once=True)
    q3.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == 24 + 21
