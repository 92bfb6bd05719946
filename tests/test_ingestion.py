"""Schema gate + checkpoint semantics (reference ``tests/test_ingestion.py``:
missing/extra columns reject, order warns, wrong types reject, corrupt file
isolation, incremental checkpoint)."""

from datetime import datetime
from pathlib import Path

import pandas as pd
import pytest

from satsure_agri_datapipeline_spark.sources.checkpoint import FileCheckpoint
from satsure_agri_datapipeline_spark.sources.parquet import (
    build_struct_type,
    read_sensor_parquet,
    types_compatible,
    validate_file_schema,
)

COLS = ["sensor_id", "timestamp", "reading_type", "value", "battery_level"]
TYPES = {
    "sensor_id": "VARCHAR",
    "timestamp": "TIMESTAMP",
    "reading_type": "VARCHAR",
    "value": "DOUBLE",
    "battery_level": "DOUBLE",
}


def _write(path: Path, drop=None, extra=False, value_as_str=False, shuffle=False):
    df = pd.DataFrame(
        {
            "sensor_id": ["s1", "s2"],
            "timestamp": [datetime(2023, 6, 1, 10), datetime(2023, 6, 1, 11)],
            "reading_type": ["temperature", "humidity"],
            "value": [20.0, 60.0],
            "battery_level": [80.0, 90.0],
        }
    )
    if drop:
        df = df.drop(columns=[drop])
    if extra:
        df["extra_col"] = 1
    if value_as_str:
        df["value"] = df["value"].astype(str)
    if shuffle:
        df = df[list(reversed(df.columns))]
    df.to_parquet(path)
    return path


def test_type_compat_groups():
    assert types_compatible("TIMESTAMP", "TIMESTAMP_NS")
    assert types_compatible("DOUBLE", "FLOAT")
    assert types_compatible("VARCHAR", "STRING")
    assert not types_compatible("DOUBLE", "VARCHAR")
    assert not types_compatible("TIMESTAMP", "DOUBLE")


def test_gate_accepts_good_file(tmp_path):
    f = _write(tmp_path / "good.parquet")
    ok, reason, warning = validate_file_schema(f, COLS, TYPES)
    assert ok and reason is None and warning is None


def test_gate_rejects_missing_and_extra(tmp_path):
    ok, reason, _ = validate_file_schema(_write(tmp_path / "m.parquet", drop="battery_level"), COLS, TYPES)
    assert not ok and "missing" in reason
    ok, reason, _ = validate_file_schema(_write(tmp_path / "e.parquet", extra=True), COLS, TYPES)
    assert not ok and "extra" in reason


def test_gate_warns_on_order_rejects_on_type(tmp_path):
    ok, _, warning = validate_file_schema(_write(tmp_path / "o.parquet", shuffle=True), COLS, TYPES)
    assert ok and warning is not None
    ok, reason, _ = validate_file_schema(_write(tmp_path / "t.parquet", value_as_str=True), COLS, TYPES)
    assert not ok and "incompatible type" in reason


def test_corrupt_file_isolated(tmp_path, spark):
    _write(tmp_path / "good.parquet")
    (tmp_path / "bad.parquet").write_bytes(b"not a parquet file")
    df, gate = read_sensor_parquet(spark, tmp_path, COLS, TYPES)
    assert len(gate.accepted) == 1 and len(gate.rejected) == 1
    assert df.count() == 2


def test_multifile_read_normalizes_order(tmp_path, spark):
    _write(tmp_path / "a.parquet")
    _write(tmp_path / "b.parquet", shuffle=True)
    df, gate = read_sensor_parquet(spark, tmp_path, COLS, TYPES)
    assert df.columns == COLS
    assert df.count() == 4


def test_checkpoint_roundtrip_and_quirk(tmp_path):
    ckpt = FileCheckpoint(tmp_path / ".checkpoint")
    files = [Path("f1.parquet"), Path("f2.parquet")]
    assert ckpt.filter_new(files) == files
    ckpt.update(attempted=files)
    assert ckpt.filter_new(files) == []
    # corrupt checkpoint → starts fresh
    (tmp_path / ".checkpoint").write_text("{broken json")
    assert ckpt.load() == set()
    # fixed mode: only accepted files checkpointed
    ckpt2 = FileCheckpoint(tmp_path / ".ck2", mark_failed_as_processed=False)
    ckpt2.update(attempted=files, accepted=[files[0]])
    assert ckpt2.load() == {"f1.parquet"}


def test_build_struct_type():
    s = build_struct_type(TYPES)
    assert [f.name for f in s.fields] == COLS
    assert s["value"].dataType.typeName() == "double"
    with pytest.raises(ValueError):
        build_struct_type({"x": "BLOB"})


def test_csv_source_with_corrupt_rows(spark, tmp_path):
    from satsure_agri_datapipeline_spark.config import PipelineConfig
    from satsure_agri_datapipeline_spark.sources.delimited import (
        read_sensor_csv,
        split_corrupt,
    )

    cfg = PipelineConfig()
    p = tmp_path / "readings.csv"
    p.write_text(
        "sensor_id,timestamp,reading_type,value,battery_level\n"
        "s1,2023-06-01T10:00:00,temperature,20.5,80.0\n"
        "s2,2023-06-01T11:00:00,humidity,55.0,\n"
        "s3,not-a-timestamp,temperature,oops,xx\n"
    )
    df = read_sensor_csv(
        spark, p, cfg.schema_.expected_columns, cfg.schema_.types
    ).cache()
    clean, corrupt = split_corrupt(df)
    rows = {r.sensor_id: r for r in clean.collect()}
    assert set(rows) == {"s1", "s2"}
    assert rows["s2"].battery_level is None
    bad = corrupt.collect()
    assert len(bad) == 1 and "not-a-timestamp" in bad[0]._corrupt_record
    df.unpersist()


def test_jsonl_source_schema_projection(spark, tmp_path):
    from satsure_agri_datapipeline_spark.config import PipelineConfig
    from satsure_agri_datapipeline_spark.sources.delimited import (
        read_sensor_jsonl,
        split_corrupt,
    )

    cfg = PipelineConfig()
    p = tmp_path / "readings.jsonl"
    p.write_text(
        '{"sensor_id":"s1","timestamp":"2023-06-01T10:00:00","reading_type":"temperature","value":20.5,"battery_level":80.0,"extra_key":1}\n'
        '{"sensor_id":"s2","timestamp":"2023-06-01T11:00:00","reading_type":"humidity","value":55.0}\n'
        "this is not json\n"
    )
    df = read_sensor_jsonl(
        spark, p, cfg.schema_.expected_columns, cfg.schema_.types
    ).cache()
    clean, corrupt = split_corrupt(df)
    rows = {r.sensor_id: r for r in clean.collect()}
    assert set(rows) == {"s1", "s2"}
    assert "extra_key" not in clean.columns  # projection ignores extras
    assert rows["s2"].battery_level is None  # missing key -> null
    assert corrupt.count() == 1
    df.unpersist()


def test_orc_roundtrip_partition_pruned(spark, sample_sensor_data, tmp_path):
    from pyspark.sql import functions as F

    from satsure_agri_datapipeline_spark.sources.orc import read_orc, write_orc_partitioned

    df = sample_sensor_data.withColumn("date", F.to_date("timestamp"))
    out = tmp_path / "orc_out"
    write_orc_partitioned(df, out, partition_by=["date", "sensor_id"])

    back = read_orc(spark, out)
    assert back.count() == 5
    pruned = back.where(F.col("sensor_id") == "sensor_1")
    assert pruned.count() == 3
    # partition filter must reach the scan, not run as a post-filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "sensor_1" in plan

    # schema-on-read projection (unpartitioned layout: partition dirs would
    # re-append their columns after the declared schema)
    flat = tmp_path / "orc_flat"
    write_orc_partitioned(df, flat)
    typed = read_orc(
        spark,
        flat,
        types={"sensor_id": "VARCHAR", "value": "DOUBLE"},
    )
    assert typed.columns == ["sensor_id", "value"]
    assert typed.count() == 5


def test_text_corpus_whole_files(spark, tmp_path):
    from satsure_agri_datapipeline_spark.sources.orc import read_text_corpus

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("hello world\nsecond line")
    (corpus / "b.txt").write_text("another document")

    docs = read_text_corpus(spark, corpus, whole_files=True)
    rows = {r.doc_path.rsplit("/", 1)[-1]: r.text for r in docs.collect()}
    assert rows == {"a.txt": "hello world\nsecond line", "b.txt": "another document"}

    lines = read_text_corpus(spark, corpus, whole_files=False)
    assert lines.count() == 3
