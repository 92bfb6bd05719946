"""Streaming throughput micro-bench (VERDICT r3 item 6): measures rows/s
through the two end-to-end streaming entry points at sf0.1 scale —

1. ``run_streaming_ingest`` — file source → watermarked hourly counts →
   parquet sink (append, exactly-once checkpoint);
2. ``run_streaming_upsert`` — file source → per-batch newest-wins compaction
   → atomic state-swap sink (foreachBatch).

Input: the sf events table mapped to the sensor-reading shape and split
across N parquet files (so the file source actually micro-batches:
``maxFilesPerTrigger=10`` → N/10 triggers). Prints ONE JSON line with wall
seconds and rows/s per scenario. Usage:

    python tools/bench_streaming.py            # sf0.1, 20 files
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/bench_streaming.py

Scale mode (r7 — BENCH_r07_streaming.json): SPARK_GRAFT_STREAM_ROCKSDB=1
switches the state store to RocksDB (the 100 TB configuration:
disk-backed state + changelog checkpointing) and
SPARK_GRAFT_STREAM_FILES_PER_TRIGGER sizes each micro-batch so triggers
carry real volume instead of being planning-floor-bound:

    SPARK_GRAFT_SF_DIR=/tmp/sf1  SPARK_GRAFT_STREAM_ROCKSDB=1 \
        python tools/bench_streaming.py        # 10x: 1M rows
    SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_STREAM_ROCKSDB=1 \
        python tools/bench_streaming.py        # 100x: 10M rows
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_files = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "20"))

    from satsure_agri_datapipeline_spark.config import PipelineConfig
    from satsure_agri_datapipeline_spark.session import get_spark
    from satsure_agri_datapipeline_spark.streaming.ingest import (
        run_streaming_ingest,
        run_streaming_upsert,
        use_rocksdb_state,
    )

    spark = get_spark(app_name="bench_streaming", timezone="UTC")
    rocksdb = os.environ.get("SPARK_GRAFT_STREAM_ROCKSDB") == "1"
    # r8 knob matrix (BENCH_r08_streaming.json): changelog checkpointing,
    # block-cache size, compact-on-commit — all RocksDB-only.
    changelog = os.environ.get("SPARK_GRAFT_STREAM_CHANGELOG", "1") == "1"
    compact = os.environ.get("SPARK_GRAFT_STREAM_COMPACT_ON_COMMIT") == "1"
    cache_mb_env = os.environ.get("SPARK_GRAFT_STREAM_BLOCK_CACHE_MB")
    cache_mb = int(cache_mb_env) if cache_mb_env else None
    if rocksdb:
        use_rocksdb_state(
            spark,
            changelog=changelog,
            block_cache_mb=cache_mb,
            compact_on_commit=compact,
        )
    work = Path(tempfile.mkdtemp(prefix="stream_bench_"))
    try:
        cfg = PipelineConfig().resolve_paths(work)
        raw = work / "data" / "raw"
        raw.mkdir(parents=True, exist_ok=True)

        # events → sensor-reading shape, split into n_files parquet files
        ev = spark.read.parquet(str(Path(sf_dir) / "events.parquet"))
        from pyspark.sql import functions as F

        readings = ev.select(
            F.concat(F.lit("sensor_"), F.col("user_id").cast("string")).alias(
                "sensor_id"
            ),
            F.col("ts").alias("timestamp"),
            F.col("event_type").alias("reading_type"),
            "value",
            (F.lit(50.0) + F.col("value")).alias("battery_level"),
        )
        n_rows = readings.count()
        staged = work / "staged"
        readings.repartition(n_files).write.parquet(str(staged))
        i = 0
        for f in sorted(staged.glob("part-*.parquet")):
            shutil.copy(f, raw / f"batch_{i:04d}.parquet")
            i += 1

        fpt = int(os.environ.get("SPARK_GRAFT_STREAM_FILES_PER_TRIGGER", "10"))
        out: dict = {
            "sf_dir": sf_dir,
            "n_rows": n_rows,
            "n_files": i,
            "files_per_trigger": fpt,
            "state_store": "rocksdb" if rocksdb else "hdfs-heap",
        }
        if rocksdb:
            out["rocksdb_knobs"] = {
                "changelog": changelog,
                "compact_on_commit": compact,
                "block_cache_mb": cache_mb,
            }

        t0 = time.time()
        q = run_streaming_ingest(
            spark,
            cfg,
            work / "ingest_out",
            work / "ingest_ckpt",
            once=True,
            max_files_per_trigger=fpt,
        )
        finished = q.awaitTermination(1200)
        dt = time.time() - t0
        if not finished:  # rows/s over partial input would be garbage
            q.stop()
            out["ingest_timed_out"] = True
        out["ingest_sec"] = round(dt, 2)
        out["ingest_rows_per_sec"] = int(n_rows / dt) if finished else None
        out["ingest_state_rows"] = spark.read.parquet(
            str(work / "ingest_out")
        ).count()

        t0 = time.time()
        q = run_streaming_upsert(
            spark,
            cfg,
            work / "state",
            work / "upsert_ckpt",
            once=True,
            max_files_per_trigger=fpt,
        )
        finished = q.awaitTermination(1200)
        dt = time.time() - t0
        if not finished:
            q.stop()
            out["upsert_timed_out"] = True
        out["upsert_sec"] = round(dt, 2)
        out["upsert_rows_per_sec"] = int(n_rows / dt) if finished else None
        out["upsert_state_rows"] = spark.read.parquet(str(work / "state")).count()

        # 3. (r10) streaming document ingest COMPOSED with standing-store
        # maintenance: half the documents table is the pre-ingested corpus
        # (band+shingle stores built untimed, the production ingest-time
        # cost); the other half streams in as drop files, each micro-batch
        # landing corpus files AND applying the stores' append deltas. The
        # timed number is the full freshness cost per batch — after every
        # batch the raw near-dup names serve an up-to-date store.
        from satsure_agri_datapipeline_spark.sources.band_store import (
            ensure_band_store,
        )
        from satsure_agri_datapipeline_spark.sources.shingle_store import (
            ensure_shingle_store,
        )
        from satsure_agri_datapipeline_spark.streaming.ingest import (
            run_streaming_document_ingest,
        )

        docs = spark.read.parquet(str(Path(sf_dir) / "documents.parquet"))
        n_docs = docs.count()
        corpus = work / "corpus"
        (corpus / "documents.parquet").mkdir(parents=True)
        base = docs.where(F.col("doc_id") % 2 == 0)
        stream_docs = docs.where(F.col("doc_id") % 2 == 1)
        n_stream = stream_docs.count()
        base.coalesce(1).write.mode("append").parquet(
            str(corpus / "documents.parquet")
        )
        # Which stores each micro-batch maintains (r12, verdict task 8: the
        # artifact must RECORD this — the r11 row couldn't say whether the
        # spans kind was part of the measured cost). Default matches the
        # historical rows; add spans with e.g.
        # SPARK_GRAFT_STREAM_DOC_STORES=bands,shingles,spans
        doc_stores = tuple(
            filter(
                None,
                os.environ.get(
                    "SPARK_GRAFT_STREAM_DOC_STORES", "bands,shingles"
                ).split(","),
            )
        )
        ensure_band_store(spark, corpus)  # untimed one-time ingest
        ensure_shingle_store(spark, corpus)
        if "spans" in doc_stores:
            ensure_shingle_store(spark, corpus, n=15)  # untimed, span width

        incoming = work / "incoming"
        incoming.mkdir()
        drops = int(os.environ.get("SPARK_GRAFT_STREAM_DOC_DROPS", "4"))
        staged2 = work / "staged_docs"
        stream_docs.repartition(drops).write.parquet(str(staged2))
        for i, f in enumerate(sorted(staged2.glob("part-*.parquet"))):
            shutil.copy(f, incoming / f"drop_{i:04d}.parquet")

        t0 = time.time()
        q = run_streaming_document_ingest(
            spark,
            incoming,
            corpus,
            work / "doc_ckpt",
            once=True,
            max_files_per_trigger=max(1, drops // 2),
            maintain_stores=doc_stores,
        )
        finished = q.awaitTermination(1800)
        dt = time.time() - t0
        if not finished:
            q.stop()
            out["doc_ingest_timed_out"] = True
        out["doc_ingest_sec"] = round(dt, 2)
        out["doc_ingest_docs_per_sec"] = int(n_stream / dt) if finished else None
        out["doc_ingest_n_docs_streamed"] = n_stream
        out["doc_ingest_n_docs_corpus"] = n_docs
        out["doc_ingest_maintain_stores"] = list(doc_stores)
        # store freshness is part of the contract being timed
        from satsure_agri_datapipeline_spark.sources.band_store import (
            band_store_or_none,
        )

        out["doc_ingest_store_fresh"] = band_store_or_none(spark, corpus) is not None
        for tbl in ("bkt_bands_h16b4n3", "bkt_shingles_w3_s0"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        from satsure_agri_datapipeline_spark.sources.store_util import layout_dir

        for kind, parts in (
            ("bands", (corpus.resolve(), 16, 4, 3, 32)),
            ("shingles", (corpus.resolve(), 3, "word", 0, 32)),
        ):
            shutil.rmtree(layout_dir(kind, *parts), ignore_errors=True)

        # 4. (r13, verdict task 4) streaming EMBEDDING ingest composed with
        # standing IVF-index maintenance: half the embeddings table is the
        # pre-ingested corpus (fit + assignment built untimed), the other
        # half streams in as drops — each micro-batch lands corpus files
        # and delta-assigns ONLY its vectors against the pinned standing
        # centroids. Timed number = full per-batch index freshness cost.
        from satsure_agri_datapipeline_spark.sources.ivf_store import (
            MANIFEST_NAME as IVF_MANIFEST,
            ensure_ivf_store,
        )
        from satsure_agri_datapipeline_spark.sources.pq_store import (
            MANIFEST_NAME as PQ_MANIFEST,
            ensure_pq_store,
        )
        from satsure_agri_datapipeline_spark.streaming.ingest import (
            run_streaming_embedding_ingest,
        )

        emb = spark.read.parquet(str(Path(sf_dir) / "embeddings.parquet"))
        n_vecs = emb.count()
        (corpus / "embeddings.parquet").mkdir(parents=True, exist_ok=True)
        emb_base = emb.where(F.col("vec_id") % 2 == 0)
        emb_stream = emb.where(F.col("vec_id") % 2 == 1)
        n_vec_stream = emb_stream.count()
        emb_base.coalesce(1).write.mode("append").parquet(
            str(corpus / "embeddings.parquet")
        )
        ensure_ivf_store(spark, corpus)  # untimed one-time fit + assign
        ensure_pq_store(spark, corpus)  # untimed codebook fit + encode (r13)

        emb_incoming = work / "incoming_emb"
        emb_incoming.mkdir()
        staged3 = work / "staged_emb"
        emb_stream.repartition(drops).write.parquet(str(staged3))
        for i, f in enumerate(sorted(staged3.glob("part-*.parquet"))):
            shutil.copy(f, emb_incoming / f"drop_{i:04d}.parquet")

        t0 = time.time()
        q = run_streaming_embedding_ingest(
            spark,
            emb_incoming,
            corpus,
            work / "emb_ckpt",
            once=True,
            max_files_per_trigger=max(1, drops // 2),
        )
        finished = q.awaitTermination(1800)
        dt = time.time() - t0
        if not finished:
            q.stop()
            out["emb_ingest_timed_out"] = True
        out["emb_ingest_sec"] = round(dt, 2)
        out["emb_ingest_vecs_per_sec"] = int(n_vec_stream / dt) if finished else None
        out["emb_ingest_n_vecs_streamed"] = n_vec_stream
        out["emb_ingest_n_vecs_corpus"] = n_vecs
        ivf_layout = layout_dir("ivf", corpus.resolve(), 8, 2, 0)
        try:
            ivf_man = json.loads((ivf_layout / IVF_MANIFEST).read_text())
            out["emb_ingest_ivf_deltas"] = len(ivf_man.get("deltas", []))
            out["emb_ingest_ivf_pending"] = "pending_delta" in ivf_man
        except OSError:
            out["emb_ingest_ivf_deltas"] = None
        shutil.rmtree(ivf_layout, ignore_errors=True)
        pq_layout = layout_dir("pq", corpus.resolve(), 8, 16, 2, 0)
        try:
            pq_man = json.loads((pq_layout / PQ_MANIFEST).read_text())
            out["emb_ingest_pq_deltas"] = len(pq_man.get("deltas", []))
            out["emb_ingest_pq_pending"] = "pending_delta" in pq_man
        except OSError:
            out["emb_ingest_pq_deltas"] = None
        shutil.rmtree(pq_layout, ignore_errors=True)

        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
