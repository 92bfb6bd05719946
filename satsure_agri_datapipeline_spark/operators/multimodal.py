"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed struct metadata, processed via Arrow-batched ``mapInPandas``.

The decode/feature-extract step is import-gated: when Pillow is installed,
``real_decoder="auto"`` / ``real_resizer="auto"`` select a real PIL
decode/resize (``pil_image_features`` / ``pil_resize``); when it is not (this
environment), the deterministic fake featurizer stands in and the explicit
real path raises ``NotImplementedError`` from ``_real_decode``. Everything
Spark-side — schema, batch iteration, partition behavior, metadata
extraction — is real and tested either way; the real-decode tests skip-mark
themselves when Pillow is absent.

Scale notes: binary payloads never pass through Python row-at-a-time; they
move as Arrow buffers into pandas batches (``mapInPandas``), the one place a
Python hop is justified (SURVEY §2.11). Metadata-only operations (size, magic
sniff, digest) are pure column expressions and stay JVM-side.
"""

from __future__ import annotations

import importlib.util
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: True when Pillow is importable — the real image decode/resize paths below
#: activate themselves; otherwise the deterministic fakes stand in. Checked
#: once at import (workers re-evaluate on their own interpreter, so a
#: heterogeneous cluster degrades per-executor rather than crashing).
HAS_PIL = importlib.util.find_spec("PIL") is not None

# Magic-byte prefixes → media type (string funcs over binary, JVM-side).
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav-or-avi",
    "494433": "audio/mp3",
    "664C6143": "audio/flac",
}


def attach_binary_metadata(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Typed metadata struct for an opaque binary column: byte size, sha1
    digest, sniffed media type from magic bytes. Pure column expressions."""
    b = F.col(bin_col)
    media = F.lit("application/octet-stream")
    for prefix, mtype in _MAGIC.items():
        media = F.when(
            F.upper(F.hex(F.substring(b, 1, len(prefix) // 2))) == prefix, F.lit(mtype)
        ).otherwise(media)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(b).alias("n_bytes"),
            F.sha1(b).alias("sha1"),
            media.alias("media_type"),
        ),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _real_decode(payload: bytes) -> list[float]:
    """Real decoder hook when no image library is importable."""
    raise NotImplementedError(
        "real media decoding requires an image/audio library; "
        "install Pillow or inject one via decode_image_features(real_decoder=...)"
    )


def pil_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Real image featurizer (requires Pillow): decode, convert to grayscale,
    resize to a dim×dim grid (area-averaging), return the dim² pixel means
    scaled to [0, 1] truncated to ``dim`` values to match FEATURE_SCHEMA's
    contract with the fake featurizer (fixed-length array<float>).

    Raises NotImplementedError when Pillow is absent so callers hit the same
    honest failure as ``_real_decode`` rather than a confusing ImportError
    deep inside an executor."""
    if not HAS_PIL:
        return _real_decode(payload)
    from PIL import Image  # noqa: PLC0415 — executor-side optional import

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, dim))
    px = list(img.getdata())
    # mean over each row of the dim×dim grid → dim features, like the fake's
    # dim-bucket histogram: fixed length, deterministic, [0,1]-scaled
    return [
        sum(px[r * dim : (r + 1) * dim]) / (dim * 255.0) for r in range(dim)
    ]


def pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize (requires Pillow): decode, bilinear resize,
    re-encode as PNG. Same ``bytes -> bytes`` contract as ``_fake_resize``."""
    if not HAS_PIL:
        return _real_decode(payload)  # raises NotImplementedError
    from PIL import Image  # noqa: PLC0415

    img = Image.open(io.BytesIO(payload)).resize((width, height))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _fake_featurize(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake: byte histogram folded into ``dim`` buckets,
    normalized. Stands in for a CNN/fft featurizer with the same shape."""
    counts = [0] * dim
    for byte in payload:
        counts[byte % dim] += 1
    total = max(sum(counts), 1)
    return [c / total for c in counts]


def decode_image_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    real_decoder=None,
    dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    ``real_decoder`` is a ``bytes -> list[float]`` callable; when None the
    deterministic fake featurizer is used. Pass the string ``"auto"`` to use
    the real Pillow decoder when Pillow is importable and fall back to the
    fake otherwise (graceful degradation — the oracle queries pin the fake
    so results stay environment-independent).
    """
    if real_decoder == "auto":
        real_decoder = (lambda b: pil_image_features(b, dim)) if HAS_PIL else None
    decoder = real_decoder or (lambda b: _fake_featurize(b, dim))
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(bin_col).alias("p"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["p"].map(len).astype("int32"),
                    "feature": pdf["p"].map(lambda b: decoder(bytes(b))),
                }
            )

    return src.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing: slice fixed-offset windows out of a binary
    payload (stand-in for video frame extraction). Pure column expressions —
    ``substring`` on binary — exploded to one row per sampled frame."""
    b = F.col(bin_col)
    idx = F.explode(F.sequence(F.lit(0), F.lit(max_frames - 1))).alias("frame_no")
    out = df.select(F.col(id_col), F.length(b).alias("n_bytes"), idx, b.alias("__b"))
    offset = F.col("frame_no") * every_n_bytes
    return (
        out.where(offset < F.col("n_bytes"))
        .select(
            id_col,
            "frame_no",
            F.substring(F.col("__b"), offset + 1, every_n_bytes).alias("frame_bytes"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes_in", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image resize: nearest-neighbor
    sampling of the raw byte stream down/up to width*height bytes. Keeps the
    (payload → smaller payload) shape and determinism of a real resize
    without a codec."""
    target = width * height
    n = len(payload)
    if n == 0:
        return b"\x00" * target
    return bytes(payload[(i * n) // target] for i in range(target))


def resize_images(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    real_resizer=None,
) -> DataFrame:
    """Image-resize plumbing over binary payloads (mapInPandas, Arrow
    batches) — same contract as ``decode_image_features``: the Spark side
    (schema, batching, partition preservation) is real; the pixel work is a
    deterministic fake unless ``real_resizer(bytes, w, h) -> bytes`` is
    injected — or ``real_resizer="auto"``, which selects the real Pillow
    resize when Pillow is importable and falls back to the fake otherwise.

    Map-only: no shuffle, output partitioning follows the input scan. Batch
    memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` ×
    (payload + width*height) bytes per row.
    """
    if real_resizer == "auto":
        real_resizer = pil_resize if HAS_PIL else None
    resizer = real_resizer or _fake_resize
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(bin_col).alias("p"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes_in": pdf["p"].map(len).astype("int32"),
                    "resized": pdf["p"].map(lambda b: resizer(bytes(b), width, height)),
                }
            )

    return src.mapInPandas(batches, RESIZED_SCHEMA)
