"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Design for 100 TB multimodal corpora:

* payloads are `BinaryType` columns living next to their metadata — never
  strings, never base64, never driver-side;
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages so each task streams record batches without
  materializing a partition in memory;
* partitioning is by content hash so shards stay balanced regardless of
  per-item payload skew.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernel is a clearly marked stub: `decode_image_features` computes
deterministic pseudo-features from the bytes (so tests pin the plumbing —
schema, batch shape, null handling) and raises `NotImplementedError` when
`strict=True` (the production switch where a real codec must be wired in).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as S

MEDIA_META_SCHEMA = S.StructType(
    [
        S.StructField("media_type", S.StringType()),
        S.StructField("n_bytes", S.LongType()),
        S.StructField("content_hash", S.StringType()),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic binary payload per document (UTF-8 bytes of
    the text — a stand-in for real image/audio blobs) plus typed metadata.
    Real pipelines would read payloads via `binaryFile` or parquet BINARY."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/png").alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("content_hash"),
        ).alias("media"),
    )


def media_metadata(media_df: DataFrame) -> DataFrame:
    """Metadata projection — JVM-side only, payload column pruned away."""
    return media_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("media.media_type").alias("media_type"),
        F.col("media.n_bytes").alias("n_bytes"),
        F.col("media.content_hash").alias("content_hash"),
    )


_FEATURE_DIM = 8

_DECODE_SCHEMA = S.StructType(
    [
        S.StructField("doc_id", S.LongType()),
        S.StructField("width", S.IntegerType()),
        S.StructField("height", S.IntegerType()),
        S.StructField("features", S.ArrayType(S.DoubleType())),
    ]
)


def decode_image_features(media_df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    STUB KERNEL: no image codec ships in this container. With
    ``strict=False`` the kernel emits deterministic pseudo-features derived
    from the payload bytes (tests pin schema/batch plumbing); with
    ``strict=True`` it raises NotImplementedError — replace the body with a
    real decoder (PIL/torchvision) in production.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires a codec (PIL/ffmpeg) not present "
                    "in this environment; wire one in here"
                )
            out = {"doc_id": [], "width": [], "height": [], "features": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload or b"")
                out["doc_id"].append(int(doc_id))
                # deterministic fake "dimensions" + bytewise features
                out["width"].append(len(b) % 640 + 1)
                out["height"].append(len(b) % 480 + 1)
                step = max(len(b) // _FEATURE_DIM, 1)
                out["features"].append(
                    [float(sum(b[i : i + step])) for i in range(0, min(len(b), _FEATURE_DIM * step), step)][: _FEATURE_DIM]
                )
            yield pd.DataFrame(out)

    cols = media_df.select("doc_id", "payload")
    # hash-repartition so payload-size skew can't create straggler tasks
    return cols.repartition(F.col("doc_id")).mapInPandas(kernel, _DECODE_SCHEMA)


_RESIZE_SCHEMA = S.StructType(
    [
        S.StructField("doc_id", S.LongType()),
        S.StructField("width", S.IntegerType()),
        S.StructField("height", S.IntegerType()),
        S.StructField("payload", S.BinaryType()),
    ]
)


def resize_images(
    media_df: DataFrame, width: int = 224, height: int = 224, strict: bool = False
) -> DataFrame:
    """Resize plumbing via mapInPandas (Arrow record batches in/out, binary
    column preserved end-to-end).

    STUB KERNEL: without a codec the "resize" deterministically re-samples
    the payload bytes to width*height/64 bytes (shape checkable in tests);
    ``strict=True`` raises NotImplementedError where a real PIL/torchvision
    resize goes. The Spark-side contract — schema, batch streaming, binary
    round-trip, per-task memory bounded by the Arrow batch size — is real.
    """

    target = max(width * height // 64, 1)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image resize requires a codec (PIL) not present in this "
                    "environment; wire one in here"
                )
            out = {"doc_id": [], "width": [], "height": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload or b"")
                step = max(len(b) // target, 1)
                out["doc_id"].append(int(doc_id))
                out["width"].append(width)
                out["height"].append(height)
                out["payload"].append(b[::step][:target])
            yield pd.DataFrame(out)

    return media_df.select("doc_id", "payload").mapInPandas(kernel, _RESIZE_SCHEMA)


def sample_frames(media_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling analog: slice the payload every N bytes (JVM-side
    substring on binary) — the plumbing shape of video frame extraction:
    one input row → many (doc_id, frame_idx, frame_bytes) rows."""
    n_frames = F.greatest(
        (F.octet_length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    frames = media_df.select("doc_id", "payload", idx)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.expr(f"substring(payload, frame_idx * {every_n_bytes} + 1, {every_n_bytes})").alias(
            "frame_bytes"
        ),
    )
