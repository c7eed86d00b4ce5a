"""Multimodal query registrations: metadata extraction is oracle-checked;
the stubbed decode path is registered rows-only (no SQL equivalent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.presentation import rfix, rfix_sql
from ..multimodal import attach_fake_media, decode_image_features, media_metadata
from ..sources.tables import inherit_scan_key, spread, table
from .registry import register


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           'image/png' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
    tags=("MM",),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata extraction — the multimodal
    column contract (payload pruned, metadata pushed down)."""
    docs = table(spark, sf_dir, "documents")
    return media_metadata(attach_fake_media(docs))


@register(
    "mm_decode_features_stub",
    # The payloads attach_fake_media synthesizes are UTF-8 text bytes —
    # never a decodable image — so the kernel's output is the deterministic
    # stub branch REGARDLESS of whether a real codec (PIL) is installed:
    # width/height/features are closed forms of the byte length and byte
    # values, which DuckDB reproduces arithmetically (corpus is asserted
    # ASCII at every SF, so ord(char) == byte — same contract
    # mm_frame_sample relies on). feature_sum covers the first
    # 8*(len//8) bytes (the stub's 8 equal chunks; all bytes when len < 8).
    oracle="""
    WITH d AS (
        SELECT doc_id, text, length(text) AS L,
               CASE WHEN length(text) >= 8 THEN 8 * (length(text) // 8)
                    ELSE length(text) END AS ncov
        FROM documents
    ),
    s AS (
        SELECT d.doc_id,
               sum(ord(substring(d.text, CAST(idx.i AS INT), 1))) AS fsum
        FROM d, (SELECT unnest(range(1, 4097)) AS i) idx
        WHERE idx.i <= d.ncov
        GROUP BY d.doc_id
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(d.L % 640 + 1 AS BIGINT) AS width,
           CAST(d.L % 480 + 1 AS BIGINT) AS height,
           CAST(least(d.L, 8) AS BIGINT) AS n_features,
           round(coalesce(s.fsum, 0)::DOUBLE, 3) AS feature_sum
    FROM d LEFT JOIN s ON s.doc_id = d.doc_id
    """,
    tags=("MM", "UDF"),
)
def mm_decode_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode pipeline exercising the STUB branch
    of the runtime codec probe (multimodal/columns.py): the synthesized
    payloads are text bytes, not decodable images, so every row takes the
    deterministic stub path whether or not PIL is present — which makes the
    stub's closed-form output fully oracle-able (see the registration
    comment). The real-decode branch of the same kernel is hash-checked by
    mm_png_decode_roundtrip.

    The feature vector is reduced to scalar digests here (count + rounded sum)
    because the harness canonicalizes results via pandas sort, which cannot
    order array cells; the array-producing operator itself is
    `multimodal.decode_image_features`.
    """
    docs = table(spark, sf_dir, "documents")
    decoded = decode_image_features(attach_fake_media(docs))
    return decoded.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.size("features").cast("long").alias("n_features"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda acc, x: acc + x), 3
        ).alias("feature_sum"),
    )


@register(
    "mm_frame_sample",
    oracle="""
    WITH frames AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(greatest(floor(octet_length(encode(text)) / 64.0), 1) AS BIGINT))) AS i
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(i AS BIGINT) AS frame_idx,
           hex(encode(substring(text, CAST(i * 64 + 1 AS INT), 64))) AS frame_hex
    FROM frames
    """,
    tags=("MM", "T6"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: one input row fans out to
    (doc_id, frame_idx, frame_bytes) rows — the plumbing shape of video
    frame extraction, entirely JVM-side (sequence + explode + substring
    on BinaryType; no Python in the path).

    The engine slices BYTES (`multimodal.sample_frames`); the oracle
    slices VARCHAR then re-encodes, which is value-identical because the
    corpus is single-byte text (asserted ASCII at every SF). Frames are
    emitted hex-encoded so both engines hash the same canonical string
    form. Reference analog: none (the reference stores no binary media;
    north-star multimodal surface, SURVEY §2 extension).
    """
    from ..multimodal import sample_frames

    docs = table(spark, sf_dir, "documents")
    frames = sample_frames(attach_fake_media(docs), every_n_bytes=64)
    return frames.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.hex("frame_bytes").alias("frame_hex"),
    )


@register(
    "mm_png_decode_roundtrip",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(4 + doc_id % 13 AS BIGINT) AS width,
           CAST(4 + doc_id % 7 AS BIGINT) AS height,
           CAST((doc_id % 256) // 32 AS BIGINT) AS dominant_bin,
           CAST((4 + doc_id % 13) * (4 + doc_id % 7) AS BIGINT) AS feat_total
    FROM documents
    """,
    tags=("MM", "UDF"),
)
def mm_png_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the full oracle gate, with zero external
    dependencies: per document, synthesize a true PNG (dimensions and the
    constant gray level derived arithmetically from doc_id), ship it as a
    BinaryType column through Arrow, then run the standard
    `decode_image_features` kernel — which, PIL or not, does real pixel
    work here via the pure-stdlib PNG codec (`multimodal/png.py`): inflate,
    unfilter, histogram. Because the synthetic image is deterministic, the
    decoded dimensions, the dominant 32-wide histogram bin (= gray // 32)
    and the feature-vector total (= width * height pixels) are all
    arithmetic functions of doc_id that DuckDB can compute without ever
    seeing the bytes — a true end-to-end encode→decode correctness check,
    not a plumbing-only row count. Both stages are Arrow-batched
    mapInPandas; per-task memory is one record batch. Reference analog:
    none (north-star multimodal surface)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..multimodal.columns import IMAGE_FEATURES_SCHEMA, image_features_kernel
    from ..multimodal.png import encode_png_gray

    def make_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, gray = 4 + d % 13, 4 + d % 7, d % 256
                ids.append(d)
                payloads.append(encode_png_gray(w, h, bytes([gray]) * (w * h)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    # r13 fusion (guide §4.1/§8): the same two batch kernels as before,
    # COMPOSED inside ONE mapInPandas worker. The chained two-stage form
    # shipped every payload byte JVM→Python→JVM→Python and needed 2 Python
    # workers per task (a measured multi-second worker-spawn storm on the
    # bench); the fused form moves payload bytes zero times and the plan
    # drops both the second MapInPandas and the payload-carrying
    # repartition exchange. Row-wise outputs are identical by construction.
    decode = image_features_kernel()

    def synth_and_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from decode(make_png(batches))

    base = table(spark, sf_dir, "documents")
    docs = spread(inherit_scan_key(base.select(F.col("doc_id").cast("long")), base))
    decoded = docs.mapInPandas(synth_and_decode, IMAGE_FEATURES_SCHEMA)
    return decoded.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        (F.array_position("features", F.array_max("features")) - 1)
        .cast("long")
        .alias("dominant_bin"),
        F.round(F.aggregate("features", F.lit(0.0), lambda acc, x: acc + x))
        .cast("long")
        .alias("feat_total"),
    )


@register(
    "mm_resize_plumbing",
    # Contract oracle (the mm_wav_decode_features move): the registered
    # output is deliberately codec-independent — fixed target dims, one row
    # per document, non-empty payload — and since the synthesized payloads
    # are text bytes (never a decodable image), the stub resample runs on
    # every row in every environment, so non-emptiness ⇔ the source text is
    # non-empty. DuckDB states the same contract arithmetically.
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(32 AS BIGINT) AS width,
           CAST(32 AS BIGINT) AS height,
           octet_length(encode(text)) > 0 AS payload_non_empty
    FROM documents
    """,
    tags=("MM", "UDF"),
)
def mm_resize_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas resize pipeline under a contract oracle:
    the Spark-side surface being verified is schema + binary round-trip +
    one row per input document with the requested target dims; payload
    content is summarized as a codec-independent non-emptiness flag (the
    encoded byte length varies by codec/PIL version, so it is deliberately
    NOT part of the registered result — see the registration comment)."""
    from ..multimodal import resize_images

    docs = table(spark, sf_dir, "documents")
    resized = resize_images(attach_fake_media(docs), width=32, height=32)
    return resized.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        (F.octet_length("payload") > F.lit(0)).alias("payload_non_empty"),
    )


@register(
    "mm_wav_decode_features",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, i,
               ((doc_id * 37 + i * 25) % 256 - 128) * 64 AS v,
               CASE WHEN i > 0
                    THEN ((doc_id * 37 + (i - 1) * 25) % 256 - 128) * 64
               END AS pv
        FROM (
            SELECT doc_id, unnest(range(0, 32 + doc_id % 97)) AS i
            FROM documents
        )
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(count(*) AS BIGINT) AS n_samples,
           {rfix_sql('sqrt(avg((v * v)::DOUBLE))', 3)} AS rms,
           CAST(max(abs(v)) AS BIGINT) AS peak,
           CAST(sum(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS zero_crossings
    FROM s
    GROUP BY doc_id
    """,
    tags=("MM", "UDF", "AUDIO"),
)
def mm_wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under the full oracle gate, zero external deps —
    the audio twin of mm_png_decode_roundtrip: per document, synthesize a
    deterministic PCM16 waveform (a closed-form function of doc_id and the
    sample index), encode it to true RIFF/WAV bytes, ship the BinaryType
    payload through Arrow, then decode with the stdlib wave codec and
    compute RMS / peak / zero-crossings from the DECODED samples
    (multimodal/wav.py). Because the waveform is a closed form, DuckDB
    reproduces every feature arithmetically without seeing a byte — any
    corruption in encode, transport, or decode breaks the hash.

    Both stages are Arrow-batched mapInPandas over (doc_id, payload);
    spread() rebalances the 1-row-group documents scan so the codec work
    parallelizes. At 100 TB the same kernel shape holds: payloads stay in
    executor-local record batches, features are the only thing that
    shuffles (here: nothing — the result is per-row).
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..multimodal.wav import (
        audio_features_kernel,
        audio_features_schema,
        encode_wav_pcm16,
    )

    def make_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 32 + d % 97
                # closed form vectorized: identical values to the per-index
                # Python loop (all operands non-negative before the shift)
                samples = ((d * 37 + np.arange(n, dtype=np.int64) * 25) % 256 - 128) * 64
                ids.append(d)
                payloads.append(encode_wav_pcm16(samples, sample_rate=8000))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    # r13 fusion (guide §4.1/§8): compose encode + decode kernels in ONE
    # mapInPandas worker — same rationale and same row-identical outputs
    # as mm_png_decode_roundtrip's fusion (see that query's comment).
    decode = audio_features_kernel()

    def synth_and_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from decode(make_wav(batches))

    base = table(spark, sf_dir, "documents")
    docs = spread(inherit_scan_key(base.select(F.col("doc_id").cast("long")), base))
    decoded = docs.mapInPandas(synth_and_decode, audio_features_schema())
    return decoded.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        rfix(F.col("rms"), 3).alias("rms"),
        "peak",
        "zero_crossings",
    )
