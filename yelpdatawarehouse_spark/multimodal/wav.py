"""Pure-stdlib WAV (RIFF / PCM16 mono) codec + audio feature kernel.

The audio twin of multimodal/png.py: real bytes-level encode/decode with no
external dependency (the stdlib ``wave`` module reads/writes RIFF through
file-like objects, so BinaryType payloads round-trip through io.BytesIO),
letting the decode path run real codec work in containers without
soundfile/librosa. Features (RMS, peak, zero crossings) are computed from
the DECODED samples, so a corrupted encoder, decoder, or byte transport
breaks the oracle check — this is an end-to-end codec gate, not plumbing.

Reference analog: none (north-star multimodal surface; the reference stores
no binary media at all).
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame


def encode_wav_pcm16(samples: Sequence[int], sample_rate: int = 8000) -> bytes:
    """PCM16 mono samples → WAV bytes (RIFF container via stdlib wave).

    The frame buffer is built with numpy (one ``tobytes`` instead of
    ``struct.pack`` unpacking every sample as a Python argument — the
    encode hot spot at 60k payloads/bench); the explicit checks preserve
    struct.pack('<Nh')'s error behavior instead of numpy's silent
    coercions: non-integer input raises (asarray(dtype=int64) would
    silently TRUNCATE floats — corrupted audio, not an error) and
    out-of-range values raise instead of int16 wraparound.
    """
    import numpy as np

    arr = np.asarray(samples)
    if arr.size and not np.issubdtype(arr.dtype, np.integer):
        raise struct.error(
            f"required argument is not an integer (got dtype {arr.dtype})"
        )
    arr = arr.astype(np.int64, copy=False)
    if arr.size and (arr.max() > 32767 or arr.min() < -32768):
        raise struct.error("short format requires -32768 <= number <= 32767")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[int, list[int]]:
    """WAV bytes → (sample_rate, samples). PCM16 mono only — the contract
    the encoder writes; anything else raises ValueError."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"expected PCM16 mono, got {w.getnchannels()}ch "
                f"{8 * w.getsampwidth()}-bit"
            )
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    return rate, list(struct.unpack(f"<{n}h", raw))


def audio_features_schema():
    """Output schema of :func:`audio_features_kernel` (for composing
    callers that run the kernel inside their own ``mapInPandas``)."""
    from pyspark.sql import types as S

    return S.StructType(
        [
            S.StructField("doc_id", S.LongType()),
            S.StructField("sample_rate", S.LongType()),
            S.StructField("n_samples", S.LongType()),
            S.StructField("rms", S.DoubleType()),
            S.StructField("peak", S.LongType()),
            S.StructField("zero_crossings", S.LongType()),
        ]
    )


def audio_features_kernel(payload_col: str = "payload"):
    """The WAV decode+feature batch kernel as a standalone generator
    function — exposed (like ``columns.image_features_kernel``) so a
    payload-producing Python stage can compose with it in ONE worker
    instead of paying a second JVM↔Python round-trip of every payload
    byte plus a doubled per-task worker count (optimization guide §4.1).
    """
    import math

    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sample_rate", "n_samples", "rms",
                                   "peak", "zero_crossings")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                # Same wave-module decode as decode_wav_pcm16 but straight
                # into an int64 array (np.frombuffer replaces the
                # struct.unpack -> list -> asarray round trip per payload).
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getnchannels() != 1 or w.getsampwidth() != 2:
                        raise ValueError(
                            f"expected PCM16 mono, got {w.getnchannels()}ch "
                            f"{8 * w.getsampwidth()}-bit"
                        )
                    rate = w.getframerate()
                    raw = w.readframes(w.getnframes())
                a = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                n = a.size
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["rms"].append(
                    math.sqrt(int((a * a).sum()) / n) if n else 0.0
                )
                out["peak"].append(int(np.abs(a).max()) if n else 0)
                out["zero_crossings"].append(
                    int((a[:-1] * a[1:] < 0).sum()) if n > 1 else 0
                )
            yield pd.DataFrame(out)

    return kernel


def decode_audio_features(media_df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched mapInPandas audio feature extraction: decode each WAV
    payload and emit (doc_id, sample_rate, n_samples, rms, peak,
    zero_crossings). Per-task memory is one record batch; payload bytes
    never leave the executor."""
    return media_df.mapInPandas(
        audio_features_kernel(payload_col), audio_features_schema()
    )
