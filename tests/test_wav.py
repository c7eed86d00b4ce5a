"""WAV codec roundtrip properties (multimodal/wav.py). The end-to-end
encode→Arrow→decode→feature path is hash-checked against the arithmetic
oracle via test_parity (mm_wav_decode_features)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yelpdatawarehouse_spark.multimodal.wav import (
    decode_wav_pcm16,
    encode_wav_pcm16,
)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), max_size=500),
    st.sampled_from([8000, 16000, 44100]),
)
def test_roundtrip(samples, rate):
    rate2, samples2 = decode_wav_pcm16(encode_wav_pcm16(samples, rate))
    assert rate2 == rate
    assert samples2 == samples


def test_riff_header_bytes():
    data = encode_wav_pcm16([0, 1, -1], 8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    # stdlib wave readers in any language can open it — size field consistent
    assert len(data) == 8 + int.from_bytes(data[4:8], "little")


def test_rejects_non_pcm16_mono():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="PCM16 mono"):
        decode_wav_pcm16(buf.getvalue())


def test_garbage_raises():
    with pytest.raises(Exception):
        decode_wav_pcm16(b"not a wav file")
