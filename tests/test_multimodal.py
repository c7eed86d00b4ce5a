from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.multimodal import (
    attach_fake_media,
    decode_image_features,
    sample_frames,
)
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def test_decode_schema_and_determinism(spark):
    media = attach_fake_media(table(spark, SF, "documents").limit(50))
    feats = decode_image_features(media)
    assert [f.name for f in feats.schema.fields] == ["doc_id", "width", "height", "features"]
    rows1 = {r.doc_id: (r.width, r.height, tuple(r.features)) for r in feats.collect()}
    rows2 = {r.doc_id: (r.width, r.height, tuple(r.features)) for r in feats.collect()}
    assert rows1 == rows2  # deterministic kernel
    assert len(rows1) == 50
    assert all(len(v[2]) <= 8 and len(v[2]) > 0 for v in rows1.values())


def test_decode_strict_raises(spark):
    media = attach_fake_media(table(spark, SF, "documents").limit(2))
    with pytest.raises(Exception) as exc_info:
        decode_image_features(media, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sampling_fanout(spark):
    media = attach_fake_media(table(spark, SF, "documents").limit(20))
    frames = sample_frames(media, every_n_bytes=64)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    sizes = {r.doc_id: r.media.n_bytes for r in media.collect()}
    for doc_id, n in per_doc.items():
        assert n == max(sizes[doc_id] // 64, 1)
    # frames reassemble to a prefix of the payload
    one = frames.filter(F.col("doc_id") == min(sizes)).orderBy("frame_idx").collect()
    reassembled = b"".join(bytes(r.frame_bytes) for r in one)
    payload = bytes(
        media.filter(F.col("doc_id") == min(sizes)).select("payload").collect()[0][0]
    )
    assert payload.startswith(reassembled[: len(payload)])


def test_resize_stub_plumbing(spark):
    from yelpdatawarehouse_spark.multimodal import resize_images

    media = attach_fake_media(table(spark, SF, "documents").limit(20))
    resized = resize_images(media, width=224, height=224)
    rows = resized.collect()
    assert len(rows) == 20
    target = 224 * 224 // 64
    for r in rows:
        assert (r.width, r.height) == (224, 224)
        assert 0 < len(bytes(r.payload)) <= target
    with pytest.raises(Exception, match="NotImplementedError|resize"):
        resize_images(media, strict=True).collect()


class _FakeImageFile:
    """Minimal PIL.Image.Image stand-in for codec-injected branch tests."""

    def __init__(self, b: bytes):
        self._b = b
        self.size = (7, 5)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def convert(self, mode):
        return self

    def histogram(self):
        return list(range(256))

    def resize(self, wh):
        self.size = wh
        return self

    def save(self, buf, format):
        buf.write(b"\x89PNG" + bytes([self.size[0] % 256, self.size[1] % 256]))


class _FakeImageModule:
    """PIL.Image stand-in: decodes payloads starting with IMG, rejects rest."""

    @staticmethod
    def open(f):
        b = f.read()
        if not b.startswith(b"IMG"):
            raise ValueError("not an image")
        return _FakeImageFile(b)


@pytest.mark.parametrize("codec", [None, _FakeImageModule])
def test_decode_kernel_branches_agree_on_contract(codec):
    """The real-codec branch (exercised via an injected codec module, since
    this container ships no PIL) and the stub branch must agree on the row
    contract: int dims, fixed-length float features (VERDICT r3 #4)."""
    from yelpdatawarehouse_spark.multimodal.columns import (
        _FEATURE_DIM,
        _decode_real,
        _stub_decode,
    )

    payload = b"IMG" + bytes(range(64))
    if codec is None:
        w, h, feats = _stub_decode(payload)
    else:
        decoded = _decode_real(codec, payload)
        assert decoded is not None
        w, h, feats = decoded
        assert (w, h) == (7, 5)  # true decoded dims, not stub arithmetic
    assert isinstance(w, int) and isinstance(h, int) and w > 0 and h > 0
    assert len(feats) == _FEATURE_DIM
    assert all(isinstance(f, float) for f in feats)


def test_decode_real_rejects_non_image_bytes():
    """Non-image bytes under a real codec must return None (kernel then
    falls back to the stub) — the mixed-corpus contract."""
    from yelpdatawarehouse_spark.multimodal.columns import _decode_real, _resize_real

    assert _decode_real(_FakeImageModule, b"not an image") is None
    assert _resize_real(_FakeImageModule, b"junk", 32, 32) is None


def test_resize_real_branch_reencodes():
    from yelpdatawarehouse_spark.multimodal.columns import _resize_real

    out = _resize_real(_FakeImageModule, b"IMGabc", 32, 32)
    assert out is not None and out.startswith(b"\x89PNG")
