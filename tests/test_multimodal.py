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


# ---------------------------------------------------------------------------
# pure-stdlib PNG codec (multimodal/png.py)


def _handcrafted_rgb_png(w: int, h: int):
    """RGB PNG exercising ALL five scanline filter types, built chunk-by-
    chunk so the decoder is tested against independently-constructed bytes,
    not its own encoder."""
    import struct
    import zlib

    pix = [[(x * 11 + y * 29 + ch * 7) % 256 for x in range(w) for ch in range(3)] for y in range(h)]
    stride = w * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for y in range(h):
        f = y % 5
        raw.append(f)
        cur = pix[y]
        up = pix[y - 1] if y > 0 else [0] * stride
        for x in range(stride):
            left = cur[x - 3] if x >= 3 else 0
            ul = up[x - 3] if x >= 3 else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = (cur[x] - left) % 256
            elif f == 2:
                v = (cur[x] - up[x]) % 256
            elif f == 3:
                v = (cur[x] - (left + up[x]) // 2) % 256
            else:
                v = (cur[x] - paeth(left, up[x], ul)) % 256
            raw.append(v)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    return data, [v for row in pix for v in row]


def test_png_encode_decode_roundtrip():
    from yelpdatawarehouse_spark.multimodal import png

    w, h = 13, 7
    px = bytes((i * 37 + 5) % 256 for i in range(w * h))
    data = png.encode_png_gray(w, h, px)
    W, H, C, out = png.decode_png(data)
    assert (W, H, C) == (w, h, 1) and bytes(out) == px


def test_png_decoder_all_filters_rgb():
    from yelpdatawarehouse_spark.multimodal import png

    data, flat = _handcrafted_rgb_png(4, 10)  # rows cycle filters 0..4 twice
    W, H, C, out = png.decode_png(data)
    assert (W, H, C) == (4, 10, 3) and list(out) == flat


def test_png_shim_matches_pil_surface():
    """The shim must satisfy exactly the PIL surface the kernels use:
    open -> size / convert('L').histogram() / resize().save()."""
    import io

    from yelpdatawarehouse_spark.multimodal import png

    data, flat = _handcrafted_rgb_png(6, 4)
    with png.Image.open(io.BytesIO(data)) as im:
        assert im.size == (6, 4)
        hist = im.convert("L").histogram()
        assert len(hist) == 256 and sum(hist) == 6 * 4
        # luma of pixel (0,0) with PIL's truncating ITU-R 601 weights
        exp = (flat[0] * 299 + flat[1] * 587 + flat[2] * 114) // 1000
        assert hist[exp] >= 1
        buf = io.BytesIO()
        im.resize((3, 2)).save(buf, format="PNG")
    W, H, C, _ = png.decode_png(buf.getvalue())
    assert (W, H, C) == (3, 2, 1)  # save() writes grayscale (documented scope)


def test_png_rejects_non_png_and_unsupported():
    import pytest as _pytest

    from yelpdatawarehouse_spark.multimodal import png

    for bad in (b"", b"hello world", b"\x89PNG\r\n\x1a\nJUNK"):
        with _pytest.raises(png.PngError):
            png.decode_png(bad)


def test_probe_prefers_full_codec_and_falls_back():
    """Without PIL: default probe returns the stdlib PNG codec (real decode
    for PNG payloads); strict probe returns None so strict mode still
    raises — the fallback deliberately does not satisfy production mode."""
    from yelpdatawarehouse_spark.multimodal import columns, png

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    mod = columns._probe_codec()
    if has_pil:
        assert not getattr(mod, "IS_STDLIB_FALLBACK", False)
    else:
        assert mod is png.Image
        assert columns._probe_codec(full_only=True) is None


def test_decode_real_pixels_via_stdlib_codec(spark):
    """End-to-end: true PNG payloads through the mapInPandas decode kernel
    come back with REAL decoded dimensions and histogram features (not stub
    arithmetic) even in this PIL-less container."""
    from yelpdatawarehouse_spark.multimodal.png import encode_png_gray

    rows = [(i, encode_png_gray(5 + i, 3 + i, bytes([10 * i]) * ((5 + i) * (3 + i)))) for i in range(4)]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_image_features(media).collect()}
    for i in range(4):
        r = out[i]
        assert (r.width, r.height) == (5 + i, 3 + i)
        feats = list(r.features)
        assert sum(feats) == (5 + i) * (3 + i)  # histogram mass == pixel count
        assert feats[(10 * i) // 32] == (5 + i) * (3 + i)  # all mass in the gray bin


def test_png_roundtrip_property():
    """Property: encode->decode is the identity for any 8-bit grayscale
    image (hypothesis over dimensions and pixel content)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from yelpdatawarehouse_spark.multimodal import png

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(w, h, seed):
        px = bytes((seed * 2654435761 + i * 40503) % 256 for i in range(w * h))
        W, H, C, out = png.decode_png(png.encode_png_gray(w, h, px))
        assert (W, H, C) == (w, h, 1) and bytes(out) == px

    check()


# ---------------------------------------------------------------------------
# optional real-PIL leg (VERDICT r4 #5): executes only where pillow exists,
# so PIL-API drift in _decode_real/_resize_real is caught on hosts that have
# it; this container skips (no PIL, and installs are disallowed here).


def test_real_pil_decode_agrees_with_stdlib_codec():
    PIL_Image = pytest.importorskip("PIL.Image")

    from yelpdatawarehouse_spark.multimodal import png
    from yelpdatawarehouse_spark.multimodal.columns import _decode_real

    w, h = 13, 7
    px = bytes((i * 37 + 5) % 256 for i in range(w * h))
    payload = png.encode_png_gray(w, h, px)
    decoded = _decode_real(PIL_Image, payload)
    assert decoded is not None
    W, H, feats = decoded
    assert (W, H) == (w, h)
    # same payload through the stdlib shim: identical dims and histogram
    # features (both are exact 256-bin grayscale histograms, binned 8-wide)
    sdec = _decode_real(png.Image, payload)
    assert sdec is not None and (sdec[0], sdec[1]) == (w, h)
    assert feats == sdec[2]


def test_real_pil_resize_roundtrip():
    PIL_Image = pytest.importorskip("PIL.Image")

    from yelpdatawarehouse_spark.multimodal import png
    from yelpdatawarehouse_spark.multimodal.columns import _resize_real

    payload = png.encode_png_gray(8, 8, bytes(range(64)))
    out = _resize_real(PIL_Image, payload, 4, 4)
    assert out is not None
    with PIL_Image.open(__import__("io").BytesIO(out)) as im:
        assert im.size == (4, 4)
