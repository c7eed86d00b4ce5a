"""Pure-stdlib PNG codec (zlib + struct) with a PIL-compatible shim.

The multimodal kernels (`multimodal/columns.py`) feature-probe a codec at
runtime on the worker; PIL is preferred, but many lean cluster images ship
without it. This module gives every environment a REAL decode path for the
most common interchange format: a from-scratch PNG reader/writer built only
on the standard library (`zlib`, `struct`), exposed through the same tiny
surface the kernels use from PIL (`open() -> {size, convert('L'),
histogram(), resize(), save()}`), so `decode_image_features` /
`resize_images` do true pixel work instead of the deterministic stub even
in codec-less containers.

Scope (documented, checked, and raising cleanly when exceeded):

* decode: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth);
  non-interlaced only;
* encode: 8-bit grayscale (color type 0), filter 0, one IDAT chunk;
* resize: nearest-neighbor.

This is a capability fallback, not a PIL replacement — anything outside
the scope above (16-bit, palette, interlace, other formats) returns a
clean failure so the caller's stub fallback engages, exactly as with a
non-image payload. No analog in the reference (the reference repo has no
binary-media handling at all); this backs the beyond-reference multimodal
surface.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel for the supported 8-bit color types
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Raised for anything this codec does not support or cannot parse."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode PNG bytes -> (width, height, channels, raw pixel bytes).

    Pixel bytes are row-major, `channels` interleaved samples per pixel.
    Raises PngError for non-PNG input or unsupported variants.
    """
    if len(data) < 8 or data[:8] != _SIG:
        raise PngError("not a PNG signature")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        pos += 12 + length  # length + type + body + CRC (CRC not verified)
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color}")
            if interlace != 0:
                raise PngError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise PngError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise PngError("missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngError("pixel data length mismatch")
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        line_in = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        base = y * stride
        if fbyte == 0:  # None
            out[base : base + stride] = line_in
        elif fbyte == 1:  # Sub
            for x in range(stride):
                left = out[base + x - channels] if x >= channels else 0
                out[base + x] = (line_in[x] + left) & 0xFF
        elif fbyte == 2:  # Up
            for x in range(stride):
                up = out[prev_start + x] if prev_start >= 0 else 0
                out[base + x] = (line_in[x] + up) & 0xFF
        elif fbyte == 3:  # Average
            for x in range(stride):
                left = out[base + x - channels] if x >= channels else 0
                up = out[prev_start + x] if prev_start >= 0 else 0
                out[base + x] = (line_in[x] + (left + up) // 2) & 0xFF
        elif fbyte == 4:  # Paeth
            for x in range(stride):
                left = out[base + x - channels] if x >= channels else 0
                up = out[prev_start + x] if prev_start >= 0 else 0
                ul = out[prev_start + x - channels] if (prev_start >= 0 and x >= channels) else 0
                out[base + x] = (line_in[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown filter byte {fbyte}")
        prev_start = base
    return width, height, channels, out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height) as a
    minimal valid PNG (color type 0, filter 0 on every scanline)."""
    if len(pixels) != width * height:
        raise PngError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * width : (y + 1) * width])
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


class ShimImage:
    """The slice of PIL's Image surface the multimodal kernels touch."""

    def __init__(self, width: int, height: int, channels: int, pixels: bytearray):
        self._w = width
        self._h = height
        self._c = channels
        self._px = pixels

    # context-manager protocol (kernels use `with image_mod.open(...) as im`)
    def __enter__(self) -> "ShimImage":
        return self

    def __exit__(self, *exc) -> None:
        return None

    @property
    def size(self) -> tuple[int, int]:
        return self._w, self._h

    def convert(self, mode: str) -> "ShimImage":
        if mode != "L":
            raise PngError(f"shim codec only converts to 'L', not {mode!r}")
        if self._c == 1:
            return self
        gray = bytearray(self._w * self._h)
        px, c = self._px, self._c
        for i in range(self._w * self._h):
            o = i * c
            if c == 2:  # gray + alpha
                gray[i] = px[o]
            else:  # RGB / RGBA — ITU-R 601 luma, truncating like PIL
                gray[i] = (px[o] * 299 + px[o + 1] * 587 + px[o + 2] * 114) // 1000
        return ShimImage(self._w, self._h, 1, gray)

    def histogram(self) -> list[int]:
        """256-bin histogram; for multi-channel images PIL concatenates
        per-band histograms, but the kernels only call this after
        convert('L'), so one band suffices (guarded for honesty)."""
        if self._c != 1:
            raise PngError("shim histogram requires convert('L') first")
        bins = [0] * 256
        for v in self._px:
            bins[v] += 1
        return bins

    def resize(self, size: tuple[int, int]) -> "ShimImage":
        """Nearest-neighbor resample (PIL's default filter differs; the
        kernels only rely on dimensions + re-encodability)."""
        nw, nh = size
        if nw <= 0 or nh <= 0:
            raise PngError("resize to non-positive dimensions")
        c = self._c
        out = bytearray(nw * nh * c)
        for y in range(nh):
            sy = y * self._h // nh
            srow = sy * self._w * c
            drow = y * nw * c
            for x in range(nw):
                sx = x * self._w // nw
                so = srow + sx * c
                do = drow + x * c
                out[do : do + c] = self._px[so : so + c]
        return ShimImage(nw, nh, c, out)

    def save(self, fp, format: str = "PNG") -> None:
        if format.upper() != "PNG":
            raise PngError(f"shim codec only writes PNG, not {format!r}")
        im = self if self._c == 1 else self.convert("L")
        fp.write(encode_png_gray(im._w, im._h, bytes(im._px)))


class Image:
    """PIL.Image-module-shaped entry point: `png.Image.open(fp)`.

    Raises PngError (a ValueError) for non-PNG/unsupported bytes, which the
    kernels' except-fallback treats exactly like PIL's UnidentifiedImageError
    — the row falls back to the deterministic stub.
    """

    # mark so callers can distinguish the full codec from this fallback
    IS_STDLIB_FALLBACK = True

    @staticmethod
    def open(fp) -> ShimImage:
        data = fp.read() if hasattr(fp, "read") else bytes(fp)
        w, h, c, px = decode_png(data)
        return ShimImage(w, h, c, px)
