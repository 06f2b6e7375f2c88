"""Real, dependency-free image codecs (BMP + PNG) for the multimodal
operators.

The container ships no PIL/ffmpeg, so the engine carries its own
spec-compliant encoders/decoders built on stdlib ``struct``/``zlib`` and
numpy — enough to make the multimodal pipeline's decode step REAL
(parse genuine headers, inflate genuine IDAT streams, unfilter genuine
scanlines) rather than a digest-derived fake:

* BMP: uncompressed 24-bit BITMAPINFOHEADER files — bottom-up rows,
  BGR byte order, 4-byte row padding (the format every tool can write).
* PNG: 8-bit-depth non-interlaced greyscale / RGB / RGBA (color types
  0, 2, 6), all five scanline filters (None/Sub/Up/Average/Paeth) with
  the spec's Paeth predictor, CRC-checked chunk walk.

Decoders return ``uint8`` arrays shaped (H, W, C); encoders accept the
same. Pixel-exact round-trip is pinned by
``tests/test_llm_ops.py::test_image_codec_roundtrip_and_known_pixels``
against hand-crafted byte fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# -- BMP ---------------------------------------------------------------------

_BMP_HEADER = struct.Struct("<2sIHHI")
_BMP_INFO = struct.Struct("<IiiHHIIiiII")


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BMP bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = arr.shape
    row_len = (w * 3 + 3) // 4 * 4
    pad = row_len - w * 3
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    body = b"".join(
        bgr[r].tobytes() + b"\x00" * pad for r in range(h)
    )
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + len(body), 0, 0, offset)
    info = _BMP_INFO.pack(
        _BMP_INFO.size, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → (H, W, 3) uint8 RGB."""
    magic, _, _, _, offset = _BMP_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (_, w, h, _, bpp, comp, *_rest) = _BMP_INFO.unpack_from(
        data, _BMP_HEADER.size
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        data, dtype=np.uint8, count=h * row_len, offset=offset
    ).reshape(h, row_len)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img.copy()


# -- PNG ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, C) uint8 (C ∈ {1, 3, 4}) → PNG bytes (filter 0 rows)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(c)
    if ctype is None or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W, {1|3|4}) uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8. Supports 8-bit depth, color types
    0/2/6, non-interlaced, filters 0–4, CRC-checked."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    c = _PNG_CHANNELS[ctype]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        ftype = raw[r, 0]
        line = raw[r, 1:].astype(np.int16)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub — sequential in the pixel dimension
            cur = line.copy()
            for i in range(c, stride):
                cur[i] = (cur[i] + cur[i - c]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                ul = prev[i - c] if i >= c else 0
                cur[i] = (cur[i] + _paeth_scalar(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[r] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, c)


def _paeth_scalar(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_image(data: bytes) -> np.ndarray:
    """Sniff the magic bytes and decode — the single entry point the
    multimodal operators use."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    raise ValueError("unrecognized image payload (expected BMP or PNG)")
