"""Dependency-free image codecs for the multimodal operators.

The container ships no image libraries, so this module implements what
is implementable from format specs alone, in pure Python + numpy:

- ``sniff(buf)``: container + dimensions for PNG, GIF, JPEG, BMP and
  PPM/PGM — header parsing only, no pixel work, enough for the
  metadata operator (``decode_image_meta``) to be REAL for the formats
  that dominate web crawls.
- ``decode_rgb(buf)``: full pixel decode for the uncompressed formats —
  BMP (24/32-bit BI_RGB) and binary/ASCII PPM/PGM — returning an
  ``(h, w, 3)`` uint8 array.
- ``resize_nearest`` + ``encode_ppm``/``encode_bmp``: deterministic
  nearest-neighbor resampling and re-encode, so ``resize_images`` is a
  real transform for decodable payloads.

Compressed pixel data (PNG IDAT inflate+unfilter, JPEG entropy decode,
GIF LZW) is the one seam left to a real library — those formats
sniff (real metadata) but ``decode_rgb`` raises ``NotImplementedError``
with the format named.

All formats per their public specs (PNG RFC 2083, JPEG ITU-T.81, BMP
BITMAPINFOHEADER, GIF89a, netpbm).
"""

from __future__ import annotations

import re
import struct

import numpy as np

__all__ = [
    "sniff",
    "decode_rgb",
    "resize_nearest",
    "encode_ppm",
    "encode_pgm",
    "encode_bmp",
]

# JPEG SOF markers carrying frame dimensions (C0-CF minus C4/C8/CC which
# are DHT/JPG/DAC)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}

_PNM_HEADER_RE = re.compile(
    rb"^(P[2356])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s+"
    rb"(?:#[^\n]*\n\s*)*(\d+)\s"
)


def sniff(buf: bytes | bytearray | memoryview | None):
    """Return ``(fmt, width, height)`` for a recognized container, else
    ``None``. fmt ∈ {png, gif, jpeg, bmp, ppm, pgm}."""
    if buf is None:
        return None
    b = bytes(buf)
    if len(b) < 10:
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"\xff\xd8":
        p = 2
        n = len(b)
        while p + 4 <= n and b[p] == 0xFF:
            marker = b[p + 1]
            if marker == 0xFF:  # fill byte
                p += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                p += 2  # standalone markers carry no length
                continue
            if marker == 0xDA:  # SOS: entropy-coded data follows, no SOF seen
                return None
            seg_len = struct.unpack(">H", b[p + 2 : p + 4])[0]
            if marker in _JPEG_SOF and p + 9 <= n:
                h, w = struct.unpack(">HH", b[p + 5 : p + 9])
                return ("jpeg", w, h)
            p += 2 + seg_len
        return None
    if b[:2] == b"BM" and len(b) >= 26:
        dib = struct.unpack("<I", b[14:18])[0]
        if dib >= 40:
            w, h = struct.unpack("<ii", b[18:26])
        else:  # BITMAPCOREHEADER: uint16 dims
            w, h = struct.unpack("<HH", b[18:22])
        return ("bmp", abs(w), abs(h))
    m = _PNM_HEADER_RE.match(b)
    if m:
        fmt = "pgm" if m.group(1) in (b"P2", b"P5") else "ppm"
        return (fmt, int(m.group(2)), int(m.group(3)))
    return None


def _decode_pnm(b: bytes) -> np.ndarray:
    m = _PNM_HEADER_RE.match(b)
    assert m is not None
    kind = m.group(1)
    w, h, maxval = int(m.group(2)), int(m.group(3)), int(m.group(4))
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    channels = 3 if kind in (b"P3", b"P6") else 1
    need = w * h * channels
    if kind in (b"P5", b"P6"):
        raw = b[m.end() : m.end() + need]
        if len(raw) < need:
            raise ValueError("truncated netpbm payload")
        arr = np.frombuffer(raw, dtype=np.uint8, count=need)
    else:  # ASCII variants
        vals = b[m.end() :].split()
        if len(vals) < need:
            raise ValueError("truncated netpbm payload")
        arr = np.array(vals[:need], dtype=np.int64).astype(np.uint8)
    arr = arr.reshape(h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def _decode_bmp(b: bytes) -> np.ndarray:
    offset = struct.unpack("<I", b[10:14])[0]
    dib = struct.unpack("<I", b[14:18])[0]
    if dib < 40:
        raise NotImplementedError("BITMAPCOREHEADER pixel decode not supported")
    w, h = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    compression = struct.unpack("<I", b[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP pixel decode supports uncompressed 24/32-bit only "
            f"(got bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3  # rows padded to 4 bytes
    need = stride * h
    raw = b[offset : offset + need]
    if len(raw) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(raw, dtype=np.uint8, count=need).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if not top_down:
        px = px[::-1]
    # BGR(A) → RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def decode_rgb(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 RGB array. Real pixel decode for
    BMP-24/32 (BI_RGB) and PPM/PGM; PNG/GIF/JPEG raise (compressed pixel
    data — the library seam)."""
    b = bytes(buf)
    meta = sniff(b)
    if meta is None:
        raise NotImplementedError("unrecognized image container")
    fmt = meta[0]
    if fmt in ("ppm", "pgm"):
        return _decode_pnm(b)
    if fmt == "bmp":
        return _decode_bmp(b)
    raise NotImplementedError(
        f"{fmt} pixel data is compressed; plug a real codec at this seam "
        "(header metadata for it IS available via sniff())"
    )


def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample to (h, w, 3) — the same
    index mapping everywhere: src = floor((dst + 0.5) * size_ratio)."""
    sh, sw = arr.shape[:2]
    ys = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64), sh - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64), sw - 1)
    return arr[ys][:, xs]


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_pgm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    # luma = integer mean of the three channels (deterministic)
    luma = (arr.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
    return b"P5\n%d %d\n255\n" % (w, h) + luma.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    payload = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(payload), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(payload), 2835, 2835, 0, 0)
    return header + payload
