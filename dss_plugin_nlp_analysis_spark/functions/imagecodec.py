"""Dependency-free image codecs for the multimodal operators.

The container ships no image libraries, so this module implements what
is implementable from format specs alone, in pure Python + numpy:

- ``sniff(buf)``: container + dimensions for PNG, GIF, JPEG, BMP and
  PPM/PGM — header parsing only, no pixel work, enough for the
  metadata operator (``decode_image_meta``) to be REAL for the formats
  that dominate web crawls.
- ``decode_rgb(buf)``: full pixel decode for BMP (24/32-bit BI_RGB),
  binary/ASCII PPM/PGM, PNG (8-bit depth, all five color types, all
  five scanline filters — stdlib zlib inflates IDAT) and GIF87a/89a
  first frames (pure-Python LZW, interlace supported) — returning an
  ``(h, w, 3)`` uint8 array.
- ``resize_nearest`` + ``encode_ppm``/``encode_bmp``: deterministic
  nearest-neighbor resampling and re-encode, so ``resize_images`` is a
  real transform for decodable payloads.

JPEG entropy decode is the ONE seam left to a real library (an ITU-T.81
Huffman+DCT implementation is out of scope) — JPEG sniffs (real
metadata) but ``decode_rgb`` raises ``NotImplementedError`` naming it.
PNG needed no external codec after all: zlib is in the standard
library, and the five scanline filters are spec arithmetic.

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
    "encode_png",
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
    if fmt == "png":
        return _decode_png(b)
    if fmt == "gif":
        return _decode_gif(b)
    raise NotImplementedError(
        f"{fmt} pixel data needs an entropy decoder (JPEG ITU-T.81); plug "
        "a real codec at this seam (header metadata IS available via sniff())"
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


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png(b: bytes) -> np.ndarray:
    """Full PNG pixel decode (RFC 2083) for 8-bit-depth, non-interlaced
    images of every color type (gray / RGB / palette / gray+alpha /
    RGBA): chunk walk, zlib inflate of the IDAT stream (stdlib zlib —
    no external codec needed after all), scanline un-filtering for all
    five filter types, palette/alpha expansion to RGB.

    Un-filtering is inherently sequential within a scanline for Sub/
    Average/Paeth (each byte depends on the reconstructed left
    neighbor), so those rows run as Python loops — correct first; a
    numpy prefix-scan is the optimization seam if PNG decode ever lands
    in a hot path (the multimodal operators batch via mapInPandas, so
    per-image cost amortizes across the executor, not the driver).
    """
    import zlib

    if b[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG signature")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        ln, typ = struct.unpack(">I4s", b[pos : pos + 8])
        pos += 8
        data = b[pos : pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, inter = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if inter != 0:
        raise NotImplementedError("interlaced PNG (Adam7) not supported")
    if ctype not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype}")
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < (stride + 1) * h:
        raise NotImplementedError("PNG pixel stream truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p).copy()
        p += stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (int(row[i]) + int(row[i - ch])) & 0xFF
        elif f == 2:  # Up (vectorized: uint8 addition wraps mod 256)
            row += prev
        elif f == 3:  # Average
            for i in range(stride):
                a = int(row[i - ch]) if i >= ch else 0
                row[i] = (int(row[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - ch]) if i >= ch else 0
                up = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pred = a + up - c
                pa, pb, pc = abs(pred - a), abs(pred - up), abs(pred - c)
                sel = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                row[i] = (int(row[i]) + sel) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[y] = row
        prev = row
    px = out.reshape(h, w, ch)
    if ctype == 0:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 3:
        if plte is None:
            raise NotImplementedError("palette PNG without PLTE")
        pal = np.frombuffer(plte, np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        return np.ascontiguousarray(pal[px[:, :, 0] % len(pal)])
    if ctype == 4:
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    return np.ascontiguousarray(px[:, :, :3])  # RGBA -> drop alpha


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal RGB PNG encoder (filter 0 scanlines, one IDAT) — the
    re-encode half of the PNG path, and the round-trip witness for the
    decoder tests."""
    import zlib

    h, w = arr.shape[:2]
    body = b"".join(
        b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- GIF


def _gif_lzw(data: bytes, min_code: int, npix: int) -> bytearray:
    """GIF-variant LZW decode (GIF89a appendix F): variable code width
    starting at min_code+1, dictionary reset on CLEAR, stop at END or
    npix decoded indices."""
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code + 1
    out = bytearray()
    buf = nbits = 0
    prev = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = buf & ((1 << code_size) - 1)
            buf >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise NotImplementedError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= npix:
                return out
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a first-frame pixel decode: global/local color table,
    pure-Python LZW, interlace row reordering. Later animation frames
    are out of scope (the first frame is the image a crawl pipeline
    fingerprints)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF signature")
    flags = b[10]
    gct = b""
    pos = 13
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = b[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:  # extension
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif blk == 0x2C:  # image descriptor
            iw, ih = struct.unpack("<HH", b[pos + 5 : pos + 9])
            iflags = b[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = b[pos : pos + 3 * n]
                pos += 3 * n
            if not ct:
                raise NotImplementedError("GIF frame without a color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                n = b[pos]
                data += b[pos + 1 : pos + 1 + n]
                pos += 1 + n
            idx = _gif_lzw(bytes(data), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise NotImplementedError("GIF pixel stream truncated")
            pal = np.frombuffer(ct, np.uint8)
            pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
            grid = np.frombuffer(bytes(idx[: iw * ih]), np.uint8).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    y for start, step in _GIF_INTERLACE_PASSES
                    for y in range(start, ih, step)
                ]
                un = np.zeros_like(grid)
                un[np.array(order)] = grid
                grid = un
            return np.ascontiguousarray(pal[grid % len(pal)])
        elif blk == 0x3B:
            break
        else:
            raise NotImplementedError(f"unexpected GIF block 0x{blk:02x}")
    raise NotImplementedError("GIF contains no image frame")
