"""Dependency-free audio/video container codecs for the multimodal
operators — the same design as functions/imagecodec.py, extended to the
other two modalities the north-star pipeline carries as opaque binary
columns:

- WAV (RIFF PCM, the one audio container decodable from the public spec
  with no entropy coder): ``sniff_wav`` header parse, ``decode_pcm``
  full sample decode for 8-bit unsigned and 16-bit signed LE PCM, and
  ``encode_wav`` for fixtures. Compressed audio (MP3/AAC/Opus) raises
  by name — those need real entropy decoders.
- MP4/ISO-BMFF (video metadata): ``sniff_mp4`` walks the box tree
  (ftyp/moov/mvhd/trak/tkhd per ISO 14496-12) and returns brand,
  timescale, duration and track dimensions — the fields a crawl
  pipeline filters on — plus ``encode_mp4_stub`` writing a spec-shaped
  box tree for fixtures. Frame pixel decode (H.264/VP9/AV1) is out of
  scope and raises by name.
- AVI/MJPEG (video frames): ``sniff_avi`` + ``iter_avi_frames`` walk
  the RIFF chunk tree to the 'movi' LIST and yield per-frame payloads;
  for MJPEG streams each payload is a complete baseline JPEG that
  functions/imagecodec decodes — real video FRAME pixel decode, not
  just metadata. ``encode_avi_mjpeg`` is the fixture writer.

Everything is deterministic and integer-valued so the Spark results
value-hash against DuckDB closed-form oracles.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff_wav",
    "decode_pcm",
    "encode_wav",
    "sniff_mp4",
    "encode_mp4_stub",
    "sniff_avi",
    "iter_avi_frames",
    "encode_avi_mjpeg",
]


# ---------------------------------------------------------------- WAV


def sniff_wav(buf: bytes | bytearray | memoryview | None):
    """Return ``(n_channels, sample_rate, bits, n_samples)`` for a RIFF
    PCM WAV, else ``None`` (not a WAV container). Compressed WAV
    payloads (format tag != 1) raise by name."""
    if buf is None:
        return None
    b = bytes(buf)
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(b):
        cid, ln = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            tag, nch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {tag} (only PCM=1; MP3/ADPCM need a "
                    "real audio decoder)"
                )
            fmt = (nch, rate, bits)
        elif cid == b"data":
            data_len = ln
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        return None
    nch, rate, bits = fmt
    if bits not in (8, 16):
        raise NotImplementedError(f"WAV bit depth {bits} (only 8/16 PCM)")
    n_samples = data_len // (nch * (bits // 8))
    return (nch, rate, bits, n_samples)


def decode_pcm(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode RIFF PCM samples to an ``(n_samples, n_channels)`` int32
    array centered at 0 (8-bit unsigned is shifted by -128; 16-bit
    signed LE passes through) — integer-exact, oracle-replicable."""
    b = bytes(buf)
    meta = sniff_wav(b)
    if meta is None:
        raise NotImplementedError("not a RIFF PCM WAV container")
    nch, _rate, bits, n_samples = meta
    pos = 12
    while pos + 8 <= len(b):
        cid, ln = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"data":
            raw = b[pos + 8 : pos + 8 + ln]
            if bits == 8:
                arr = np.frombuffer(raw, np.uint8).astype(np.int32) - 128
            else:
                arr = np.frombuffer(raw, "<i2").astype(np.int32)
            return arr[: n_samples * nch].reshape(n_samples, nch)
        pos += 8 + ln + (ln & 1)
    raise NotImplementedError("WAV data chunk missing")


def encode_wav(arr: np.ndarray, sample_rate: int = 16000, bits: int = 16) -> bytes:
    """RIFF PCM writer for ``(n_samples, n_channels)`` integer arrays
    (fixture-grade; values must fit the target depth)."""
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, nch = arr.shape
    if bits == 8:
        raw = (arr.astype(np.int32) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = arr.astype("<i2").tobytes()
    else:
        raise NotImplementedError(f"WAV bit depth {bits}")
    byte_rate = sample_rate * nch * (bits // 8)
    block = nch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, nch, sample_rate, byte_rate, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# ---------------------------------------------------------------- MP4


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) over an ISO-BMFF range."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        typ = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", b[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr or pos + size > end:
            raise NotImplementedError("corrupt MP4 box structure")
        yield typ, pos + hdr, pos + size
        pos += size


def sniff_mp4(buf: bytes | bytearray | memoryview | None):
    """Return ``(brand, timescale, duration, width, height)`` for an
    ISO-BMFF (MP4/MOV) container, else ``None``. Duration/timescale come
    from mvhd (version 0 or 1); width/height from the first tkhd (16.16
    fixed point, returned as integers). Frame decode is out of scope —
    this is the metadata a trillion-document pipeline filters and
    partitions on before any GPU decode stage."""
    if buf is None:
        return None
    b = bytes(buf)
    if len(b) < 16 or b[4:8] != b"ftyp":
        return None
    brand = b[8:12].decode("latin-1").strip()
    timescale = duration = width = height = None
    for typ, s, e in _walk_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in _walk_boxes(b, s, e):
            if t2 == b"mvhd":
                ver = b[s2]
                if ver == 1:
                    timescale = struct.unpack(">I", b[s2 + 20 : s2 + 24])[0]
                    duration = struct.unpack(">Q", b[s2 + 24 : s2 + 32])[0]
                else:
                    timescale, duration = struct.unpack(
                        ">II", b[s2 + 12 : s2 + 20]
                    )
            elif t2 == b"trak" and width is None:
                for t3, s3, _e3 in _walk_boxes(b, s2, e2):
                    if t3 == b"tkhd":
                        ver = b[s3]
                        off = s3 + (96 if ver == 1 else 84) - 8
                        w_fx, h_fx = struct.unpack(">II", b[off : off + 8])
                        width, height = w_fx >> 16, h_fx >> 16
                        break
    if timescale is None:
        return None
    return (brand, timescale, duration, width or 0, height or 0)


def encode_mp4_stub(
    brand: str = "isom",
    timescale: int = 1000,
    duration: int = 0,
    width: int = 0,
    height: int = 0,
) -> bytes:
    """Write a minimal spec-shaped MP4 box tree (ftyp + moov/mvhd +
    trak/tkhd, no media data) — the fixture half of ``sniff_mp4``."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    mvhd = bytes(4) + bytes(8) + struct.pack(">II", timescale, duration)
    mvhd += struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100) + bytes(10)
    mvhd += struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    mvhd += bytes(24) + struct.pack(">I", 2)
    tkhd = bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(4)
    tkhd += struct.pack(">I", duration) + bytes(8)
    tkhd += struct.pack(">hhhh", 0, 0, 0, 0)
    tkhd += struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    tkhd += struct.pack(">II", width << 16, height << 16)
    moov = box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd))
    ftyp = brand.ljust(4).encode()[:4] + struct.pack(">I", 0) + b"isomiso2"
    return box(b"ftyp", ftyp) + box(b"moov", moov)


# ---------------------------------------------------------------- AVI

# RIFF AVI with MJPEG video: the one video container whose FRAME PIXELS
# are decodable here, because each '00dc' chunk is a complete baseline
# JPEG that functions/imagecodec._decode_jpeg handles. This makes video
# frame sampling REAL end-to-end (container walk → frame select →
# entropy decode), not a plan-only stub.


def sniff_avi(buf: bytes | bytearray | memoryview | None):
    """Return ``(width, height, n_frames, usec_per_frame)`` from the
    'avih' main header of a RIFF AVI, else ``None``."""
    if buf is None:
        return None
    b = bytes(buf)
    if len(b) < 24 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    # avih is inside LIST hdrl; a flat scan for the fourcc is robust to
    # writer variations and cheap (headers live in the first KB)
    at = b.find(b"avih")
    if at < 0 or at + 40 > len(b):
        return None
    usec = struct.unpack("<I", b[at + 8 : at + 12])[0]
    n_frames = struct.unpack("<I", b[at + 24 : at + 28])[0]
    w, h = struct.unpack("<II", b[at + 40 : at + 48])
    return (w, h, n_frames, usec)


def iter_avi_frames(buf: bytes | bytearray | memoryview):
    """Yield the compressed payload bytes of each video frame chunk
    ('00dc'/'00db') inside the 'movi' LIST, in stream order. Pure
    container walk — decoding the payload is the caller's choice (MJPEG
    payloads are baseline JPEGs; other codecs raise there, by name)."""
    b = bytes(buf)
    if sniff_avi(b) is None:
        raise NotImplementedError("not a RIFF AVI container")
    pos = 12
    n = len(b)
    while pos + 8 <= n:
        cid = b[pos : pos + 4]
        ln = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"LIST":
            list_type = b[pos + 8 : pos + 12]
            if list_type == b"movi":
                q = pos + 12
                end = pos + 8 + ln
                while q + 8 <= min(end, n):
                    fcc = b[q : q + 4]
                    fln = struct.unpack("<I", b[q + 4 : q + 8])[0]
                    if fcc[2:4] in (b"dc", b"db"):
                        yield b[q + 8 : q + 8 + fln]
                    q += 8 + fln + (fln & 1)
                return
            pos += 12  # descend into other LISTs (hdrl)
            continue
        pos += 8 + ln + (ln & 1)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     usec_per_frame: int = 40000) -> bytes:
    """Minimal spec-shaped RIFF AVI writer wrapping pre-encoded JPEG
    frames as '00dc' chunks (fixture half of ``iter_avi_frames``)."""

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIIIII", usec_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height,
    ) + bytes(16)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"avih", avih))) + b"hdrl"
    hdrl += chunk(b"avih", avih)
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
