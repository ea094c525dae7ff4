"""Audio (RIFF PCM WAV) and video (ISO-BMFF) codec tests
(functions/audiocodec.py) plus the multimodal operators wired onto them
— completing the image/audio/video triad with real, dependency-free
container parsing."""

import struct

import numpy as np
import pytest

from dss_plugin_nlp_analysis_spark.functions.audiocodec import (
    decode_pcm,
    encode_mp4_stub,
    encode_wav,
    sniff_mp4,
    sniff_wav,
)


def test_wav_roundtrip_16bit_stereo():
    rng = np.random.RandomState(1)
    a = rng.randint(-32768, 32768, (50, 2)).astype(np.int32)
    b = encode_wav(a, 8000, 16)
    assert sniff_wav(b) == (2, 8000, 16, 50)
    assert np.array_equal(decode_pcm(b), a)


def test_wav_roundtrip_8bit_mono_odd_length():
    # 33 bytes of sample data forces the word-alignment pad path
    a = np.arange(-16, 17, dtype=np.int32)
    b = encode_wav(a, 44100, 8)
    assert sniff_wav(b) == (1, 44100, 8, 33)
    assert np.array_equal(decode_pcm(b), a.reshape(-1, 1))


def test_wav_extra_chunks_skipped():
    # a LIST chunk between fmt and data must not desync the walk
    a = np.array([100, -100, 0], dtype=np.int32)
    b = bytearray(encode_wav(a, 16000, 16))
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    patched = bytes(b[:fmt_end]) + extra + bytes(b[fmt_end:])
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert sniff_wav(patched) == (1, 16000, 16, 3)
    assert np.array_equal(decode_pcm(patched), a.reshape(-1, 1))


def test_wav_compressed_and_exotic_depths_raise_by_name():
    b = bytearray(encode_wav(np.zeros(4, np.int32), 16000, 16))
    b[20:22] = struct.pack("<H", 85)  # format tag 85 = MP3
    with pytest.raises(NotImplementedError, match="85"):
        sniff_wav(bytes(b))
    with pytest.raises(NotImplementedError, match="24"):
        encode_wav(np.zeros(4, np.int32), 16000, 24)


def test_wav_non_wav_returns_none():
    assert sniff_wav(b"plain text") is None
    assert sniff_wav(None) is None
    assert sniff_wav(b"RIFF" + b"\x00" * 8) is None  # too short / not WAVE


def test_mp4_roundtrip_metadata():
    b = encode_mp4_stub("mp42", 90000, 123456, 640, 360)
    assert sniff_mp4(b) == ("mp42", 90000, 123456, 640, 360)


def test_mp4_version1_mvhd_and_largesize():
    # hand-patch the stub to a version-1 mvhd (64-bit duration)
    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    mvhd = bytes([1]) + bytes(3) + bytes(16)
    mvhd += struct.pack(">IQ", 600, 1 << 33)  # timescale, 64-bit duration
    moov = box(b"mvhd", mvhd)
    ftyp = b"isom" + struct.pack(">I", 0) + b"isom"
    b = box(b"ftyp", ftyp) + box(b"moov", moov)
    brand, ts, dur, w, h = sniff_mp4(b)
    assert (ts, dur, w, h) == (600, 1 << 33, 0, 0)


def test_mp4_non_mp4_returns_none():
    assert sniff_mp4(b"GIF89a____") is None
    assert sniff_mp4(None) is None


def test_mp4_corrupt_box_raises():
    b = encode_mp4_stub()
    bad = b[:4] + b[4:]  # valid; now corrupt a size field inside moov
    bad = bytearray(bad)
    # find moov and overwrite its first child's size with an overflow
    moov_at = bytes(bad).find(b"moov") - 4
    bad[moov_at + 8 : moov_at + 12] = struct.pack(">I", 1 << 30)
    with pytest.raises(NotImplementedError, match="corrupt"):
        sniff_mp4(bytes(bad))


# --- the multimodal operators over real audio/video payloads --------------

def test_decode_audio_meta_and_features(spark):
    from dss_plugin_nlp_analysis_spark.operators.multimodal import (
        audio_features,
        decode_audio_meta,
    )

    s = np.array([5, -3, 0, 7, -2, -2], dtype=np.int32)
    df = spark.createDataFrame(
        [(1, encode_wav(s, 16000, 16))], "id long, audio binary"
    )
    meta = decode_audio_meta(df, "id", "audio").collect()[0]
    assert (meta["channels"], meta["sample_rate"], meta["bits"]) == (1, 16000, 16)
    assert (meta["n_samples"], meta["duration_ms"]) == (6, 0)
    feats = audio_features(df, "id", "audio").collect()[0]
    assert feats["sum_abs"] == 19
    assert feats["max_abs"] == 7
    # sign-change pairs under (s<0): (5,-3), (-3,0), (7,-2) → 3
    assert feats["zero_crossings"] == 3


def test_decode_video_meta_operator(spark):
    from dss_plugin_nlp_analysis_spark.operators.multimodal import decode_video_meta

    df = spark.createDataFrame(
        [(7, encode_mp4_stub("isom", 1000, 2500, 320, 240))],
        "id long, video binary",
    )
    row = decode_video_meta(df, "id", "video").collect()[0]
    assert (row["brand"], row["timescale"], row["duration"]) == ("isom", 1000, 2500)
    assert (row["width"], row["height"], row["duration_ms"]) == (320, 240, 2500)


# --- AVI/MJPEG: real video FRAME decode ------------------------------------

from dss_plugin_nlp_analysis_spark.functions.audiocodec import (  # noqa: E402
    encode_avi_mjpeg,
    iter_avi_frames,
    sniff_avi,
)
from dss_plugin_nlp_analysis_spark.functions.imagecodec import (  # noqa: E402
    decode_rgb,
    encode_jpeg,
)


def _solid_jpeg(v, w=8, h=8):
    return encode_jpeg(np.full((h, w, 3), v, np.uint8), quality=50)


def test_avi_sniff_and_frame_walk():
    frames = [_solid_jpeg(v) for v in (10, 130, 250)]
    avi = encode_avi_mjpeg(frames, 8, 8, 33333)
    assert sniff_avi(avi) == (8, 8, 3, 33333)
    assert list(iter_avi_frames(avi)) == frames


def test_avi_odd_frame_length_padding():
    # JPEG frames of odd byte length force the RIFF word-align pad path
    frames = [_solid_jpeg(200, 5, 3)]
    if len(frames[0]) % 2 == 0:
        frames.append(_solid_jpeg(201, 5, 3))
    avi = encode_avi_mjpeg(frames + [_solid_jpeg(7, 5, 3)], 5, 3)
    got = list(iter_avi_frames(avi))
    assert got == frames + [_solid_jpeg(7, 5, 3)]


def test_avi_non_avi_raises():
    with pytest.raises(NotImplementedError, match="AVI"):
        list(iter_avi_frames(b"RIFFxxxxWAVEdata"))
    assert sniff_avi(b"GIF89a") is None


def test_sample_video_frames_decodes_every_nth(spark):
    from dss_plugin_nlp_analysis_spark.operators.multimodal import (
        sample_video_frames,
    )

    vals = [10, 60, 110, 160, 210]
    avi = encode_avi_mjpeg([_solid_jpeg(v, 4, 6) for v in vals], 4, 6)
    df = spark.createDataFrame([(3, avi)], "id long, video binary")
    rows = sorted(
        sample_video_frames(df, "id", "video", every=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r, v in zip(rows, vals[::2]):
        arr = decode_rgb(_solid_jpeg(v, 4, 6)).astype(np.int64)
        assert (r["width"], r["height"]) == (4, 6)
        assert r["sum_r"] == int(arr[:, :, 0].sum())
