"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a small self-describing
header; the Spark-side plumbing (schema, Arrow batch shape, mapInPandas
iterator discipline, partition sizing) is real and tested. The actual
codec work is STUBBED — the decode seam raises ``NotImplementedError``
unless the deterministic fake codec is selected (image/audio libraries are
not in this container; plug Pillow/torchaudio/decord at the marked seam).

Fake wire format (deterministic, oracle-reproducible):
    b"IMG|<width>|<height>|<fmt>|" + payload-bytes
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fake_image_binary", "decode_image_meta", "resize_images",
    "extract_features", "frame_sample_plan",
]

META_SCHEMA = "id long, width int, height int, fmt string, payload_bytes int"


def fake_image_binary(width: Column, height: Column, payload: Column) -> Column:
    """Build the deterministic fake image bytes from typed columns."""
    header = F.concat_ws("|", F.lit("IMG"), width.cast("string"), height.cast("string"), F.lit("raw"))
    return F.encode(F.concat(header, F.lit("|"), payload), "utf-8")


def _decode_header(buf: bytes) -> tuple[int, int, str, int]:
    """The decode seam. Real codecs plug in here (Pillow etc.)."""
    if buf is None:
        raise NotImplementedError("real image decoding requires an image library")
    head = bytes(buf).split(b"|", 4)
    if head[0] != b"IMG" or len(head) != 5:
        raise NotImplementedError(
            "real image decoding is stubbed in this environment; only the "
            "deterministic fake codec (IMG|w|h|fmt|payload) is available"
        )
    return int(head[1]), int(head[2]), head[3].decode(), len(head[4])


def decode_image_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """mapInPandas decode: binary column → typed metadata rows.

    Arrow batches stream through Python once; output schema is fixed so
    downstream stays native. Per-batch vectorization is the real plumbing
    being exercised; only ``_decode_header`` is a stub seam.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_header(b) for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "fmt": [m[2] for m in metas],
                    "payload_bytes": [m[3] for m in metas],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, META_SCHEMA)


def _resize_fake(buf: bytes, w: int, h: int) -> bytes:
    """The resize seam. A real implementation plugs Pillow's
    ``Image.resize`` in here; the fake codec rewrites the header
    dimensions and scales the payload length proportionally (area ratio,
    min 1 byte for non-empty payloads; empty stays empty),
    deterministically."""
    ow, oh, fmt, _n = _decode_header(buf)
    payload = bytes(buf).split(b"|", 4)[4]
    if not payload or not ow * oh:
        resized = payload
    else:
        new_len = max(1, (len(payload) * w * h) // (ow * oh))
        resized = (payload * (new_len // len(payload) + 1))[:new_len]
    return b"IMG|%d|%d|%s|" % (w, h, fmt.encode()) + resized


def resize_images(
    df: DataFrame, id_col: str, bin_col: str, width: int, height: int
) -> DataFrame:
    """mapInPandas resize: binary → binary at the target dimensions.

    Arrow batch shape and output schema are the real plumbing; the pixel
    resampling itself is the ``_resize_fake`` stub seam (raises
    NotImplementedError for non-fake payloads, like ``_decode_header``).
    Returns (id, image) with the same column names so resize stages chain.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "image": [_resize_fake(b, width, height) for b in pdf[bin_col]],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(resize, "id long, image binary")


def extract_features(
    df: DataFrame, id_col: str, bin_col: str, dim: int = 16
) -> DataFrame:
    """mapInPandas feature extraction: binary → ``array<float>`` embedding.

    The model forward pass is the stub seam — here a deterministic
    md5-derived featurizer (same construction as the LSH hyperplanes, so
    it is engine-reproducible); a real encoder (CLIP/torchvision) plugs in
    at ``_featurize``. Output plugs directly into the embedding ops
    (``cosine_topk`` / ``lsh_ann_topk`` / ``cosine_dup_pairs``): the
    multimodal dedup path is decode → extract_features → LSH dup pairs.
    """
    import hashlib

    def _featurize(buf: bytes) -> list[float]:
        # same contract as the other codec seams: only the fake wire
        # format is featurizable here; real payloads need a real encoder
        if buf is None or not bytes(buf).startswith(b"IMG|"):
            raise NotImplementedError(
                "real feature extraction is stubbed in this environment; "
                "only the deterministic fake codec (IMG|w|h|fmt|payload) "
                "is available — plug a real encoder (CLIP/torchvision) here"
            )
        out = []
        for d in range(dim):
            h = int(hashlib.md5(bytes(buf) + b"|%d" % d).hexdigest()[:15], 16)
            out.append(h / float(2 ** 60) * 2.0 - 1.0)
        return out

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "embedding": [_featurize(b) for b in pdf[bin_col]],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        featurize, "id long, embedding array<float>"
    )


def frame_sample_plan(df: DataFrame, id_col: str, n_frames_col: str, every: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index —
    pure Catalyst (sequence + explode), no decode needed for planning."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    )
