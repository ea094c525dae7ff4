"""Minimal WARC/1.0 source: parse Common-Crawl-style web-archive blobs
into (url, warc_date, payload) rows.

WARC (ISO 28500, public) is the container Common Crawl ships: a
concatenation of records, each a ``WARC/1.0`` version line + CRLF header
block + empty line + ``Content-Length`` payload bytes + CRLF CRLF. The
reference has no archive source; this is the ingest seam a crawl
pipeline needs in front of the html→text stage (the north-star input
table ``(url, warc_ts, html, ...)`` is exactly what a WARC parse
yields). Only the headers the pipeline consumes are surfaced
(``WARC-Target-URI``, ``WARC-Date``, ``WARC-Type``); everything else is
skipped by Content-Length arithmetic — no third-party warc library
(none is installed here, and none is needed for the record framing).

Scale shape: archives arrive as independent blobs (one per WARC file or
per range-request chunk); parsing is ``mapInPandas`` over the blob rows
— an Arrow-batched pure map, zero shuffle, parallel in the number of
blobs. Malformed tails are SKIPPED, not fatal (real crawls contain
truncated records), with the skip surfaced per blob in ``n_skipped``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_warc_bytes", "warc_records"]

_SEP = b"\r\n\r\n"

RECORD_SCHEMA = (
    "url string, warc_date string, warc_type string, payload string, "
    "n_skipped int"
)


def parse_warc_bytes(data: bytes) -> tuple[list[dict], int]:
    """Parse one WARC blob into record dicts; returns (records, n_skipped).

    A record is counted skipped when its version line is wrong, its
    header block never terminates, Content-Length is missing/non-numeric,
    or the payload extends past the end of the blob (truncated tail)."""
    records: list[dict] = []
    skipped = 0
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_SEP, pos)
        if head_end < 0:
            skipped += 1
            break
        head = data[pos:head_end]
        lines = head.split(b"\r\n")
        if not lines or not lines[0].startswith(b"WARC/"):
            skipped += 1
            # resync: jump past this header block and try again
            pos = head_end + len(_SEP)
            continue
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            skipped += 1
            pos = head_end + len(_SEP)
            continue
        body_start = head_end + len(_SEP)
        body_end = body_start + length
        if length < 0 or body_end > n:
            skipped += 1  # truncated record: drop the tail
            break
        records.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "warc_type": headers.get("warc-type", ""),
                "payload": data[body_start:body_end].decode("utf-8", "replace"),
            }
        )
        pos = body_end
    return records, skipped


def warc_records(df: DataFrame, blob_col: str) -> DataFrame:
    """Explode WARC blobs into one row per record:
    (url, warc_date, warc_type, payload, n_skipped) — ``n_skipped`` is
    the blob's malformed-record count, repeated on each of its rows ( 0
    rows are emitted for an all-garbage blob, so count skips upstream
    via ``parse_warc_bytes`` when exact accounting matters)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                recs, skipped = parse_warc_bytes(bytes(blob))
                for r in recs:
                    r["n_skipped"] = skipped
                    out.append(r)
            yield pd.DataFrame(
                out,
                columns=["url", "warc_date", "warc_type", "payload", "n_skipped"],
            )

    return df.select(F.col(blob_col)).mapInPandas(run, RECORD_SCHEMA)
