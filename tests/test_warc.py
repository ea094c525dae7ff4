"""WARC/1.0 source parsing (sources/warc.py): framing, header extraction,
truncation/garbage tolerance, Spark mapInPandas plumbing."""

from __future__ import annotations

from dss_plugin_nlp_analysis_spark.sources.warc import (
    parse_warc_bytes,
    warc_records,
)


def _rec(url: str, payload: bytes, date: str = "2026-01-01T00:00:00Z") -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n" + payload + b"\r\n\r\n"
    )


def test_parse_multi_record_blob():
    blob = _rec("http://a/1", b"hello world") + _rec("http://a/2", b"second")
    recs, skipped = parse_warc_bytes(blob)
    assert skipped == 0
    assert [(r["url"], r["payload"]) for r in recs] == [
        ("http://a/1", "hello world"), ("http://a/2", "second"),
    ]
    assert recs[0]["warc_type"] == "response"
    assert recs[0]["warc_date"] == "2026-01-01T00:00:00Z"


def test_parse_payload_containing_separator_bytes():
    # Content-Length framing must win over any \r\n\r\n INSIDE the payload
    body = b"part one\r\n\r\npart two"
    recs, skipped = parse_warc_bytes(_rec("http://a/3", body) + _rec("http://a/4", b"x"))
    assert skipped == 0
    assert recs[0]["payload"] == body.decode()
    assert recs[1]["url"] == "http://a/4"


def test_truncated_tail_is_skipped_not_fatal():
    good = _rec("http://a/5", b"ok")
    truncated = _rec("http://a/6", b"this payload is cut")[:-8]
    recs, skipped = parse_warc_bytes(good + truncated)
    assert [r["url"] for r in recs] == ["http://a/5"]
    assert skipped == 1


def test_garbage_block_resyncs():
    garbage = b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n"  # not a WARC version line
    blob = garbage + _rec("http://a/7", b"after garbage")
    recs, skipped = parse_warc_bytes(blob)
    # resync consumes the garbage header block, then... the garbage body
    # is NOT length-framed, so the parser treats the following bytes as
    # the next candidate; the real record is still recovered
    assert any(r["url"] == "http://a/7" for r in recs)
    assert skipped >= 1


def test_missing_content_length_skipped():
    bad = (
        b"WARC/1.0\r\nWARC-Target-URI: http://a/8\r\n\r\n"  # no length
    )
    recs, skipped = parse_warc_bytes(bad + _rec("http://a/9", b"fine"))
    assert [r["url"] for r in recs] == ["http://a/9"]
    assert skipped == 1


def test_warc_records_spark_plumbing(spark):
    blob1 = _rec("http://a/1", "unicode café 中文".encode()) 
    blob2 = _rec("http://a/2", b"plain")
    df = spark.createDataFrame([(blob1,), (blob2,), (None,)], "blob binary")
    out = warc_records(df, "blob").collect()
    got = {r["url"]: r["payload"] for r in out}
    assert got == {"http://a/1": "unicode café 中文", "http://a/2": "plain"}
    plan = warc_records(df, "blob")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # blob-parallel pure map
