"""As-of (point-in-time) join semantics (operators/asof.py)."""

from __future__ import annotations

import datetime


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    from dss_plugin_nlp_analysis_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2026-01-01 10:00:00")),  # matches r@09:00
            (3, "u1", _ts("2026-01-01 12:00:00")),  # matches r@12:00 (equal ts)
            (5, "u1", _ts("2026-01-01 08:00:00")),  # before any right -> NULL
            (7, "u2", _ts("2026-01-01 10:00:00")),  # u2 has no rights -> NULL
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (2, "u1", _ts("2026-01-01 09:00:00"), 1.5),
            (4, "u1", _ts("2026-01-01 12:00:00"), 2.5),   # boundary: matches
            (6, "u1", _ts("2026-01-01 12:00:00"), 9.9),   # (key,ts) tie: max id wins
            (8, "u1", _ts("2026-01-01 13:00:00"), 3.5),   # future: never matches
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    out = asof_join(
        left, right, "user_id", "ts",
        left_cols=["event_id"], right_cols=["event_id", "value"],
        seq_col="event_id",
    )
    got = {r["event_id"]: (r["r_event_id"], r["r_value"]) for r in out.collect()}
    assert got[1] == (2, 1.5)
    assert got[3] == (6, 9.9)   # equal-ts right matches; tie -> event_id 6
    assert got[5] == (None, None)
    assert got[7] == (None, None)
    assert out.count() == 4     # exactly one output row per left row


def test_range_join_semantics(spark):
    from dss_plugin_nlp_analysis_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [("u1", 100, 1), ("u1", 650, 3), ("u1", 2000, 5), ("u2", 100, 7)],
        "user string, sec long, pid long",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", 50, 200, 10),    # contains pid 1
            ("u1", 100, 700, 20),   # contains pids 1 and 3 (boundary 100)
            ("u1", 651, 900, 30),   # just after pid 3 -> no match
            ("u2", 0, 99, 40),      # ends just before pid 7 -> no match
        ],
        "user string, s long, e long, iid long",
    )
    out = range_join(points, intervals, "user", "sec", "s", "e", bucket_seconds=128)
    pairs = sorted(
        (r["point"]["pid"], r["interval"]["iid"]) for r in out.collect()
    )
    assert pairs == [(1, 10), (1, 20), (3, 20)]

    # tiny buckets (every interval explodes into many buckets) must give
    # the SAME pairs — no duplicates from multi-bucket coverage
    out_small = range_join(points, intervals, "user", "sec", "s", "e", bucket_seconds=7)
    assert sorted(
        (r["point"]["pid"], r["interval"]["iid"]) for r in out_small.collect()
    ) == pairs
