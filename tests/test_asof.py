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
