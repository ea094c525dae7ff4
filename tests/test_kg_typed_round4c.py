"""Round-4 continued-session operators, part 3: temporal fact
resolution, attribute schema induction, literal normalization, and
reciprocal-rank fusion — unit contracts."""

import pytest
from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.operators.kg import (
    attribute_schema,
    current_facts,
    normalize_literals,
)
from dss_plugin_nlp_analysis_spark.operators.similarity import rrf_fuse


def _triples(spark, rows):
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, warc_ts string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def test_current_facts_latest_wins_then_mentions_then_obj(spark):
    t = _triples(spark, [
        # newer snapshot flips the believed capital
        ("s1", "capital", "old", "2026-01-01 00:00:00"),
        ("s1", "capital", "old", "2026-01-02 00:00:00"),
        ("s1", "capital", "new", "2026-01-05 00:00:00"),
        # same last_seen: mention count decides
        ("s2", "lang", "en", "2026-01-03 00:00:00"),
        ("s2", "lang", "en", "2026-01-03 00:00:00"),
        ("s2", "lang", "fr", "2026-01-03 00:00:00"),
        # full tie: greatest obj wins (total order)
        ("s3", "tag", "a", "2026-01-04 00:00:00"),
        ("s3", "tag", "b", "2026-01-04 00:00:00"),
        # NULL ts rows cannot vote
        ("s4", "x", "v", None),
    ])
    got = {(r["subj"], r["pred"]): r.asDict() for r in current_facts(t).collect()}
    assert got[("s1", "capital")]["obj"] == "new"
    assert got[("s1", "capital")]["n_candidates"] == 2
    assert got[("s2", "lang")]["obj"] == "en"
    assert got[("s2", "lang")]["n_mentions"] == 2
    assert got[("s3", "tag")]["obj"] == "b"
    assert ("s4", "x") not in got


def _attrs(spark, rows):
    return spark.createDataFrame(rows, "subj long, key string, value string")


def test_attribute_schema_type_shares_and_fanout(spark):
    a = _attrs(spark, [
        (1, "population", "1000"), (2, "population", "25.5"),
        (3, "population", "n/a"), (4, "population", "2000"),
        (1, "founded", "2026-01-02"), (2, "founded", "3/4/2026"),
        (1, "alias", "x"), (1, "alias", "y"), (1, "alias", "x"),
    ])
    got = {r["key"]: r.asDict() for r in attribute_schema(a).collect()}
    p = got["population"]
    assert (p["n_rows"], p["n_subjects"], p["n_values"]) == (4, 4, 4)
    assert p["numeric_ppm"] == 750_000 and p["datelike_ppm"] == 0
    f = got["founded"]
    assert f["datelike_ppm"] == 1_000_000 and f["numeric_ppm"] == 0
    assert got["alias"]["max_per_subject"] == 3
    assert got["alias"]["n_values"] == 2


def test_normalize_literals_each_kind(spark):
    a = _attrs(spark, [
        (1, "k", "42"), (2, "k", "-7"),
        (3, "k", "3.25"), (4, "k", "-0.5"),
        (5, "k", "85%"), (6, "k", "-12.5%"),
        (7, "k", "2026-01-02"), (8, "k", "3/4/2026"), (9, "k", "11/28/2026"),
        (10, "k", "hello"), (11, "k", "1234567890123"),  # >12 digits: text
        (12, "k", "1.2345678"),  # frac > 6: text
    ])
    got = {r["subj"]: (r["value_kind"], r["value_micro"], r["value_iso"])
           for r in normalize_literals(a).collect()}
    assert got[1] == ("int", 42_000_000, None)
    assert got[2] == ("int", -7_000_000, None)
    assert got[3] == ("decimal", 3_250_000, None)
    assert got[4] == ("decimal", -500_000, None)
    assert got[5] == ("percent", 85_000_000, None)
    assert got[6] == ("percent", -12_500_000, None)
    assert got[7] == ("date", None, "2026-01-02")
    assert got[8] == ("date", None, "2026-03-04")
    assert got[9] == ("date", None, "2026-11-28")
    assert got[10] == ("text", None, None)
    assert got[11] == ("text", None, None)
    assert got[12] == ("text", None, None)


def test_rrf_fuse_known_values(spark):
    r1 = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "id long, rank int")
    r2 = spark.createDataFrame([(20, 1), (40, 2)], "id long, rank int")
    got = {r["id"]: (r["rrf_micro"], r["n_systems"])
           for r in rrf_fuse([r1, r2], k=60).collect()}
    assert got[10] == (10**6 // 61, 1)
    assert got[20] == (10**6 // 62 + 10**6 // 61, 2)
    assert got[30] == (10**6 // 63, 1)
    assert got[40] == (10**6 // 62, 1)


def test_rrf_fuse_rejects_bad_inputs(spark):
    r1 = spark.createDataFrame([(1, 1)], "id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([r1], k=-1)


def test_crlf_values_stay_clean_and_untyped_garbage_stays_text(spark):
    # CRLF page: '\r' must NOT survive the line split into values
    # (review finding: Java '$' matches before a trailing '\r', so a
    # '123\r' value would classify int on Spark, text on RE2 — and the
    # decimal micro-cast would crash under ANSI)
    page = "n: 123\r\nscore: 3.5\r\nwhen: 3/4/2026\r\nplain"
    from dss_plugin_nlp_analysis_spark.operators.kg import attribute_triples

    df = spark.createDataFrame([(1, page)], "id long, page string")
    kv = attribute_triples(df, "id", "page")
    vals = {r["key"]: r["value"] for r in kv.collect()}
    assert vals == {"n": "123", "score": "3.5", "when": "3/4/2026"}
    got = {r["key"]: (r["value_kind"], r["value_micro"], r["value_iso"])
           for r in normalize_literals(kv, subj="subj").collect()}
    assert got["n"] == ("int", 123_000_000, None)
    assert got["score"] == ("decimal", 3_500_000, None)
    assert got["when"] == ("date", None, "2026-03-04")
    # a value with an embedded carriage return (not from the line split)
    # must classify text on BOTH engines (\z anchors) — and never crash
    raw = spark.createDataFrame(
        [(1, "k", "123\r"), (2, "k", "3.5\r")],
        "subj long, key string, value string",
    )
    got2 = {r["subj"]: r["value_kind"] for r in normalize_literals(raw).collect()}
    assert got2 == {1: "text", 2: "text"}


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_funnel_strict_order_and_ties(spark):
    from dss_plugin_nlp_analysis_spark.operators.rollup import funnel_counts

    ev = _events(spark, [
        # u1 converts fully in order
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:01:00", 1, "click"),
        (3, "2024-01-01 00:02:00", 1, "purchase"),
        # u2: click BEFORE view -> stops at view
        (4, "2024-01-01 00:00:00", 2, "click"),
        (5, "2024-01-01 00:01:00", 2, "view"),
        # u3: same-timestamp view then click (seq breaks the tie) but no
        # purchase -> stops after click
        (6, "2024-01-01 00:00:00", 3, "view"),
        (7, "2024-01-01 00:00:00", 3, "click"),
        # u4 never views
        (8, "2024-01-01 00:00:00", 4, "purchase"),
    ])
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_rejects_empty_steps(spark):
    from dss_plugin_nlp_analysis_spark.operators.rollup import funnel_counts

    with pytest.raises(ValueError):
        funnel_counts(_events(spark, []), [])


def test_cohort_retention_offsets(spark):
    from dss_plugin_nlp_analysis_spark.operators.rollup import (
        cohort_retention,
    )

    ev = _events(spark, [
        # u1 first active week W, active again W+2 (two events same week
        # count once)
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-02 00:00:00", 1, "view"),
        (3, "2024-01-15 00:00:00", 1, "view"),
        # u2 joins one week later, never returns
        (4, "2024-01-08 00:00:00", 2, "view"),
        (5, None, 2, "view"),  # NULL ts excluded
    ])
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    w = (19723) // 7  # 2024-01-01 is epoch day 19723
    assert got == {(w, 0): 1, (w, 2): 1, (w + 1, 0): 1}
