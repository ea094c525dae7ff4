"""Time rollups + KMV sketch (operators/rollup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.operators.rollup import (
    kmv_distinct,
    rollup_time,
)


def test_rollup_time_buckets_and_grans(spark):
    rows = [
        (0, "a", 10), (59, "a", 20), (60, "a", 30),     # 1m buckets 0,0,60
        (3599, "b", 5), (3600, "b", 7),                 # 1h buckets 0,3600
    ]
    df = spark.createDataFrame(rows, "sec long, k string, v long")
    out = rollup_time(df, "sec", "v", {"1m": 60, "1h": 3600}, key_col="k")
    got = {
        (r["gran"], r["bucket_start"], r["key"]): (r["n"], r["sum_value"])
        for r in out.collect()
    }
    assert got[("1m", 0, "a")] == (2, 30)
    assert got[("1m", 60, "a")] == (1, 30)
    assert got[("1h", 0, "a")] == (3, 60)
    assert got[("1h", 0, "b")] == (1, 5)
    assert got[("1h", 3600, "b")] == (1, 7)
    # every aggregate is map-side combinable: partial agg in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert "Window" not in plan


def test_kmv_distinct_exact_below_capacity_and_estimate(spark):
    # below capacity: exact count; above: estimate within 30% for k=64
    small = spark.createDataFrame(
        [(f"v{i % 10}",) for i in range(100)], "x string"
    )
    r = kmv_distinct(small, "x", k=64).collect()[0]
    assert (r["k_used"], r["estimate"]) == (10, 10.0)

    big = spark.createDataFrame([(f"value-{i}",) for i in range(5000)], "x string")
    r = kmv_distinct(big, "x", k=64).collect()[0]
    assert r["k_used"] == 64
    assert 5000 * 0.7 < r["estimate"] < 5000 * 1.3

    # determinism under repartitioning (the sketch is order-free)
    r2 = kmv_distinct(big.repartition(13), "x", k=64).collect()[0]
    assert (r2["kth_hash"], r2["estimate"]) == (r["kth_hash"], r["estimate"])

    # NULLs ignored; all-NULL input -> k_used 0
    nulls = spark.createDataFrame([(None,), (None,)], "x string")
    r = kmv_distinct(nulls, "x").collect()[0]
    assert r["k_used"] == 0


def test_burst_buckets_flags_only_bursts(spark):
    import pytest

    from dss_plugin_nlp_analysis_spark.operators.rollup import burst_buckets

    # key 'a': buckets of 1 event each except bucket 19 with 30 events
    # (>= 20 buckets needed: a single outlier among n buckets has z =
    # sqrt(n-1) at most, so n=10 sits exactly ON the 3-sigma boundary)
    rows = [("a", b) for b in range(19)] + [("a", 19)] * 30
    # key 'b': uniform — nothing flagged; key 'c': single bucket — never
    rows += [("b", b) for b in range(5)] * 2 + [("c", 0)] * 50
    df = spark.createDataFrame(rows, "k string, bkt int")
    got = {
        (r["key"], r["bucket"]): (r["cnt"], r["is_burst"])
        for r in burst_buckets(df, "k", "bkt").collect()
    }
    assert got[("a", 19)] == (30, 1)
    assert all(v == (1, 0) for (k, b), v in got.items() if k == "a" and b != 19)
    assert all(v[1] == 0 for (k, _), v in got.items() if k in ("b", "c"))

    # python cross-check of the integer inequality for key 'a'
    cnts = [1] * 19 + [30]
    n, s, ssq = len(cnts), sum(cnts), sum(c * c for c in cnts)
    for b, x in enumerate(cnts):
        expect = int((n * x - s) ** 2 > 9 * (n * ssq - s * s) and n * x > s)
        assert got[("a", b)][1] == expect

    with pytest.raises(ValueError):
        burst_buckets(df, "k", "bkt", sigma=0)
