"""resolve_redirects: chains, branches, cycles, self-loops, exact hop
counts, doubling budget semantics."""

import pytest

from dss_plugin_nlp_analysis_spark.operators.url import resolve_redirects


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["url"]: (r["final_url"], r["hops"], r["resolved"])
            for r in resolve_redirects(df, **kw).collect()}


def test_chain_branch_cycle_selfloop(spark):
    out = _run(spark, [
        ("a", "b"), ("b", "c"), ("c", "d"),  # 3-hop chain to terminal d
        ("e", "b"),                           # branch joins mid-chain
        ("x", "y"), ("y", "x"),               # 2-cycle
        ("s", "s"),                           # self-loop: excluded
    ])
    assert out["a"] == ("d", 3, 1)
    assert out["b"] == ("d", 2, 1)
    assert out["c"] == ("d", 1, 1)
    assert out["e"] == ("d", 3, 1)
    assert out["x"] == ("x", 64, 0)  # even cycle returns to self at 2^6
    assert out["y"] == ("y", 64, 0)
    assert "s" not in out
    assert "d" not in out  # terminals aren't redirect sources


def test_min_dst_determinism_on_conflicts(spark):
    out = _run(spark, [("a", "z"), ("a", "b")])
    assert out["a"] == ("b", 1, 1)  # min target wins


def test_long_chain_within_budget(spark):
    # 40-hop chain: needs 2^6 = 64 >= 40
    edges = [(f"n{i}", f"n{i+1}") for i in range(40)]
    out = _run(spark, edges)
    assert out["n0"] == ("n40", 40, 1)
    assert out["n39"] == ("n40", 1, 1)


def test_chain_beyond_budget_unresolved(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(5)]
    out = _run(spark, edges, doubling_rounds=1)  # covers 2 hops
    assert out["n0"][2] == 0 and out["n0"][1] == 2
    assert out["n3"] == ("n5", 2, 1)


def test_validation(spark):
    with pytest.raises(ValueError):
        _run(spark, [("a", "b")], doubling_rounds=-1)
