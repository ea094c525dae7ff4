"""Hypothesis fuzz of the graph family (pagerank, triangle_count, k_hop)
against brute-force pure-Python references on random small graphs —
contract-level: the integer fixpoint, the triangle invariant under the
degree orientation, and shortest-hop BFS including cycles."""

from hypothesis import HealthCheck, given, settings, strategies as st

from dss_plugin_nlp_analysis_spark.operators.graph import (
    k_hop,
    pagerank,
    triangle_count,
)
from tests.test_graph import py_pagerank

FUZZ = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

NODE = st.integers(0, 7)
EDGES = st.lists(st.tuples(NODE, NODE), min_size=1, max_size=24)


@given(EDGES, st.integers(1, 3))
@FUZZ
def test_pagerank_fuzz_vs_python(spark, edges, iters):
    e = [(s, d) for s, d in edges if s != d]
    if not e:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=iters).collect()}
    assert got == py_pagerank(edges, iterations=iters)


def _py_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    count = 0
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            count += len([c for c in adj[a] & adj[b] if c > b])
    return count


@given(EDGES)
@FUZZ
def test_triangle_count_fuzz_vs_bruteforce(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = triangle_count(df).collect()
    got = rows[0]["n_triangles"] if rows else 0
    assert got == _py_triangles(edges)


def _py_khop(edges, seeds, k):
    e = {(s, d) for s, d in edges if s != d}
    out = {}
    for s, d in e:
        out.setdefault(s, set()).add(d)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for depth in range(1, k + 1):
        nxt = set()
        for u in frontier:
            for v in out.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = depth
        frontier = nxt
    return dist


@given(EDGES, st.sets(NODE, min_size=1, max_size=3), st.integers(0, 3))
@FUZZ
def test_k_hop_fuzz_vs_python_bfs(spark, edges, seeds, k):
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r["node"]: r["hops"] for r in k_hop(df, sdf, k=k).collect()}
    assert got == _py_khop(edges, seeds, k)
