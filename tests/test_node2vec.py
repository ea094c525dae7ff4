"""node2vec_walks: exact-match against an independent pure-Python
simulation of the integer weighted-sampling contract, sink/validation
edges."""

import collections
import hashlib

import pytest

from dss_plugin_nlp_analysis_spark.operators.graph import node2vec_walks

EDGES = [(1, 2), (2, 1), (2, 3), (2, 4), (3, 4), (4, 1), (1, 3), (5, 5)]


def _simulate(seeds, steps, p, q):
    adj = collections.defaultdict(set)
    for s, d in EDGES:
        if s != d:
            adj[s].add(d)

    def h(walk, t):
        return int(hashlib.md5(f"{walk}|{t}".encode()).hexdigest()[:15], 16)

    path = {}
    for seed in seeds:
        prev, cur = None, seed
        path[(seed, 0)] = seed
        for t in range(1, steps + 1):
            cands = sorted(adj[cur])
            if not cands:
                break
            ws = [
                q if (prev is not None and c == prev)
                else p * q if (prev is not None and c in adj.get(prev, ()))
                else p
                for c in cands
            ]
            hh = h(seed, t) % sum(ws)
            cum = 0
            for c, w in zip(cands, ws):
                cum += w
                if cum > hh:
                    nxt = c
                    break
            path[(seed, t)] = nxt
            prev, cur = cur, nxt
    return path


@pytest.mark.parametrize("p,q", [(1, 1), (2, 3), (4, 1)])
def test_matches_simulation(spark, p, q):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (3,), (4,)], "node long")
    out = node2vec_walks(edges, seeds, steps=3, p=p, q=q)
    got = {(r.walk_id, r.step): r.node for r in out.collect()}
    assert got == _simulate([1, 3, 4], 3, p, q)


def test_walk_ends_at_sink(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    rows = node2vec_walks(edges, seeds, steps=4).collect()
    # 1 -> 2 (sink): steps 0 and 1 only
    assert sorted((r.step, r.node) for r in rows) == [(0, 1), (1, 2)]


def test_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        node2vec_walks(edges, seeds, steps=-1)
    with pytest.raises(ValueError):
        node2vec_walks(edges, seeds, p=0)
