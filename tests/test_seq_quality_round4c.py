"""Round-4 continued-session operators, part 2: personalized PageRank,
event-transition statistics, the hashed-linear quality classifier, and
BPE pair counting — unit contracts + Python-mirror checks."""

import hashlib
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from dss_plugin_nlp_analysis_spark.operators.graph import personalized_pagerank
from dss_plugin_nlp_analysis_spark.operators.rollup import transition_counts
from dss_plugin_nlp_analysis_spark.operators.textstats import (
    char_pair_counts,
    hashed_linear_score,
)

FUZZ = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

NODE = st.integers(0, 7)
EDGES = st.lists(st.tuples(NODE, NODE), min_size=1, max_size=24)


# --- personalized pagerank ------------------------------------------------

def py_ppr(edges, seeds, iterations, init=10**12, dnum=85, dden=100):
    e = {(s, d) for s, d in edges if s != d}
    nodes = sorted({n for t in e for n in t})
    outdeg = Counter(s for s, _ in e)
    base = (dden - dnum) * init // dden
    seeds = set(seeds) & set(nodes)
    rank = {n: (init if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for s, d in e:
            inc[d] += rank[s] // outdeg[s]
        rank = {
            n: (base if n in seeds else 0) + (dnum * inc[n]) // dden
            for n in nodes
        }
    return rank


def test_ppr_mass_stays_near_seeds(spark):
    # two disconnected components; seeds only in the first — the second
    # component's ranks must be exactly 0
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (5, 6), (6, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["rank"]
           for r in personalized_pagerank(df, seeds, iterations=3).collect()}
    assert got[5] == 0 and got[6] == 0
    assert got[0] > 0 and got[1] > 0
    assert got == py_ppr([(0, 1), (1, 0), (5, 6), (6, 5)], [0], 3)


def test_ppr_rejects_zero_iterations(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(ValueError):
        personalized_pagerank(df, seeds, iterations=0)


@given(EDGES, st.sets(NODE, min_size=1, max_size=3), st.integers(1, 3))
@FUZZ
def test_ppr_fuzz_vs_python(spark, edges, seeds, iters):
    if not any(s != d for s, d in edges):
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r["node"]: r["rank"]
           for r in personalized_pagerank(df, sdf, iterations=iters).collect()}
    assert got == py_ppr(edges, seeds, iters)


# --- event transitions ----------------------------------------------------

def _ev(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_transition_counts_per_user_sequences(spark):
    ev = _ev(spark, [
        (1, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 00:01:00", 1, "b"),
        (3, "2024-01-01 00:02:00", 1, "a"),
        (4, "2024-01-01 00:00:30", 2, "b"),
        (5, "2024-01-01 00:00:45", 2, "a"),
    ])
    got = sorted(tuple(r) for r in transition_counts(ev).collect())
    # user1: a->b, b->a; user2: b->a
    assert got == [("a", "b", 1, 1000000), ("b", "a", 2, 1000000)]


def test_transition_counts_tiebreak_and_null_exclusion(spark):
    ev = _ev(spark, [
        # same timestamp: event_id breaks the tie -> a then b
        (10, "2024-01-01 00:00:00", 1, "a"),
        (11, "2024-01-01 00:00:00", 1, "b"),
        # NULL type and NULL ts rows vanish BEFORE sequencing: a->b
        # remains adjacent despite the NULL row between them in time
        (20, "2024-01-01 00:00:00", 2, "a"),
        (21, "2024-01-01 00:00:30", 2, None),
        (22, None, 2, "c"),
        (23, "2024-01-01 00:01:00", 2, "b"),
    ])
    got = sorted(tuple(r) for r in transition_counts(ev).collect())
    assert got == [("a", "b", 2, 1000000)]


# --- hashed linear score --------------------------------------------------

def py_linear(texts, weights, bias):
    import re

    out = {}
    for i, t in texts:
        norm = re.sub(r"\s+", " ", (t or "").lower()).strip()
        toks = [x for x in norm.split(" ") if x != ""]
        s = bias
        for tk in toks:
            b = int(hashlib.md5(tk.encode()).hexdigest()[:15], 16) % len(weights)
            s += weights[b]
        out[i] = s
    return out


def test_hashed_linear_score_python_mirror(spark):
    texts = [(1, "Hello  world HELLO"), (2, ""), (3, None), (4, "x y z w")]
    weights = [((b * 7) % 5 - 2) * 100 for b in range(16)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["id"]: (r["score_micro"], r["keep"]) for r in hashed_linear_score(
        df, "doc_id", "text", weights, bias=50, threshold=51
    ).collect()}
    exp = py_linear(texts, weights, 50)
    assert got == {i: (s, int(s >= 51)) for i, s in exp.items()}
    assert got[2][0] == 50 and got[3][0] == 50  # empty/NULL -> bias only


def test_hashed_linear_score_rejects_empty_weights(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hashed_linear_score(df, "doc_id", "text", [])


# --- BPE pair counts ------------------------------------------------------

def test_char_pair_counts_matches_counter(spark):
    texts = [(1, "Hello hello"), (2, "ab a  ba"), (3, None)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = [(r["pair"], r["n_occurrences"])
           for r in char_pair_counts(df, "text", k=50).collect()]
    c = Counter()
    for _, t in texts:
        import re

        norm = re.sub(r"\s+", " ", (t or "").lower()).strip()
        for w in [x for x in norm.split(" ") if x]:
            for i in range(len(w) - 1):
                c[w[i:i + 2]] += 1
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == exp
    # determinism of the tie boundary: ties sort by pair text
    assert [p for p, _ in got] == sorted(
        [p for p, _ in got],
        key=lambda p: (-c[p], p),
    )
