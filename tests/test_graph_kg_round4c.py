"""Round-4 continued-session operators: integer HITS, taxonomy
transitive closure, deterministic random walks, predicate cardinality
profiling, majority-vote entity typing, and KG-to-text linearization —
unit contracts plus hypothesis fuzz against pure-Python references."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from dss_plugin_nlp_analysis_spark.operators.graph import (
    hits,
    random_walks,
    transitive_closure,
)
from dss_plugin_nlp_analysis_spark.operators.kg import (
    infer_entity_types,
    linearize_triples,
    predicate_profile,
)

FUZZ = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

NODE = st.integers(0, 7)
EDGES = st.lists(st.tuples(NODE, NODE), min_size=1, max_size=24)


# --- HITS -----------------------------------------------------------------

def py_hits(edges, iterations, scale=10**6):
    e = {(s, d) for s, d in edges if s != d}
    nodes = sorted({n for t in e for n in t})
    hub = {n: scale for n in nodes}
    auth = {}
    for _ in range(iterations):
        raw = {n: 0 for n in nodes}
        for s, d in e:
            raw[d] += hub[s]
        mx = max(max(raw.values()), 1)
        auth = {n: (r * scale) // mx for n, r in raw.items()}
        raw = {n: 0 for n in nodes}
        for s, d in e:
            raw[s] += auth[d]
        mx = max(max(raw.values()), 1)
        hub = {n: (r * scale) // mx for n, r in raw.items()}
    return auth, hub


def test_hits_star_graph(spark):
    # 0 -> {1,2,3}: 0 is the pure hub, 1..3 are equal pure authorities
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    rows = {r["node"]: (r["auth"], r["hub"]) for r in hits(df, iterations=2).collect()}
    assert rows[0] == (0, 10**6)
    assert rows[1] == rows[2] == rows[3] == (10**6, 0)


def test_hits_rejects_zero_iterations(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        hits(df, iterations=0)


@given(EDGES, st.integers(1, 2))
@FUZZ
def test_hits_fuzz_vs_python(spark, edges, iters):
    if not any(s != d for s, d in edges):
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["auth"], r["hub"]) for r in hits(df, iterations=iters).collect()}
    auth, hub = py_hits(edges, iters)
    assert got == {n: (auth[n], hub[n]) for n in auth}


# --- transitive closure ---------------------------------------------------

def py_closure(edges):
    e = {(c, p) for c, p in edges if c != p}
    parents = {}
    for c, p in e:
        parents.setdefault(c, set()).add(p)
    out = {}
    for n in parents:
        depth = {p: 1 for p in parents[n]}
        frontier = set(parents[n])
        d = 1
        while frontier:
            d += 1
            nxt = {
                g
                for a in frontier
                for g in parents.get(a, ())
                if g not in depth
            }
            for g in nxt:
                depth[g] = d
            frontier = nxt
        for a, dd in depth.items():
            out[(n, a)] = dd
    return out


def test_closure_chain_and_dag_shortest_depth(spark):
    # chain 3->2->1->0 plus shortcut 3->1: (3,0) must keep depth 2 (via
    # the shortcut), not 3
    df = spark.createDataFrame(
        [(3, 2), (2, 1), (1, 0), (3, 1)], "child long, parent long"
    )
    got = {(r["node"], r["ancestor"]): r["depth"]
           for r in transitive_closure(df).collect()}
    assert got[(3, 0)] == 2
    assert got[(3, 1)] == 1
    assert got[(2, 0)] == 2
    assert len(got) == len(py_closure([(3, 2), (2, 1), (1, 0), (3, 1)]))


def test_closure_cycle_terminates_reachability_minus_self(spark):
    # 0 -> 1 -> 2 -> 0: every node reaches the other two, never itself
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "child long, parent long"
    )
    got = {(r["node"], r["ancestor"]): r["depth"]
           for r in transitive_closure(df, max_depth=6).collect()}
    assert got == {
        (0, 1): 1, (1, 2): 1, (2, 0): 1,
        (0, 2): 2, (1, 0): 2, (2, 1): 2,
    }


def test_closure_max_depth_exceeded_raises(spark):
    # depth-5 chain with max_depth=2 must raise, not truncate silently
    df = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        transitive_closure(df, max_depth=2)


def test_closure_fixed_depth_matches_converged(spark):
    edges = [(6, 3), (3, 1), (1, 0), (5, 3)]
    df = spark.createDataFrame(edges, "child long, parent long")
    conv = sorted(tuple(r) for r in transitive_closure(df).collect())
    fixed = sorted(tuple(r) for r in transitive_closure(df, fixed_depth=5).collect())
    assert conv == fixed == sorted(
        (n, a, d) for (n, a), d in py_closure(edges).items()
    )


@given(st.lists(st.tuples(st.integers(1, 7), st.integers(0, 6)), min_size=1,
                max_size=20))
@FUZZ
def test_closure_fuzz_vs_python_on_dags(spark, raw):
    # child > parent forces acyclicity
    edges = [(c, p) for c, p in raw if c > p]
    if not edges:
        return
    df = spark.createDataFrame(edges, "child long, parent long")
    got = {(r["node"], r["ancestor"]): r["depth"]
           for r in transitive_closure(df).collect()}
    assert got == py_closure(edges)


# --- random walks ---------------------------------------------------------

def py_walks(edges, seeds, steps):
    e = {(s, d) for s, d in edges if s != d}
    adj = {}
    for s, d in e:
        adj.setdefault(s, set()).add(d)
    rows = []
    for w in sorted(set(seeds)):
        cur = w
        rows.append((w, 0, w))
        for t in range(1, steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            _, cur = min(
                (hashlib.md5(f"{w}|{t}|{d}".encode()).hexdigest(), d)
                for d in nbrs
            )
            rows.append((w, t, cur))
    return sorted(rows)


def test_random_walks_follow_edges_and_end_at_sinks(spark):
    edges = [(0, 1), (1, 2), (1, 3)]  # 2 and 3 are sinks
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    rows = sorted(tuple(r) for r in random_walks(df, seeds, steps=4).collect())
    assert rows == py_walks(edges, [0], 4)
    # the walk left 0, reached 1, then one of the sinks, then stopped
    assert len(rows) == 3


def test_random_walks_deterministic_across_runs(spark):
    edges = [(i, (i + k) % 6) for i in range(6) for k in (1, 2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    a = sorted(tuple(r) for r in random_walks(df, seeds, steps=3).collect())
    b = sorted(tuple(r) for r in random_walks(df, seeds, steps=3).collect())
    assert a == b and len(a) == 8


@given(EDGES, st.sets(NODE, min_size=1, max_size=3), st.integers(0, 3))
@FUZZ
def test_random_walks_fuzz_vs_python(spark, edges, seeds, steps):
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = sorted(tuple(r) for r in random_walks(df, sdf, steps=steps).collect())
    assert got == py_walks(edges, seeds, steps)


# --- predicate profile ----------------------------------------------------

def test_predicate_profile_cardinalities(spark):
    rows = [
        # functional predicate: every subject one object (s2 mentioned 2x)
        ("s1", "born", "1950"), ("s2", "born", "1960"), ("s2", "born", "1960"),
        # multivalued: s1 asserts two objects
        ("s1", "child", "a"), ("s1", "child", "b"), ("s2", "child", "a"),
        # NULL components excluded entirely
        (None, "born", "x"), ("s3", "born", None),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r["pred"]: r.asDict() for r in predicate_profile(df).collect()}
    assert got["born"]["n_mentions"] == 3
    assert got["born"]["n_triples"] == 2
    assert got["born"]["n_subjects"] == 2
    assert got["born"]["n_objects"] == 2
    assert got["born"]["max_obj_per_subj"] == 1
    assert got["born"]["n_multivalued_subjects"] == 0
    assert got["born"]["avg_obj_ppm"] == 10**6
    assert got["child"]["n_triples"] == 3
    assert got["child"]["n_objects"] == 2
    assert got["child"]["max_obj_per_subj"] == 2
    assert got["child"]["n_multivalued_subjects"] == 1
    assert got["child"]["avg_obj_ppm"] == 15 * 10**5


# --- entity typing --------------------------------------------------------

def test_infer_entity_types_majority_and_ties(spark):
    rows = [
        ("jaguar", "animal"), ("jaguar", "vehicle"), ("jaguar", "vehicle"),
        ("python", "language"), ("python", "animal"),  # tie -> 'animal'
        ("spark", None), (None, "x"),
    ]
    df = spark.createDataFrame(rows, "tag string, tag_category string")
    got = {r["entity"]: r.asDict() for r in infer_entity_types(df).collect()}
    assert set(got) == {"jaguar", "python"}
    assert got["jaguar"]["inferred_type"] == "vehicle"
    assert got["jaguar"]["n_type_mentions"] == 2
    assert got["jaguar"]["n_mentions"] == 3
    assert got["jaguar"]["n_categories"] == 2
    assert got["python"]["inferred_type"] == "animal"  # lexicographic tie
    assert got["python"]["n_type_mentions"] == 1


# --- linearization --------------------------------------------------------

def test_linearize_triples_sorted_deduped(spark):
    rows = [
        (1, "born", "1950"), (1, "award", "nobel"), (1, "born", "1950"),
        (2, "born", "1960"), (None, "x", "y"), (2, None, "z"),
    ]
    df = spark.createDataFrame(rows, "subj long, pred string, obj string")
    got = {r["subj"]: (r["kg_text"], r["n_facts"])
           for r in linearize_triples(df).collect()}
    assert got == {
        1: ("1: award nobel; born 1950", 2),
        2: ("2: born 1960", 1),
    }
