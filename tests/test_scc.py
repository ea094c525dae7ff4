"""strongly_connected_components: hand graphs (cycles, bridges, DAG
tendrils, descending chains), self-loop universe contract, cap raise."""

import pytest

from dss_plugin_nlp_analysis_spark.operators.graph import (
    strongly_connected_components as scc,
)


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return sorted((r.node, r.scc_id) for r in scc(df, **kw).collect())


def test_cycles_bridge_tendril_chain(spark):
    # cycle {1,2,3} -> cycle {4,5}; tendril 6->1; descending chain 9->8->7->4
    e = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (6, 1), (3, 4),
         (9, 8), (8, 7), (7, 4)]
    assert _run(spark, e) == [
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6),
        (7, 7), (8, 8), (9, 9),
    ]


def test_single_giant_cycle(spark):
    n = 12
    e = [(i, (i + 1) % n) for i in range(n)]
    assert _run(spark, e) == [(i, 0) for i in range(n)]


def test_two_cycles_joined_both_ways_merge(spark):
    # two 2-cycles with edges both directions between them: one SCC
    e = [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3), (4, 1)]
    assert _run(spark, e) == [(i, 1) for i in (1, 2, 3, 4)]


def test_pure_dag_all_singletons(spark):
    e = [(1, 2), (1, 3), (2, 4), (3, 4)]
    assert _run(spark, e) == [(1, 1), (2, 2), (3, 3), (4, 4)]


def test_self_loop_only_node_excluded(spark):
    # node 7 appears only in a self-loop: not in the universe (contract
    # shared with pagerank/_link_seed_nodes)
    e = [(1, 2), (2, 1), (7, 7)]
    assert _run(spark, e) == [(1, 1), (2, 1)]


def test_peel_cap_raises_not_partial(spark):
    # descending chain peels one trim level per iteration; with the trim
    # budget strangled the operator must raise, never return partial
    e = [(i, i - 1) for i in range(9, 0, -1)]
    with pytest.raises(ValueError):
        _run(spark, e, max_peel_rounds=1, trim_iters=1)
    # and with sane caps the same graph completes
    assert _run(spark, e) == [(i, i) for i in range(0, 10)]
