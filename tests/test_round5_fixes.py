"""Round-5 ADVICE-item regression tests: neighbor_jaccard exact_counts,
quantile_buckets NULL contract, cohort_retention epoch-seconds contract,
rollup_time empty-granularities validation."""

import pytest
from pyspark.sql import functions as F

from tests.test_graph import py_neighbor_jaccard


def test_neighbor_jaccard_exact_counts_restores_true_jaccard(spark):
    """A pair that shares BOTH a hub and a non-hub neighbor survives the
    capped wedge stage but (by default) reports only the non-hub witness
    count; exact_counts=True recomputes the TRUE intersection for the
    surviving pairs — matching the uncapped reference values for every
    emitted pair, while candidate recall stays capped."""
    from dss_plugin_nlp_analysis_spark.operators.graph import neighbor_jaccard

    # hub 0 <-> 1..5; nodes 1 and 2 also share low-degree neighbor 6, and
    # 3/4 share ONLY the hub. cap=3: pair (1,2) survives via pivot 6 but
    # shares hub 0 too; pair (3,4) is (correctly) not a candidate at all.
    edges = [(0, i) for i in range(1, 6)] + [(1, 6), (2, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")

    capped_default = {
        (r[0], r[1]): tuple(r)
        for r in neighbor_jaccard(df, max_hub_degree=3).collect()
    }
    # documented lower-bound semantics: hub witness not counted
    assert capped_default[(1, 2)][2] == 1  # shared: only node 6

    capped_exact = {
        (r[0], r[1]): tuple(r)
        for r in neighbor_jaccard(
            df, max_hub_degree=3, exact_counts=True
        ).collect()
    }
    uncapped = {(r[0], r[1]): r for r in py_neighbor_jaccard(edges)}
    # same candidate set as the capped default (recall unchanged) ...
    assert set(capped_exact) == set(capped_default)
    # ... but every surviving pair now carries the TRUE shared / jaccard
    for pair, row in capped_exact.items():
        assert row == uncapped[pair], pair
    assert capped_exact[(1, 2)][2] == 2  # hub 0 + node 6


def test_neighbor_jaccard_exact_counts_noop_without_cap(spark):
    from dss_plugin_nlp_analysis_spark.operators.graph import neighbor_jaccard

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(tuple(r) for r in neighbor_jaccard(df).collect())
    b = sorted(
        tuple(r) for r in neighbor_jaccard(df, exact_counts=True).collect()
    )
    assert a == b == py_neighbor_jaccard(edges)


def test_quantile_buckets_null_metric_excluded(spark):
    """NULL metrics are excluded from histogram AND output (previously
    they skewed thresholds via NULLS-FIRST cumulation and landed in the
    top bucket through three-valued `v <= t`)."""
    from dss_plugin_nlp_analysis_spark.operators.textstats import (
        quantile_buckets,
    )

    rows = [(i, i) for i in range(1, 9)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r["id"]: r["bucket"] for r in quantile_buckets(df, "id", "v").collect()}
    # NULL rows absent from the output entirely
    assert 100 not in got and 101 not in got
    # thresholds identical to the NULL-free corpus (1..8 quartiles)
    assert got == {1: "q1", 2: "q1", 3: "q2", 4: "q2",
                   5: "q3", 6: "q3", 7: "q4", 8: "q4"}


def test_cohort_retention_epoch_seconds_matches_timestamp(spark):
    """cohort_retention accepts integer epoch seconds (the rollup_time
    portable contract) and agrees with the timestamp-typed run on the
    same instants."""
    from dss_plugin_nlp_analysis_spark.operators.rollup import cohort_retention

    DAY = 86400
    rows = [
        ("u1", 0 * DAY), ("u1", 7 * DAY), ("u1", 21 * DAY),
        ("u2", 3 * DAY), ("u2", 8 * DAY),
        ("u3", 14 * DAY),
        ("u3", None),
    ]
    ints = spark.createDataFrame(rows, "user_id string, ts long")
    tss = ints.withColumn("ts", F.timestamp_seconds("ts"))
    got_int = sorted(tuple(r) for r in cohort_retention(ints).collect())
    got_ts = sorted(tuple(r) for r in cohort_retention(tss).collect())
    assert got_int == got_ts
    assert got_int == [
        (0, 0, 2), (0, 1, 2), (0, 3, 1),  # u1+u2 cohort week 0
        (2, 0, 1),                        # u3 cohort week 2
    ]


def test_rollup_time_empty_granularities_raises(spark):
    from dss_plugin_nlp_analysis_spark.operators.rollup import rollup_time

    ev = spark.createDataFrame([("a", 100, 1)], "k string, ts long, v long")
    with pytest.raises(ValueError, match="granularities"):
        rollup_time(ev, "ts", "v", granularities={})
