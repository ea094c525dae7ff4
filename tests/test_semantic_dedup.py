"""semantic_dedup: planted paraphrase copies drop, cluster boundary
blocks cross-cluster pruning, first-occurrence-wins chains."""

import pytest

from dss_plugin_nlp_analysis_spark.operators.similarity import semantic_dedup


def test_scaled_copy_drops_original_survives(spark):
    # orthogonal base vectors = their own clusters; 101/102 are scaled
    # copies of 1 (cosine 1.0) and must drop; 2 survives in its cluster
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (101, [2.0, 0.0, 0.0]),
        (102, [0.5, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["cid"], r["keep"]) for r in
           semantic_dedup(df, n_centroids=2, threshold=0.95).collect()}
    assert out[1] == (1, 1)
    assert out[2] == (2, 1)
    assert out[101][1] == 0 and out[102][1] == 0
    assert out[101][0] == 1  # copies cluster with their original


def test_cluster_boundary_blocks_pruning(spark):
    # two near-identical vectors forced into different clusters by
    # n_centroids=2 seeding survive both: SemDeDup prunes within
    # clusters only (the paper's explicit recall trade)
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.999, 0.05]),  # near 1, clusters with 1 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["keep"] for r in
           semantic_dedup(df, n_centroids=2, threshold=0.95).collect()}
    assert out == {1: 1, 2: 1, 3: 0}


def test_chain_coarsening_first_wins(spark):
    # a~b and b~c with a!~c: b drops (a wins), c drops too (b < c and
    # cosine(b,c) >= tau) — documented chain semantics
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9824, 0.1867]),   # cos(1,2) ~ .982
        (3, [0.9306, 0.3659]),   # cos(2,3) ~ .982, cos(1,3) ~ .93 < tau
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["keep"] for r in
           semantic_dedup(df, n_centroids=1, threshold=0.95).collect()}
    assert out == {1: 1, 2: 0, 3: 0}


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        semantic_dedup(df, n_centroids=0)
