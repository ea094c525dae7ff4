"""Distributed connected components over an edge list.

The north rule's canonicalization ("connected-components over an alias
graph") is driver-side union-find in ``kg.canonical_map`` because the
ontology is broadcast-sized. This module is the 10^12-scale path for
graphs that are NOT driver-sized — above all duplicate CLUSTERING: the
near-dup candidate pairs from ``dedup.minhash_candidate_pairs`` (or the
LSH embedding pairs) form a graph whose components are the duplicate
clusters, from which a pipeline keeps one canonical document each.

Algorithm: iterative min-label propagation — every node repeatedly takes
the minimum component label among itself and its neighbors; converges in
O(graph diameter) rounds (web duplicate clusters are shallow star/clique
shapes, typically 2-3 rounds). Each round is one join + one groupBy(min),
both map-side combinable; each round's label table is localCheckpointed
(mandatory — see the inline note on exponential plan growth) and the
edge table is persisted once so its upstream DAG executes exactly once.
Deterministic: the component id is the minimum node id; non-convergence
RAISES rather than returning wrong labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``;
    component = min node id of the connected component.

    Converges early when a round changes nothing; raises RuntimeError if
    ``max_iter`` rounds were not enough (component labels would be WRONG —
    raise ``max_iter`` for long-chain graphs; convergence needs about the
    graph eccentricity from each component's min node). The edge table is
    persisted once so its upstream DAG (e.g. the whole minhash pair
    pipeline) executes exactly once, not once per round."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    # localCheckpoint is REQUIRED each round, not an optimization: labels
    # feeds the next round twice (neighbor-min + the self join), so without
    # a lineage cut the logical plan doubles per round (2^k nodes -> driver
    # OOM around round ~20). Superseded checkpoint blocks are released by
    # the ContextCleaner once the driver reference drops (labels is
    # overwritten each round); on a real cluster with very high max_iter,
    # use reliable checkpoint() + explicit cleanup of the checkpoint dir.
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    try:
        for _ in range(max_iter):
            nbr_min = (
                und.join(
                    labels.select(
                        F.col("node").alias("v"), F.col("component").alias("_nc")
                    ),
                    "v",
                )
                .groupBy("u")
                .agg(F.min("_nc").alias("_m"))
            )
            new_labels = (
                labels.join(
                    nbr_min.select(F.col("u").alias("node"), "_m"), "node", "left"
                )
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce("_m", F.col("component"))
                    ).alias("component"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.withColumnRenamed("component", "_new")
                .join(labels, "node")
                .where(F.col("_new") != F.col("component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
    finally:
        und.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds — labels would be wrong; raise max_iter (rounds needed ≈ "
            "max eccentricity from each component's minimum node)"
        )
    return labels
