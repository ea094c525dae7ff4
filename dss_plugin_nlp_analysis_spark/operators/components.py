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
both map-side combinable; lineage is cut per round with localCheckpoint
(swap for reliable ``checkpoint()`` against a checkpoint dir on a real
cluster). Deterministic: the component id is the minimum node id.
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
    component = min node id of the connected component. Converges early
    when a round changes nothing; ``max_iter`` bounds pathological
    diameters (raise it for long-chain graphs)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
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
            labels.join(nbr_min.select(F.col("u").alias("node"), "_m"), "node", "left")
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
            break
    return labels
