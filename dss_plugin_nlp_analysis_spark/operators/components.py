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
both map-side combinable. Convergence is detected from a ``_changed``
flag computed INSIDE the relabel pass (a narrow scan of the just-cut
round table — no extra join between the old and new label tables).

Lineage must be cut every round (see the inline note on exponential plan
growth). Two cut modes:

- default: ``localCheckpoint`` — zero-setup, right for local/sandbox
  runs, but blocks live in executor storage: losing an executor
  mid-iteration kills the job unrecoverably.
- ``checkpoint_dir`` set: each round's label table is written to
  ``<dir>/cc_round_NNNN`` parquet and read back — a *reliable* cut that
  survives executor loss (and, unlike ``RDD.checkpoint()``, leaves
  deterministic per-round files the loop can delete as soon as they are
  superseded, so the footprint stays at ~2 rounds of labels). The final
  round's files back the returned DataFrame and are left for the caller.

Deterministic: the component id is the minimum node id; non-convergence
RAISES rather than returning wrong labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def _round_path(checkpoint_dir: str, rnd: int) -> str:
    return f"{checkpoint_dir}/cc_round_{rnd:04d}"


def _hadoop_rm(spark: SparkSession, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API so cleanup works
    on any checkpoint_dir scheme (HDFS, S3A, local) — not just local paths."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    keep_checkpoint: bool = False,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``;
    component = min node id of the connected component.

    Converges early when a round changes nothing; raises RuntimeError if
    ``max_iter`` rounds were not enough (component labels would be WRONG —
    raise ``max_iter`` for long-chain graphs; convergence needs about the
    graph eccentricity from each component's min node). The edge table is
    persisted once so its upstream DAG (e.g. the whole minhash pair
    pipeline) executes exactly once, not once per round.

    ``checkpoint_dir``: when set, each round's lineage cut is a parquet
    round-trip under a per-invocation subdirectory
    ``{checkpoint_dir}/cc_run_<uuid>`` (reliable — survives executor
    loss; superseded round files are deleted as the loop advances, and
    the whole run directory is deleted if the loop raises). The unique
    subdir means concurrent jobs can safely share one ``checkpoint_dir``
    without clobbering each other's round files. By default
    (``keep_checkpoint=False``) the run directory is ALSO removed on
    success: the converged labels are handed off through a final
    ``localCheckpoint`` so nothing on disk backs the returned DataFrame
    — repeated scheduled runs leave zero accumulated files, and no
    caller ever needs to know the internal uuid path. Pass
    ``keep_checkpoint=True`` to keep the final round's parquet under the
    run directory instead (the returned DataFrame then reads from it —
    durable across executor loss until the caller deletes the
    directory; the path is logged via the DataFrame's file scan).
    When ``checkpoint_dir`` is None, ``localCheckpoint`` is used for
    every round: fine in-sandbox, NOT durable on a real cluster — set
    ``checkpoint_dir`` for long production runs."""
    spark = edges.sparkSession
    run_dir = None
    if checkpoint_dir is not None:
        import uuid

        run_dir = f"{checkpoint_dir}/cc_run_{uuid.uuid4().hex[:12]}"

    def cut(df: DataFrame, rnd: int) -> DataFrame:
        # A lineage cut is REQUIRED each round, not an optimization: labels
        # feeds the next round twice (neighbor-min + the self join), so
        # without a cut the logical plan doubles per round (2^k nodes ->
        # driver OOM around round ~20).
        if run_dir is None:
            return df.localCheckpoint()
        path = _round_path(run_dir, rnd)
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        if rnd >= 1:
            # the previous round is fully superseded once this write is
            # complete (the write above is an action) — drop its files so
            # the on-disk footprint stays at two rounds of labels
            _hadoop_rm(spark, _round_path(run_dir, rnd - 1))
        return out

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    labels = cut(
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node")),
        0,
    )
    converged = False
    try:
        for rnd in range(1, max_iter + 1):
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
            # _changed is computed in the SAME pass that produces the new
            # labels, so convergence detection is a narrow scan of the
            # just-cut round table — not a second join of old vs new labels
            new_labels = cut(
                labels.join(
                    nbr_min.select(F.col("u").alias("node"), "_m"), "node", "left"
                ).select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce("_m", F.col("component"))
                    ).alias("component"),
                    F.coalesce(
                        F.col("_m") < F.col("component"), F.lit(False)
                    ).alias("_changed"),
                ),
                rnd,
            )
            changed = new_labels.where("_changed").limit(1).count()
            labels = new_labels.drop("_changed")
            if changed == 0:
                converged = True
                break
    finally:
        und.unpersist()
        if not converged and run_dir is not None:
            # raise/exception path: the result is never returned, so no
            # reader depends on the round files — remove the whole run dir
            _hadoop_rm(spark, run_dir)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds — labels would be wrong; raise max_iter (rounds needed ≈ "
            "max eccentricity from each component's minimum node)"
        )
    if run_dir is not None and not keep_checkpoint:
        # hand the converged labels off through an in-cluster cut so the
        # run directory can be removed NOW — zero files accumulate across
        # scheduled runs (the durable parquet cuts have already done
        # their job: protecting the iterations)
        labels = labels.localCheckpoint()
        _hadoop_rm(spark, run_dir)
    return labels
