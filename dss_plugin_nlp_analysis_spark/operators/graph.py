"""Link-graph analytics over the materialized KG / web-page link graph.

PageRank is the canonical web-corpus salience signal: CCNet- and
RefinedWeb-style curation pipelines rank pages by link authority before
sampling training data, and a KG build ranks entities by alias-graph
centrality when choosing canonical nodes. The reference plugin has no
graph surface at all — this extends the engine's KG-materialize stage
(north rule: "graph materialize") with the downstream analytics a
trillion-page corpus needs.

Determinism contract (the whole point of the integer formulation): ranks
are kept in integer micro-units and every per-iteration step is either an
integer sum (order-free — bit-identical no matter how partitions combine)
or an integer floor-division that both Spark (``div``) and any ANSI engine
(DuckDB ``//``) evaluate identically on non-negative values. Doubles would
make the gated value-hash depend on reduction order; 64-bit integers do
not. With init=1e12 micro-units, total mass is ``n_nodes * 1e12`` and the
damped sum peaks below ``85 * total_mass`` — safely inside int64 for
graphs up to ~10^5 nodes per unit of init; callers at 10^12 nodes lower
``init`` accordingly (mass, not node count, is what must fit).

Scale shape (what survives 100 TB):

- edges are the big table; ranks/outdeg are node-sized. Every iteration is
  ``edges ⋈ ranks`` (equi-join on src — AQE skew-splits hub domains) then
  ``groupBy(dst).sum`` (map-side combinable: a page with 10^9 in-links
  partial-sums inside each map task, the classic combiner win).
- lineage is cut per iteration with ``localCheckpoint`` — persist() alone
  does NOT cut lineage, and an iterative plan referenced twice per round
  doubles per round (2^k nodes → driver OOM); see components.py for the
  durable-parquet variant when executor loss matters.
- dangling nodes (no out-edges) keep receiving rank but redistribute
  nothing; their mass leaks rather than being re-spread. DIV from the
  textbook formulation, chosen because the re-spread term is a global
  scalar that would force a full collect-broadcast barrier per iteration;
  documented in SEMANTICS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "degree_stats", "triangle_count", "k_hop"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 3,
    init: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Deterministic integer PageRank over a directed edge list.

    Returns (node, rank) with rank in integer micro-units. Self-loops are
    dropped and parallel edges collapsed (DISTINCT) before iterating, so
    out-degree counts distinct successors — the standard link-graph
    convention.

    Update rule per iteration, all in int64::

        share(u)    = rank(u) div outdeg(u)
        incoming(v) = sum(share(u) for each edge u -> v)        (order-free)
        rank'(v)    = (1 - d) * init  +  (d * incoming(v)) div 1
                    = ((damp_den - damp_num) * init) div damp_den
                      + (damp_num * incoming(v)) div damp_den
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edges ⋈ outdeg is iteration-invariant: precompute once, cut lineage
    # once, reuse every round (outdeg >= 1 for every src by construction)
    e_deg = e.join(outdeg, "src").localCheckpoint()
    nodes = nodes.localCheckpoint()

    base = (damp_den - damp_num) * init // damp_den
    ranks = nodes.withColumn("rank", F.lit(init).cast("long"))
    for _ in range(iterations):
        incoming = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").alias("incoming"))
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"(cast({damp_num} as bigint)"
                        f" * coalesce(incoming, cast(0 as bigint)))"
                        f" div cast({damp_den} as bigint)"
                    )
                ).alias("rank"),
            )
            .localCheckpoint()  # cut per-round lineage (see module doc)
        )
    return ranks


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node degree profile of a directed graph: (node, out_degree,
    in_degree, total_degree) over DISTINCT non-loop edges.

    Two map-side-combinable groupBys + one node-keyed outer join — the
    degree histogram a KG build reports per checkpoint (north rule:
    per-partition lineage + metrics)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (
                F.coalesce("out_degree", F.lit(0)) + F.coalesce("in_degree", F.lit(0))
            ).alias("total_degree"),
        )
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of the UNDIRECTED simple graph underlying
    ``edges`` (direction ignored, loops dropped, parallel edges collapsed).

    Returns a single row (n_triangles BIGINT). Triangle density is the
    standard alias-graph health metric (a canonicalization graph whose
    clusters are cliques triangle-counts quadratically; bridges don't).

    Scale shape — the degree-orientation trick (public, Cohen 2009 /
    Suri-Vassilvitskii 2011): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one. Every node's
    out-degree is then O(sqrt(m)) even on power-law graphs — the wedge
    self-join on the shared source explodes per-node as out-degree², so
    orientation turns the celebrity-node O(d²) blowup into the graph-wide
    minimum. Three equi-joins total (wedge build + closing-edge probe),
    all map-side combinable into one final count."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orientation key: (degree, node id) — total order, ties by id
    ranked = (
        und.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b")), "b"
        )
        .select(
            F.when(
                F.struct(F.col("deg_a"), F.col("a"))
                < F.struct(F.col("deg_b"), F.col("b")),
                F.struct(
                    F.col("a").alias("u"),
                    F.col("b").alias("v"),
                    F.col("deg_b").alias("deg_v"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("u"),
                    F.col("a").alias("v"),
                    F.col("deg_a").alias("deg_v"),
                )
            )
            .alias("e")
        )
        .select("e.u", "e.v", "e.deg_v")
    )
    e1 = ranked.select(
        F.col("u"), F.col("v").alias("v1"), F.col("deg_v").alias("dv1")
    )
    e2 = ranked.select(
        F.col("u"), F.col("v").alias("v2"), F.col("deg_v").alias("dv2")
    )
    # wedges at u with canonically-ordered endpoints (same (deg,id) order
    # as the orientation, so the closing edge is oriented v1 -> v2)
    wedges = e1.join(e2, "u").where(
        F.struct(F.col("dv1"), F.col("v1")) < F.struct(F.col("dv2"), F.col("v2"))
    )
    closing = ranked.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    return wedges.join(closing, ["v1", "v2"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    k: int = 2,
    node_col: str = "node",
) -> DataFrame:
    """Bounded BFS: (node, hops) for every node reachable from the seed
    set within ``k`` directed hops; hops = shortest distance (0 for the
    seeds themselves).

    The KG-neighborhood query behind entity-context expansion ("every
    entity within 2 hops of these seed entities") and crawl frontier
    scoping. k is a small constant, so the loop unrolls to k equi-joins —
    per round: frontier ⋈ edges (src-keyed; AQE skew-splits hubs), an
    anti-join against the visited set to keep the frontier minimal, and a
    lineage cut (``localCheckpoint`` — see the module doc; per-round
    growth would otherwise double the plan). Visited stays
    (node, hops)-sized — bounded by the reachable set, not the edge
    count. Distances are set on FIRST discovery and never revisited, so
    the result is the true shortest-hop count without any min-merge.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    visited = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    for depth in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(depth))
        )
        frontier = nxt.localCheckpoint()
        visited = visited.union(frontier).localCheckpoint()
    return visited
