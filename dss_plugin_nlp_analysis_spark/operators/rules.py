"""KG rule mining: 2-hop relation composition and AMIE-style horn-rule
confidence scoring over a (subj, pred, obj) triple table.

The classic KG-completion loop (Galárraga et al., "AMIE: Association
Rule Mining under Incomplete Evidence in Ontological Knowledge Bases",
WWW 2013 — public): mine rules of the shape

    p1(x, y) ∧ p2(y, z)  ⇒  p3(x, z)

score them by support (how many distinct (x, z) bindings of the body are
already asserted under p3) and std-confidence (support / distinct body
bindings), then use high-confidence rules to propose missing triples.

Scale notes (100 TB / 10^12-triple KG):
- The body join composes triples on the shared MID entity. A hub mid
  (a country every person's born_in points at) contributes
  in-degree × out-degree composed pairs, so ``max_mid_degree`` drops
  hub mids BEFORE the self-join — the same pivot cap as
  graph.neighbor_jaccard, with the same honesty note: it reduces
  candidate-binding recall, never the correctness of surviving counts.
- Everything downstream is distinct-projection + map-side-combinable
  groupBys on (p1, p2[, p3]) — the predicate dim is tiny by nature.
- The head join is an equi-join of body bindings against the triple
  table on (x, z); confidences are exact integer ppm (no libm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["compose_relations", "amie_rules"]


def _dedup_triples(
    triples: DataFrame, subj: str, pred: str, obj: str
) -> DataFrame:
    return (
        triples.select(
            F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
        )
        .where(F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull())
        .distinct()
    )


def compose_relations(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    *,
    max_mid_degree: int | None = None,
    drop_reflexive: bool = True,
) -> DataFrame:
    """2-hop relation composition: every path p1(x, y) ∧ p2(y, z) becomes
    one (x, p1, p2, z, n_mids) row, ``n_mids`` = number of distinct mid
    entities y witnessing the composition (multi-path evidence — the
    inference-strength signal a KG-completion consumer thresholds on).

    ``drop_reflexive`` (default) removes x = z compositions (born_in ∘
    contains loops assert nothing new about x). ``max_mid_degree`` caps
    the mid entity's TOTAL degree (in + out over the deduplicated triple
    table) before the join — a hub mid contributes in×out pairs; capped
    mids are excluded ENTIRELY, so n_mids counts only non-hub witnesses
    (documented recall cut, same contract as graph.neighbor_jaccard).

    Scale shape: one self-equi-join on the mid entity + one combinable
    groupBy; the optional degree cap is a combinable count + equi-join.
    """
    t = _dedup_triples(triples, subj, pred, obj)
    left = t.select(F.col("s").alias("x"), F.col("p").alias("p1"), F.col("o").alias("mid"))
    right = t.select(F.col("s").alias("mid"), F.col("p").alias("p2"), F.col("o").alias("z"))
    if max_mid_degree is not None:
        deg = (
            t.select(F.col("s").alias("e"))
            .union(t.select(F.col("o").alias("e")))
            .groupBy("e")
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        ok = deg.where(F.col("_d") <= max_mid_degree).select(F.col("e").alias("mid"))
        left = left.join(ok, "mid")
        right = right.join(ok, "mid")
    comp = left.join(right, "mid")
    if drop_reflexive:
        comp = comp.where(F.col("x") != F.col("z"))
    return comp.groupBy("x", "p1", "p2", "z").agg(
        F.count_distinct("mid").alias("n_mids")
    )


def amie_rules(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    *,
    min_support: int = 2,
    min_conf_ppm: int = 100_000,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """AMIE-style composition-rule mining: for every predicate triple
    (p1, p2 ⇒ p3), returns

    - ``body_size``: distinct (x, z) bindings of p1(x,y) ∧ p2(y,z)
      (mid-deduplicated, reflexive bindings dropped — they can never be
      confirmed by a meaningful head),
    - ``support``: bindings already asserted as p3(x, z),
    - ``conf_ppm`` = 1e6 · support div body_size (AMIE std-confidence,
      exact integer ppm),

    filtered to ``support >= min_support`` and ``conf_ppm >=
    min_conf_ppm``. The head predicate p3 ranges over asserted triples
    only (a rule nobody's facts confirm has support 0 and never
    surfaces). p3 = p1 or p3 = p2 is allowed (transitivity rules:
    contains ∘ contains ⇒ contains).

    Scale shape: body bindings from ``compose_relations`` (hub-mid cap
    applies there); body_size is a combinable groupBy on the tiny
    (p1, p2) dim; support joins bindings to the triple table on the
    (x, z) entity-pair key — an equi-join whose skew follows entity
    popularity, not predicate count.
    """
    t = _dedup_triples(triples, subj, pred, obj)
    body = compose_relations(
        triples, subj, pred, obj,
        max_mid_degree=max_mid_degree, drop_reflexive=True,
    ).select("x", "p1", "p2", "z")
    body_size = body.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("body_size")
    )
    heads = t.select(
        F.col("s").alias("x"), F.col("p").alias("p3"), F.col("o").alias("z")
    )
    support = (
        body.join(heads, ["x", "z"])
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        support.join(body_size, ["p1", "p2"])
        .withColumn("conf_ppm", F.expr("(1000000 * support) div body_size"))
        .where(
            (F.col("support") >= min_support)
            & (F.col("conf_ppm") >= min_conf_ppm)
        )
        .select("p1", "p2", "p3", "body_size", "support", "conf_ppm")
    )
