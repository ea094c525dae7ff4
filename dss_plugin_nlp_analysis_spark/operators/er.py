"""Entity resolution: blocked fuzzy name matching.

A KG built from a crawl accumulates near-identical surface forms for one
real-world entity ("Acme Corp", "Acme Corp.", "acme c0rp"); merging them
is the entity-resolution step between mention extraction (operators/kg.py)
and the canonical-node choice (alias graph + connected components). The
classic shape is block → compare → match: an all-pairs Levenshtein over
10^9 names is 10^18 comparisons, so candidates are restricted to shared
cheap blocking keys first, exactly like the LSH band-bucket join in
operators/dedup.py.

Scale shape (what survives 100 TB):

- one groupBy(block_key) to size blocks + one self-equi-join on the key:
  both shuffle on the key, never a cartesian (plan-asserted in
  tests/test_plans.py).
- hot keys are the skew risk ("j" surnames, stop-word-led brands):
  ``max_block_size`` drops oversized blocks BEFORE the join — a
  documented recall trade (the dropped keys are enumerable from the
  size table), identical in spirit to dedup.py's ``max_bucket_size``.
- ``levenshtein`` evaluates JVM-side inside codegen; the id ordering
  (id_a < id_b) halves the join output and keeps the pair set canonical.

DIV (SEMANTICS.md): blocking is first-2-chars of the normalized name —
a deliberate simple key so recall is analyzable (a typo INSIDE the key
prefix escapes the block; production stacks add a second phonetic or
q-gram key pass and union candidates). The compare is plain Levenshtein,
byte-identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_name", "blocked_name_matches", "score_candidate_pairs"]


def normalize_name(col: Column) -> Column:
    """lower + trim + collapse internal whitespace (NULL → '')."""
    return F.regexp_replace(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"\s+", " ")


def blocked_name_matches(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    max_dist: int = 2,
    max_block_size: int = 1000,
) -> DataFrame:
    """Candidate duplicate-entity pairs by blocked Levenshtein.

    Returns (id_a, id_b, name_a, name_b, dist) with id_a < id_b and
    dist <= ``max_dist``, comparing only names that share a blocking key
    (first 2 chars of the normalized name). Blocks larger than
    ``max_block_size`` are dropped entirely (skew guard; see module doc).
    Empty/NULL names never match (their normalized form is '' — filtered).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if max_block_size < 2:
        raise ValueError(f"max_block_size must be >= 2, got {max_block_size}")
    names = df.select(
        F.col(id_col).alias("id"), normalize_name(F.col(name_col)).alias("name")
    ).where(F.length("name") >= 2)
    keyed = names.withColumn("bkey", F.substring("name", 1, 2))
    ok_keys = (
        keyed.groupBy("bkey")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") <= F.lit(max_block_size))
        .select("bkey")
    )
    k = keyed.join(ok_keys, "bkey")
    a = k.select(
        F.col("bkey"), F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    b = k.select(
        F.col("bkey"), F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    return (
        a.join(b, "bkey")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= F.lit(max_dist))
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def score_candidate_pairs(
    pairs: DataFrame,
    fields: list[tuple[str, int, int]],
    *,
    upper: int,
    lower: int,
) -> DataFrame:
    """Fellegi-Sunter-style record-linkage scoring: given candidate
    pairs carrying per-field AGREEMENT flags (0/1 columns a comparison
    stage produced — exact, normalized, or fuzzy-thresholded upstream),
    score each pair with integer log-odds-style weights and classify by
    the two-threshold rule: ``link`` / ``possible`` (clerical-review
    band) / ``nonlink``.

    ``fields`` is ``[(flag_col, agree_weight, disagree_weight), ...]``:
    agreement on a field ADDS ``agree_weight``, disagreement SUBTRACTS
    ``disagree_weight`` (both non-negative by contract — pass the
    log-ratio magnitudes; a rare-field agreement like tax-id carries a
    large agree weight, a common-field agreement like country a small
    one). NULL flags contribute 0 (the missing-comparison convention).

    Returns the input columns plus ``(score, decision)``. Pure per-row
    arithmetic — zero shuffle on top of the candidate-pair input; the
    weights ride the plan as literals (they are model parameters, not
    data).
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    if lower > upper:
        raise ValueError(f"lower ({lower}) must be <= upper ({upper})")
    score: Column | None = None
    for col, aw, dw in fields:
        if aw < 0 or dw < 0:
            raise ValueError(
                f"weights must be non-negative, got ({aw}, {dw}) for {col!r}"
            )
        term = (
            F.when(F.col(col) == 1, F.lit(aw))
            .when(F.col(col) == 0, F.lit(-dw))
            .otherwise(F.lit(0))
        )
        score = term if score is None else score + term
    assert score is not None
    out = pairs.withColumn("score", score.cast("long"))
    return out.withColumn(
        "decision",
        F.when(F.col("score") >= upper, F.lit("link"))
        .when(F.col("score") >= lower, F.lit("possible"))
        .otherwise(F.lit("nonlink")),
    )
