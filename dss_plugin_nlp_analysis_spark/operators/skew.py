"""Skew-aware aggregation: explicit two-phase salting (north rule —
"salts hot domains to defuse skew").

For plain algebraic aggregates Spark's partial aggregation already defuses
key skew; the pattern below matters for *holistic* aggregates
(collect_set/distinct) where one hot key (a crawl's mega-domain) would
otherwise funnel every row into a single reducer. Phase 1 groups by
(key, salt) — the hot key fans out across ``buckets`` reducers — phase 2
merges the per-salt partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_distinct_stats"]


def salted_distinct_stats(
    df: DataFrame,
    key_col: str,
    val_col: str,
    buckets: int = 8,
) -> DataFrame:
    """Per-key (count, distinct-count of ``val_col``) with salted two-phase
    aggregation. Returns (key, n_rows, n_distinct).

    Salt = hash of the *value* so identical values land in the same salt
    bucket (making phase-2 distinct a cheap merge of disjoint-ish sets).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(val_col)), F.lit(buckets))
    )
    # Phase 1 reduces each (key, salt) group to a single COUNT — because the
    # salt is a hash of the value, per-salt distinct sets are disjoint by
    # construction, so phase 2 can merge counts instead of re-shipping every
    # distinct value of a hot key to one reducer.
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count("*").alias("_n"),
        F.size(F.collect_set(val_col)).alias("_nd"),
    )
    return partial.groupBy(key_col).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_nd").cast("int").alias("n_distinct"),
    )
