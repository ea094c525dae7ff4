"""Inverted-index construction: token → sorted posting list of document
ids, with document frequency and a df cap.

The retrieval-side artifact a corpus engine materializes next to the KG:
BM25/boolean search, contamination lookups, and keyword routing all read
a token → doc-ids index. The reference plugin has no index surface.

Scale shape: the danger is the posting LIST, not the count — a stopword's
posting list at 10^12 documents is billions of ids, and
``collect_list`` would buffer it in one reducer. So df is computed FIRST
(map-side-combinable count over distinct (token, id) pairs) and tokens
beyond ``max_df`` never reach the list-building aggregate — the same
cap-the-posting-list-before-the-expensive-stage shape as
``dedup.ngram_jaccard_pairs``. Both groupBys share the token key, so the
exchange is reused; the df filter join is token-keyed as well.

Determinism: posting lists are ``sort_array``-ed (collect_list order is
partition-dependent; the sorted array is not), so the index value-hashes
identically under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.operators.dedup import exploded_shingles

__all__ = ["inverted_index"]


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_df: int = 1,
    max_df: int = 100_000,
) -> DataFrame:
    """Build (token, df, doc_ids) from normalized whitespace tokens.

    ``df`` counts DISTINCT documents containing the token; tokens with
    df < ``min_df`` or df > ``max_df`` are dropped (the cap is the
    posting-list memory guard — raise it consciously). ``doc_ids`` is
    ascending-sorted.
    """
    pairs = (
        exploded_shingles(df, id_col, text_col, n=1)
        .where(F.col("g") != "")
        .select(F.col("g").alias("token"), "id")
        .distinct()
    )
    dfc = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    keep = dfc.where((F.col("df") >= min_df) & (F.col("df") <= max_df))
    return (
        pairs.join(keep, "token")
        .groupBy("token", "df")
        .agg(F.sort_array(F.collect_list("id")).alias("doc_ids"))
        .select("token", "df", "doc_ids")
    )
