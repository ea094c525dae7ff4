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

__all__ = ["inverted_index", "bm25_topk", "phrase_search"]


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


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    *,
    k: int = 10,
) -> DataFrame:
    """Top-k documents for a term query under an integer-quantized BM25
    (k1 = 1.2, b = 0.75, Robertson idf) — the retrieval scorer next to
    ``inverted_index``.

    Determinism contract (same discipline as the micro-nat LM scores):
    idf is materialized once per term as ``round(ln(1 + (N-df+0.5)/(df+0.5))·1e6)``
    (round-to-micro absorbs libm ULP differences — the tfidf_top
    precedent), and the tf saturation ratio ``(k1+1)·tf / (tf + k1·(1-b
    + b·dl/avgdl))`` is evaluated in scaled int64 with EARLY floor
    divisions::

        q_micro = (22·tf·1e6) div (10·tf + 3 + (9·dl) div avgdl)
        contribution = (idf_micro · q_micro) div 1e6
        score_micro  = Σ contribution          (order-free integer sum)

    The early ``(9·dl) div avgdl`` quantizes the length normalization to
    ~1/avgdl relative error — a deliberate trade: exact rational BM25
    would overflow int64 at web-scale document lengths, and float BM25
    would make the ranking partition-order- and libm-dependent. avgdl =
    ``total_tokens div N`` (integer).

    Scale shape: tokens are FILTERED TO THE QUERY TERMS before the tf
    groupBy (the explode never materializes non-query tokens past the
    filter), the df/idf table is query-sized (broadcast), the corpus
    stats are a 1-row broadcast, and the final top-k is
    ``ORDER BY ... LIMIT`` → TakeOrderedAndProject. The only corpus-wide
    shuffles are the (id, token) tf groupBy and the per-doc score sum,
    both map-side combinable and id-keyed (no skew: a document scores
    once per query term at most).

    Output: (id, score_micro), ties broken by id ascending. Documents
    containing none of the query terms never appear.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    from dss_plugin_nlp_analysis_spark.operators.textstats import (
        token_count,
        word_tokens,
    )

    dlt = df.select(
        F.col(id_col).alias("id"), token_count(F.col(text_col)).alias("dl")
    )
    stats = dlt.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).select("n", F.expr("total div n").alias("avgdl"))
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_tokens(F.col(text_col))).alias("token"),
        )
        .where(F.col("token").isin(query_terms))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    idf = dfc.crossJoin(F.broadcast(stats.select("n"))).select(
        "token",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("dfc") + F.lit(0.5))
                / (F.col("dfc") + F.lit(0.5))
            )
            * 1e6
        )
        .cast("long")
        .alias("idf_micro"),
    )
    contrib = (
        tf.join(dlt, "id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .join(F.broadcast(idf), "token")
        .select(
            "id",
            F.expr(
                "(idf_micro * ((22 * tf * 1000000)"
                " div (10 * tf + 3 + (9 * dl) div avgdl)))"
                " div 1000000"
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("id")
        .agg(F.sum("c").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), F.col("id"))
        .limit(k)
    )


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Positional phrase search: documents containing the EXACT token
    sequence ``phrase`` (whitespace tokens of the normalized text, same
    tokenization as ``inverted_index``) with the match count — the
    adjacency query a bag-of-words index cannot answer ("table scan"
    must not match "scan the table"), the standard positional-postings
    upgrade of the IR stack here (inverted_index → bm25 → phrase).

    Returns ``(id, n_matches)`` for matching documents only. Matching
    is via per-token positional postings self-joined on ``pos_{k+1} =
    pos_k + 1`` — k-1 equi-joins for a k-token phrase, each keyed on
    (id, position), never a regex over the corpus (the join form prunes
    to the phrase's rarest token first under AQE and reuses any
    materialized postings table; the regex form rescans every byte).

    Scale shape: postings are (id, pos) rows filtered to the phrase's
    tokens BEFORE the joins (predicate pushdown into the scan); all
    joins share the id key. Single-token phrases reduce to a postings
    count.
    """
    toks = [t for t in phrase.lower().split() if t]
    if not toks:
        raise ValueError("phrase must contain at least one token")
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    posting = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(norm, " ")).alias("pos", "tok"),
        )
        .where(F.col("tok").isin(toks))
    )
    cur = posting.where(F.col("tok") == toks[0]).select(
        "id", F.col("pos").alias("p0")
    )
    for k, t in enumerate(toks[1:], start=1):
        nxt = posting.where(F.col("tok") == t).select(
            "id", F.col("pos").alias(f"p{k}")
        )
        cur = cur.join(nxt, "id").where(
            F.col(f"p{k}") == F.col(f"p{k-1}") + 1
        )
    return cur.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )
