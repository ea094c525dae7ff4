"""LLM training-data preparation operators: skip-gram pair generation,
context-window sequence packing, and DSIR-style importance weighting.

These are the last-mile ops between a cleaned corpus and a training run:
word2vec/GloVe-style (center, context) pairs, GPT-style document packing
into fixed token budgets, and data-selection weights that up-sample raw
documents resembling a target distribution (Xie et al., "Data Selection
for Language Models via Importance Resampling", NeurIPS 2023 — the
hashed-n-gram importance-weight construction; implemented here in exact
integer arithmetic so the DuckDB oracle value-hashes identically, see
the libm note on operators/kg.py cooccurrence_lift).

Scale notes (100 TB):
- skipgram_pairs is a pure map + one explode: the token array is
  materialized as a projected column BEFORE the position/offset HOFs
  run (HOF lambdas re-evaluate referenced subtrees per element — the
  O(n²) trap documented in TODO.md round 4 — so the split runs once per
  document, and per-element work is O(1) ``element_at`` indexing).
- pack_sequences does ONE window scan per shard. Packing is inherently
  sequential (each document's bin depends on every predecessor), so the
  parallel unit is an explicit shard column: shards pack independently,
  cluster-wide parallelism = number of shards. No global sort, no
  single-partition window.
- dsir_weights reduces both corpora to a ≤``buckets``-row hashed dim
  (two map-side-combinable groupBys), broadcasts the score dim, and
  re-joins it to the raw gram stream — the corpus-sized side never
  shuffles on a skewed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exploded_shingles, normalized_text

__all__ = ["skipgram_pairs", "pack_sequences", "dsir_weights", "ict_pairs", "fim_transform", "span_corruption", "preference_pairs"]


def skipgram_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 2,
) -> DataFrame:
    """Word2vec-style skip-gram training pairs: for every token position
    ``pos`` (1-based) and every offset ``o`` in ``[-window, window] \\ {0}``
    that stays inside the document, one (id, pos, center, context,
    offset) row. Tokens are single-space splits of the dedup
    normalization (lowercase, collapsed whitespace — operators/dedup.py
    ``normalized_text``). Documents with fewer than two tokens (including
    empty/NULL text) emit nothing — every offset falls outside the
    document.

    Scale shape: token array projected once per document, then one
    flatten(transform(positions, transform(offsets, struct))) and ONE
    explode — zero shuffle, and the per-element lambda work is O(1)
    ``element_at`` lookups against the materialized array (never a
    re-split; see module docstring).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    arr = F.col("_toks")
    n = F.col("_n")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.filter(
                    F.sequence(F.lit(-window), F.lit(window)),
                    lambda o: (o != 0) & (i + o >= 1) & (i + o <= n),
                ),
                lambda o: F.struct(
                    i.cast("int").alias("pos"),
                    F.element_at(arr, i.cast("int")).alias("center"),
                    F.element_at(arr, (i + o).cast("int")).alias("context"),
                    o.cast("int").alias("offset"),
                ),
            ),
        )
    )
    return toks.select("id", F.explode(pairs).alias("p")).select(
        "id",
        F.col("p.pos").alias("pos"),
        F.col("p.center").alias("center"),
        F.col("p.context").alias("context"),
        F.col("p.offset").alias("offset"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    budget: int = 2048,
    shards: int = 64,
) -> DataFrame:
    """GPT-style document packing: concatenate documents in id order and
    split the token stream into fixed windows of ``budget`` tokens,
    reporting where each document lands — (id, shard, n_tokens,
    start_off, first_bin, last_bin, n_bins). A document MAY straddle a
    bin boundary (that is the packing used for decoder pre-training:
    documents are concatenated with no padding and the context window
    cuts wherever it cuts); ``n_bins = last_bin - first_bin + 1`` is how
    many windows carry a piece of the document. Token count is the
    single-space split of the dedup normalization; empty/NULL documents
    count 0 tokens and land (zero-width) at their stream offset.

    Packing is sequential by construction — each document's offset
    depends on the total length of every predecessor — so the parallel
    unit is an explicit shard: ``shard = id mod shards`` (non-negative
    ``pmod``), documents pack independently per shard in id order, and
    bin ids are per-shard. Choose ``shards`` >= cluster parallelism; at
    100 TB each shard's window scan is a single linear pass over its
    partition (one shuffle on the shard key, never a global sort).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    from pyspark.sql import Window

    norm = normalized_text(F.col(text_col))
    n_tok = (
        F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))
    ).cast("int")
    base = df.select(
        F.col(id_col).alias("id"),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    out = base.withColumn("start_off", start)
    first_bin = F.expr(f"start_off div {budget}")
    last_bin = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(start_off + n_tokens - 1) div {budget}"),
    ).otherwise(first_bin)
    return out.select(
        "id",
        "shard",
        "n_tokens",
        "start_off",
        first_bin.alias("first_bin"),
        last_bin.alias("last_bin"),
        (last_bin - first_bin + F.lit(1)).alias("n_bins"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 1,
    buckets: int = 4096,
) -> DataFrame:
    """DSIR-style data-selection weights: score each RAW document by how
    much its hashed-n-gram distribution resembles the TARGET corpus.
    Per hashed bucket ``b = md5int(gram) mod buckets``, both corpora
    contribute occurrence counts; the bucket score is an integer
    surrogate of DSIR's log-frequency-ratio —

        score_micro(b) = (1e6 * (tgt_ppm(b) + 1)) div (raw_ppm(b) + 1)

    where ``*_ppm`` are per-corpus gram frequencies in integer parts per
    million and the +1 is add-one smoothing (buckets unseen in the
    target score ~0, not -inf). The surrogate is monotone in the true
    frequency ratio, so importance-RESAMPLING order is preserved; exact
    integer arithmetic keeps the DuckDB oracle value-hash-identical
    (no log/libm drift — same rationale as cooccurrence_lift,
    operators/kg.py). Per document: ``weight_sum`` over its gram stream
    (duplicates count, as in DSIR) and ``weight_avg_micro = weight_sum
    div n_grams``. Returns (id, n_grams, weight_sum, weight_avg_micro);
    documents whose text is empty still carry their single whole-text
    shingle (exploded_shingles contract), so every raw id appears.

    Scale shape: two map-side-combinable groupBys reduce both corpora to
    a ≤``buckets``-row score dim; the dim is broadcast and joined back
    to the raw gram stream; one final groupBy(id). The corpus-sized side
    never sees a skewed shuffle key.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")

    def _bucketed(d: DataFrame) -> DataFrame:
        grams = exploded_shingles(d, id_col, text_col, n)
        return grams.withColumn(
            "b",
            F.pmod(
                F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long"),
                F.lit(buckets),
            ).cast("int"),
        )

    raw_grams = _bucketed(raw)
    raw_counts = raw_grams.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tgt_counts = _bucketed(target).groupBy("b").agg(
        F.count(F.lit(1)).alias("tc")
    )
    raw_tot = raw_counts.agg(F.sum("rc").alias("rtot"))
    tgt_tot = tgt_counts.agg(F.sum("tc").alias("ttot"))
    dim = (
        raw_counts.join(tgt_counts, "b", "left")
        .crossJoin(raw_tot)
        .crossJoin(tgt_tot)
        .select(
            "b",
            F.expr(
                "(1000000 * ((1000000 * coalesce(tc, 0)) div ttot + 1))"
                " div ((1000000 * rc) div rtot + 1)"
            ).alias("score_micro"),
        )
    )
    return (
        raw_grams.join(F.broadcast(dim), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("score_micro").alias("weight_sum"),
        )
        .select(
            "id",
            "n_grams",
            "weight_sum",
            F.expr("weight_sum div n_grams").alias("weight_avg_micro"),
        )
    )


def ict_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_sentences: int = 2,
) -> DataFrame:
    """Inverse-Cloze-Task training pairs for retriever pre-training (Lee
    et al., "Latent Retrieval for Weakly Supervised Open Domain Question
    Answering", ACL 2019): one sentence of a passage becomes the QUERY,
    the remaining sentences (in order) become the positive CONTEXT.

    The held-out sentence is chosen by md5-argmin over
    ``(id, sentence_idx, sentence)`` — deterministic and uniform-ish,
    never a Math.random the oracle could not replay. Sentences are
    ``". "``-splits of the dedup normalization (the portable boundary
    contract the gated corpus uses; the full multilingual sentencizer in
    functions/sentencizer.py is the fidelity path — this op is the
    training-prep fast path). Documents with fewer than
    ``min_sentences`` sentences emit nothing (no context would remain).

    Returns (id, n_sentences, query_idx, query, context) — query_idx is
    0-based stream order; context preserves sentence order and re-joins
    with ``". "``.

    Scale shape: zero shuffle — one split per document (materialized as
    a projected column BEFORE any HOF references it, then the argmin
    struct is ITSELF materialized before the context filter runs: HOF
    lambdas re-evaluate referenced subtrees per element, the O(n²) trap
    documented in TODO.md round 4; bound attributes are O(1)).
    """
    if min_sentences < 2:
        raise ValueError("min_sentences must be >= 2 (a pair needs both sides)")
    sents = df.select(
        F.col(id_col).alias("id"),
        F.split(normalized_text(F.col(text_col)), r"\. ").alias("sents"),
    ).where(F.size("sents") >= min_sentences)
    picked = sents.select(
        "id",
        "sents",
        F.size("sents").alias("n_sentences"),
        F.array_min(
            F.transform(
                "sents",
                lambda x, i: F.struct(
                    F.md5(F.concat_ws("|", F.col("id"), i, x)).alias("h"),
                    i.cast("int").alias("i"),
                    x.alias("s"),
                ),
            )
        ).alias("best"),
    )
    return picked.select(
        "id",
        "n_sentences",
        F.col("best.i").alias("query_idx"),
        F.col("best.s").alias("query"),
        F.concat_ws(
            ". ",
            F.filter("sents", lambda x, j: j != F.col("best.i")),
        ).alias("context"),
    )


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_tokens: int = 4,
) -> DataFrame:
    """Fill-In-the-Middle training transform (Bavarian et al., "Efficient
    Training of Language Models to Fill in the Middle", 2022): split each
    document at two deterministic token cuts into (prefix, middle,
    suffix) and emit the PSM re-ordering the paper trains on.

    Cut points are md5-derived — ``u = md5int(id|fim1) mod (n-1) + 1``
    and likewise ``v`` with salt fim2, then ``s1 = least(u, v)``,
    ``s2 = greatest(u, v)`` — so the transform is reproducible on any
    engine and stable under repartitioning (never a Math.random). Tokens
    are single-space splits of the dedup normalization; prefix =
    tokens[1..s1], middle = tokens[s1+1..s2] (empty when u = v), suffix
    = tokens[s2+1..n]. Documents with fewer than ``min_tokens`` tokens
    emit nothing.

    Returns (id, n_tokens, split_a, split_b, prefix, middle, suffix,
    psm) where psm = ``<PRE> prefix <SUF> suffix <MID> middle``.

    Scale shape: pure map, zero shuffle; the token array is a
    materialized projection before any slice references it.
    """
    if min_tokens < 2:
        raise ValueError("min_tokens must be >= 2 (need two cut positions)")

    def _cut(salt: str) -> "F.Column":
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col("id"), F.lit(salt))), 1, 15),
            16,
            10,
        ).cast("long")
        return (F.pmod(h, F.size("_toks") - 1) + 1).cast("int")

    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"),
    ).where(F.size("_toks") >= min_tokens)
    cuts = toks.select(
        "id", "_toks", _cut("fim1").alias("_u"), _cut("fim2").alias("_v")
    ).select(
        "id",
        "_toks",
        F.least("_u", "_v").alias("split_a"),
        F.greatest("_u", "_v").alias("split_b"),
    )
    prefix = F.array_join(F.slice("_toks", 1, F.col("split_a")), " ")
    middle = F.array_join(
        F.slice(
            "_toks", F.col("split_a") + 1, F.col("split_b") - F.col("split_a")
        ),
        " ",
    )
    suffix = F.array_join(
        F.slice(
            "_toks", F.col("split_b") + 1, F.size("_toks") - F.col("split_b")
        ),
        " ",
    )
    return cuts.select(
        "id",
        F.size("_toks").alias("n_tokens"),
        "split_a",
        "split_b",
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        F.concat(
            F.lit("<PRE> "), prefix, F.lit(" <SUF> "), suffix,
            F.lit(" <MID> "), middle,
        ).alias("psm"),
    )


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block: int = 10,
    span: int = 3,
) -> DataFrame:
    """T5-style span-corruption pairs (Raffel et al., JMLR 2020): mask one
    ``span``-token run per ``block``-token block, replacing it with a
    numbered sentinel, and emit the (input, target) pair — target =
    sentinel-prefixed masked spans in order.

    T5 samples span starts; a cross-engine-reproducible pipeline cannot
    (RNG state differs), so the start offset WITHIN each block is
    md5-derived: ``off = md5int(id|block_idx) mod (block - span + 1)``.
    Corruption rate is exactly span/block (default 30%, the T5 paper's
    15% doubled default is reachable via span/block); a trailing partial
    block shorter than ``span`` tokens is left uncorrupted. Documents
    with fewer than ``block`` tokens emit nothing (no full block to
    corrupt). Sentinels are ``<extra_id_K>``, K = block index (0-based).

    Returns (id, n_tokens, n_spans, input, target).

    Scale shape: pure map, zero shuffle — block index sequence +
    per-block md5 offsets computed over a materialized token array; the
    input re-assembles via one flatten/transform pass (per-element work
    is O(1) element_at against bound attributes).
    """
    if span < 1 or block < 2 or span >= block:
        raise ValueError(f"need 1 <= span < block (got span={span}, block={block})")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"),
    ).where(F.size("_toks") >= block)
    n = F.size("_toks")
    arr = F.col("_toks")
    n_full = toks.select("id", "_toks", (n / block).cast("int").alias("_nb"))
    # per-block struct: start position (1-based) of the masked span
    blocks = F.transform(
        F.sequence(F.lit(0), F.col("_nb") - 1),
        lambda b: F.struct(
            b.cast("int").alias("k"),
            (
                b * block
                + F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("|", F.col("id"), b.cast("string"))),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(block - span + 1),
                )
                + 1
            ).cast("int").alias("start"),
        ),
    )
    staged = n_full.select("id", "_toks", "_nb", blocks.alias("_blocks"))
    # input: walk the blocks; per block emit [kept-before, sentinel,
    # kept-after]; then the trailing partial block verbatim
    per_block = F.transform(
        F.col("_blocks"),
        lambda s: F.concat(
            F.slice(arr, s["k"] * block + 1, s["start"] - (s["k"] * block + 1)),
            F.array(
                F.concat(F.lit("<extra_id_"), s["k"].cast("string"), F.lit(">"))
            ),
            F.slice(
                arr,
                s["start"] + span,
                (s["k"] + 1) * block - (s["start"] + span) + 1,
            ),
        ),
    )
    tail = F.slice(
        arr, F.col("_nb") * block + 1, F.size(arr) - F.col("_nb") * block
    )
    inp = F.array_join(F.concat(F.flatten(per_block), tail), " ")
    target_parts = F.transform(
        F.col("_blocks"),
        lambda s: F.concat_ws(
            " ",
            F.concat(F.lit("<extra_id_"), s["k"].cast("string"), F.lit(">")),
            F.array_join(F.slice(arr, s["start"], span), " "),
        ),
    )
    return staged.select(
        "id",
        F.size("_toks").alias("n_tokens"),
        F.col("_nb").alias("n_spans"),
        inp.alias("input"),
        F.array_join(target_parts, " ").alias("target"),
    )


def preference_pairs(
    scored: DataFrame,
    cluster_col: str,
    id_col: str,
    score_col: str,
    *,
    min_gap: int = 1,
) -> DataFrame:
    """DPO/RLHF-style preference-pair synthesis from quality scores:
    within each cluster of comparable documents (a near-dup cluster, a
    prompt group, a topic bucket), pair the best-scored member as
    ``chosen`` against the worst as ``rejected`` — the weak-supervision
    preference data a reward/DPO stage trains on when no human labels
    exist (quality-score gaps as implicit preferences).

    chosen = (max score, tie → min id); rejected = (min score, tie →
    min id) — both pure min(struct) aggregates, so the pair is a
    deterministic function of the input. Single-member clusters and
    pairs with ``gap < min_gap`` emit nothing (no signal); NULL scores
    and NULL cluster keys are excluded. chosen == rejected cannot
    happen for emitted rows (gap >= min_gap >= 1 forces distinct
    scores).

    Returns ``(cluster, chosen_id, rejected_id, chosen_score,
    rejected_score, gap)``.

    Scale shape: ONE map-side-combinable groupBy on the cluster key —
    the best/worst extremes need no window and no per-cluster sort; a
    caller wanting all k·(k-1) within-cluster pairs instead accepts the
    quadratic blowup explicitly (this operator deliberately emits the
    extreme pair only).
    """
    if min_gap < 1:
        raise ValueError(f"min_gap must be >= 1, got {min_gap}")
    rows = scored.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("id"),
        F.col(score_col).cast("long").alias("score"),
    ).where(F.col("cluster").isNotNull() & F.col("score").isNotNull())
    agg = rows.groupBy("cluster").agg(
        F.min(
            F.struct((-F.col("score")).alias("ns"), F.col("id").alias("id"))
        ).alias("_best"),
        F.min(
            F.struct(F.col("score").alias("s"), F.col("id").alias("id"))
        ).alias("_worst"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        agg.where(F.col("_n") >= 2)
        .select(
            "cluster",
            F.col("_best.id").alias("chosen_id"),
            F.col("_worst.id").alias("rejected_id"),
            (-F.col("_best.ns")).cast("long").alias("chosen_score"),
            F.col("_worst.s").cast("long").alias("rejected_score"),
            (-F.col("_best.ns") - F.col("_worst.s"))
            .cast("long")
            .alias("gap"),
        )
        .where(F.col("gap") >= min_gap)
    )
