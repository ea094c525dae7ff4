"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard eval-leak pass (GPT-3 appendix C, PaLM, Llama — all public):
a training document is contaminated if any of its n-grams appears in any
benchmark document; contaminated docs are dropped (or flagged for
split-level filtering) before training. The reference plugin has no
equivalent — this is part of the training-data-pipeline surface.

Scale shape: the corpus side is the 100 TB table, the benchmark side is
eval sets — thousands of documents, at most a few million distinct
n-grams — so the gram set is BROADCAST and the corpus-side plan never
shuffles rows: one projection explodes corpus grams (the fused
single-scan regex generator from ``dedup.exploded_shingles``), a
broadcast-hash semi-style join marks hits, and the per-document hit count
is a map-side-combinable ``groupBy(id)`` whose key is the document id
(no skew — every doc contributes at most its own gram count). The final
flag join back to the id spine is id-keyed.

Counting contract (mirrored exactly by the DuckDB oracle): ``n_hits``
counts corpus-gram OCCURRENCES that appear in the DISTINCT benchmark gram
set — a doc repeating a leaked 3-gram five times scores 5. Documents
shorter than ``n`` words contribute their whole normalized text as a
single gram (the ``exploded_shingles`` fallback), so short eval answers
still match verbatim copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.operators.dedup import exploded_shingles

__all__ = ["decontaminate"]


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bench_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """Return (id, n_hits, contaminated) for every document in ``docs``.

    ``benchmark`` rows need only ``bench_text_col`` (defaults to
    ``text_col``); its n-grams are deduplicated and broadcast.
    ``contaminated`` is an INT flag (1 = at least one shared n-gram).
    """
    bcol = bench_text_col or text_col
    bench_grams = (
        exploded_shingles(
            benchmark.select(F.lit(0).alias("_bid"), F.col(bcol)), "_bid", bcol, n=n
        )
        .select("g")
        .distinct()
    )
    doc_grams = exploded_shingles(docs, id_col, text_col, n=n)
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    spine = docs.select(F.col(id_col).alias("id"))
    return spine.join(hits, "id", "left").select(
        "id",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.when(F.col("n_hits").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "contaminated"
        ),
    )
