"""C4-style web-page cleaning: heuristic line/page filters + global
line-level deduplication.

The standard Common-Crawl curation cuts (C4, Raffel et al. 2020, public):
keep lines that end in terminal punctuation and have enough words; drop
pages with too few sentences or containing boilerplate markers
("lorem ipsum", "{"); deduplicate exact lines ACROSS the whole corpus,
keeping only the first occurrence. The reference has no equivalent — this
is part of the training-data-pipeline surface the engine adds on top of
its §2 parity (README scale-design notes).

Scale shapes:

- ``c4_line_filter`` is a pure per-row map (split → filter → rejoin as
  native array expressions) — zero shuffle at any corpus size, and every
  predicate is a literal string op (no regex) so the DuckDB oracle runs
  the byte-identical logic.
- ``line_dedup`` is the one genuinely global op: explode lines → first
  occurrence per line via a map-side-combinable ``groupBy(line).min`` —
  never a window, which would buffer a boilerplate line's entire global
  group in one reducer ("subscribe to our newsletter" appears on ~every
  page of a domain; groupBy partials + AQE handle exactly that skew) —
  then an equi-join back and a per-doc reassembly groupBy whose groups
  are bounded by document size. Two key shuffles total, both equi-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "c4_line_filter",
    "line_dedup",
    "dedup_lines_in_doc",
    "TERMINAL_PUNCT",
]

TERMINAL_PUNCT = (".", "!", "?", '"')


def _lines(text: Column) -> Column:
    """Trimmed non-empty lines of a document (array<string>)."""
    return F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), "\n"), F.trim),
        lambda x: x != "",
    )


def _word_count(line: Column) -> Column:
    # filter empty tokens so runs of whitespace ('a\t\tb  c') don't inflate
    # the count — matches C4's whitespace-split word count; still a literal
    # op the DuckDB oracle mirrors exactly
    return F.size(F.filter(F.split(line, " "), lambda x: x != ""))


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Per-document C4 heuristics. Output columns:

    - ``clean_text``: lines ending in terminal punctuation with at least
      ``min_words_per_line`` words, rejoined with ``\\n`` ('' if none)
    - ``n_lines`` / ``n_kept``: line counts before/after the filter
    - ``n_sentences``: terminal-punctuation marks in the kept text
    - ``page_kept``: ``n_sentences >= min_sentences`` and no boilerplate
      marker ('lorem ipsum' case-insensitive, or '{') anywhere on the page
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = _lines(text)
    kept = F.filter(
        lines,
        lambda x: F.substring(x, -1, 1).isin(*TERMINAL_PUNCT)
        & (_word_count(x) >= min_words_per_line),
    )
    clean_text = F.array_join(kept, "\n")
    # literal char-count (no regex → byte-identical in the SQL oracle)
    n_sent = F.length(clean_text) - F.length(
        F.replace(
            F.replace(F.replace(clean_text, F.lit("."), F.lit("")), F.lit("!"), F.lit("")),
            F.lit("?"),
            F.lit(""),
        )
    )
    low = F.lower(text)
    page_kept = (
        (n_sent >= min_sentences)
        & ~low.contains("lorem ipsum")
        & ~low.contains("{")
    )
    return df.select(
        F.col(id_col).alias("id"),
        clean_text.alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        n_sent.alias("n_sentences"),
        page_kept.alias("page_kept"),
    )


def dedup_lines_in_doc(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """WITHIN-document repeated-line removal (RefinedWeb-style template
    cleanup: nav bars and footers repeat inside one page): keep each
    distinct trimmed line at its first position, preserving order.
    Returns (id, clean_text, n_lines, n_kept).

    Pure per-row map — the intra-doc complement of the corpus-global
    ``line_dedup`` (no shuffle; run this first so the global pass sees
    each page's line set once). The keep-first filter is an index lambda
    over a PROJECTED line-array column (O(lines²) per row — bounded by
    page size, and the array must be a bound reference: a lambda over
    the `_lines(...)` subtree would re-split the document per line)."""
    lines_df = df.select(
        F.col(id_col).alias("id"), _lines(F.col(text_col)).alias("_ls")
    )
    ls = F.col("_ls")
    kept = F.filter(
        ls, lambda x, i: ~F.array_contains(F.slice(ls, 1, i), x)
    )
    return lines_df.select(
        "id",
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(ls).alias("n_lines"),
        F.size(kept).alias("n_kept"),
    )


def line_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-global exact line dedup, first occurrence wins (C4's
    cross-document line dedup). Returns one row per input document with
    ``clean_text`` = the document's surviving lines ('' when every line
    was a repeat of an earlier document's line).

    First occurrence = smallest ``(id, position)`` under the id column's
    own ordering — ``min(struct(id, pos))``, which Spark compares
    lexicographically field-by-field, so ANY orderable id type works
    (string doc ids are standard in web corpora; a numeric-packing scheme
    like ``id*1e6+pos`` would NULL out on strings and silently drop every
    line). Still a plain ``min`` with map-side partials. Dedup keys on the
    exact line text; at 100 TB swap the join key for ``xxhash64(line)`` to
    shrink shuffle width (collision-free in practice, same plan shape).
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_lines(F.col(text_col))).alias("pos", "line"),
    )
    # distinct output names on the aggregated side: `firsts` derives from
    # `lines`, so joining on same-named columns trips the ambiguous-self-
    # join analyzer check
    firsts = lines.groupBy(F.col("line").alias("first_line")).agg(
        F.min(F.struct("id", "pos")).alias("first")
    )
    survivors = lines.join(
        firsts,
        (F.col("line") == F.col("first_line"))
        & (F.col("id") == F.col("first.id"))
        & (F.col("pos") == F.col("first.pos")),
    ).select("id", "pos", "line")
    rebuilt = survivors.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .select("id", F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )
