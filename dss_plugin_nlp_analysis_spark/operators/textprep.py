"""Text-prep operators exposed at the DataFrame surface (SURVEY.md §2.2
P3/P4, §2.7 T1).

``clean_linebreaks_col`` is the *native Catalyst* expression form of the
Python kernel ``functions.textnorm.clean_linebreaks`` (whole-stage codegen,
no UDF) — covers \\r\\n/\\r/\\n, the linebreak classes that occur in web
text after UTF-8 decode; the Python kernel additionally handles exotic
unicode linebreaks via str.splitlines. Equivalence on the common classes is
pinned in tests/test_textprep.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.sentencizer import split_sentences
from ..functions.textnorm import clean_linebreaks

__all__ = [
    "clean_linebreaks_col",
    "clean_text_rows",
    "split_sentences_udf",
    "extract_text_udf",
]


def clean_text_rows(df, columns: list[str]):
    """P7 — generic text-column cleaner (reference
    utils/cleaning_utils.py:43-57, unused by the recipe path): strip each
    column, empty → NULL, drop rows where any cleaned column is NULL."""
    out = df
    for c in columns:
        out = out.withColumn(c, F.nullif(F.trim(F.col(c)), F.lit("")))
    cond = None
    for c in columns:
        cnd = F.col(c).isNotNull()
        cond = cnd if cond is None else (cond & cnd)
    return out.where(cond)


def clean_linebreaks_col(col: Column) -> Column:
    """P3+P4 as one codegen'd expression: NULL→"", split lines, drop
    empty lines (pre-strip), strip survivors, rejoin with \\n
    (reference sentence_splitter.py:39-44, 54-57)."""
    lines = F.split(F.coalesce(col, F.lit("")), "\r\n|\r|\n")
    kept = F.filter(lines, lambda x: x != "")
    # Python str.strip removes tabs/formfeeds too — F.trim only strips
    # spaces, so strip with a whitespace-class regex (incl. common unicode
    # spaces) to match the kernel
    ws = ("[\\s\u00a0\u1680\u2000-\u200a"
          "\u2028\u2029\u202f\u205f\u3000]+")  # \s + unicode spaces
    stripped = F.transform(
        kept,
        lambda x: F.regexp_replace(F.regexp_replace(x, f"^{ws}", ""), f"{ws}$", ""),
    )
    return F.array_join(stripped, "\n")


def split_sentences_udf():
    """T1 as an Arrow UDF: text (pre-cleaned or raw) + lang → array of
    sentence strings (cleans linebreaks first, like the reference recipe)."""

    @F.pandas_udf("array<string>")
    def _split(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for text_s, lang_s in it:
            out = [
                split_sentences(clean_linebreaks(t), l if isinstance(l, str) and l else "en")
                for t, l in zip(text_s, lang_s)
            ]
            yield pd.Series(out)

    return _split


def extract_text_udf():
    """HTML→text extraction as an Arrow UDF (SEMANTICS.md §9)."""
    from ..functions.html_text import extract_text

    @F.pandas_udf("string")
    def _extract(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for html_s in it:
            yield pd.Series(
                [extract_text(h) if h is not None else None for h in html_s]
            )

    return _extract
