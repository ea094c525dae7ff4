"""Integration scenario matrix — the reference's 8 DSS scenarios
(tests/python/integration/test_integration.py:14-58: {mono,multi}lingual ×
{category,no-category} × each matching option × all three output formats)
re-expressed as local end-to-end runs with structural assertions."""

import itertools

import pytest

from dss_plugin_nlp_analysis_spark.operators.ontology import TagOptions
from dss_plugin_nlp_analysis_spark.operators.tagger import OUTPUT_FORMATS, tag_documents

TEXTS = [
    ("d1", "The Merge Sort runs. Engines whirr loudly.", "en"),
    ("d2", "les engines de donnés", "fr"),
    ("d3", "no relevant content at all", "en"),
    ("d4", "cafe CAFÉ café", "en"),
]

ONTO = [
    ("msort", "merge sort", "algo"),
    ("engine", "engines", "tech"),
    ("cafe", "café", "food"),
]

OPTION_SETS = [
    TagOptions(),
    TagOptions(ignore_case=True),
    TagOptions(ignore_diacritics=True),
    TagOptions(lemmatization=True),
    TagOptions(ignore_case=True, ignore_diacritics=True, lemmatization=True),
]


@pytest.mark.parametrize(
    "with_category,fmt,opts",
    list(itertools.product([False, True], OUTPUT_FORMATS, OPTION_SETS)),
)
def test_scenario_matrix(spark, with_category, fmt, opts):
    docs = spark.createDataFrame(TEXTS, "doc_id string, text string, lang string")
    onto = spark.createDataFrame(ONTO, "tag string, keyword string, category string")
    out = tag_documents(
        docs,
        onto,
        text_col="text",
        lang_col="lang",
        category_col="category" if with_category else None,
        output_format=fmt,
        options=opts,
    )
    rows = out.collect()
    cols = out.columns
    # input columns survive, new columns placed right after text
    assert cols[:2] == ["doc_id", "text"]
    assert "lang" in cols
    if fmt == "one_row_per_match":
        # ≥1 row per doc (no-match docs keep a NULL row)
        ids = {r["doc_id"] for r in rows}
        assert ids == {"d1", "d2", "d3", "d4"}
        tag_col = "tag"
        assert all(r[tag_col] is None for r in rows if r["doc_id"] == "d3")
        if opts.ignore_case:
            assert any(r[tag_col] == "msort" for r in rows if r["doc_id"] == "d1")
    else:
        assert len(rows) == 4  # exactly one row per document
    if fmt == "one_row_per_doc_json":
        json_col = "tag_json_full"
        by_id = {r["doc_id"]: r[json_col] for r in rows}
        assert by_id["d3"] is None
        if opts.ignore_case:
            assert by_id["d1"] is not None
    # full-option run finds the diacritic/case variants in d4
    if opts.ignore_case and opts.ignore_diacritics and fmt == "one_row_per_match":
        d4 = [r for r in rows if r["doc_id"] == "d4" and r["tag"] == "cafe"]
        assert len(d4) >= 1
