"""Parity tests for text cleaning / normalization (SEMANTICS.md §1-2).

Cases derived from the reference's pinned behaviors:
tests/python/unit/test_sentence_splitter.py, nlp/utils.py:49-67.
"""

from dss_plugin_nlp_analysis_spark.functions.textnorm import (
    clean_linebreaks,
    normalize_text,
    use_nfc,
)


def test_clean_linebreaks_cr_and_doubles():
    text = "first line\rsecond line\n\nthird)\nLast line"
    assert clean_linebreaks(text) == "first line\nsecond line\nthird)\nLast line"


def test_clean_linebreaks_strips_each_line():
    assert clean_linebreaks("  a  \n\tb\t") == "a\nb"


def test_clean_linebreaks_space_only_line_survives_filter():
    # reference wart: a line of spaces is truthy, strips to "" (SEMANTICS §1)
    assert clean_linebreaks("a\n  \nb") == "a\n\nb"


def test_clean_linebreaks_none_and_empty():
    assert clean_linebreaks(None) == ""
    assert clean_linebreaks("") == ""


def test_use_nfc_truth_table():
    # ontology_tagger.py:86 — NFC iff lemmatization and not ignore_diacritics
    assert use_nfc(True, False) is True
    assert use_nfc(True, True) is False
    assert use_nfc(False, False) is False
    assert use_nfc(False, True) is False


def test_normalize_diacritics_match_pair():
    # test_ontology_tagger.py:112-130 — keyword matches stripped text
    kw = "ÄâêËùûôçèîÏìàñ"
    assert normalize_text(kw, ignore_diacritics=True) == "AaeEuuoceiIian"


def test_normalize_case():
    assert normalize_text("My KeYword", ignore_case=True) == "my keyword"


def test_normalize_nfd_default():
    # é composed (U+00E9) → NFD decomposes to e + combining accent
    assert normalize_text("é") == "é"
    assert normalize_text("é", lemmatization=True) == "é"  # NFC when lemmatizing
