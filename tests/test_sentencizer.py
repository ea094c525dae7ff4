"""Sentencizer parity tests (SEMANTICS.md §4; reference
test_sentence_splitter.py + ontology_tagger.py:71-74)."""

from dss_plugin_nlp_analysis_spark.functions.sentencizer import split_sentences
from dss_plugin_nlp_analysis_spark.functions.textnorm import clean_linebreaks


def split_clean(text, lang="en"):
    return split_sentences(clean_linebreaks(text), lang)


def test_nan_text_splits_to_empty():
    # test_sentence_splitter.py:5-18
    assert split_clean(None) == []
    assert split_clean("") == []


def test_linebreaks_four_sentences():
    # test_sentence_splitter.py:21-40 — exactly 4 sentences
    text = (
        "first line with carriage return\rsecond line with two linebreaks\n\n"
        "third line with parenthesis)\nLast line"
    )
    sents = split_clean(text)
    assert len(sents) == 4
    assert sents[2] == "third line with parenthesis)"
    assert sents[3] == "Last line"


def test_period_splitting():
    assert split_clean("I hope nothing. I fear nothing. I am free.") == [
        "I hope nothing.",
        "I fear nothing.",
        "I am free.",
    ]


def test_trailing_punct_stays_attached():
    # closing punctuation after the period stays in the sentence
    assert split_clean('He said "stop." Then left.') == ['He said "stop."', "Then left."]


def test_no_terminal_punct_single_sentence():
    assert split_clean("no punctuation at all") == ["no punctuation at all"]


def test_cjk_fullwidth_punct():
    assert split_clean("異体同心。 そうです。", lang="ja") == ["異体同心。", "そうです。"]
