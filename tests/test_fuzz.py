"""Hypothesis fuzz: kernel invariants on arbitrary unicode (web corpora
contain garbage; the extraction kernel must never crash and must keep its
offset/coverage invariants)."""

from hypothesis import given, settings, strategies as st

from dss_plugin_nlp_analysis_spark.functions.sentencizer import (
    sentence_token_spans,
    split_sentences,
)
from dss_plugin_nlp_analysis_spark.functions.textnorm import clean_linebreaks, normalize_text
from dss_plugin_nlp_analysis_spark.functions.tokenizer import tokenize
from dss_plugin_nlp_analysis_spark.operators.ontology import TagOptions, compile_ontology
from dss_plugin_nlp_analysis_spark.operators.tagger import process_document

TEXT = st.text(max_size=300)
LANG = st.sampled_from(["en", "fr", "zh", "de", "ja", "th"])


@given(TEXT, LANG)
@settings(max_examples=300, deadline=None)
def test_tokenize_offsets_and_coverage(text, lang):
    toks = tokenize(text, lang)
    prev_end = 0
    for t in toks:
        assert text[t.start:t.end] == t.text
        assert t.start >= prev_end  # ordered, non-overlapping
        prev_end = t.end
    # every non-space char is covered by some token
    covered = [False] * len(text)
    for t in toks:
        for i in range(t.start, t.end):
            covered[i] = True
    for i, ch in enumerate(text):
        if not ch.isspace():
            assert covered[i], (i, ch, text)


@given(TEXT, LANG)
@settings(max_examples=200, deadline=None)
def test_sentences_are_substrings(text, lang):
    clean = clean_linebreaks(text)
    for s in split_sentences(clean, lang):
        assert s in clean
        assert s == s.rstrip() or s.strip() == ""  # no trailing whitespace


@given(TEXT, st.booleans(), st.booleans(), st.booleans())
@settings(max_examples=200, deadline=None)
def test_normalize_never_crashes(text, ic, lem, dia):
    out = normalize_text(text, ignore_case=ic, lemmatization=lem, ignore_diacritics=dia)
    assert isinstance(out, str)


_COMPILED = compile_ontology(
    [("t1", "alpha beta", None), ("t2", "γάμμα", None), ("t3", "1.1.1.1", None)],
    ["en", "zh"],
    TagOptions(ignore_case=True, ignore_diacritics=True),
    False,
)


@given(st.one_of(st.none(), TEXT), st.sampled_from(["en", "zh"]))
@settings(max_examples=300, deadline=None)
def test_process_document_total(text, lang):
    sentences, matches = process_document(_COMPILED, text, lang)
    for m in matches:
        assert 0 <= m["sent_idx"] < len(sentences)
        assert m["tag"] in ("t1", "t2", "t3")
        assert m["char_start"] < m["char_end"]
        assert m["keyword"]
