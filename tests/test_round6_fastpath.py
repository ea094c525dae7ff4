"""Round-6 kernel fast path: the plain-words screen in process_document
must be behavior-invisible — every (document, options) pair must produce
byte-identical output whether or not the screen fires. The generic path is
forced by monkeypatching the screen regexes to never match."""

import random
import re

import pytest

from dss_plugin_nlp_analysis_spark.operators import tagger
from dss_plugin_nlp_analysis_spark.operators.ontology import (
    TagOptions,
    compile_ontology,
)

ROWS = [
    ("scan_op", "table scan", "operator"),
    ("merge_op", "merge", "operator"),
    ("merge_op", "slow", "operator"),
    ("window_op", "window", "operator"),
    ("customer_ent", "customer", "entity"),
    ("spark_ent", "spark", "entity"),
    ("dual_a", "window", "entity"),  # duplicate keyword (tie rules)
]

VOCAB = [
    "table", "scan", "merge", "slow", "window", "customer", "spark",
    "query", "fast", "data", "row", "line", "the", "a", "42", "x9",
]

_NEVER = re.compile(r"(?!)")


def _docs():
    rng = random.Random(1234)
    docs = [
        "",
        "spark",
        "window",
        "table scan",
        "table scan table scan slow window",
        "merge slow merge window customer spark",
        "the spark table scan runs slow",
    ]
    for _ in range(60):
        docs.append(" ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40))))
    # documents that must NOT pass the screen (exercise fallback parity
    # through the same public entry)
    docs += [
        "Spark window",          # uppercase (lowercase screen)
        "table  scan",           # double space
        "spark.\nwindow works",  # punctuation + newline
        "café spark window",     # non-ASCII
        "spark\twindow",         # tab
        " spark window ",        # cleaned by clean_linebreaks anyway
    ]
    return docs


@pytest.mark.parametrize(
    "opts,has_cat",
    [
        (TagOptions(), False),
        (TagOptions(), True),
        (TagOptions(ignore_case=True), False),
        (TagOptions(ignore_case=True), True),
        (TagOptions(lemmatization=True), False),
        (TagOptions(link_entities=True), True),
        (TagOptions(ignore_case=True, lemmatization=True), False),
    ],
)
def test_fast_path_matches_generic(monkeypatch, opts, has_cat):
    rows = ROWS if has_cat else [(t, k, None) for t, k, _ in ROWS]
    compiled = compile_ontology(rows, ["en"], opts, has_cat)
    docs = _docs()
    fast = [tagger.process_document(compiled, d, "en") for d in docs]
    monkeypatch.setattr(tagger, "_FAST_WORDS_RE", _NEVER)
    monkeypatch.setattr(tagger, "_FAST_WORDS_LOWER_RE", _NEVER)
    slow = [tagger.process_document(compiled, d, "en") for d in docs]
    for d, f, s in zip(docs, fast, slow):
        assert f == s, f"fast/generic divergence on {d!r}:\n fast={f}\n slow={s}"


def test_screen_fires_on_plain_words():
    compiled = compile_ontology(
        [("t", "spark", None)], ["en"], TagOptions(), False
    )
    assert tagger._FAST_WORDS_RE.fullmatch("plain words only 42")
    assert not tagger._FAST_WORDS_RE.fullmatch("two  spaces")
    assert not tagger._FAST_WORDS_RE.fullmatch("punct.")
    assert not tagger._FAST_WORDS_LOWER_RE.fullmatch("Upper case")
    sents, matches = tagger.process_document(compiled, "spark is here", "en")
    assert sents == ["spark is here"] and matches[0]["tag"] == "t"
