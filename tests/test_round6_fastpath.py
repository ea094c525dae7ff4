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


def test_manual_json_serializer_matches_json_dumps():
    """_slots_json / the cat builders must be byte-identical to
    json.dumps(..., ensure_ascii=False) on adversarial strings."""
    import json

    from dss_plugin_nlp_analysis_spark.operators.tagger import _doc_json_builders

    build_no_cat, build_cat = _doc_json_builders()
    nasty = [
        "plain", 'quo"te', "back\\slash", "tab\there", "new\nline",
        "unicode é 中文 🎉", "ctrl\x01\x1f", "", "sp ace", " sep",
    ]
    rng = __import__("random").Random(5)
    for trial in range(50):
        matches = []
        sentences = [rng.choice(nasty) + str(i) for i in range(4)]
        for _ in range(rng.randint(1, 10)):
            matches.append(
                {
                    "tag": rng.choice(nasty),
                    "keyword": rng.choice(nasty),
                    "category": rng.choice(nasty[:4]),
                    "sent_idx": rng.randrange(4),
                }
            )

        # reference: the original dict assembly + json.dumps
        def ref_no_cat(ms, ss):
            full = {}
            for mt in ms:
                tag, kw = mt["tag"], mt["keyword"]
                sent = ss[mt["sent_idx"]]
                slot = full.get(tag)
                if slot is None:
                    full[tag] = {"count": 1, "sentences": [sent], "keywords": [kw]}
                else:
                    slot["count"] += 1
                    if sent not in slot["sentences"]:
                        slot["sentences"].append(sent)
                    if kw not in slot["keywords"]:
                        slot["keywords"].append(kw)
            return json.dumps(full, ensure_ascii=False) if full else None

        def ref_cat(ms, ss):
            cats, full = {}, {}
            for mt in ms:
                tag, kw, cat = mt["tag"], mt["keyword"], mt["category"]
                sent = ss[mt["sent_idx"]]
                by_tag = full.setdefault(cat, {})
                slot = by_tag.get(tag)
                if slot is None:
                    by_tag[tag] = {"count": 1, "sentences": [sent], "keywords": [kw]}
                    cats.setdefault(cat, []).append(tag)
                else:
                    slot["count"] += 1
                    if sent not in slot["sentences"]:
                        slot["sentences"].append(sent)
                    if kw not in slot["keywords"]:
                        slot["keywords"].append(kw)
            if not full:
                return None, None
            return (
                json.dumps(cats, ensure_ascii=False),
                json.dumps(full, ensure_ascii=False),
            )

        assert build_no_cat(matches, sentences) == ref_no_cat(matches, sentences)
        assert build_cat(matches, sentences) == ref_cat(matches, sentences)
    assert build_no_cat([], []) is None
    assert build_cat([], []) == (None, None)


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
