"""Explicit triple-extraction P/R measurement (BASELINE.json metric:
P/R ≥ 0.95 vs the reference tagger).

The reference cannot execute in this environment (spaCy absent —
SURVEY.md preamble), so the golden triple set is hand-derived from the
reference's *frozen semantics* (SEMANTICS.md §1-7, each rule pinned to
reference file:line and cross-checked against its unit tests). The corpus
deliberately hits every semantic branch: multi-sentence docs, linebreaks,
case/diacritics variants, overlapping keywords, emoji, clitics, no-match
docs, multiple languages.
"""

import pytest

from dss_plugin_nlp_analysis_spark.operators.kg import build_triples
from dss_plugin_nlp_analysis_spark.operators.ontology import TagOptions

DOCS = [
    # (url, text, lang)
    ("u1", "Spark engines run fast. The merge sort wins.", "en"),
    ("u2", "new york city has a big subway", "en"),          # overlap: NY vs NYC
    ("u3", "line one\rMERGE SORT here\n\nlast line", "en"),  # linebreaks + case
    ("u4", "the café serves coffee", "en"),            # café NFD composed
    ("u5", "nothing to see here", "en"),
    ("u6", "d'automne les feuilles tombent", "fr"),          # elision
    ("u7", "great demo \U0001F44D today", "en"),             # emoji
    ("u8", "she worked on it. it works now.", "en"),         # lemma forms
]

ONTOLOGY = [
    # (tag, keyword, category)
    ("engine", "engines", "tech"),
    ("msort", "merge sort", "tech"),
    ("nyc", "new york city", "place"),
    ("ny", "new york", "place"),
    ("cafe", "café", "food"),
    ("autumn", "automne", "nature"),
    ("thumb", "👍", "social"),
    ("work", "work", "activity"),
]

# golden (subj, pred, keyword) triples under ignore_case=True,
# lemmatization=True, no category (all-overlaps + last-wins), derived by
# hand from SEMANTICS.md rules:
# - u1: 'engines' (ic→lowercase; lemma engines→engine matches keyword
#        'engines' lemma 'engine'... both sides lemmatized identically),
#        'merge sort'
# - u2: overlapping 'new york city' AND 'new york' both emitted (M1)
# - u3: cleaned linebreaks; 'MERGE SORT' lowercased matches
# - u4: café matches composed form (NFC under lemmatization)
# - u6: d' + automne tokenized by fr elision → 'automne' matches
# - u7: 👍 emoji token matches
# - u8: 'worked'→work, 'works'→work lemma matches (two sentences)
GOLDEN = {
    ("u1", "engine", "engines"),
    ("u1", "msort", "merge sort"),
    ("u2", "nyc", "new york city"),
    ("u2", "ny", "new york"),
    ("u3", "msort", "merge sort"),
    ("u4", "cafe", "café"),
    ("u6", "autumn", "automne"),
    ("u7", "thumb", "👍"),
    ("u8", "work", "worked"),
    ("u8", "work", "works"),
}


def test_triple_precision_recall(spark):
    docs = spark.createDataFrame(DOCS, "url string, text string, lang string")
    onto = spark.createDataFrame(ONTOLOGY, "tag string, keyword string, category string")
    triples = build_triples(
        docs, onto, ts_col=None, category_col=None, canonicalize=False,
        options=TagOptions(ignore_case=True, lemmatization=True),
    ).collect()
    got = {(t["subj"], t["pred"], t["keyword"]) for t in triples}
    tp = len(got & GOLDEN)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(GOLDEN)
    assert precision >= 0.95, f"precision {precision}: extra={sorted(got - GOLDEN)}"
    assert recall >= 0.95, f"recall {recall}: missing={sorted(GOLDEN - got)}"


def test_leftmost_longest_category_golden(spark):
    # category path: u2 must emit ONLY the longest span (nyc)
    docs = spark.createDataFrame(DOCS, "url string, text string, lang string")
    onto = spark.createDataFrame(ONTOLOGY, "tag string, keyword string, category string")
    triples = build_triples(
        docs, onto, ts_col=None, canonicalize=False,
        options=TagOptions(ignore_case=True, lemmatization=True),
    ).collect()
    u2 = {(t["pred"], t["keyword"]) for t in triples if t["subj"] == "u2"}
    assert u2 == {("nyc", "new york city")}
    cats = {t["pred"]: t["category"] for t in triples}
    assert cats.get("msort") == "tech"
