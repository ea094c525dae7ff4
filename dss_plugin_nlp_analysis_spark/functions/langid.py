"""Character n-gram language identification (UDF-side heuristic).

Tiny frozen trigram profiles for web-text languages (derived from the
sample phrases this repo generates — no external data). Scoring: overlap
count between the document's trigram set and each profile, normalized by
profile size; deterministic tiebreak by language code. 'xx' when nothing
scores. For the shuffle-free native variant see operators/textstats.py.
"""

from __future__ import annotations

__all__ = ["detect_language", "trigrams"]

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the he_ _th ing _an and _of of_ ion _in ed_ _to ent _is er_".split()
    ),
    "fr": frozenset(
        "es_ _de de_ le_ _le la_ _la ent ait _et les ur_ une ais on_".split()
    ),
    "es": frozenset(
        "os_ _de de_ la_ _la el_ _el as_ que _qu ión ado _lo con".split()
    ),
    "de": frozenset(
        "en_ _de der ie_ die und _un sch ein ich cht ung _ei ver".split()
    ),
    "zh": frozenset(),  # CJK handled by script detection below
}


def trigrams(text: str) -> set[str]:
    t = "_" + text.lower().replace(" ", "_") + "_"
    return {t[i:i + 3] for i in range(len(t) - 2)}


def detect_language(text: str | None) -> str:
    if not text:
        return "xx"
    # script shortcut: CJK-dominated text
    cjk = sum(1 for c in text if 0x4E00 <= ord(c) <= 0x9FFF or 0x3040 <= ord(c) <= 0x30FF)
    if cjk > len(text) * 0.25:
        return "zh" if not any(0x3040 <= ord(c) <= 0x30FF for c in text) else "ja"
    grams = trigrams(text)
    best_lang, best_score = "xx", 0.0
    for lang in sorted(_PROFILES):
        prof = _PROFILES[lang]
        if not prof:
            continue
        score = len(grams & prof) / len(prof)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0.05 else "xx"
