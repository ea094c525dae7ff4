"""Text cleaning + normalization kernels (pure Python, UDF-side).

Behavioral spec: SEMANTICS.md §1-2. Reference behaviors re-derived from
/root/reference python-lib/nlp/sentence_splitter.py:39-44 (linebreaks),
python-lib/nlp/utils.py:12-14,49-67 (case / unicode lattice),
python-lib/nlp/ontology_tagging/ontology_tagger.py:86 (_use_nfc rule).
"""

from __future__ import annotations

import unicodedata

__all__ = [
    "clean_linebreaks",
    "normalize_text",
    "use_nfc",
]


def clean_linebreaks(text: str | None) -> str:
    """Strip each line, drop falsy (empty) lines, rejoin with ``\\n``.

    Mirrors sentence_splitter.py:39-44 exactly, including the wart that a
    line of only spaces survives the falsy filter and strips to ``""``.
    ``None`` is treated as empty text (sentence_splitter.py:54-57).
    """
    if not text:
        return ""
    lines = text.splitlines()
    if len(lines) == 1:  # dominant single-line case: no list/join churn
        return lines[0].strip()
    kept = [line.strip() for line in lines if line]
    return "\n".join(kept)


def use_nfc(lemmatization: bool, ignore_diacritics: bool) -> bool:
    """NFC iff lemmatizing without diacritic-stripping (ontology_tagger.py:86)."""
    return bool(lemmatization and not ignore_diacritics)


def normalize_text(
    text: str,
    ignore_case: bool = False,
    lemmatization: bool = False,
    ignore_diacritics: bool = False,
) -> str:
    """Apply the reference's normalization lattice (SEMANTICS.md §2).

    Order: optional lowercase → NFC/NFD unicode normalization → optional
    combining-mark removal (nlp/utils.py:49-67).
    """
    if ignore_case:
        text = text.lower()
    if text.isascii():
        # NFC/NFD are identity on ASCII and ASCII has no combining marks —
        # the dominant web-text fast path
        return text
    form = "NFC" if use_nfc(lemmatization, ignore_diacritics) else "NFD"
    text = unicodedata.normalize(form, text)
    if ignore_diacritics:
        text = "".join(ch for ch in text if not unicodedata.combining(ch))
    return text
