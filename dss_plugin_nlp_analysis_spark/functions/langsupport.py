"""Supported-language surface (SURVEY.md §2.2 P8).

The reference supports 59 ISO 639-1 codes (python-lib/nlp/language_support.py:4-64
— spaCy's public language list minus Korean); unsupported codes raise at
config-validation time (dku_plugin_config_loading.py:153-159) and at
tokenizer creation (spacy_tokenizer.py:384-388).
"""

from __future__ import annotations

__all__ = ["SUPPORTED_LANGUAGES", "is_supported", "validate_languages"]

SUPPORTED_LANGUAGES = frozenset(
    "af ar bg bn ca cs da de el en es et eu fa fi fr ga gu he hi hr hu hy id "
    "is it ja kn lb lt lv mk ml mr nb ne nl pl pt ro ru sa si sk sl sq sr sv "
    "ta te th tl tr tt uk ur vi yo zh".split()
)


def is_supported(lang: str | None) -> bool:
    return bool(lang) and lang in SUPPORTED_LANGUAGES


def validate_languages(languages: list[str], skip_unknown: bool = False) -> list[str]:
    """Return the supported subset; raise on unsupported codes unless
    ``skip_unknown`` (reference raises — web-scale builds skip+count)."""
    bad = [l for l in languages if not is_supported(l)]
    if bad and not skip_unknown:
        raise ValueError(f"Unsupported language code(s): {sorted(bad)}")
    return [l for l in languages if l in SUPPORTED_LANGUAGES]
