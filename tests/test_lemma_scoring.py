"""Per-language lemmatization scoring (VERDICT r4 item 3): the
reference's 28-language goldens scored per language, plus a pinned
pass-rate floor per model-lemmatizer language (de/en/es/fr/nb/pl/ru) on
a wider regular-morphology fixture. Table reproduced by
scripts/score_lemmas.py; fixture in tests/lemma_fixture.py."""

import pytest

from dss_plugin_nlp_analysis_spark.functions.lemmas import (
    lemma_table,
    lemmatize_tokens,
)
from tests.lemma_fixture import MODEL_LANG_FIXTURE, REFERENCE_GOLDENS


@pytest.mark.parametrize("keyword,language,gold", REFERENCE_GOLDENS)
def test_reference_golden_per_language(keyword, language, gold):
    got = " ".join(lemmatize_tokens(keyword.split(" "), lemma_table(language)))
    assert got == gold


@pytest.mark.parametrize("lang", sorted(MODEL_LANG_FIXTURE))
def test_model_language_pass_rate_floor(lang):
    """Measured round 5: every model language scores 1.0 on the fixture;
    the pinned floor is 0.9 to leave room for fixture growth without
    letting a paradigm regression hide."""
    pairs = MODEL_LANG_FIXTURE[lang]
    table = lemma_table(lang)
    got = lemmatize_tokens([f for f, _ in pairs], table)
    hits = sum(g == gold for g, (_, gold) in zip(got, pairs))
    rate = hits / len(pairs)
    assert len(pairs) >= 16
    assert rate >= 0.9, (
        lang,
        rate,
        [(f, g, gold) for g, (f, gold) in zip(got, pairs) if g != gold],
    )
