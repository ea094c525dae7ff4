"""Score the lemmatizer per language: the reference's 28 golden pairs
(one per language) plus a wider regular-morphology fixture for the seven
model-lemmatizer languages (de/en/es/fr/nb/pl/ru). Prints one JSON line
with the per-language table. Fixture: tests/lemma_fixture.py.

Usage: python scripts/score_lemmas.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dss_plugin_nlp_analysis_spark.functions.lemmas import (
    lemma_table,
    lemmatize_tokens,
)
from tests.lemma_fixture import MODEL_LANG_FIXTURE, REFERENCE_GOLDENS


def score_reference_goldens() -> dict[str, bool]:
    out: dict[str, bool] = {}
    for keyword, lang, gold in REFERENCE_GOLDENS:
        table = lemma_table(lang)
        got = " ".join(lemmatize_tokens(keyword.split(" "), table))
        out[lang] = got == gold
    return out

def score_model_langs() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for lang, pairs in sorted(MODEL_LANG_FIXTURE.items()):
        table = lemma_table(lang)
        forms = [f for f, _ in pairs]
        got = lemmatize_tokens(forms, table)
        misses = [
            {"form": f, "got": g, "gold": gold}
            for (f, gold), g in zip(pairs, got)
            if g != gold
        ]
        out[lang] = {
            "n": len(pairs),
            "hits": len(pairs) - len(misses),
            "rate": round((len(pairs) - len(misses)) / len(pairs), 4),
            "misses": misses,
        }
    return out


def main() -> None:
    ref = score_reference_goldens()
    model = score_model_langs()
    print(
        json.dumps(
            {
                "reference_goldens_pass": sum(ref.values()),
                "reference_goldens_total": len(ref),
                "reference_goldens_by_lang": ref,
                "model_language_scores": model,
            },
            ensure_ascii=False,
        )
    )


if __name__ == "__main__":
    main()
