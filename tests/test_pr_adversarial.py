"""Measured precision/recall vs reference-tagger semantics on the
adversarial multilingual corpus (tests/pr_corpus.py) — the BASELINE.json
"Triple-extraction P/R ≥ 0.95" target as an actual number.

scripts/measure_pr.py prints the same figure as a JSON artifact; the
measured value is recorded in BENCH.md / BASELINE.md per round.
"""

from tests.pr_corpus import SCENARIOS, score_scenarios


def test_adversarial_pr_meets_baseline(spark):
    result = score_scenarios(spark)
    detail = {
        k: v
        for k, v in result["per_scenario"].items()
        if v["extra"] or v["missing"]
    }
    assert result["precision"] >= 0.95, (result["precision"], detail)
    assert result["recall"] >= 0.95, (result["recall"], detail)
    # the corpus must stay adversarial-sized, not shrink to a smoke test
    assert result["n_golden"] >= 45
    assert result["n_scenarios"] == len(SCENARIOS) >= 12
