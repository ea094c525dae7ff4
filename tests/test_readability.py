"""readability_scores: hand-computed FK goldens and counting contracts."""

from dss_plugin_nlp_analysis_spark.operators.textstats import readability_scores


def test_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 6 words, 2 sentences, syllables: the=1 cat=1 sat=1 it=1
            # was=1 happy=2 -> 7
            (1, "The cat sat. It was happy!"),
            # no terminator: sentence count floors at 1
            (2, "hello world"),
            # vowel-less word still counts one syllable
            (3, "rhythm."),
            (4, ""),
            (5, None),
        ],
        "id long, text string",
    )
    out = {r["id"]: r.asDict() for r in readability_scores(df, "id", "text").collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 7)
    assert r1["fk_grade_micro"] == (
        390000 * 6 // 2 + 11800000 * 7 // 6 - 15590000
    )
    assert (out[2]["n_sentences"], out[2]["n_syllables"]) == (1, 3)
    assert out[3]["n_syllables"] == 1  # floor, not zero
    for i in (4, 5):
        assert (
            out[i]["n_words"],
            out[i]["n_sentences"],
            out[i]["n_syllables"],
            out[i]["fk_grade_micro"],
        ) == (0, 0, 0, 0)


def test_grade_orders_simple_vs_complex(spark):
    df = spark.createDataFrame(
        [
            (1, "I go. He ran. We sit."),
            (2, "Extraordinarily sophisticated terminological "
                "disambiguation necessitates painstakingly elaborate "
                "methodological considerations."),
        ],
        "id long, text string",
    )
    g = {r["id"]: r["fk_grade_micro"] for r in
         readability_scores(df, "id", "text").collect()}
    assert g[1] < g[2]
