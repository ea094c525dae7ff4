"""bigram_lm_scores: hand-computed stupid-backoff goldens, short-doc and
NULL contracts, self-training default."""

from dss_plugin_nlp_analysis_spark.operators.textstats import bigram_lm_scores


def test_hand_computed_stupid_backoff(spark):
    # train: the cat sat the cat sat on -> uni the=2 cat=2 sat=2 on=1 N=7
    # bigrams: (the,cat)=2 (cat,sat)=2 (sat,the)=1 (sat,on)=1
    train = spark.createDataFrame(
        [(0, "the cat sat the cat sat on")], "id long, text string"
    )
    df = spark.createDataFrame(
        [
            (1, "the cat sat"),   # both bigrams seen: 1e6*2/2 each
            (2, "the cat ran"),   # (cat,ran) unseen, ran OOV -> 0
            (3, "zz on"),         # (zz,on) unseen -> backoff 400000*1/7
            (4, ""),              # empty
            (5, None),            # NULL text
            (6, "cat"),           # single token: no bigrams
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r.asDict()
        for r in bigram_lm_scores(df, "id", "text", train_df=train).collect()
    }
    assert len(out) == 6
    assert out[1]["n_bigrams"] == 2
    assert out[1]["n_backoff"] == 0
    assert out[1]["score_sum_ppm"] == 2_000_000
    assert out[1]["avg_score_ppm"] == 1_000_000
    assert out[2] == {
        "id": 2, "n_bigrams": 2, "n_backoff": 1,
        "score_sum_ppm": 1_000_000, "avg_score_ppm": 500_000,
    }
    # backoff to unigram: floor(400000 * c(on)=1 / N=7) = 57142
    assert out[3]["n_backoff"] == 1
    assert out[3]["score_sum_ppm"] == 400_000 * 1 // 7
    for i in (4, 5, 6):
        assert (
            out[i]["n_bigrams"],
            out[i]["n_backoff"],
            out[i]["score_sum_ppm"],
            out[i]["avg_score_ppm"],
        ) == (0, 0, 0, 0)


def test_self_training_default_has_no_backoff(spark):
    # scoring the training corpus against itself: every bigram is by
    # definition in the count table, so n_backoff must be 0 everywhere
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "x")], "id long, text string"
    )
    rows = bigram_lm_scores(df, "id", "text").collect()
    assert all(r["n_backoff"] == 0 for r in rows)
    assert sum(r["n_bigrams"] for r in rows) == 4
