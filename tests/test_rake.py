"""RAKE keyword extraction (operators/textstats.rake_keywords) — scores
hand-computed per Rose et al. 2010's worked definition (degree/frequency
word scores summed over candidate phrases)."""

from dss_plugin_nlp_analysis_spark.operators.textstats import rake_keywords


def test_rake_classic_example(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox, and a lazy dog in the park.")],
        "doc_id long, text string",
    )
    rows = {r["phrase"]: r for r in rake_keywords(df).collect()}
    assert set(rows) == {"quick brown fox", "lazy dog", "park"}
    assert rows["quick brown fox"]["score_ppm"] == 9_000_000
    assert rows["quick brown fox"]["n_words"] == 3
    assert rows["lazy dog"]["score_ppm"] == 4_000_000
    assert rows["park"]["score_ppm"] == 1_000_000


def test_rake_shared_word_degree(spark):
    df = spark.createDataFrame(
        [(1, "data systems. big data platforms")], "doc_id long, text string"
    )
    rows = {r["phrase"]: r for r in rake_keywords(df).collect()}
    # data: freq 2, degree 2+3=5 → 2_500_000; systems: 2_000_000 ÷1
    assert rows["data systems"]["score_ppm"] == 2_500_000 + 2_000_000
    assert rows["big data platforms"]["score_ppm"] == 2_500_000 + 3_000_000 + 3_000_000


def test_rake_repeat_occurrence_and_cap(spark):
    df = spark.createDataFrame(
        [
            (1, "fast cars! fast cars!"),
            (2, "one two three four five six seven"),  # 7-gram dropped (cap 4)
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = rake_keywords(df).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id.get(1, [])) == 1
    r1 = by_id[1][0]
    assert r1["phrase"] == "fast cars" and r1["n_occurrences"] == 2
    # fast: freq 2 deg 4 → 2e6; cars same → phrase 4e6
    assert r1["score_ppm"] == 4_000_000
    assert 2 not in by_id and 3 not in by_id and 4 not in by_id
