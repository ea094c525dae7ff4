"""C4-style cleaning operators: line/page filters + corpus-global line
dedup (operators/webclean.py)."""

from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.operators.webclean import (
    c4_line_filter,
    line_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_filter_semantics(spark):
    rows = [
        # kept: both lines end in '.', >= 3 words
        (1, "alpha beta gamma delta.\nepsilon zeta eta theta."),
        # line 2 lacks terminal punct -> dropped; only 1 sentence -> page dropped
        (2, "alpha beta gamma delta.\nepsilon zeta eta theta"),
        # short line dropped by word count even with punct
        (3, "one two.\nalpha beta gamma delta.\nepsilon zeta eta theta!"),
        (4, "this page has lorem ipsum inside. plus words galore here.\nmore of the same thing here."),
        (5, "curly brace { page with words one.\ntwo three four five six."),
        (6, ""),
        (7, None),
    ]
    out = {
        r["id"]: r
        for r in c4_line_filter(
            _docs(spark, rows), "doc_id", "text",
            min_words_per_line=3, min_sentences=2,
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma delta.\nepsilon zeta eta theta."
    assert (out[1]["n_lines"], out[1]["n_kept"], out[1]["n_sentences"]) == (2, 2, 2)
    assert out[1]["page_kept"] is True
    assert out[2]["n_kept"] == 1 and out[2]["page_kept"] is False
    assert out[3]["clean_text"].count("\n") == 1 and out[3]["n_kept"] == 2
    assert out[3]["page_kept"] is True
    assert out[4]["page_kept"] is False  # lorem ipsum marker
    assert out[5]["page_kept"] is False  # '{' marker
    for empty_id in (6, 7):
        r = out[empty_id]
        assert (r["clean_text"], r["n_lines"], r["page_kept"]) == ("", 0, False)


def test_c4_line_filter_is_pure_map(spark):
    df = _docs(spark, [(1, "a b c.\nd e f.")])
    plan = (
        c4_line_filter(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # 100 TB shape: zero shuffle


def test_line_dedup_first_occurrence_wins(spark):
    rows = [
        (1, "shared line\nunique one"),
        (2, "shared line\nunique two"),   # loses 'shared line' to doc 1
        (3, "unique three\nshared line"), # also loses it, keeps position order
        (4, "shared line"),               # loses its only line -> ''
        (5, None),
    ]
    out = {
        r["id"]: r["clean_text"]
        for r in line_dedup(_docs(spark, rows), "doc_id", "text").collect()
    }
    assert out == {
        1: "shared line\nunique one",
        2: "unique two",
        3: "unique three",
        4: "",
        5: "",
    }


def test_line_dedup_within_doc_repeats(spark):
    # a line repeated INSIDE one doc also collapses to its first position
    out = line_dedup(
        _docs(spark, [(1, "x y z\nx y z\nother line")]), "doc_id", "text"
    ).collect()
    assert out[0]["clean_text"] == "x y z\nother line"


def test_line_dedup_plan_uses_aggregate_not_window(spark):
    # the global first-occurrence pass must be a map-side-combinable
    # groupBy(min), never a window buffering a hot line's whole group
    df = _docs(spark, [(1, "a\nb"), (2, "a\nc")])
    plan = (
        line_dedup(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_unigram_lm_scores_values_and_plan(spark):
    import math

    from dss_plugin_nlp_analysis_spark.operators.textstats import (
        unigram_lm_scores,
    )

    freqs = {"the": 90, "cat": 10}  # total 100
    df = spark.createDataFrame(
        [(1, "the cat"), (2, "the zzz"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in unigram_lm_scores(df, "doc_id", "text", freqs).collect()}
    c_the = int(round(-math.log(90 / 100) * 1e6))
    c_cat = int(round(-math.log(10 / 100) * 1e6))
    c_oov = int(round(math.log(100) * 1e6))
    assert out[1]["nll_micro"] == c_the + c_cat and out[1]["n_oov"] == 0
    assert out[2]["nll_micro"] == c_the + c_oov and out[2]["n_oov"] == 1
    # Spark F.round is HALF_UP (Python round is banker's): mirror it
    expected = math.floor((c_the + c_oov) / 2 / 1e6 * 1e6 + 0.5) / 1e6
    assert out[2]["avg_nll"] == expected
    for empty_id in (3, 4):
        r = out[empty_id]
        assert (r["n_tokens"], r["n_oov"], r["nll_micro"], r["avg_nll"]) == (0, 0, 0, 0.0)
    # LM scoring is a filter-stage op: must stay a pure map at 100 TB
    plan = (
        unigram_lm_scores(df, "doc_id", "text", freqs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_line_dedup_int_ids_no_overflow(spark):
    # IntegerType id columns must work at any magnitude (the former
    # id*1e6+pos ord encoding hit ANSI ARITHMETIC_OVERFLOW at id >= 2148;
    # min(struct(id, pos)) has no such limit)
    df = spark.createDataFrame(
        [(2, "shared line"), (3000, "shared line\nkeep me")],
        "doc_id int, text string",
    )
    out = {r["id"]: r["clean_text"] for r in line_dedup(df, "doc_id", "text").collect()}
    assert out == {2: "shared line", 3000: "keep me"}


def test_line_dedup_string_ids(spark):
    # string doc ids (urls — standard in web corpora): the former numeric
    # ord packing cast them to NULL and silently emptied EVERY document;
    # min(struct(id, pos)) orders by the id column's own type
    df = spark.createDataFrame(
        [
            ("http://a.example/1", "shared line\nunique one"),
            ("http://b.example/2", "shared line\nunique two"),
            ("http://a.example/0", "late but lexicographically first\nshared line"),
        ],
        "doc_id string, text string",
    )
    out = {r["id"]: r["clean_text"] for r in line_dedup(df, "doc_id", "text").collect()}
    # 'shared line' survives only in the lexicographically-smallest url
    assert out == {
        "http://a.example/0": "late but lexicographically first\nshared line",
        "http://a.example/1": "unique one",
        "http://b.example/2": "unique two",
    }


def test_c4_word_count_ignores_whitespace_runs(spark):
    # 'a\t\tb  c  .' must NOT pass min_words_per_line=5: runs of
    # whitespace split into empty tokens which are filtered, not counted
    df = _docs(spark, [(1, "a\t\tb  c  .\nreal words one two three.")])
    out = c4_line_filter(df, "doc_id", "text", min_words_per_line=5).collect()[0]
    assert out["clean_text"] == "real words one two three."
    assert out["n_kept"] == 1


def test_winnow_fingerprints_invariants(spark):
    from dss_plugin_nlp_analysis_spark.operators.textstats import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = window+k-1
    df = spark.createDataFrame(
        [
            (1, f"{shared} one two three"),
            (2, f"zero {shared} nine"),   # same 6-token run, shifted
            (3, "tiny doc"),              # < k tokens: 0 grams
            (4, "just four little words"),  # 2 grams < window: 1 global min
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in winnow_fingerprints(df, "doc_id", "text", k=3, window=4).collect()}
    # winnowing guarantee: a shared run of >= window+k-1 tokens yields a
    # shared fingerprint
    assert set(out[1]["fingerprints"]) & set(out[2]["fingerprints"])
    assert out[3]["n_fingerprints"] == 0
    assert out[4]["n_fingerprints"] == 1
    for empty_id in (5, 6):
        assert out[empty_id]["n_fingerprints"] == 0
    # sorted distinct, and never more fingerprints than windows
    fp1 = out[1]["fingerprints"]
    assert fp1 == sorted(set(fp1)) and len(fp1) <= 9 - 3  # 9 tokens -> 7 grams -> 4 windows... bound loose
    # pure map
    plan = (
        winnow_fingerprints(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_tfidf_top_terms_hand_values(spark):
    import math

    from dss_plugin_nlp_analysis_spark.operators.textstats import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry cherry")],
        "doc_id long, text string",
    )
    out = {}
    for r in tfidf_top_terms(df, "doc_id", "text", k=2).collect():
        out.setdefault(r["id"], []).append((r["rank"], r["token"], r["tf"], r["dfc"], r["score_micro"]))
    i3 = int(round(math.log(3 / 1) * 1e6))   # df=1
    i32 = int(round(math.log(3 / 2) * 1e6))  # df=2
    assert sorted(out[1]) == [(1, "apple", 2, 1, 2 * i3), (2, "banana", 1, 2, i32)]
    # doc 2: equal scores -> tie broken by token ascending
    assert sorted(out[2]) == [(1, "banana", 1, 2, i32), (2, "cherry", 1, 2, i32)]
    assert sorted(out[3]) == [(1, "cherry", 3, 2, 3 * i32)]


def test_anchor_text_index_counts_and_cap(spark):
    from dss_plugin_nlp_analysis_spark.operators.url import anchor_text_index

    import pytest
    from pyspark.sql import functions as F  # noqa: F811

    rows = [
        ("/a", "home"), ("/a", "home"), ("/a", "start"),
        ("/b", "x1"), ("/b", "x2"), ("/b", "x3"),
        ("/c", "only"),
    ]
    links = spark.createDataFrame(rows, "href string, anchor_text string")
    got = {
        r["target"]: (r["n_links"], r["n_texts"], r["anchor_texts"])
        for r in anchor_text_index(links, max_distinct_texts=2).collect()
    }
    # /a: 3 links, 2 distinct texts -> sorted JSON list
    assert got["/a"] == (3, 2, '["home","start"]')
    # /b: 3 distinct texts > cap -> counts kept, list suppressed
    assert got["/b"] == (3, 3, None)
    assert got["/c"] == (1, 1, '["only"]')
    with pytest.raises(ValueError):
        anchor_text_index(links, max_distinct_texts=0)


def test_anchor_text_index_drops_null_targets(spark):
    from dss_plugin_nlp_analysis_spark.operators.url import anchor_text_index

    links = spark.createDataFrame(
        [(None, "ghost"), ("/a", "x")], "href string, anchor_text string"
    )
    got = {r["target"] for r in anchor_text_index(links).collect()}
    assert got == {"/a"}  # NULL target dropped by contract, not silently
