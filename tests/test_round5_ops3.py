"""Unit tests for the round-5 session-3 part-2 operators: relation
composition + AMIE rule mining (operators/rules.py), schema.org
microdata extraction (operators/structured.py), and heuristic pronoun
resolution (operators/mentions.py)."""

import pytest
from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.operators.mentions import resolve_pronouns
from dss_plugin_nlp_analysis_spark.operators.rules import (
    amie_rules,
    compose_relations,
)
from dss_plugin_nlp_analysis_spark.operators.structured import (
    extract_microdata,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


# ------------------------------------------------------ compose_relations


def test_compose_counts_distinct_mid_witnesses(spark):
    t = _triples(
        spark,
        [
            ("a", "p", "m1"), ("a", "p", "m2"),
            ("m1", "q", "z"), ("m2", "q", "z"),
            ("m1", "q", "w"),
        ],
    )
    out = {
        (r.x, r.p1, r.p2, r.z): r.n_mids
        for r in compose_relations(t).collect()
    }
    assert out[("a", "p", "q", "z")] == 2  # two distinct mids
    assert out[("a", "p", "q", "w")] == 1


def test_compose_drops_reflexive_and_dedups_triples(spark):
    t = _triples(
        spark,
        [("a", "p", "m"), ("a", "p", "m"), ("m", "q", "a"), ("m", "q", "z")],
    )
    out = [(r.x, r.z) for r in compose_relations(t).collect()]
    assert ("a", "a") not in out
    assert out == [("a", "z")]
    kept = compose_relations(t, drop_reflexive=False).collect()
    # q∘p also composes m -> a -> m once reflexive rows are kept
    assert {(r.x, r.z) for r in kept} == {("a", "a"), ("a", "z"), ("m", "m")}


def test_compose_hub_mid_cap_excludes_hub_entirely(spark):
    rows = [("a", "p", "hub"), ("a", "p", "m")]
    rows += [(f"x{i}", "p", "hub") for i in range(9)]
    rows += [("hub", "q", "z"), ("m", "q", "z")]
    t = _triples(spark, rows)
    out = {
        (r.x, r.z): r.n_mids
        for r in compose_relations(t, max_mid_degree=3).collect()
    }
    # hub has degree 11 > 3: only the m witness survives, and the x_i
    # compositions (hub-only paths) disappear
    assert out == {("a", "z"): 1}


def test_compose_null_components_excluded(spark):
    t = _triples(spark, [("a", "p", None), (None, "q", "z"), ("a", "p", "m"), ("m", "q", "z")])
    assert [(r.x, r.z) for r in compose_relations(t).collect()] == [("a", "z")]


# ------------------------------------------------------------ amie_rules


def test_amie_confidence_exact(spark):
    # body born∘loc: (a,z) (b,z); head nationality asserted only for a
    t = _triples(
        spark,
        [
            ("a", "born", "c1"), ("b", "born", "c2"),
            ("c1", "loc", "z"), ("c2", "loc", "z"),
            ("a", "nat", "z"),
        ],
    )
    out = amie_rules(t, min_support=1, min_conf_ppm=0).collect()
    rules = {(r.p1, r.p2, r.p3): (r.body_size, r.support, r.conf_ppm) for r in out}
    assert rules[("born", "loc", "nat")] == (2, 1, 500_000)


def test_amie_transitivity_head_allowed(spark):
    t = _triples(
        spark,
        [("a", "in", "b"), ("b", "in", "c"), ("a", "in", "c")],
    )
    out = amie_rules(t, min_support=1, min_conf_ppm=0).collect()
    rules = {(r.p1, r.p2, r.p3): r.conf_ppm for r in out}
    assert rules[("in", "in", "in")] == 1_000_000


def test_amie_min_filters(spark):
    t = _triples(
        spark,
        [("a", "born", "c1"), ("c1", "loc", "z"), ("a", "nat", "z")],
    )
    assert amie_rules(t, min_support=2, min_conf_ppm=0).count() == 0
    assert amie_rules(t, min_support=1, min_conf_ppm=0).count() == 1


# ------------------------------------------------------------- microdata


def test_microdata_three_forms_extracted(spark):
    html = (
        '<div itemscope itemtype="https://schema.org/Product">'
        '<meta itemprop="sku" content="S1">'
        '<span itemprop="name">Widget X</span>'
        '<time itemprop="datePublished">2025-03</time></div>'
    )
    df = spark.createDataFrame([(1, html)], "id bigint, html string")
    out = {(r.itemprop, r.value, r.src) for r in extract_microdata(df, "id", "html").collect()}
    assert out == {
        ("@type", "Product", "type"),
        ("sku", "S1", "attr"),
        ("name", "Widget X", "text"),
        ("datePublished", "2025-03", "text"),
    }


def test_microdata_plain_page_and_null_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "<html><p>no microdata</p></html>"), (2, None)],
        "id bigint, html string",
    )
    assert extract_microdata(df, "id", "html").count() == 0


# ------------------------------------------------------- resolve_pronouns


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id bigint, text string")


def test_pronouns_resolve_to_nearest_preceding_entity(spark):
    df = _docs(spark, [(1, "Alpha arrived then he met Beta and she smiled")])
    out = {
        r.pronoun: (r.antecedent, r.pronoun_idx, r.antecedent_idx)
        for r in resolve_pronouns(df, "id", "text", ["alpha", "beta"]).collect()
    }
    assert out["he"] == ("alpha", 4, 1)
    assert out["she"] == ("beta", 8, 6)


def test_pronouns_window_cut_yields_null(spark):
    filler = " ".join(["word"] * 30)
    df = _docs(spark, [(1, f"alpha {filler} then he spoke")])
    r = resolve_pronouns(df, "id", "text", ["alpha"], max_distance=10).collect()[0]
    assert r.pronoun == "he" and r.antecedent is None and r.antecedent_idx is None


def test_pronouns_no_entity_before_is_null(spark):
    df = _docs(spark, [(1, "he spoke before alpha arrived")])
    r = resolve_pronouns(df, "id", "text", ["alpha"]).collect()[0]
    assert r.antecedent is None


def test_pronouns_validation(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="entities"):
        resolve_pronouns(df, "id", "text", [])
    with pytest.raises(ValueError, match="max_distance"):
        resolve_pronouns(df, "id", "text", ["a"], max_distance=0)


def test_pronouns_docs_without_pronouns_emit_nothing(spark):
    df = _docs(spark, [(1, "alpha met beta"), (2, ""), (3, None)])
    assert resolve_pronouns(df, "id", "text", ["alpha"]).count() == 0


# ---------------------------------------------------------- mirror_domains


def test_mirror_domains_detects_and_caps(spark):
    from dss_plugin_nlp_analysis_spark.operators.url import mirror_domains

    rows = []
    for i in range(6):
        rows.append(("a.com", f"page {i}"))
        rows.append(("b.com", f"page {i}"))  # full mirror of a.com
    rows.append(("b.com", "b only"))
    rows.append(("c.com", "unrelated"))
    # a template every domain serves: must not create pairs at cap 2
    for dom in ("a.com", "b.com", "c.com", "d.com"):
        rows.append((dom, "shared template"))
    df = spark.createDataFrame(rows, "domain string, text string")
    out = mirror_domains(df, "domain", "text", min_shared=2, max_fp_domains=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.domain_a, r.domain_b, r.shared) == ("a.com", "b.com", 6)
    # template fp excluded from sizes too: a=6 not 7, b=7 not 8
    assert (r.n_a, r.n_b) == (6, 7)
    assert r.overlap_ppm == 1_000_000  # a.com fully contained


def test_mirror_domains_normalization_and_validation(spark):
    from dss_plugin_nlp_analysis_spark.operators.url import mirror_domains

    df = spark.createDataFrame(
        [("x.com", "Hello  World"), ("y.com", "hello world"), (None, "hello world")],
        "domain string, text string",
    )
    out = mirror_domains(df, "domain", "text", min_shared=1).collect()
    assert [(r.domain_a, r.domain_b) for r in out] == [("x.com", "y.com")]
    with pytest.raises(ValueError, match="min_shared"):
        mirror_domains(df, "domain", "text", min_shared=0)


# ------------------------------------------------------- translation_pairs


def test_translation_pairs_filters_and_collapses(spark):
    from dss_plugin_nlp_analysis_spark.operators.url import translation_pairs

    pages = spark.createDataFrame(
        [
            ("u1", "en", 100), ("u2", "de", 120),   # good pair
            ("u3", "en", 100), ("u4", "en", 100),   # same lang -> dropped
            ("u5", "en", 100), ("u6", "fr", 500),   # ratio 500 -> dropped
            ("u7", "en", 0),   ("u8", "es", 50),    # zero length -> dropped
        ],
        "url string, lang string, n_tokens int",
    )
    alts = spark.createDataFrame(
        [
            ("u1", "x", "u2"), ("u2", "x", "u1"),  # bidirectional -> one row
            ("u3", "x", "u4"),
            ("u5", "x", "u6"),
            ("u7", "x", "u8"),
        ],
        "id string, hreflang string, href string",
    )
    out = translation_pairs(pages, alts)
    rows = out.collect()
    assert [(r.url_a, r.url_b, r.lang_a, r.lang_b, r.len_ratio_pct) for r in rows] == [
        ("u1", "u2", "en", "de", 120)
    ]
    with pytest.raises(ValueError, match="max_len_ratio_pct"):
        translation_pairs(pages, alts, max_len_ratio_pct=50)
