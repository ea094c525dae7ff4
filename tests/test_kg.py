"""KG materialization tests: triples, canonicalization, entity linking,
checkpoint resumability (SEMANTICS.md §8, north rule)."""

import pytest

from dss_plugin_nlp_analysis_spark.functions.html_text import extract_text
from dss_plugin_nlp_analysis_spark.operators.kg import build_triples, canonical_map
from dss_plugin_nlp_analysis_spark.operators.ontology import TagOptions
from dss_plugin_nlp_analysis_spark.sources.webpages import (
    demo_kg_ontology,
    generate_pages,
    pages_df,
)


def test_canonical_map_unions_by_shared_keyword():
    rows = [
        ("nyc", "new york", None),
        ("new_york_city", "new york", None),
        ("paris", "paris", None),
    ]
    cmap = canonical_map(rows)
    assert cmap["nyc"] == cmap["new_york_city"] == "new_york_city"  # min tag
    assert cmap["paris"] == "paris"


def test_canonical_map_case_insensitive_aliases():
    rows = [("a_tag", "Engine", None), ("b_tag", "engine", None)]
    cmap = canonical_map(rows)
    assert cmap["a_tag"] == cmap["b_tag"] == "a_tag"


def test_pages_corpus_text_invariant():
    # FIXTURES.md §1: text == extract_text(html) byte-for-byte per url
    for url, _ts, html, text, _lang in generate_pages(200, seed=42):
        if html is None:
            assert text is None
        else:
            assert extract_text(html) == text, url


def test_pages_corpus_deterministic():
    assert generate_pages(50, seed=42) == generate_pages(50, seed=42)


def test_build_triples_end_to_end(spark):
    docs = pages_df(spark, 120, seed=42)
    onto = demo_kg_ontology(spark)
    triples = build_triples(docs, onto).collect()
    assert len(triples) > 0
    preds = {t["pred"] for t in triples}
    assert "spark_engine" in preds
    t0 = triples[0]
    assert t0["subj"].startswith("https://")
    assert t0["sentence"] is not None and t0["keyword"] is not None
    # canonicalization: spark_engine and analytics_engine share keyword
    # 'engine' → both map to the min tag
    for t in triples:
        if t["pred"] in ("spark_engine", "analytics_engine"):
            assert t["obj"] == "analytics_engine"


def test_build_triples_unsupported_lang_skipped(spark):
    docs = pages_df(spark, 200, seed=42)
    onto = demo_kg_ontology(spark)
    langs = {t["lang"] for t in build_triples(docs, onto).collect()}
    assert "xx" not in langs  # skip_unknown default for KG builds


def test_entity_linking_context_scoring(spark):
    # ambiguous keyword 'bank': river_bank's other keyword 'river' appears
    # in context → linking resolves to river_bank; default resolves to the
    # last ontology row (dict-overwrite reference rule)
    onto_rows = [
        ("river_bank", "bank", None),
        ("river_bank", "river", None),
        ("money_bank", "bank", None),
        ("money_bank", "money", None),
    ]
    onto = spark.createDataFrame(onto_rows, "tag string, keyword string, category string")
    docs = spark.createDataFrame(
        [("u1", "the river flows past the bank", "en")],
        "url string, text string, lang string",
    )
    linked = build_triples(
        docs, onto, ts_col=None, category_col=None,
        options=TagOptions(link_entities=True), canonicalize=False,
    ).collect()
    by_kw = {t["keyword"]: t["pred"] for t in linked}
    assert by_kw["bank"] == "river_bank"
    # default (no linking): no-category path → last ontology row wins
    unlinked = build_triples(
        docs, onto, ts_col=None, category_col=None, canonicalize=False
    ).collect()
    assert {t["pred"] for t in unlinked if t["keyword"] == "bank"} == {"money_bank"}
    # category path (EntityRuler): first ontology row wins
    with_cat = build_triples(docs, onto, ts_col=None, canonicalize=False).collect()
    assert {t["pred"] for t in with_cat if t["keyword"] == "bank"} == {"river_bank"}


def test_entity_linking_tie_and_sentence_scope(spark):
    # driver-gate semantics (tag_match_linked): ties go to the FIRST-added
    # candidate, and the context window is the containing SENTENCE — a
    # profile token in a different sentence does not count
    from dss_plugin_nlp_analysis_spark.operators.tagger import tag_documents

    onto = spark.createDataFrame(
        [
            ("river_bank", "bank"),
            ("money_bank", "bank"),
            ("river_bank", "river"),
            ("money_bank", "money"),
        ],
        "tag string, keyword string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the bank is steep", "en"),          # no profile token: tie → first added
            (2, "the bank is steep. money talks.", "en"),  # 'money' in OTHER sentence → still tie
            (3, "money sits in the bank", "en"),      # same-sentence 'money' → money_bank
        ],
        "doc_id int, text string, lang string",
    )
    out = tag_documents(
        docs, onto, text_col="text", lang_col="lang",
        options=TagOptions(link_entities=True),
    )
    got = {
        r["doc_id"]: r["tag"]
        for r in out.collect()
        if r["tag_keyword"] == "bank"
    }
    assert got == {1: "river_bank", 2: "river_bank", 3: "money_bank"}


def test_checkpointed_build_resumes(spark, tmp_path):
    from dss_plugin_nlp_analysis_spark.plans.checkpoint import (
        read_manifest,
        run_checkpointed_build,
    )

    docs = pages_df(spark, 100, seed=42)
    onto = demo_kg_ontology(spark)

    def triple_fn(part):
        return build_triples(part, onto, languages=["en", "fr", "es", "de"])

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    r1 = run_checkpointed_build(
        spark, docs, triple_fn, out, ckpt, num_buckets=4, buckets_per_job=2
    )
    assert sorted(r1.processed_buckets) == [0, 1, 2, 3]
    m = read_manifest(spark, ckpt).collect()
    assert len(m) == 4
    assert sum(r["input_rows"] for r in m) == 100
    # second run: everything skipped
    r2 = run_checkpointed_build(
        spark, docs, triple_fn, out, ckpt, num_buckets=4, buckets_per_job=2
    )
    assert r2.processed_buckets == []
    assert r2.skipped_buckets == [0, 1, 2, 3]
    # output is complete and readable
    total = spark.read.parquet(out).count()
    assert total == r1.total_triples > 0


def test_canonical_map_transitive_chain():
    # A—kw1—B, B—kw2—C: union-find must merge the whole chain
    rows = [
        ("a_tag", "kw1", None),
        ("b_tag", "kw1", None),
        ("b_tag", "kw2", None),
        ("c_tag", "kw2", None),
        ("d_tag", "kw9", None),
    ]
    cmap = canonical_map(rows)
    assert cmap["a_tag"] == cmap["b_tag"] == cmap["c_tag"] == "a_tag"
    assert cmap["d_tag"] == "d_tag"


def test_connected_components_matches_union_find(spark):
    import random

    import pyspark.sql.functions as F

    from dss_plugin_nlp_analysis_spark.operators.components import (
        connected_components,
    )

    random.seed(5)
    edges = [(random.randint(0, 60), random.randint(0, 60)) for _ in range(80)]
    edges += [(100 + i, 100 + i + 1) for i in range(12)]  # a 13-node chain
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=30).collect()}

    # reference: driver-side union-find over the same edges
    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    expected = {n: min(ns) for r, ns in comp.items() for n in ns}
    assert got == expected
    # the chain collapses to one component labeled by its minimum node
    assert all(got[100 + i] == 100 for i in range(13))


# --- triple_history / tag_cooccurrence / negative_samples -----------------


def _triples_fixture(spark):
    import datetime as dt

    def ts(d):
        return dt.datetime(2026, 1, d)

    rows = [
        # (subj, pred, obj, warc_ts) — u1's (p, X) fact seen in 3 crawls
        ("u1", "p", "X", ts(1)),
        ("u1", "p", "X", ts(2)),
        ("u1", "p", "X", ts(2)),   # second mention in the same crawl
        ("u1", "q", "Y", ts(2)),
        ("u2", "p", "X", ts(3)),
        ("u2", "q", "Z", ts(3)),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, warc_ts timestamp"
    )


def test_triple_history(spark):
    import datetime as dt

    from dss_plugin_nlp_analysis_spark.operators.kg import triple_history

    got = {
        (r["subj"], r["pred"], r["obj"]): (
            r["first_seen"], r["last_seen"], r["n_snapshots"], r["n_mentions"]
        )
        for r in triple_history(_triples_fixture(spark)).collect()
    }
    d = lambda x: dt.datetime(2026, 1, x)
    assert got[("u1", "p", "X")] == (d(1), d(2), 2, 3)
    assert got[("u1", "q", "Y")] == (d(2), d(2), 1, 1)
    assert got[("u2", "p", "X")] == (d(3), d(3), 1, 1)
    assert len(got) == 4


def test_tag_cooccurrence(spark):
    from dss_plugin_nlp_analysis_spark.operators.kg import tag_cooccurrence

    got = {
        (r["obj_a"], r["obj_b"]): r["n_docs"]
        for r in tag_cooccurrence(_triples_fixture(spark)).collect()
    }
    # u1 mentions {X, Y}; u2 mentions {X, Z} — repeat mentions collapse
    assert got == {("X", "Y"): 1, ("X", "Z"): 1}
    from dss_plugin_nlp_analysis_spark.operators.kg import tag_cooccurrence as tc
    assert tc(_triples_fixture(spark), min_count=2).count() == 0


def test_negative_samples_deterministic_and_valid(spark):
    import hashlib

    from dss_plugin_nlp_analysis_spark.operators.kg import negative_samples

    t = _triples_fixture(spark)
    out1 = sorted(tuple(r) for r in negative_samples(t, n_per=3, seed="s").collect())
    out2 = sorted(tuple(r) for r in negative_samples(t, n_per=3, seed="s").collect())
    assert out1 == out2  # pure function of the triple — retry-stable

    ents = sorted({"X", "Y", "Z"})
    positives = {("u1", "p", "X"), ("u1", "q", "Y"), ("u2", "p", "X"),
                 ("u2", "q", "Z")}
    expected = []
    for s, p, o in sorted(positives):
        for i in range(3):
            key = f"s|{i}|{s}|{p}|{o}"
            idx = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % len(ents)
            neg = ents[idx]
            if neg != o:
                expected.append((s, p, o, neg, i))
    assert out1 == sorted(expected)
    assert all(r[3] != r[2] for r in out1)


def test_negative_samples_rejects_degenerate(spark):
    from dss_plugin_nlp_analysis_spark.operators.kg import negative_samples

    t = _triples_fixture(spark)
    with pytest.raises(ValueError):
        negative_samples(t, n_per=0)
    one = spark.createDataFrame(
        [("u", "p", "X", None)],
        "subj string, pred string, obj string, warc_ts timestamp",
    )
    with pytest.raises(ValueError):
        negative_samples(one)


def test_entity_salience(spark):
    from dss_plugin_nlp_analysis_spark.operators.kg import entity_salience

    rows = [
        ("u1", "X", 0), ("u1", "X", 1), ("u1", "X", 1), ("u1", "Y", 2),
        ("u2", "Z", 5),
    ]
    t = spark.createDataFrame(rows, "subj string, obj string, sent_idx int")
    got = {
        (r["subj"], r["obj"]): (
            r["n_mentions"], r["first_sent_idx"], r["salience_micro"]
        )
        for r in entity_salience(t).collect()
    }
    assert got[("u1", "X")] == (3, 0, 750000)
    assert got[("u1", "Y")] == (1, 2, 250000)
    assert got[("u2", "Z")] == (1, 5, 1000000)


def test_negative_samples_excludes_null_component_triples(spark):
    from dss_plugin_nlp_analysis_spark.operators.kg import negative_samples

    rows = [
        ("u1", "p", "X", None), ("u1", "p", "Y", None),
        ("u2", None, "X", None),          # NULL pred: excluded
        (None, "p", "Y", None),           # NULL subj: excluded
        ("u3", "p", None, None),          # NULL obj: excluded + not in vocab
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, warc_ts timestamp"
    )
    out = negative_samples(t, n_per=1, seed="s").collect()
    assert all(r["subj"] in ("u1",) for r in out)
    assert all(r["neg_obj"] in ("X", "Y") for r in out)


def test_triple_delta(spark):
    from dss_plugin_nlp_analysis_spark.operators.kg import triple_delta

    old = spark.createDataFrame(
        [("u1", "p", "X"), ("u1", "p", "X"), ("u2", "q", "Y")],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [("u1", "p", "X"), ("u3", "p", "Z")],
        "subj string, pred string, obj string",
    )
    got = {
        (r["subj"], r["pred"], r["obj"]): r["status"]
        for r in triple_delta(old, new).collect()
    }
    assert got == {
        ("u1", "p", "X"): "same",     # dup mentions collapse first
        ("u2", "q", "Y"): "removed",
        ("u3", "p", "Z"): "added",
    }


def test_attribute_triples(spark):
    from dss_plugin_nlp_analysis_spark.operators.kg import attribute_triples

    docs = [
        (1, "title: Example Page\nprose line without marker\nlang: en"),
        (2, "x: a: b\n: missing key\nkey only:\nok: v"),
        (3, None),
        (4, "no colons at all"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = sorted(
        (r["subj"], r["line_idx"], r["key"], r["value"])
        for r in attribute_triples(df, "id", "text").collect()
    )
    assert got == [
        (1, 0, "title", "Example Page"),
        (1, 2, "lang", "en"),
        # first ': ' splits — value keeps the rest verbatim
        (2, 0, "x", "a: b"),
        (2, 3, "ok", "v"),
    ]


def test_triple_delta_null_components_excluded(spark):
    from dss_plugin_nlp_analysis_spark.operators.kg import triple_delta

    old = spark.createDataFrame(
        [(None, "p", "X"), ("u1", "p", "X")],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [(None, "p", "X"), ("u1", "p", "X")],
        "subj string, pred string, obj string",
    )
    rows = triple_delta(old, new).collect()
    # the NULL-keyed fact must not surface as a contradictory
    # added+removed pair — it is excluded by contract
    assert [(r["subj"], r["status"]) for r in rows] == [("u1", "same")]


def test_ntriples_escaping_and_null_exclusion(spark):
    """RDF 1.1 N-Triples: ECHAR escapes in literals, percent-encoding of
    forbidden IRIREF chars, NULL-component exclusion, IRI-object mode."""
    from dss_plugin_nlp_analysis_spark.operators.kg import ntriples_lines

    rows = [
        ("http://a.org/x y", "is a", 'quote " back \\ nl \n tab \t cr \r end'),
        ("http://a.org/<b>", "p|q", "plain"),
        (None, "p", "o"),
        ("s", None, "o"),
        ("s", "p", None),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {r["subj"]: r["line"] for r in ntriples_lines(df).collect()}
    assert len(out) == 2  # NULL-component rows dropped
    assert out["http://a.org/x y"] == (
        '<http://a.org/x%20y> <http://example.org/pred/is%20a> '
        '"quote \\" back \\\\ nl \\n tab \\t cr \\r end" .'
    )
    assert out["http://a.org/<b>"] == (
        '<http://a.org/%3Cb%3E> <http://example.org/pred/p%7Cq> "plain" .'
    )
    # IRI-object mode wraps the object under the namespace
    iri = ntriples_lines(
        spark.createDataFrame([("s", "p", "node 1")], "subj string, pred string, obj string"),
        obj_namespace="http://ex.org/node/",
    ).collect()[0]["line"]
    assert iri == '<s> <http://example.org/pred/p> <http://ex.org/node/node%201> .'
