"""Round-4 verdict/advice closures:

- mixed_language_profile keys chunks by struct(id, chunk_idx) — no
  per-document chunk-count ceiling (the old id*100_000+idx uid packing
  collided across documents past 100k chunks).
- tfidf_top_terms document-frequency join is a shuffled equi-join by
  default (broadcast_df opt-in) — a crawl-scale vocabulary is not
  broadcastable.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mixed_language_profile_no_chunk_uid_collision(spark):
    """A document with more chunks than the old 100k packing modulus must
    not leak chunks into another document's majority vote. chunk_tokens=1
    makes every word a chunk, so a 100_050-word doc crosses the old
    ceiling cheaply; under uid packing its chunks 100_000..100_049 would
    collide with doc 2's uids and corrupt BOTH documents' counts."""
    from dss_plugin_nlp_analysis_spark.operators.textstats import (
        mixed_language_profile,
    )

    big_words = 100_050
    big_text = " ".join(["the"] * big_words)          # all-en marker hits
    small_text = "le la les et des le la"             # all-fr marker hits
    df = spark.createDataFrame(
        [(1, big_text), (2, small_text)], "doc_id long, text string"
    )
    out = {
        r["id"]: r
        for r in mixed_language_profile(df, "doc_id", "text", chunk_tokens=1)
        .collect()
    }
    assert out[1]["majority_lang"] == "en"
    assert out[1]["n_chunks"] == big_words
    assert out[1]["n_langs"] == 1
    assert out[2]["majority_lang"] == "fr"
    assert out[2]["n_chunks"] == 7
    assert out[2]["n_langs"] == 1


def test_mixed_language_profile_string_ids_and_majority(spark):
    # struct keying also admits string doc ids; majority + tie rules
    from dss_plugin_nlp_analysis_spark.operators.textstats import (
        mixed_language_profile,
    )

    df = spark.createDataFrame(
        [
            # 2 en chunks vs 1 fr chunk -> en majority, 2 langs
            ("u1", "the and of is with the and of " + "le la les et des le la les"[:0]
             + "the and of is with the and of " + "le la les et des le la les"),
            ("u2", None),  # no chunks -> emits nothing
        ],
        "doc_id string, text string",
    )
    rows = {
        r["id"]: r
        for r in mixed_language_profile(df, "doc_id", "text", chunk_tokens=8)
        .collect()
    }
    assert set(rows) == {"u1"}
    assert rows["u1"]["majority_lang"] == "en"
    assert rows["u1"]["n_langs"] == 2


def test_winnow_kernel_equivalence_and_plan(spark):
    """engine='kernel' (O(n) monotone-deque pandas UDF) must produce the
    exact fingerprint sets of the native expression path on adversarial
    inputs (ties, short docs, whitespace runs, NULL/empty), and stay a
    zero-shuffle Arrow-vectorized map."""
    import random

    from dss_plugin_nlp_analysis_spark.operators.textstats import (
        winnow_fingerprints,
    )

    random.seed(23)
    vocab = ["alpha", "beta", "gamma", "x", "the", "Zeta"]
    rows = [
        (0, None),
        (1, ""),
        (2, "one"),                      # < k tokens -> no fingerprints
        (3, "one two three"),            # exactly k -> 1 gram, < window
        (4, "a a a a a a a a a a"),      # all-tie hashes
        (5, "  spaced\t\tout   tokens here now  "),
        # unicode whitespace at boundaries: F.trim strips ONLY ascii
        # spaces, so NBSP/U+2028 must survive normalization identically
        # in both engines (web text is full of &nbsp;)
        (6, "  nbsp lead and trail mid line word  "),
    ] + [
        (10 + i, " ".join(random.choices(vocab, k=random.randint(0, 40))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, w in ((3, 4), (2, 5), (1, 3)):
        expr = {
            r["id"]: r["fingerprints"]
            for r in winnow_fingerprints(df, "doc_id", "text", k=k, window=w).collect()
        }
        kern = {
            r["id"]: r["fingerprints"]
            for r in winnow_fingerprints(
                df, "doc_id", "text", k=k, window=w, engine="kernel"
            ).collect()
        }
        assert expr == kern, (k, w)

    out = winnow_fingerprints(df, "doc_id", "text", engine="kernel")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time

    import pytest

    with pytest.raises(ValueError, match="engine"):
        winnow_fingerprints(df, "doc_id", "text", engine="bogus")


def test_winnow_kernel_long_doc(spark):
    # a genuinely long document (80k tokens, window 50): the kernel path
    # must agree with the expression path where the expression path is
    # still tractable, and handle the long doc without O(n*w) blowup
    from dss_plugin_nlp_analysis_spark.operators.textstats import (
        _winnow_one,
        winnow_fingerprints,
    )

    words = [f"w{i % 997}" for i in range(80_000)]
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = winnow_fingerprints(
        df, "doc_id", "text", k=3, window=50, engine="kernel"
    ).collect()[0]
    assert got["fingerprints"] == _winnow_one(text, 3, 50)
    # periodic 997-word vocab -> few distinct window minima, but nonempty
    assert got["n_fingerprints"] > 10


def test_ttl_first_seen_session_semantics(spark):
    """Batch replication of the streaming TTL horizon: same-key sightings
    within the gap suppress (count into the session), a sighting more
    than gap after the previous one re-emits; the exact-boundary event
    EXTENDS the session (Spark merges sessions meeting at the boundary)."""
    from dss_plugin_nlp_analysis_spark.operators.dedup import ttl_first_seen

    rows = [
        # key 'a': 0s, 500s (suppressed), 1100s (chained extend, suppressed),
        # 1700s (= prev + 600: boundary -> still same session),
        # 3000s (gap 1300 > 600 -> new session)
        (1, "a", 0), (2, "a", 500), (3, "a", 1100), (4, "a", 1700), (5, "a", 3000),
        # key 'b': single sighting
        (6, "b", 100),
        # key 'c': tie on ts -> first = smaller id
        (8, "c", 50), (7, "c", 50),
    ]
    df = spark.createDataFrame(rows, "id long, key string, sec long")
    out = ttl_first_seen(df, "id", "sec", "key", gap="600 seconds")
    got = sorted(
        (r["key"], r["first_id"], int(r["first_ts"].timestamp()), r["n_in_session"])
        for r in out.collect()
    )
    assert got == [
        ("a", 1, 0, 4),
        ("a", 5, 3000, 1),
        ("b", 6, 100, 1),
        ("c", 7, 50, 2),
    ]


def test_generated_lemma_tables_recall_floor():
    """Regression floor for the generated regular-paradigm lemma tables:
    on a morphology-heavy fixture of common REGULAR inflections (chosen
    independently of the table contents), the full table must recover
    ≥75% of gold lemmas, the irregulars-only baseline stays ≤45%, and
    the generated tables contribute ≥30 points of recall — pinning the
    round-3 'generated paradigms' gain as a measured property, not a
    structural claim."""
    from dss_plugin_nlp_analysis_spark.functions.lemmas import (
        _BUILTIN,
        lemma_table,
        lemmatize_tokens,
    )

    fixture = {
        "en": [
            ("played", "play"), ("playing", "play"), ("plays", "play"),
            ("worked", "work"), ("studies", "study"), ("studied", "study"),
            ("cities", "city"), ("boxes", "box"), ("running", "run"),
            ("talked", "talk"), ("watches", "watch"), ("families", "family"),
            ("carried", "carry"), ("stopped", "stop"),
        ],
        "es": [
            ("hablamos", "hablar"), ("hablaron", "hablar"),
            ("comemos", "comer"), ("viviendo", "vivir"),
            ("trabajando", "trabajar"), ("cantaba", "cantar"),
        ],
        "fr": [
            ("parlé", "parler"), ("parlons", "parler"), ("mangé", "manger"),
            ("finissons", "finir"), ("donnée", "donner"),
        ],
        "de": [
            ("gespielt", "spielen"), ("spielte", "spielen"),
            ("kinder", "Kind"), ("gemacht", "machen"),
        ],
    }
    n = hit_full = hit_base = 0
    for lang, pairs in fixture.items():
        full = lemma_table(lang)
        base = dict(_BUILTIN.get(lang, {}))  # irregulars/goldens only
        forms = [f for f, _ in pairs]
        for got, (_, gold) in zip(lemmatize_tokens(forms, full), pairs):
            hit_full += got == gold
        for got, (_, gold) in zip(lemmatize_tokens(forms, base), pairs):
            hit_base += got == gold
        n += len(pairs)
    recall_full = hit_full / n
    recall_base = hit_base / n
    assert recall_full >= 0.75, (recall_full, recall_base)
    assert recall_base <= 0.45, (recall_full, recall_base)
    assert recall_full - recall_base >= 0.30


def test_generated_lemma_tables_nb_pl():
    """nb/pl generators complete the reference's model-lemmatizer
    language set (de/en/es/fr/nb/pl/ru): golden regular inflections
    resolve through the full lemma_table path, and real orthography
    (diacritics) is preserved in both form and lemma."""
    from dss_plugin_nlp_analysis_spark.functions.lemmas import (
        lemma_table,
        lemmatize_tokens,
    )

    nb_pairs = [
        ("kastet", "kaste"), ("kaster", "kaste"),
        ("kjørte", "kjøre"), ("kjørt", "kjøre"), ("lærte", "lære"),
        ("spiste", "spise"), ("sendte", "sende"),
        ("bilen", "bil"), ("bilene", "bil"), ("skolene", "skole"),
        ("guttene", "gutt"), ("ukene", "uke"),
    ]
    pl_pairs = [
        ("kobiety", "kobieta"), ("kobietę", "kobieta"),
        ("szkoły", "szkoła"), ("książki", "książka"), ("ręką", "ręka"),
        ("domu", "dom"), ("bankiem", "bank"), ("parki", "park"),
        ("czytał", "czytać"), ("czytali", "czytać"),
        ("mieszkam", "mieszkać"), ("słuchali", "słuchać"),
        ("śpiewam", "śpiewać"),
    ]
    for lang, pairs in (("nb", nb_pairs), ("pl", pl_pairs)):
        table = lemma_table(lang)
        forms = [f for f, _ in pairs]
        got = lemmatize_tokens(forms, table)
        for (form, gold), g in zip(pairs, got):
            assert g == gold, (lang, form, g, gold)
