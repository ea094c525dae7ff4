"""Round-2 fixes: scale guards and correctness corners flagged by review.

- ngram_jaccard_pairs shingle document-frequency cap (boilerplate shingles
  must not quadratically explode the inverted-index self-join)
- per-category output columns when two raw categories NFD-collide
- idempotent per-epoch streaming sink (retried micro-batch != duplicates)
- checkpoint bucket-partition safety (subj != url contract violation)
- commutative checkpoint fingerprint (order-insensitive, constant-memory)
"""

import pyspark.sql.functions as F
import pytest

from dss_plugin_nlp_analysis_spark.operators.dedup import ngram_jaccard_pairs


def test_ngram_jaccard_doc_freq_cap_drops_boilerplate_pairs(spark):
    # 10 docs share ONLY the boilerplate trigram; 2 docs share a rare one
    rows = [(i, f"common words here unique{i} tail{i}") for i in range(10)]
    rows += [
        (100, "rare trigram match alpha beta"),
        (101, "rare trigram match gamma delta"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")

    capped = ngram_jaccard_pairs(df, "id", "t", n=3, threshold=0.1, max_doc_freq=5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    # boilerplate-only pairs (df=10 > cap) are gone; the rare pair survives
    assert set(got) == {(100, 101)}
    # ...and its Jaccard is EXACT over the full shingle sets (1 shared of 5)
    assert got[(100, 101)] == pytest.approx(1 / 5)

    # with the cap above the corpus size the boilerplate pairs come back
    uncapped = ngram_jaccard_pairs(df, "id", "t", n=3, threshold=0.1, max_doc_freq=1000)
    assert uncapped.count() > 1


def test_per_category_columns_survive_nfd_collision(spark):
    from dss_plugin_nlp_analysis_spark.operators.tagger import tag_documents

    nfc_cat = "café"          # precomposed é
    nfd_cat = "café"         # e + combining acute — same NFD string
    docs = spark.createDataFrame(
        [(0, "alpha and beta here", "en")], "doc_id long, text string, lang string"
    )
    onto = spark.createDataFrame(
        [("t1", "alpha", nfc_cat), ("t2", "beta", nfd_cat)],
        "tag string, keyword string, category string",
    )
    out = tag_documents(
        docs, onto, category_col="category", output_format="one_row_per_doc"
    )
    tag_cols = [c for c in out.columns if c.startswith("tag_list_")]
    assert len(tag_cols) == 2, tag_cols  # one column PER RAW category
    row = out.collect()[0]
    vals = sorted(row[c] for c in tag_cols)
    assert vals == ['["t1"]', '["t2"]']


def test_write_epoch_is_idempotent(spark, tmp_path):
    from dss_plugin_nlp_analysis_spark.streaming.stream_tagger import write_epoch

    out = str(tmp_path / "sink")
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_epoch(batch, 0, out)
    write_epoch(batch, 0, out)  # simulated micro-batch retry
    assert spark.read.parquet(out).count() == 2  # replaced, not appended
    write_epoch(batch, 1, out)  # a NEW epoch appends its own partition
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert got.where(F.col("epoch_id") == 0).count() == 2


def test_checkpoint_rejects_stray_subj_buckets(spark, tmp_path):
    from dss_plugin_nlp_analysis_spark.plans.checkpoint import run_checkpointed_build

    docs = spark.createDataFrame(
        [(f"http://d{i}.com/x", f"text {i}") for i in range(20)],
        "url string, text string",
    )

    def bad_triple_fn(part):
        # drops _bucket AND rewrites subj: buckets re-derived from subj
        # would land outside the current group -> must raise, not corrupt
        return part.select(
            F.lit("one-fixed-subject").alias("subj"),
            F.lit("p").alias("pred"),
            F.col("text").alias("obj"),
        )

    with pytest.raises(ValueError, match="_bucket"):
        run_checkpointed_build(
            spark, docs, bad_triple_fn,
            str(tmp_path / "out"), str(tmp_path / "ckpt"),
            num_buckets=4, buckets_per_job=1,
        )


def test_checkpoint_bucket_carry_through_allows_custom_subj(spark, tmp_path):
    from dss_plugin_nlp_analysis_spark.plans.checkpoint import (
        read_manifest,
        run_checkpointed_build,
    )

    docs = spark.createDataFrame(
        [(f"http://d{i}.com/x", f"text {i}") for i in range(20)],
        "url string, text string",
    )

    def carrying_triple_fn(part):
        # custom subj is fine when the INPUT bucket column is preserved
        return part.select(
            "_bucket",
            F.concat(F.lit("entity:"), F.col("url")).alias("subj"),
            F.lit("p").alias("pred"),
            F.col("text").alias("obj"),
        )

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    res = run_checkpointed_build(
        spark, docs, carrying_triple_fn, out, ckpt, num_buckets=4, buckets_per_job=2
    )
    assert res.total_triples == 20
    m = read_manifest(spark, ckpt).collect()
    assert sum(r["input_rows"] for r in m) == 20
    # commutative fingerprint present for every non-empty bucket
    assert all(r["output_fingerprint"] is not None for r in m if r["triples"] > 0)


def test_checkpoint_fingerprint_is_order_insensitive_and_dup_sensitive(spark):
    from dss_plugin_nlp_analysis_spark.plans.checkpoint import _output_fingerprint

    rows = [("a", "p", "x"), ("b", "p", "y"), ("c", "q", "z")]
    fp1 = spark.createDataFrame(rows, "subj string, pred string, obj string") \
        .agg(_output_fingerprint().alias("fp")).collect()[0]["fp"]
    fp2 = spark.createDataFrame(list(reversed(rows)), "subj string, pred string, obj string") \
        .agg(_output_fingerprint().alias("fp")).collect()[0]["fp"]
    assert fp1 == fp2  # row order does not matter
    fp3 = spark.createDataFrame(rows + [rows[0]], "subj string, pred string, obj string") \
        .agg(_output_fingerprint().alias("fp")).collect()[0]["fp"]
    assert fp3 != fp1  # a duplicated row DOES change the fingerprint (no XOR cancel)


def test_exploded_shingles_matches_hof_multiset(spark):
    # the regex fast path must emit the exact multiset of the HOF shingles
    # column (incl. duplicates and the short-doc whole-text row)
    import random

    from dss_plugin_nlp_analysis_spark.operators.dedup import (
        exploded_shingles,
        shingles,
    )

    random.seed(3)
    vocab = "aa bb cc dd ee ff gg aa bb".split()
    rows = [(i, " ".join(random.choice(vocab) for _ in range(random.randint(0, 12))))
            for i in range(120)]
    rows += [(900, ""), (901, "one"), (902, "one two"), (903, "  padded   ws  ")]
    df = spark.createDataFrame(rows, "id long, t string")
    for n in (1, 2, 3, 5):
        hof = sorted(
            (r["id"], r["g"])
            for r in df.select("id", F.explode(shingles(F.col("t"), n)).alias("g")).collect()
        )
        fast = sorted(
            (r["id"], r["g"]) for r in exploded_shingles(df, "id", "t", n).collect()
        )
        assert fast == hof, f"n={n}"
