"""Unit tests for operators/trainprep.py (skip-gram pairs, sequence
packing, DSIR weights) and the dedup containment join.

The driver-mirror oracle gate (test_entry.py) already value-hashes the
four queries against DuckDB; these tests pin the EDGE semantics a
corpus-derived query can under-exercise: window boundaries, empty and
single-token documents, bin straddling, zero-width placement,
target-affinity ordering, and subset-vs-Jaccard separation.
"""

import pytest
from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from dss_plugin_nlp_analysis_spark.operators.trainprep import (
    dsir_weights,
    pack_sequences,
    skipgram_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id bigint, text string")


# ---------------------------------------------------------------- skipgram


def test_skipgram_window_boundaries(spark):
    df = _docs(spark, [(1, "a b c d")])
    out = skipgram_pairs(df, "id", "text", window=2).collect()
    got = {(r.pos, r.center, r.context, r.offset) for r in out}
    # position 1 ('a'): only forward offsets survive the left edge
    assert {(1, "a", "b", 1), (1, "a", "c", 2)} <= got
    assert not any(r.pos == 1 and r.offset < 0 for r in out)
    # position 4 ('d'): only backward offsets survive the right edge
    assert {(4, "d", "c", -1), (4, "d", "b", -2)} <= got
    # interior position emits all 2*window contexts
    assert sum(1 for r in out if r.pos == 2) == 3  # offsets -1, +1, +2
    assert sum(1 for r in out if r.pos == 3) == 3  # offsets -2, -1, +1
    assert len(out) == 2 + 3 + 3 + 2


def test_skipgram_short_and_empty_docs_emit_nothing(spark):
    df = _docs(spark, [(1, ""), (2, None), (3, "solo"), (4, "  \t ")])
    assert skipgram_pairs(df, "id", "text", window=2).count() == 0


def test_skipgram_normalizes_text(spark):
    df = _docs(spark, [(1, "  Hello   WORLD  ")])
    out = skipgram_pairs(df, "id", "text", window=1).collect()
    assert {(r.center, r.context) for r in out} == {
        ("hello", "world"),
        ("world", "hello"),
    }


def test_skipgram_rejects_bad_window(spark):
    with pytest.raises(ValueError, match="window"):
        skipgram_pairs(_docs(spark, [(1, "a b")]), "id", "text", window=0)


# ---------------------------------------------------------- pack_sequences


def test_pack_straddles_bin_boundary(spark):
    # one shard; docs of 3 + 4 tokens against budget 5: the second doc
    # spans tokens [3, 6] -> bins 0 and 1
    df = _docs(spark, [(0, "a b c"), (8, "d e f g")])
    out = {
        r.id: r
        for r in pack_sequences(
            df, "id", "text", budget=5, shards=8
        ).collect()
    }
    assert out[0].shard == 0 and out[8].shard == 0
    assert (out[0].start_off, out[0].first_bin, out[0].last_bin) == (0, 0, 0)
    assert (out[8].start_off, out[8].first_bin, out[8].last_bin) == (3, 0, 1)
    assert out[8].n_bins == 2


def test_pack_empty_doc_zero_width(spark):
    df = _docs(spark, [(0, "a b c d e"), (8, ""), (16, "x")])
    out = {
        r.id: r
        for r in pack_sequences(
            df, "id", "text", budget=5, shards=8
        ).collect()
    }
    assert out[8].n_tokens == 0
    # zero-width at offset 5 = start of bin 1; it must not shift doc 16
    assert (out[8].start_off, out[8].first_bin, out[8].last_bin) == (5, 1, 1)
    assert out[8].n_bins == 1
    assert out[16].start_off == 5 and out[16].first_bin == 1


def test_pack_shards_are_independent(spark):
    df = _docs(spark, [(0, "a b c"), (1, "d e f"), (2, "g h")])
    out = {
        r.id: r
        for r in pack_sequences(
            df, "id", "text", budget=2, shards=3
        ).collect()
    }
    # every doc is alone in its shard, so every start_off is 0
    assert {r.start_off for r in out.values()} == {0}
    assert {r.shard for r in out.values()} == {0, 1, 2}


def test_pack_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "id", "text", budget=0)
    with pytest.raises(ValueError, match="shards"):
        pack_sequences(df, "id", "text", shards=0)


# ------------------------------------------------------------ dsir_weights


def test_dsir_upweights_target_like_docs(spark):
    target_text = "quantum computing research paper"
    raw = _docs(
        spark,
        [(1, target_text), (2, "cheap pills buy now click here"), (3, "")],
    )
    target = _docs(
        spark, [(10, target_text), (11, "quantum research methods")]
    )
    out = {
        r.id: r
        for r in dsir_weights(
            raw, target, "id", "text", n=1, buckets=64
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # empty doc still carries its '' shingle
    assert out[1].weight_avg_micro > out[2].weight_avg_micro
    assert out[1].n_grams == 4 and out[3].n_grams == 1


def test_dsir_rejects_bad_buckets(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="buckets"):
        dsir_weights(df, df, "id", "text", buckets=1)


# ------------------------------------------------- ngram_containment_pairs


def test_containment_flags_subset_where_jaccard_dilutes(spark):
    long = " ".join(f"w{i}" for i in range(40))
    sub = " ".join(f"w{i}" for i in range(10, 18))  # 8-word quoted span
    df = _docs(spark, [(1, long), (2, sub)])
    cont = ngram_containment_pairs(
        df, "id", "text", n=3, threshold_ppm=900_000
    ).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r.id_a, r.id_b) == (1, 2)
    # every trigram of the quote appears in the long doc -> exact 1e6
    assert r.containment_ppm == 1_000_000
    assert (r.sz_a, r.sz_b, r.inter) == (38, 6, 6)
    # the symmetric Jaccard join at the same bar sees ~6/38 and drops it
    jac = ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.9)
    assert jac.count() == 0


def test_containment_df_cap_limits_candidates_not_values(spark):
    # the one shared shingle is above the df cap -> no candidate pair
    df = _docs(
        spark,
        [(i, f"common phrase here tail{i}") for i in range(5)],
    )
    out = ngram_containment_pairs(
        df, "id", "text", n=3, threshold_ppm=1, max_doc_freq=2
    )
    assert out.where(F.col("inter") >= 1).count() == 0
