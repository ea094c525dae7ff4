"""Hypothesis fuzz of the round-3 DataFrame ops against pure-Python
reference implementations (contract-level: chunk arithmetic and global
first-occurrence semantics, on a collision-heavy alphabet)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from dss_plugin_nlp_analysis_spark.operators.textprep import chunk_documents
from dss_plugin_nlp_analysis_spark.operators.webclean import line_dedup

WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
LINE = st.lists(WORD, min_size=0, max_size=4).map(" ".join)
TEXT = st.lists(LINE, min_size=0, max_size=5).map("\n".join)
FUZZ = settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _ref_chunks(text: str, chunk: int, overlap: int):
    toks = " ".join((text or "").lower().split()).split(" ")
    if toks == [""]:
        return []
    step = chunk - overlap
    return [
        (idx, " ".join(toks[s:s + chunk]), min(chunk, len(toks) - s))
        for idx, s in enumerate(range(0, len(toks), step))
    ]


@given(st.lists(TEXT, min_size=1, max_size=4),
       st.integers(2, 5), st.integers(0, 1))
@FUZZ
def test_chunk_documents_matches_reference(spark, texts, chunk, overlap):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in chunk_documents(df, "doc_id", "text", chunk, overlap).collect():
        got.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        )
    for i, text in enumerate(texts):
        assert sorted(got.get(i, [])) == _ref_chunks(text, chunk, overlap), (i, text)


def _ref_line_dedup(docs):
    seen, out = set(), {}
    for i, t in sorted(docs):
        kept = []
        for ln in (l.strip() for l in (t or "").split("\n")):
            if ln and ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[i] = "\n".join(kept)
    return out


@given(st.lists(TEXT, min_size=1, max_size=5))
@FUZZ
def test_line_dedup_matches_reference(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r["clean_text"] for r in line_dedup(df, "doc_id", "text").collect()}
    assert got == _ref_line_dedup(docs)


# --- round-4 continued: duplicated_spans fuzz -----------------------------

from tests.test_dedup_similarity import py_spans

_WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


@given(st.lists(_DOC, min_size=1, max_size=6), st.integers(2, 4))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_duplicated_spans_fuzz_vs_python(spark, texts, L):
    from dss_plugin_nlp_analysis_spark.operators.dedup import duplicated_spans

    corpus = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(corpus, "id long, text string")
    got = sorted(
        tuple(r) for r in duplicated_spans(df, "id", "text", window=L).collect()
    )
    assert got == py_spans(corpus, L)
