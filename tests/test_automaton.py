"""Aho-Corasick kernel tests: all-overlaps vs leftmost-longest duality
(SEMANTICS.md §6; SURVEY.md §7.3 'hard parts' fuzz)."""

from hypothesis import given, strategies as st

from dss_plugin_nlp_analysis_spark.operators.automaton import (
    TokenAutomaton,
    filter_leftmost_longest,
)


def build(patterns):
    auto = TokenAutomaton()
    for i, p in enumerate(patterns):
        auto.add(tuple(p.split()), i)
    return auto.build()


def spans(hits):
    return [(s, e) for s, e, _p in hits]


def test_all_overlaps_nested():
    auto = build(["new york", "new york city", "york"])
    hits = auto.find_all("i love new york city".split())
    assert spans(hits) == [(2, 4), (2, 5), (3, 4)]


def test_leftmost_longest():
    auto = build(["new york", "new york city", "york"])
    hits = filter_leftmost_longest(auto.find_all("i love new york city".split()))
    assert spans(hits) == [(2, 5)]


def test_duplicate_pattern_payloads_in_add_order():
    auto = build(["merge", "merge"])
    hits = auto.find_all(["merge"])
    assert hits == [(0, 1, (0, 1))]  # all payloads, add order


def test_unknown_tokens_reset_state():
    auto = build(["a b"])
    assert auto.find_all(["a", "x", "b"]) == []
    assert spans(auto.find_all(["a", "b"])) == [(0, 2)]


def test_overlapping_not_nested():
    auto = build(["a b", "b c"])
    assert spans(auto.find_all("a b c".split())) == [(0, 2), (1, 3)]
    assert spans(filter_leftmost_longest(auto.find_all("a b c".split()))) == [(0, 2)]


def test_repeated_occurrences():
    auto = build(["x"])
    assert spans(auto.find_all("x y x x".split())) == [(0, 1), (2, 3), (3, 4)]


def test_suffix_pattern_via_fail_links():
    auto = build(["a b c", "b c"])
    assert spans(auto.find_all("a b c".split())) == [(0, 3), (1, 3)]


@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=3).map(tuple),
        min_size=1,
        max_size=6,
    ),
    st.lists(st.sampled_from("abc"), max_size=20),
)
def test_matches_equal_naive_scan(patterns, text):
    """AC must agree with the naive O(n·m) scan on every input."""
    auto = TokenAutomaton()
    for i, p in enumerate(patterns):
        auto.add(p, i)
    auto.build()
    got = {(s, e) for s, e, _p in auto.find_all(text)}
    expected = set()
    uniq = set(patterns)
    for p in uniq:
        for s in range(len(text) - len(p) + 1):
            if tuple(text[s:s + len(p)]) == p:
                expected.add((s, s + len(p)))
    assert got == expected


def test_leftmost_longest_non_overlap_invariant():
    auto = build(["a", "a b", "b c", "c"])
    kept = filter_leftmost_longest(auto.find_all("a b c a".split()))
    assert spans(kept) == [(0, 2), (2, 3), (3, 4)]
    for (s1, e1), (s2, e2) in zip(spans(kept), spans(kept)[1:]):
        assert e1 <= s2
