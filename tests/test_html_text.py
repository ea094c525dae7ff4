"""HTML→text extraction: deterministic, byte-pinned by golden hashes
(SEMANTICS.md §9; BASELINE.md 'byte-identical per url')."""

import hashlib

from dss_plugin_nlp_analysis_spark.functions.html_text import extract_text


def sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def test_basic_blocks_and_skips():
    html = (
        "<html><head><title>T</title><style>p{}</style><script>x</script></head>"
        "<body><h1>Head</h1><p>one</p><p>two</p></body></html>"
    )
    assert extract_text(html) == "Head\none\ntwo"  # head subtree (incl. title) dropped


def test_head_title_skipped_inside_head_subtree():
    # head is in the skip list, so title text inside it is dropped…
    # …except title sits inside <head>: verify the subtree rule
    html = "<head><title>gone</title></head><body><p>kept</p></body>"
    assert extract_text(html) == "kept"


def test_entities_and_inline_tags():
    html = "<p>a &amp; b <b>bold</b> &#233;</p>"
    assert extract_text(html) == "a & b bold é"


def test_whitespace_collapse():
    html = "<p>a   b\t\tc</p><p>  d  </p>"
    assert extract_text(html) == "a b c\nd"


def test_br_and_nested_blocks():
    html = "<div>x<br>y<ul><li>i1</li><li>i2</li></ul></div>"
    assert extract_text(html) == "x\ny\ni1\ni2"


def test_bytes_input_and_none():
    assert extract_text(b"<p>bytes</p>") == "bytes"
    assert extract_text(None) == ""


def test_golden_hashes_pinned():
    """Byte-level regression pin: any change to extraction rules must
    consciously update these hashes."""
    cases = {
        "<html><body><p>hello world</p></body></html>":
            sha("hello world"),
        "<div><script>no</script><p>a&nbsp;b</p><footer>f</footer></div>":
            sha("a b\nf"),
        "<p>multi</p>\n<p>line</p>":
            sha("multi\nline"),
    }
    for html, expected in cases.items():
        assert sha(extract_text(html)) == expected


def test_fixpoint_of_clean_linebreaks():
    # extracted text must be stable under the tagging pipeline's text prep
    from dss_plugin_nlp_analysis_spark.functions.textnorm import clean_linebreaks

    html = "<div><p> spaced  out </p><p></p><p>next</p></div>"
    text = extract_text(html)
    assert clean_linebreaks(text) == text
