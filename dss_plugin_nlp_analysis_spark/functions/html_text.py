"""Deterministic HTML → text extraction (stdlib-only, byte-pinned).

New surface vs the reference (SURVEY.md §2.1: the reference has no file
formats at all); required by the input hint — ``text`` must be the
byte-identical extraction of ``html`` per url, verified by golden-hash
pytest (SEMANTICS.md §9).

Rules (frozen):
- ``script``/``style``/``template``/``head``/``noscript`` subtrees dropped
- block-level elements and ``<br>`` emit a line break; inline tags nothing
- character/entity references decoded (HTMLParser convert_charrefs)
- within each line: runs of spaces/tabs collapse to one space
- each line stripped; empty lines dropped; joined with ``"\\n"``

The final whitespace discipline matches ``clean_linebreaks`` on non-blank
lines, so extracted text is a fixpoint of the tagging pipeline's text prep.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["extract_text"]

_SKIP_SUBTREES = frozenset({"script", "style", "template", "head", "noscript"})
_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "br", "caption",
        "dd", "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
        "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
        "html", "li", "main", "nav", "ol", "option", "p", "pre", "section",
        "summary", "table", "td", "th", "tr", "ul",
    }
)
_WS_RUN = re.compile(r"[ \t\f\r ]+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._skip_depth:
            self.parts.append(data)


def extract_text(html: bytes | str | None) -> str:
    """Extract visible text from HTML, deterministically (SEMANTICS.md §9)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    raw = "".join(parser.parts)
    lines = []
    for line in raw.split("\n"):
        line = _WS_RUN.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
