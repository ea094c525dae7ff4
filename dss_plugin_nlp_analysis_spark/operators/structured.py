"""Structured-data extraction from web pages: JSON-LD and OpenGraph.

The highest-precision KG facts on the open web are the ones publishers
emit deliberately: schema.org JSON-LD islands (``<script
type="application/ld+json">``) and OpenGraph ``<meta property="og:*">``
tags. A web-scale KG build mines these BEFORE free-text tagging — they
are machine-written, unambiguous, and cover ~40% of crawled pages —
and uses the text-mined triples (operators/kg.py) to fill the rest.
The reference plugin has no web surface at all (SURVEY.md §2.1); this
extends the KG-materialize stage with the crawl-native fact source.

Scale shape (what survives 100 TB):

- both extractors are pure per-row projections — regexp + JSON path
  evaluation inside whole-stage codegen, zero Exchange, zero Python.
  Filters and column pruning push through them to the parquet scan.
- ``get_json_object`` re-parses the island once per requested path;
  with the handful of paths a KG schema maps (3-10), that is cheaper
  than a Python round-trip and stays JVM-side. For a FIXED wide schema
  prefer ``from_json`` with an explicit struct type (single parse) —
  this operator keeps paths dynamic because ontology-driven mappings
  change per run.
- every regex is in the Java-regex ∩ RE2 common subset so the DuckDB
  oracle reproduces extraction byte-for-byte (same discipline as
  operators/url.py).

DIV (SEMANTICS.md): only the FIRST JSON-LD island per page is mined —
multi-island pages (rare: carousel markup) need a regexp_extract_all
variant; documented rather than silently merged.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_jsonld",
    "extract_og",
    "extract_hreflang",
    "extract_tables",
    "extract_microdata",
    "jsonld_block",
    "extract_headings",
    "extract_meta_robots",
    "extract_feed_items",
]

# non-greedy island body; (?s) so embedded newlines stay inside the block.
# Attribute order/spacing is frozen to the canonical form emitted by the
# major SSGs; a lenient attribute regex would leave the Java∩RE2 subset.
_JSONLD_RE = r'(?s)<script type="application/ld\+json">(.*?)</script>'
# og: keys are lowercase ascii + ':' (og:image:width etc.)
_OG_RE = r'<meta property="og:([a-z:]+)" content="([^"]*)"'
# hreflang alternates: BCP-47-ish codes (en, de-AT, zh-Hant, x-default)
_HREFLANG_RE = r'<link rel="alternate" hreflang="([A-Za-z0-9-]+)" href="([^"]*)"'


def jsonld_block(html: Column) -> Column:
    """First JSON-LD island body in the page ('' when absent)."""
    return F.regexp_extract(html, _JSONLD_RE, 1)


def extract_jsonld(
    df: DataFrame,
    id_col: str,
    html_col: str,
    paths: Mapping[str, str],
) -> DataFrame:
    """Mine the page's first JSON-LD island into (id, pred, obj) triples.

    ``paths`` maps output predicate names to JSONPath expressions
    (``{"name": "$.name", "author": "$.author.name"}``). Paths that are
    absent in the island — or pages without an island / with malformed
    JSON (``get_json_object`` yields NULL on both) — emit no row, so the
    output is exactly the set of facts the publisher stated. One
    projection + one explode; zero shuffle.
    """
    if not paths:
        raise ValueError("paths must be non-empty")
    block = jsonld_block(F.col(html_col))
    pairs = F.array(
        *[
            F.struct(
                F.lit(pred).alias("pred"),
                F.get_json_object(block, path).alias("obj"),
            )
            for pred, path in sorted(paths.items())
        ]
    )
    # the filter lambda touches only its struct element (never an outer
    # subtree), so the HOF re-evaluation trap (TODO.md round-4) does not
    # apply; the k get_json_object calls evaluate once each in the array
    # constructor.
    present = F.filter(pairs, lambda s: s["obj"].isNotNull())
    return (
        df.select(F.col(id_col).alias("id"), F.explode(present).alias("kv"))
        .select("id", F.col("kv.pred").alias("pred"), F.col("kv.obj").alias("obj"))
    )


def extract_og(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """OpenGraph tags as (id, og_key, og_content) rows, in document order.

    Two positionally-aligned ``regexp_extract_all`` passes (key group,
    content group) zipped and exploded — the same one-regex-per-group
    formulation the DuckDB oracle uses, so parity is structural. Pages
    without og: tags emit no row. Pure map, zero shuffle.
    """
    html = F.col(html_col)
    keys = F.regexp_extract_all(html, F.lit(_OG_RE), 1).alias("k")
    vals = F.regexp_extract_all(html, F.lit(_OG_RE), 2).alias("v")
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.arrays_zip(keys, vals)).alias("kv"))
        .select(
            "id",
            F.col("kv.k").alias("og_key"),
            F.col("kv.v").alias("og_content"),
        )
    )


def extract_hreflang(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """hreflang alternate-language links as (id, hreflang, href) rows.

    ``<link rel="alternate" hreflang=…>`` clusters are how publishers
    declare translation variants of one page — a multilingual corpus
    build uses them to group parallel documents (translation-pair mining)
    and to avoid counting a page's 12 language variants as 12 independent
    facts' sources. Same zipped two-pass regexp_extract_all formulation
    as ``extract_og`` (attribute order frozen — the canonical emission);
    pure map, zero shuffle. Grouping the variants afterwards is one
    groupBy over the resolved href set (or ``url.resolve_canonical``
    first, since hreflang targets are frequently themselves chained).
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(_HREFLANG_RE), 1).alias("hl"),
        F.regexp_extract_all(html, F.lit(_HREFLANG_RE), 2).alias("href"),
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(pairs).alias("kv")
    ).select(
        "id",
        F.col("kv.hl").alias("hreflang"),
        F.col("kv.href").alias("href"),
    )


# one table island; (?s) keeps row markup with newlines inside the block
_TABLE_RE = r"(?s)<table[^>]*>(.*?)</table>"
_TR_RE = r"(?s)<tr[^>]*>(.*?)</tr>"
# two positionally-aligned passes over the SAME cell pattern: tag name
# (td/th -> is_header) and inner text; attribute-bearing cells accepted,
# nested markup inside a cell is not ([^<]* keeps the regex in the
# Java∩RE2 subset — WebTables-style extraction treats rich cells as
# non-relational noise anyway)
_CELL_TAG_RE = r"<(t[dh])[^>]*>[^<]*</t[dh]>"
_CELL_TXT_RE = r"<t[dh][^>]*>([^<]*)</t[dh]>"


def extract_tables(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Relational web-table harvest (the WebTables move): every
    ``<table>`` in the page becomes addressable cells — (id, table_idx,
    row_idx, col_idx, cell, is_header) — the third deliberate-markup KG
    source next to JSON-LD and OpenGraph; header rows + aligned columns
    are what attribute-style fact extraction (``kg.attribute_triples``)
    consumes downstream.

    Scale shape: three nested posexplodes over per-row regex arrays —
    still a pure per-row projection chain (each explode multiplies rows
    but never shuffles); filters/pruning push through to the scan. The
    blowup factor is the page's cell count, the same order as the
    token-level ops the corpus already runs. Cells are trimmed;
    ``is_header`` is true for ``<th>``.
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    tables = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(html, F.lit(_TABLE_RE), 1)
        ).alias("table_idx", "tbl"),
    )
    rows = tables.select(
        "id",
        "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("tbl"), F.lit(_TR_RE), 1)
        ).alias("row_idx", "tr"),
    )
    cells = F.arrays_zip(
        F.regexp_extract_all(F.col("tr"), F.lit(_CELL_TAG_RE), 1).alias("tag"),
        F.regexp_extract_all(F.col("tr"), F.lit(_CELL_TXT_RE), 1).alias("txt"),
    )
    return rows.select(
        "id",
        "table_idx",
        "row_idx",
        F.posexplode(cells).alias("col_idx", "c"),
    ).select(
        "id",
        "table_idx",
        "row_idx",
        "col_idx",
        F.trim(F.col("c.txt")).alias("cell"),
        (F.col("c.tag") == "th").alias("is_header"),
    )


# schema.org MICRODATA (the third embedding syntax next to JSON-LD and
# OpenGraph): itemscope types plus the two canonical itemprop carriers —
# <meta itemprop content=...> (attribute form) and simple
# <span/div/h1/time itemprop>text</> (text form). Attribute order frozen
# to the canonical emission; nested markup inside a text-form value is
# not crossed ([^<]* keeps the patterns in the Java∩RE2 subset), same
# contract as extract_tables cells.
_MICRO_TYPE_RE = r'itemtype="https?://schema\.org/([A-Za-z]+)"'
_MICRO_META_RE = r'<meta itemprop="([A-Za-z]+)" content="([^"]*)"'
_MICRO_TEXT_RE = r'<(?:span|div|h1|time) itemprop="([A-Za-z]+)"[^>]*>([^<]*)<'


def extract_microdata(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """schema.org microdata as (id, itemprop, value, src) rows — src is
    'type' (itemscope itemtype, itemprop literal '@type'), 'attr'
    (meta/content form), or 'text' (inline-element form), in document
    order within each form. Pages without microdata emit no row.

    Same structural-parity formulation as ``extract_og``: one
    regexp_extract_all per capture group, zipped and exploded — the
    DuckDB oracle runs the identical patterns, so the gate checks the
    EXTRACTION, not a reimplementation. Pure map, zero shuffle.
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    types = F.transform(
        F.regexp_extract_all(html, F.lit(_MICRO_TYPE_RE), 1),
        lambda t: F.struct(
            F.lit("@type").alias("itemprop"),
            t.alias("value"),
            F.lit("type").alias("src"),
        ),
    )
    metas = F.transform(
        F.arrays_zip(
            F.regexp_extract_all(html, F.lit(_MICRO_META_RE), 1).alias("k"),
            F.regexp_extract_all(html, F.lit(_MICRO_META_RE), 2).alias("v"),
        ),
        lambda kv: F.struct(
            kv["k"].alias("itemprop"),
            kv["v"].alias("value"),
            F.lit("attr").alias("src"),
        ),
    )
    texts = F.transform(
        F.arrays_zip(
            F.regexp_extract_all(html, F.lit(_MICRO_TEXT_RE), 1).alias("k"),
            F.regexp_extract_all(html, F.lit(_MICRO_TEXT_RE), 2).alias("v"),
        ),
        lambda kv: F.struct(
            kv["k"].alias("itemprop"),
            kv["v"].alias("value"),
            F.lit("text").alias("src"),
        ),
    )
    rows = F.concat(types, metas, texts)
    return df.select(
        F.col(id_col).alias("id"), F.explode(rows).alias("r")
    ).select(
        "id",
        F.col("r.itemprop").alias("itemprop"),
        F.col("r.value").alias("value"),
        F.col("r.src").alias("src"),
    )


# h1-h6 with inline-free text body (the Java∩RE2 common-subset contract
# of this module: no lookaround, one capture per pass)
_HEADING_LEVEL_RE = r"<h([1-6])[^>]*>[^<]*</h[1-6]>"
_HEADING_TEXT_RE = r"<h[1-6][^>]*>([^<]*)</h[1-6]>"
# robots meta directives; content is a comma-separated token list
_META_ROBOTS_RE = r'<meta name="robots" content="([^"]*)"'


def extract_headings(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Document outline: one row per ``<h1>``-``<h6>`` heading —
    ``(id, pos, level, text)`` in document order (``pos`` is 1-based).
    The outline is the section signal for structure-aware chunking
    (split training chunks at headings, prefix each chunk with its
    heading path) and for title-quality checks (a page whose only h1 is
    'Untitled' gets flagged).

    Same structural-parity formulation as the sibling extracts: the
    level and text captures run as two passes of one anchored pattern
    over identical match sites, zipped positionally. Headings with
    nested inline markup inside (``<h1><b>x</b></h1>``) do not match
    the inline-free body — frozen contract (the Java∩RE2 subset has no
    way to strip nested tags in one pattern; run ``html_to_text``
    downstream when inner markup matters). Pure map + explode, zero
    shuffle; pages without headings emit no rows.
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(_HEADING_LEVEL_RE), 1).alias("lvl"),
        F.regexp_extract_all(html, F.lit(_HEADING_TEXT_RE), 1).alias("txt"),
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(pairs).alias("p", "h"),
        )
        .select(
            "id",
            (F.col("p") + 1).cast("long").alias("pos"),
            F.col("h.lvl").cast("long").alias("level"),
            F.col("h.txt").alias("text"),
        )
    )


def extract_meta_robots(
    df: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """Page-level robots directives: ``(id, noindex, nofollow,
    directives)`` from the first ``<meta name="robots">`` tag —
    ``noindex``/``nofollow`` as 0/1 flags (1 also when the blanket
    ``none`` directive appears, per the robots-meta spec), ``directives``
    the raw content string (NULL when the tag is absent; absent means
    indexable — the crawl default). The page-level half of the politeness
    stack (``robots.py`` handles the host-level robots.txt half): a
    pipeline that trains on noindex'd pages violates publisher intent,
    so this flag feeds the same filter as ``robots_filter``.

    Token matching is word-boundary exact on the lowercased list
    (``"noindex,nofollow"``, ``"index, follow"`` both parse; a
    hypothetical ``"nonoindex"`` token does NOT match). Pure per-row
    map, zero shuffle.
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    content = F.regexp_extract(html, _META_ROBOTS_RE, 1)
    raw = F.when(content == "", F.lit(None)).otherwise(content)
    toks = F.lower(F.coalesce(raw, F.lit("")))

    def has(token: str) -> Column:
        return F.regexp_like(toks, F.lit(rf"(^|[,\s])(?:{token})([,\s]|$)"))

    return df.select(
        F.col(id_col).alias("id"),
        (has("noindex") | has("none")).cast("int").alias("noindex"),
        (has("nofollow") | has("none")).cast("int").alias("nofollow"),
        raw.alias("directives"),
    )


# canonical-form feed items (frozen attribute/element order — the same
# major-SSG canonical-form stance as _JSONLD_RE); one capture per pass
_RSS_TITLE_RE = r"(?s)<item><title>([^<]*)</title><link>[^<]*</link></item>"
_RSS_LINK_RE = r"(?s)<item><title>[^<]*</title><link>([^<]*)</link></item>"
_ATOM_TITLE_RE = r'(?s)<entry><title>([^<]*)</title><link href="[^"]*"/></entry>'
_ATOM_LINK_RE = r'(?s)<entry><title>[^<]*</title><link href="([^"]*)"/></entry>'


def extract_feed_items(df: DataFrame, id_col: str, xml_col: str) -> DataFrame:
    """Feed discovery: one row per RSS ``<item>`` or Atom ``<entry>`` —
    ``(id, pos, fmt, title, link)`` with ``fmt`` in {'rss', 'atom'} and
    ``pos`` 1-based within the feed (rss items first, then atom entries,
    each in document order). Feeds are how a crawler finds fresh urls
    between sitemap fetches; the links feed ``crawl_frontier`` exactly
    like ``extract_links`` anchors do.

    Canonical element form is frozen (title before link, no interleaved
    elements — the module's SSG-canonical-form contract; a lenient parse
    needs an XML parser, not a regex). Two zipped single-group passes
    per format over identical match sites; pure map + explode, zero
    shuffle. Pages with neither format emit no rows.
    """
    xml = F.coalesce(F.col(xml_col), F.lit(""))

    def fmt_rows(fmt: str, title_re: str, link_re: str):
        return F.transform(
            F.arrays_zip(
                F.regexp_extract_all(xml, F.lit(title_re), 1).alias("title"),
                F.regexp_extract_all(xml, F.lit(link_re), 1).alias("link"),
            ),
            lambda s: F.struct(
                F.lit(fmt).alias("fmt"),
                s["title"].alias("title"),
                s["link"].alias("link"),
            ),
        )

    items = F.concat(
        fmt_rows("rss", _RSS_TITLE_RE, _RSS_LINK_RE),
        fmt_rows("atom", _ATOM_TITLE_RE, _ATOM_LINK_RE),
    )
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(items).alias("p", "it")
    ).select(
        "id",
        (F.col("p") + 1).cast("long").alias("pos"),
        F.col("it.fmt").alias("fmt"),
        F.col("it.title").alias("title"),
        F.col("it.link").alias("link"),
    )
