"""URL canonicalization + domain extraction for web-page tables.

The north-star input is an Iceberg table of Common-Crawl-style pages
keyed by url; crawl pipelines canonicalize urls before dedup/grouping
(fragment and tracking-parameter variants of one page would otherwise
count as distinct documents) and aggregate per registrable domain for
skew decisions and per-site quality policies.

Canonicalization contract (frozen, SEMANTICS.md):

1. strip the fragment (``#...`` to end)
2. strip ``utm_*`` tracking parameters (each with its separator; a
   leading ``?utm_...&`` keeps the ``?`` for the surviving params)
3. lowercase the scheme+authority prefix (path/query case preserved)
4. strip a single trailing ``/``

Every step is a regex in the Java-regex ∩ RE2 common subset, so the
DuckDB oracle reproduces the canonical url byte-for-byte. Pure per-row
map — zero shuffle; the per-domain aggregate a caller builds on top is
one map-side-combinable groupBy (domain cardinality is ~10^7 at crawl
scale — far below the row count — and AQE splits hot domains like any
skewed equi-key aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_url", "url_table"]

_FRAGMENT = r"#.*$"
# anchored to a real [?&] separator (kept via the capture group — '$1' in
# Java, '\\1' in RE2 — so 'xutm_source=1' style params are NOT corrupted),
# and matching a whole RUN of adjacent utm params in one pass so
# '?utm_a=1&utm_b=2&c=3' collapses to '?c=3'
_UTM_MID = r"([?&])(?:utm_[a-z]+=[^&#]*&)+"
_UTM_END = r"[?&]utm_[a-z]+=[^&#]*$"
_SCHEME_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def normalize_url(col: Column) -> Column:
    """Canonical url (see module contract). NULL → ''."""
    u = F.coalesce(col, F.lit(""))
    u = F.regexp_replace(u, _FRAGMENT, "")
    u = F.regexp_replace(u, _UTM_MID, "$1")
    u = F.regexp_replace(u, _UTM_END, "")
    prefix = F.regexp_extract(u, _SCHEME_HOST, 0)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + 1, 1 << 30))
    return F.regexp_replace(u, r"/$", "")


def url_table(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """(id, url_norm, host, domain) per row.

    ``host`` = the authority of the canonical url (userinfo/port kept —
    split further if a pipeline needs it); ``domain`` = the last two
    dot-labels of the host (the public-suffix-list-free approximation:
    right for .com/.org/..., one label short for ccTLD registries like
    .co.uk — swap in a PSL table via broadcast join when exactness
    matters)."""
    norm = normalize_url(F.col(url_col))
    host = F.regexp_extract(norm, r"^[a-z][a-z0-9+.-]*://([^/:?#@]*@)?([^/:?#]+)", 2)
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return df.select(
        F.col(id_col).alias("id"),
        norm.alias("url_norm"),
        host.alias("host"),
        domain.alias("domain"),
    )
