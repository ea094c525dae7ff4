"""Deterministic synthetic Common-Crawl-style web-page corpus (FIXTURES.md §1).

Schema per the driver input hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Invariants:
- ``text == extract_text(html)`` byte-for-byte (pinned by golden tests)
- ~20% of rows share 3 hot domains (exercises skew handling)
- rows include ``\\r``, ``\\n\\n``, NULL text, emoji + hashtags, an
  unsupported lang code — the reference's edge fixtures.

Seeded (default 42); no external data. Used by tests, the KG-build
launcher demo, and the scaling bench.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.html_text import extract_text

__all__ = ["WEB_PAGE_SCHEMA", "generate_pages", "pages_df", "demo_kg_ontology"]

WEB_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_HOT_DOMAINS = ["hub.example.com", "news.example.org", "blog.example.net"]
_LANG_WORDS = {
    "en": ["the spark engine joins tables", "a merge sort runs fast",
           "New York hosts the data summit", "she worked on the query planner",
           "hash joins beat nested loops", "the vector index scans batches"],
    "fr": ["le moteur d'analyse traite les données", "la jointure s'exécute vite",
           "il a travaillé sur l'optimiseur"],
    "es": ["el motor procesa los datos", "la consulta trabajó bien",
           "Nueva York acoge la cumbre"],
    "de": ["die Engine verarbeitet Daten schnell", "der Planer hat funktioniert"],
}
_EXTRAS = [
    "great results 👍 #spark",
    "ping 1.1.1.1 then N.Y office",
    "line one\rline two\n\nline three",
    "ÄâêËùûôçèîÏìàñ appears here",
]


def _make_html(title: str, paragraphs: list[str]) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    html = (
        f"<html><head><title>{title}</title><style>p{{color:red}}</style>"
        f"<script>var x=1;</script></head><body><h1>{title}</h1>"
        f"<div class=\"main\">{body}</div>"
        f"<footer>footer text</footer></body></html>"
    )
    return html.encode("utf-8")


def generate_pages(n: int = 1000, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    base_ts = datetime(2025, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)
    rows = []
    langs = list(_LANG_WORDS)
    for i in range(n):
        if rng.random() < 0.2:
            domain = _HOT_DOMAINS[rng.randrange(3)]
        else:
            domain = f"site{rng.randrange(max(10, n // 10))}.example.com"
        url = f"https://{domain}/page/{i}"
        ts = base_ts + timedelta(seconds=i * 37 % 86400, days=i % 30)
        lang = langs[rng.randrange(len(langs))] if rng.random() > 0.02 else "xx"
        word_pool = _LANG_WORDS.get(lang, _LANG_WORDS["en"])
        paragraphs = [word_pool[rng.randrange(len(word_pool))] for _ in range(rng.randrange(1, 5))]
        if rng.random() < 0.15:
            paragraphs.append(_EXTRAS[rng.randrange(len(_EXTRAS))])
        if rng.random() < 0.01:
            html, text = None, None  # NULL page (edge fixture)
        else:
            html = _make_html(f"Page {i}", paragraphs)
            text = extract_text(html)
        rows.append((url, ts, html, text, lang))
    return rows


def pages_df(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(generate_pages(n, seed), WEB_PAGE_SCHEMA)


def demo_kg_ontology(spark: SparkSession) -> DataFrame:
    """Ontology for the web-page corpus, with alias structure for
    canonicalization tests (two tags sharing the keyword 'engine')."""
    rows = [
        ("spark_engine", "spark engine", "tech"),
        ("spark_engine", "engine", "tech"),
        ("analytics_engine", "engine", "tech"),  # ambiguous alias
        ("nyc", "New York", "place"),
        ("nyc", "Nueva York", "place"),
        ("merge_sort", "merge sort", "tech"),
        ("hash_join", "hash joins", "tech"),
        ("work", "worked", "activity"),
    ]
    return spark.createDataFrame(rows, "tag string, keyword string, category string")
