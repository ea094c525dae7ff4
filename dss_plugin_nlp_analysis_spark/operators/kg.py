"""KG materialization: triples + alias canonicalization (SEMANTICS.md §8).

New surface (north_star in BASELINE.json): the reference stops at tag
columns; this engine materializes `(subj=url, pred=tag, obj=canonical
ontology node)` triples with full provenance.

Canonicalization is a connected-components pass over the alias graph
(tag ↔ keyword edges from the ontology). The ontology is broadcast-sized
(SURVEY.md §1.4), so union-find runs on the driver and the resulting
tag→canonical map ships as a broadcast join payload — no iterative
distributed CC is needed (it would be for a billion-node alias graph; the
map-side design keeps that door open by isolating the mapping behind one
small dimension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.langsupport import validate_languages
from ..functions.textnorm import normalize_text
from .ontology import TagOptions, clean_ontology, compile_ontology
from .tagger import extract_mentions, sentence_of

__all__ = ["canonical_map", "build_triples", "TRIPLE_COLUMNS"]

TRIPLE_COLUMNS = [
    "subj", "pred", "obj", "keyword", "sentence", "sent_idx",
    "category", "lang", "warc_ts",
]


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def canonical_map(rows: list[tuple[str, str, str | None]]) -> dict[str, str]:
    """tag → canonical node id.

    Alias graph: tags sharing a *normalized* keyword surface form are
    aliases (e.g. 'NYC' via keyword 'New York' and 'New_York_City' via the
    same keyword). Canonical id = lexicographically smallest tag in the
    component (deterministic).
    """
    uf = _UnionFind()
    for tag, keyword, _cat in rows:
        kw_node = "\x00kw:" + normalize_text(keyword, ignore_case=True)
        uf.union("tag:" + tag, kw_node)
    components: dict[str, list[str]] = {}
    for tag, _kw, _cat in rows:
        root = uf.find("tag:" + tag)
        components.setdefault(root, []).append(tag)
    return {
        tag: min(tags)
        for tags in components.values()
        for tag in tags
    }


def build_triples(
    docs_df: DataFrame,
    ontology_df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str | None = "lang",
    ts_col: str | None = "warc_ts",
    language: str = "en",
    tag_col: str = "tag",
    keyword_col: str = "keyword",
    category_col: str | None = "category",
    options: TagOptions = TagOptions(),
    languages: list[str] | None = None,
    canonicalize: bool = True,
    skip_unknown: bool = True,
    repartition_by_url: int | None = None,
) -> DataFrame:
    """Emit the triples table (one row per mention, no-match docs dropped).

    Physical plan: optional repartition by ``xxhash64(url)`` (north rule —
    defuses hot-domain skew before the embarrassingly-parallel match
    stage), one Arrow UDF pass, explode, then a broadcast join to the
    canonical-node dimension. Zero non-broadcast shuffles after the
    optional repartition.
    """
    spark = docs_df.sparkSession
    clean = clean_ontology(ontology_df, tag_col, keyword_col, category_col)
    rows = [
        (r["tag"], r["keyword"], r["category"] if category_col else None)
        for r in clean.collect()
    ]
    if languages is None:
        if lang_col:
            languages = [
                r[0]
                for r in docs_df.select(lang_col)
                .where(F.col(lang_col).isNotNull())
                .distinct()
                .collect()
            ]
        else:
            languages = [language]
    languages = validate_languages(languages, skip_unknown)
    compiled = compile_ontology(rows, languages, options, category_col is not None)

    if repartition_by_url:
        docs_df = docs_df.repartition(repartition_by_url, F.xxhash64(F.col(url_col)))

    res = "_tagging"
    tagged = extract_mentions(
        docs_df, compiled, text_col, lang_col, language, res, skip_unknown=skip_unknown
    )
    # resolve the sentence INSIDE the per-row transform, before exploding:
    # exploding first would duplicate the whole sentences array once per
    # match row (measured ~1.7x the per-match cost at 2 matches/doc)
    m_structs = F.transform(
        F.col(res)["matches"],
        lambda m: F.struct(
            m["tag"].alias("pred"),
            m["keyword"].alias("keyword"),
            sentence_of(res, m).alias("sentence"),
            m["sent_idx"].alias("sent_idx"),
            m["category"].alias("category"),
        ),
    )
    exploded = tagged.select(
        F.col(url_col).alias("subj"),
        (F.col(lang_col) if lang_col else F.lit(language)).alias("lang"),
        (F.col(ts_col) if ts_col else F.lit(None).cast("timestamp")).alias("warc_ts"),
        F.explode(m_structs).alias("m"),
    ).select(
        "subj",
        F.col("m")["pred"].alias("pred"),
        F.col("m")["keyword"].alias("keyword"),
        F.col("m")["sentence"].alias("sentence"),
        F.col("m")["sent_idx"].alias("sent_idx"),
        F.col("m")["category"].alias("category"),
        "lang",
        "warc_ts",
    )
    if canonicalize:
        cmap = canonical_map(rows)
        dim = spark.createDataFrame(
            list(cmap.items()), "pred string, obj string"
        )
        out = exploded.join(F.broadcast(dim), "pred", "left").withColumn(
            "obj", F.coalesce(F.col("obj"), F.col("pred"))
        )
    else:
        out = exploded.withColumn("obj", F.col("pred"))
    return out.select(*TRIPLE_COLUMNS)
