"""Ontology preparation: cleaning (native Spark) + pattern compilation.

Reference semantics (SEMANTICS.md §5):
- python-lib/nlp/ontology_tagging/ontology_tagger.py:145-154 — "" → NULL,
  drop rows with NULL keyword/tag, error when empty (P1 in SURVEY.md §2.2).
- ontology_tagger.py:156-160 — NULL/"" category → "uncategorized" (P2).
- ontology_tagger.py:162-232 — keyword normalization + tokenization into
  per-language match patterns (J1/J2 build side).

The ontology is broadcast-sized by design (SURVEY.md §1.4): cleaning runs
as native Catalyst ops; compilation collects the cleaned rows to the driver
and builds per-language token patterns to ship via ``sc.broadcast``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lemmas import lemma_table, lemmatize_tokens
from ..functions.textnorm import normalize_text
from ..functions.tokenizer import tokenize
from .automaton import TokenAutomaton

__all__ = [
    "TagOptions",
    "CompiledOntology",
    "clean_ontology",
    "compile_ontology",
    "align_ontologies",
    "keyword_match_tokens",
]

UNCATEGORIZED = "uncategorized"


@dataclass(frozen=True)
class TagOptions:
    """Matching options (recipe.json:348-383 of the reference).

    ``link_entities`` is new surface (SEMANTICS.md §8): when a keyword maps
    to several tags, score candidates by context-token overlap with each
    tag's other keywords instead of the reference's dict-order tie rules.
    """

    ignore_case: bool = False
    lemmatization: bool = False
    ignore_diacritics: bool = False
    link_entities: bool = False


def clean_ontology(
    df: DataFrame,
    tag_col: str = "tag",
    keyword_col: str = "keyword",
    category_col: str | None = None,
) -> DataFrame:
    """P1 + P2 as native Catalyst ops; returns columns (tag, keyword[, category])."""
    tag = F.nullif(F.col(tag_col), F.lit(""))
    keyword = F.nullif(F.col(keyword_col), F.lit(""))
    cols = [tag.alias("tag"), keyword.alias("keyword")]
    if category_col:
        cols.append(
            F.coalesce(F.nullif(F.col(category_col), F.lit("")), F.lit(UNCATEGORIZED)).alias("category")
        )
    return df.select(*cols).where(F.col("tag").isNotNull() & F.col("keyword").isNotNull())


@dataclass
class CompiledOntology:
    """Driver-built, picklable match spec: per-language patterns + payloads.

    ``payloads[i] = (tag, category)`` for ontology row i (post-clean order —
    order carries the dup-keyword tie rules, SEMANTICS.md §5).
    ``patterns[lang][i]`` is row i's match-key token tuple for ``lang``.
    Automata are built lazily per process and memoized (pickling ships only
    the compact pattern lists to executors).
    """

    payloads: list[tuple[str, str | None]]
    patterns: dict[str, list[tuple[str, ...]]]
    lemma_tables: dict[str, dict[str, str]]
    options: TagOptions
    has_category: bool
    # entity-linking context profiles: lang -> payload_idx -> frozenset of
    # tokens from the same tag's OTHER keywords (SEMANTICS.md §8)
    profiles: dict[str, dict[int, frozenset[str]]] = field(default_factory=dict)
    _automata: dict[str, TokenAutomaton] = field(default_factory=dict, repr=False)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_automata"] = {}  # rebuild on the executor
        return state

    def automaton_for(self, lang: str) -> TokenAutomaton:
        auto = self._automata.get(lang)
        if auto is None:
            auto = TokenAutomaton()
            for idx, toks in enumerate(self.patterns[lang]):
                auto.add(toks, idx)
            auto.build()
            self._automata[lang] = auto
        return auto

    def languages(self) -> list[str]:
        return list(self.patterns)


def keyword_match_tokens(
    keyword: str, lang: str, options: TagOptions, table: dict[str, str]
) -> tuple[str, ...]:
    """Normalize + tokenize (+ lemmatize) one keyword into its match-key
    token tuple (ontology_tagger.py:196-232 semantics)."""
    norm = normalize_text(
        keyword,
        ignore_case=options.ignore_case,
        lemmatization=options.lemmatization,
        ignore_diacritics=options.ignore_diacritics,
    )
    toks = [t.text for t in tokenize(norm, lang)]
    if options.lemmatization:
        toks = lemmatize_tokens(toks, table)
    return tuple(toks)


def compile_ontology(
    rows: list[tuple[str, str, str | None]],
    languages: list[str],
    options: TagOptions,
    has_category: bool,
    lemma_lookup_dir: str | None = None,
) -> CompiledOntology:
    """Compile cleaned ontology rows ``(tag, keyword, category)`` into a
    broadcastable match spec for each document language."""
    if not rows:
        raise ValueError(
            "No valid tags were found: the ontology must contain at least "
            "one row with both a keyword and a tag (reference "
            "ontology_tagger.py:151-154)."
        )
    payloads = [(tag, category) for tag, _kw, category in rows]
    tables = {
        lang: (lemma_table(lang, lemma_lookup_dir) if options.lemmatization else {})
        for lang in languages
    }
    patterns = {
        lang: [keyword_match_tokens(kw, lang, options, tables[lang]) for _t, kw, _c in rows]
        for lang in languages
    }
    profiles: dict[str, dict[int, frozenset[str]]] = {}
    if options.link_entities:
        for lang in languages:
            by_tag: dict[str, set[str]] = {}
            for idx, (tag, _cat) in enumerate(payloads):
                by_tag.setdefault(tag, set()).update(patterns[lang][idx])
            profiles[lang] = {
                idx: frozenset(by_tag[tag] - set(patterns[lang][idx]))
                for idx, (tag, _cat) in enumerate(payloads)
            }
    return CompiledOntology(
        payloads=payloads,
        patterns=patterns,
        lemma_tables=tables,
        options=options,
        has_category=has_category,
        profiles=profiles,
    )


def align_ontologies(
    left: DataFrame,
    right: DataFrame,
    tag_col: str = "tag",
    keyword_col: str = "keyword",
    *,
    min_jaccard_ppm: int = 0,
    normalize: bool = True,
) -> DataFrame:
    """Ontology-version alignment: match tags of one ontology release to
    tags of another by the overlap of their keyword (alias) sets — the
    maintenance step of a living KG, where each release renames/merges
    tags and the pipeline must map old canonical nodes onto new ones.

    Candidate pairs are *blocked* by a shared normalized keyword (an
    equi-join on the keyword — never a tag x tag cartesian; a pair with
    zero shared aliases is unmatchable by definition and is never
    generated).  Each surviving pair is scored by keyword-set Jaccard in
    integer ppm: ``10^6 * |A ∩ B| / (|A| + |B| - |A ∩ B|)`` (floor).
    ``normalize`` lower-cases and trims keywords first, so case-variant
    releases still align; sizes are counted over the same normalized
    distinct sets the intersection uses (a tag whose aliases differ only
    by case counts them once — documented, matches the join key).

    Returns ``(tag_left, tag_right, shared, size_left, size_right,
    jaccard_ppm)`` filtered to ``jaccard_ppm >= min_jaccard_ppm``.

    Scale shape: ontologies are dimension-sized (SURVEY.md §1.4) but the
    same plan holds for alias tables far beyond broadcast size — two
    distinct-projections, one equi-join on the keyword, two
    map-side-combinable counts.  A stopword-like alias shared by k_L ·
    k_R tags bounds the pair blowup exactly as the wedge pivot does in
    ``graph.neighbor_jaccard``; callers with such aliases should drop
    them upstream (they carry no alignment signal).
    """
    if min_jaccard_ppm < 0 or min_jaccard_ppm > 1_000_000:
        raise ValueError(
            f"min_jaccard_ppm must be in [0, 10^6], got {min_jaccard_ppm}"
        )

    def prep(df: DataFrame, side: str) -> DataFrame:
        kw = F.col(keyword_col).cast("string")
        if normalize:
            kw = F.lower(F.trim(kw))
        return (
            df.select(
                F.col(tag_col).cast("string").alias(f"tag_{side}"),
                kw.alias("_kw"),
            )
            .where(F.col(f"tag_{side}").isNotNull() & F.col("_kw").isNotNull())
            .distinct()
        )

    lhs, rhs = prep(left, "left"), prep(right, "right")
    size_l = lhs.groupBy("tag_left").agg(F.count(F.lit(1)).alias("size_left"))
    size_r = rhs.groupBy("tag_right").agg(
        F.count(F.lit(1)).alias("size_right")
    )
    shared = (
        lhs.join(rhs, "_kw")
        .groupBy("tag_left", "tag_right")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(size_l, "tag_left")
        .join(size_r, "tag_right")
        .withColumn(
            "jaccard_ppm",
            F.floor(
                (F.lit(1_000_000) * F.col("shared"))
                / (F.col("size_left") + F.col("size_right") - F.col("shared"))
            ).cast("long"),
        )
    )
    return out.select(
        "tag_left",
        "tag_right",
        F.col("shared").cast("long").alias("shared"),
        F.col("size_left").cast("long").alias("size_left"),
        F.col("size_right").cast("long").alias("size_right"),
        "jaccard_ppm",
    ).where(F.col("jaccard_ppm") >= min_jaccard_ppm)
