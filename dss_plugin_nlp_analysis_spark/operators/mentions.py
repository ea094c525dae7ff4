"""Free-text micro-mention extraction: dates and attributed quotes.

Temporal grounding and quotation provenance are the two mention classes
a web-KG build needs beyond entities: a fact without a date can't enter
the temporal fact table (``kg.triple_history`` / ``kg.current_facts``),
and a quote without a speaker is unattributable training data. Both
extractors are regex families over raw text in the Java-regex ∩ RE2
common subset (the cross-engine contract of operators/pii.py), so the
DuckDB oracle reproduces every extraction byte-for-byte.

Scale shape: pure per-row projections — per pattern two-to-three
positionally-aligned ``regexp_extract_all`` passes zipped and exploded
once (the hearst_patterns formulation). Zero shuffle at any corpus
size; downstream aggregation is the caller's one combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_dates", "extract_quotes", "resolve_pronouns", "MONTHS", "DATE_PATTERNS", "PRONOUNS", "mine_acronyms"]

MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]

_MONTH_ALT = "|".join(MONTHS)
_DAY = r"(0?[1-9]|[12][0-9]|3[01])"
_MON_NUM = r"(0?[1-9]|1[0-2])"

# (kind, regex, year_group, month_group, day_group, month_is_name)
DATE_PATTERNS: list[tuple[str, str, int, int, int, bool]] = [
    ("iso", r"\b(\d{4})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])\b",
     1, 2, 3, False),
    ("us_slash", r"\b" + _MON_NUM + "/" + _DAY + r"/(\d{4})\b",
     3, 1, 2, False),
    ("month_dmy", r"\b" + _DAY + " (" + _MONTH_ALT + r") (\d{4})\b",
     3, 2, 1, True),
    ("month_mdy", r"\b(" + _MONTH_ALT + ") " + _DAY + r", (\d{4})\b",
     3, 1, 2, True),
]


def _month_num(col: Column, is_name: bool) -> Column:
    if not is_name:
        return col.cast("int")
    expr = F.lit(None).cast("int")
    for i, name in enumerate(MONTHS, start=1):
        expr = F.when(col == name, F.lit(i)).otherwise(expr)
    return expr


def extract_dates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Date mentions normalized to ISO-8601: (id, raw, iso, kind) per
    match, covering the four dominant web-date shapes — ISO
    (2021-03-05), US slash (3/5/2021), day-month-year (5 March 2021)
    and month-day-year (March 5, 2021). ``raw`` is the exact matched
    substring; ``iso`` is ``yyyy-MM-dd`` with zero-padding. Syntactic
    validation lives in the regexes (month 1-12, day 1-31); calendar
    validation (Feb 30) is deliberately not applied — both engines
    normalize the same digits, and a KG ingestion pass filters
    impossible dates with its own policy.

    Scale shape: per pattern, aligned group extractions zipped and
    concatenated into ONE explode (hearst_patterns formulation) — pure
    map, zero shuffle.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    arrays = []
    for kind, rex, yg, mg, dg, is_name in DATE_PATTERNS:
        z = F.arrays_zip(
            F.regexp_extract_all(text, F.lit(rex), 0).alias("raw"),
            F.regexp_extract_all(text, F.lit(rex), yg).alias("y"),
            F.regexp_extract_all(text, F.lit(rex), mg).alias("m"),
            F.regexp_extract_all(text, F.lit(rex), dg).alias("d"),
        )

        def _tag(kind=kind, is_name=is_name):
            return lambda s: F.struct(
                s["raw"].alias("raw"),
                F.concat(
                    s["y"],
                    F.lit("-"),
                    F.lpad(_month_num(s["m"], is_name).cast("string"), 2, "0"),
                    F.lit("-"),
                    F.lpad(s["d"].cast("int").cast("string"), 2, "0"),
                ).alias("iso"),
                F.lit(kind).alias("kind"),
            )

        arrays.append(F.transform(z, _tag()))
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.concat(*arrays)).alias("m")
    ).select(
        "id",
        F.col("m.raw").alias("raw"),
        F.col("m.iso").alias("iso"),
        F.col("m.kind").alias("kind"),
    )


_SAY = r"(?:said|says|told|wrote)"
# (pattern_name, regex, speaker_group, quote_group)
QUOTE_PATTERNS: list[tuple[str, str, int, int]] = [
    ("speaker_first",
     r'\b([A-Z][A-Za-z]+) ' + _SAY + r'[,:]? "([^"]+)"', 1, 2),
    # lazy quote group so the optional comma stays OUTSIDE the captured
    # text ('"we shipped it," said Bob' -> 'we shipped it'); lazy
    # quantifiers are in the Java∩RE2 common subset
    ("quote_first",
     r'"([^"]+?),?" ' + _SAY + r' ([A-Z][A-Za-z]+)', 2, 1),
]


def extract_quotes(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Attributed quotations: (id, speaker, quote, pattern) for the two
    canonical newswire attribution shapes — ``X said, "…"`` and
    ``"…," said X``. Speaker is the single capitalized token adjacent
    to the speech verb (multi-token names need the entity tagger — run
    ``kg.build_triples`` and join on the sentence instead when an
    ontology is available; this extractor is the ontology-free
    bootstrap). Quote text is the inner span without the delimiting
    double quotes.

    Scale shape: identical to ``extract_dates`` — aligned group
    extractions per pattern, one explode, zero shuffle.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    arrays = []
    for name, rex, sg, qg in QUOTE_PATTERNS:
        z = F.arrays_zip(
            F.regexp_extract_all(text, F.lit(rex), sg).alias("speaker"),
            F.regexp_extract_all(text, F.lit(rex), qg).alias("quote"),
        )

        def _tag(name=name):
            return lambda s: F.struct(
                s["speaker"].alias("speaker"),
                s["quote"].alias("quote"),
                F.lit(name).alias("pattern"),
            )

        arrays.append(F.transform(z, _tag()))
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.concat(*arrays)).alias("m")
    ).select(
        "id",
        F.col("m.speaker").alias("speaker"),
        F.col("m.quote").alias("quote"),
        F.col("m.pattern").alias("pattern"),
    )


# third-person English pronouns the nearest-antecedent heuristic resolves;
# token match runs over the lowercased dedup normalization
PRONOUNS = ("he", "she", "it", "they", "him", "her", "them")


def resolve_pronouns(
    df: DataFrame,
    id_col: str,
    text_col: str,
    entities: list[str],
    *,
    max_distance: int = 20,
) -> DataFrame:
    """Heuristic pronoun resolution for KG triple recall: each pronoun
    token resolves to the NEAREST PRECEDING entity token within
    ``max_distance`` tokens — the classic recency baseline (Hobbs-style
    search order collapsed to linear distance; no syntax, no agreement).
    A coreference pass before relation extraction recovers the triples
    whose subject is "he/she/it" rather than the entity surface form.

    ``entities`` is a driver-side lexicon (ontology-object-scale by
    contract, like the tagger's ontology and the stopword table — NOT a
    corpus-derived set); matching is whole-token over the lowercased
    dedup normalization. Returns (id, pronoun_idx, pronoun,
    antecedent_idx, antecedent) — 1-based token indices, one row per
    pronoun occurrence, antecedent NULL when no entity precedes within
    the window (kept for recall accounting).

    Scale shape: pure map, zero shuffle. The token array and the entity-
    index array are BOTH materialized projections before any lambda
    references them (HOF re-eval trap, TODO.md round 4); per-pronoun
    work is O(|entity positions in doc|).
    """
    if not entities:
        raise ValueError("entities lexicon must be non-empty")
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    from dss_plugin_nlp_analysis_spark.operators.dedup import normalized_text

    ent_arr = F.array(*[F.lit(e.lower()) for e in sorted(set(entities))])
    pron_arr = F.array(*[F.lit(p) for p in PRONOUNS])
    toks_df = df.select(
        F.col(id_col).alias("id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"),
    )
    idx_df = toks_df.select(
        "id",
        "_toks",
        F.filter(
            F.sequence(F.lit(1), F.size("_toks")),
            lambda i: F.array_contains(ent_arr, F.element_at(F.col("_toks"), i.cast("int"))),
        ).alias("_ents"),
    )
    pron_rows = F.transform(
        F.filter(
            F.sequence(F.lit(1), F.size("_toks")),
            lambda i: F.array_contains(pron_arr, F.element_at(F.col("_toks"), i.cast("int"))),
        ),
        lambda i: F.struct(
            i.cast("int").alias("pronoun_idx"),
            F.element_at(F.col("_toks"), i.cast("int")).alias("pronoun"),
            F.array_max(
                F.filter(
                    F.col("_ents"),
                    lambda e: (e < i) & (i - e <= max_distance),
                )
            ).cast("int").alias("antecedent_idx"),
        ),
    )
    return idx_df.select(
        "id", "_toks", F.explode(pron_rows).alias("r")
    ).select(
        "id",
        F.col("r.pronoun_idx").alias("pronoun_idx"),
        F.col("r.pronoun").alias("pronoun"),
        F.col("r.antecedent_idx").alias("antecedent_idx"),
        # F.get (0-based), NOT element_at: Spark 4.1.2's element_at with a
        # NULL-evaluating computed index returns the LAST element instead
        # of NULL (reproduced in tests/test_round5_ops3.py's probe note);
        # get() handles NULL and out-of-bounds as NULL
        F.get(F.col("_toks"), F.col("r.antecedent_idx") - 1).alias("antecedent"),
    )


# phrase of 1-5 words immediately before a parenthesized 2-5-letter
# uppercase acronym; two passes share one pattern (module contract)
_ACRO_PHRASE_RE = r"((?:[A-Za-z]+ ){1,5})\(([A-Z]{2,5})\)"


def mine_acronyms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Acronym/expansion alias mining: ``"knowledge graph (KG)"`` →
    ``(id, acronym='KG', expansion='knowledge graph')`` — the classic
    in-document alias-pair signal that feeds the KG alias graph
    (``canonical_map`` / ``alias_canon``) alongside anchor text and
    hreflang: an acronym defined this way is the highest-precision
    surface-form alias the page itself asserts.

    A candidate (phrase, ACRO) survives only if the LAST ``len(ACRO)``
    words of the phrase initial-match the acronym case-insensitively,
    letter for letter ("United Nations (UN)" yes; "the company (IBM)"
    no). Emitted expansion = exactly those matched words, lowercased —
    one row per surviving definition site, duplicates within a page
    kept (frequency is signal for the alias-graph weighting).

    Scale shape: two zipped single-group regex passes over one pattern
    + native array ops for the initials check (split/slice/zip/forall —
    no UDF); pure map + explode, zero shuffle.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    cands = F.arrays_zip(
        F.regexp_extract_all(text, F.lit(_ACRO_PHRASE_RE), 1).alias("phrase"),
        F.regexp_extract_all(text, F.lit(_ACRO_PHRASE_RE), 2).alias("acr"),
    )
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(cands).alias("c")
    ).select(
        "id",
        F.split(F.trim(F.col("c.phrase")), " ").alias("words"),
        F.col("c.acr").alias("acronym"),
    )
    alen = F.length("acronym")
    wsize = F.size("words")
    tail = F.slice(
        F.col("words"), (wsize - alen + 1).cast("int"), alen.cast("int")
    )
    chars = F.split(F.col("acronym"), "")
    ok = (wsize >= alen) & F.forall(
        F.arrays_zip(tail.alias("w"), chars.alias("ch")),
        lambda z: F.upper(F.substring(z["w"], 1, 1)) == z["ch"],
    )
    return (
        ex.where(ok)
        .select(
            "id",
            "acronym",
            F.lower(F.array_join(tail, " ")).alias("expansion"),
        )
    )
