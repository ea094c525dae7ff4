"""C4-style web-page cleaning: heuristic line/page filters + global
line-level deduplication.

The standard Common-Crawl curation cuts (C4, Raffel et al. 2020, public):
keep lines that end in terminal punctuation and have enough words; drop
pages with too few sentences or containing boilerplate markers
("lorem ipsum", "{"); deduplicate exact lines ACROSS the whole corpus,
keeping only the first occurrence. The reference has no equivalent — this
is part of the training-data-pipeline surface the engine adds on top of
its §2 parity (README scale-design notes).

Scale shapes:

- ``c4_line_filter`` is a pure per-row map (split → filter → rejoin as
  native array expressions) — zero shuffle at any corpus size, and every
  predicate is a literal string op (no regex) so the DuckDB oracle runs
  the byte-identical logic.
- ``line_dedup`` is the one genuinely global op: explode lines → first
  occurrence per line via a map-side-combinable ``groupBy(line).min`` —
  never a window, which would buffer a boilerplate line's entire global
  group in one reducer ("subscribe to our newsletter" appears on ~every
  page of a domain; groupBy partials + AQE handle exactly that skew) —
  then an equi-join back and a per-doc reassembly groupBy whose groups
  are bounded by document size. Two key shuffles total, both equi-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "c4_line_filter",
    "line_dedup",
    "dedup_lines_in_doc",
    "boilerplate_lines",
    "domain_policy",
    "fix_mojibake",
    "mojibake_profile",
    "MOJIBAKE_TABLE",
    "TERMINAL_PUNCT",
    "badword_filter",
]

TERMINAL_PUNCT = (".", "!", "?", '"')


def _lines(text: Column) -> Column:
    """Trimmed non-empty lines of a document (array<string>)."""
    return F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), "\n"), F.trim),
        lambda x: x != "",
    )


def _word_count(line: Column) -> Column:
    # filter empty tokens so runs of whitespace ('a\t\tb  c') don't inflate
    # the count — matches C4's whitespace-split word count; still a literal
    # op the DuckDB oracle mirrors exactly
    return F.size(F.filter(F.split(line, " "), lambda x: x != ""))


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Per-document C4 heuristics. Output columns:

    - ``clean_text``: lines ending in terminal punctuation with at least
      ``min_words_per_line`` words, rejoined with ``\\n`` ('' if none)
    - ``n_lines`` / ``n_kept``: line counts before/after the filter
    - ``n_sentences``: terminal-punctuation marks in the kept text
    - ``page_kept``: ``n_sentences >= min_sentences`` and no boilerplate
      marker ('lorem ipsum' case-insensitive, or '{') anywhere on the page
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = _lines(text)
    kept = F.filter(
        lines,
        lambda x: F.substring(x, -1, 1).isin(*TERMINAL_PUNCT)
        & (_word_count(x) >= min_words_per_line),
    )
    clean_text = F.array_join(kept, "\n")
    # literal char-count (no regex → byte-identical in the SQL oracle)
    n_sent = F.length(clean_text) - F.length(
        F.replace(
            F.replace(F.replace(clean_text, F.lit("."), F.lit("")), F.lit("!"), F.lit("")),
            F.lit("?"),
            F.lit(""),
        )
    )
    low = F.lower(text)
    page_kept = (
        (n_sent >= min_sentences)
        & ~low.contains("lorem ipsum")
        & ~low.contains("{")
    )
    return df.select(
        F.col(id_col).alias("id"),
        clean_text.alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        n_sent.alias("n_sentences"),
        page_kept.alias("page_kept"),
    )


def dedup_lines_in_doc(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """WITHIN-document repeated-line removal (RefinedWeb-style template
    cleanup: nav bars and footers repeat inside one page): keep each
    distinct trimmed line at its first position, preserving order.
    Returns (id, clean_text, n_lines, n_kept).

    Pure per-row map — the intra-doc complement of the corpus-global
    ``line_dedup`` (no shuffle; run this first so the global pass sees
    each page's line set once). The keep-first filter is an index lambda
    over a PROJECTED line-array column (O(lines²) per row — bounded by
    page size, and the array must be a bound reference: a lambda over
    the `_lines(...)` subtree would re-split the document per line)."""
    lines_df = df.select(
        F.col(id_col).alias("id"), _lines(F.col(text_col)).alias("_ls")
    )
    ls = F.col("_ls")
    kept = F.filter(
        ls, lambda x, i: ~F.array_contains(F.slice(ls, 1, i), x)
    )
    return lines_df.select(
        "id",
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(ls).alias("n_lines"),
        F.size(kept).alias("n_kept"),
    )


def line_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-global exact line dedup, first occurrence wins (C4's
    cross-document line dedup). Returns one row per input document with
    ``clean_text`` = the document's surviving lines ('' when every line
    was a repeat of an earlier document's line).

    First occurrence = smallest ``(id, position)`` under the id column's
    own ordering — ``min(struct(id, pos))``, which Spark compares
    lexicographically field-by-field, so ANY orderable id type works
    (string doc ids are standard in web corpora; a numeric-packing scheme
    like ``id*1e6+pos`` would NULL out on strings and silently drop every
    line). Still a plain ``min`` with map-side partials. Dedup keys on the
    exact line text; at 100 TB swap the join key for ``xxhash64(line)`` to
    shrink shuffle width (collision-free in practice, same plan shape).
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_lines(F.col(text_col))).alias("pos", "line"),
    )
    # the min aggregate IS the survivor set — each distinct line's winning
    # (id, pos) — so no join back to `lines` is needed (the old
    # lines ⋈ firsts equi-join matched exactly one row per distinct line
    # and recomputed the whole explode pipeline as its probe side; removing
    # it drops 2 of 4 Exchanges, measured 1.5 -> 1.1 s at 100k docs)
    id_type = dict(df.dtypes).get(id_col)
    if id_type in ("tinyint", "smallint", "int", "bigint"):
        # integral ids: pack (id, pos) into one DECIMAL(38,0) so the min
        # has a fixed-width buffer and stays a HashAggregate — min over a
        # STRUCT buffer forces SortAggregate, i.e. two full sorts of the
        # exploded lines. key = id*2^31 + pos preserves the (id, pos)
        # lexicographic order exactly (pos < 2^31 always: a document's
        # line count is bounded by its 2 GiB string length), including
        # negative ids; decimal(38) holds ±2^63*2^31 without overflow.
        # Equivalence incl. negative/±2^62 ids pinned in
        # tests/test_round6_plans.py.
        big = F.lit(2 ** 31).cast("decimal(38,0)")
        key = F.col("id").cast("decimal(38,0)") * big + F.col("pos")
        packed = lines.groupBy("line").agg(F.min(key).alias("_k"))
        kid = F.floor(F.col("_k") / big)
        survivors = packed.select(
            kid.cast(id_type).alias("id"),
            (F.col("_k") - kid.cast("decimal(38,0)") * big).cast("int").alias("pos"),
            "line",
        )
    else:
        # any orderable id type (string doc ids are standard in web
        # corpora): lexicographic struct min — correct for every type,
        # at the cost of a sort-based aggregate
        firsts = lines.groupBy("line").agg(
            F.min(F.struct("id", "pos")).alias("first")
        )
        survivors = firsts.select(
            F.col("first.id").alias("id"), F.col("first.pos").alias("pos"), "line"
        )
    rebuilt = survivors.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .select("id", F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    text_col: str,
    *,
    min_ratio_ppm: int = 500_000,
    min_pages: int = 2,
) -> DataFrame:
    """Domain-scoped boilerplate detection: lines that repeat across a
    site's pages (nav menus, cookie banners, footers) — the CCNet/
    RefinedWeb site-template signal. Global line dedup (``line_dedup``)
    keeps the FIRST copy of a boilerplate line; this finds the TEMPLATE
    itself so a cleaner can strip every copy, including the first.

    Returns (domain, line, n_pages, domain_pages, ratio_ppm) for trimmed
    non-empty lines that appear on at least ``min_ratio_ppm`` / 1e6 of the
    domain's pages, restricted to domains with at least ``min_pages``
    pages (one-page domains would make every line 100% 'boilerplate').
    ratio_ppm = n_pages * 1e6 div domain_pages (integer — order-free).

    Scale shape: explode lines → DISTINCT (domain, line, id) (a line
    repeated WITHIN one page counts that page once) → groupBy(domain,
    line) count — both shuffle on the same leading key, map-side
    combinable — then one equi-join against the domain-sized page-count
    table. Never a window; the hot-domain key skew is the equi-key kind
    AQE splits.
    """
    if min_pages < 1:
        raise ValueError(f"min_pages must be >= 1, got {min_pages}")
    if not (0 < min_ratio_ppm <= 1_000_000):
        raise ValueError(
            f"min_ratio_ppm must be in (0, 1e6], got {min_ratio_ppm}"
        )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        F.col(text_col).alias("text"),
    ).where(F.col("domain").isNotNull())
    dpages = (
        base.select("domain", "id")
        .distinct()
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("domain_pages"))
        .where(F.col("domain_pages") >= F.lit(min_pages))
    )
    per_page = (
        base.select("domain", "id", F.explode(_lines(F.col("text"))).alias("line"))
        .distinct()
        .groupBy("domain", "line")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    return (
        per_page.join(dpages, "domain")
        .withColumn(
            "ratio_ppm",
            F.expr("n_pages * cast(1000000 as bigint) div domain_pages"),
        )
        .where(F.col("ratio_ppm") >= F.lit(min_ratio_ppm))
        .select("domain", "line", "n_pages", "domain_pages", "ratio_ppm")
    )


def domain_policy(
    df: DataFrame,
    domain_col: str,
    score_col: str,
    keep_col: str,
    *,
    min_pages: int = 3,
    min_mean_score: int = 0,
    min_keep_ppm: int = 500_000,
) -> DataFrame:
    """Per-domain curation policy: aggregate page-level quality into a
    site-level keep/drop verdict — the RefinedWeb/C4 blocklist-builder
    step (spam farms fail page filters consistently; dropping the whole
    domain beats re-scoring its pages forever).

    Inputs are page rows with an integer quality score (e.g.
    ``textstats.hashed_linear_score`` micro-units) and a boolean keep
    flag (e.g. the Gopher composite). Returns per domain: n_pages,
    mean_score (integer floor mean — order-free), keep_ppm, and
    ``verdict``: 'keep' when mean_score >= min_mean_score AND
    keep_ppm >= min_keep_ppm, 'drop' when both fail or either fails,
    'review' when the domain has fewer than ``min_pages`` pages (too
    little evidence to blocklist — route to the next crawl). NULL
    domains and NULL scores are excluded (a page that failed scoring
    cannot vote).

    Scale shape: ONE map-side-combinable groupBy(domain) — sums and
    counts only, no distincts, no windows; domain cardinality is ~1e7 at
    crawl scale, far below page count.
    """
    if min_pages < 1:
        raise ValueError(f"min_pages must be >= 1, got {min_pages}")
    base = df.select(
        F.col(domain_col).alias("domain"),
        F.col(score_col).cast("long").alias("score"),
        F.col(keep_col).cast("boolean").alias("keep"),
    ).where(F.col("domain").isNotNull() & F.col("score").isNotNull())
    agg = base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("score").alias("_sum"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("_kept"),
    )
    mean = F.expr("_sum div n_pages")
    keep_ppm = F.expr("_kept * cast(1000000 as bigint) div n_pages")
    return agg.select(
        "domain",
        "n_pages",
        mean.alias("mean_score"),
        keep_ppm.alias("keep_ppm"),
        F.when(F.col("n_pages") < F.lit(min_pages), F.lit("review"))
        .when(
            (mean >= F.lit(min_mean_score)) & (keep_ppm >= F.lit(min_keep_ppm)),
            F.lit("keep"),
        )
        .otherwise(F.lit("drop"))
        .alias("verdict"),
    )


# UTF-8-bytes-read-as-cp1252 repair table: the classic web-crawl mojibake
# (a page emitted as UTF-8 but transcoded through Latin-1/cp1252 somewhere
# in its pipeline). Each entry maps the 2-3 character garbled form back to
# the intended code point. ORDER MATTERS and is part of the contract:
# 3-char punctuation forms first (their first char Ã¢/â prefixes some
# 2-char forms), then the 2-char accents. Entries whose cp1252 image
# contains an unmapped C1 control byte (e.g. the right-double-quote 0x9D)
# cannot round-trip through text and are deliberately absent. The table is
# pure public knowledge (the UTF-8/cp1252 code charts); it repairs the
# high-frequency Western-European + smart-punctuation cases, not every
# possible double-encoding.
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã ", "à"),  # Ã +NBSP -> à
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â°", "°"),  # Â° -> °
    ("Â ", " "),  # Â+NBSP -> NBSP
)


def fix_mojibake(col: Column) -> Column:
    """Repair classic UTF-8-read-as-cp1252 mojibake via the fixed
    ``MOJIBAKE_TABLE`` replace chain — literal ``replace``s only (no
    regex, no UDF), so the DuckDB oracle applies the identical chain and
    value-hashes. NULL-safe (NULL passes through as NULL)."""
    out = col
    for bad, good in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def mojibake_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mojibake diagnosis + repair: (id, n_mojibake, fixed,
    changed). ``n_mojibake`` counts occurrences of every
    ``MOJIBAKE_TABLE`` garbled form in the ORIGINAL text — each marker
    counted independently BEFORE any replacement via the portable
    ``(len(t) - len(replace(t, m, ''))) div len(m)`` identity (markers
    start at distinct positions, so independent counts are exact; all
    char-based lengths, identical across engines). NULL text profiles as
    (0, '', false), matching the corpus NULL→'' fill contract (P4).

    A curation pipeline thresholds on ``n_mojibake`` (a page whose text
    is saturated with unrepairable double-encoding should drop, not
    repair) and keeps ``fixed`` otherwise.

    Scale shape: pure map — one projection, zero shuffle, zero Python.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        (F.length(t) - F.length(F.replace(t, F.lit(bad), F.lit("")))) / len(bad)
        for bad, _ in MOJIBAKE_TABLE
    ]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    fixed = fix_mojibake(t)
    return df.select(
        F.col(id_col).alias("id"),
        total.cast("int").alias("n_mojibake"),
        fixed.alias("fixed"),
        (fixed != t).alias("changed"),
    )


def badword_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    words: list[str],
    *,
    max_bad_ppm: int = 0,
) -> DataFrame:
    """C4-style blocklist filtering: flag documents containing blocklist
    TOKENS (whitespace-token exact match on the lowercased text — the
    scalable, false-positive-safe form: 'assess' never matches 'ass';
    multi-word entries are matched as token phrases by the caller via
    ``tagger``/``automaton`` when needed, this operator is the
    single-token hot path the original C4 badwords pass is).

    Returns every input row as ``(id, n_tokens, n_bad, bad_ppm, keep)``
    with ``bad_ppm = 10^6 · n_bad div max(n_tokens, 1)`` and ``keep = 1``
    iff ``bad_ppm <= max_bad_ppm`` (default 0: C4's any-hit drop). NULL
    text counts zero tokens and keeps.

    Scale shape: the blocklist ships as a broadcast dimension joined on
    the exploded token — NOT a giant alternation regex (a 10^4-entry
    regex de-optimizes the whole scan; a hash join on tokens doesn't) —
    then one map-side-combinable count per doc and a join back to the
    (id) spine. The blocklist is dimension-sized by definition.
    """
    if max_bad_ppm < 0 or max_bad_ppm > 1_000_000:
        raise ValueError(
            f"max_bad_ppm must be in [0, 10^6], got {max_bad_ppm}"
        )
    if not words:
        raise ValueError("words must be non-empty")
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(w.lower(),) for w in sorted(set(words))], "tok string"
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(
                        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        r"\s+",
                        " ",
                    )
                ),
                " ",
            )
        ).alias("tok"),
    ).where(F.col("tok") != "")
    per_doc = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_tokens"))
    bad = (
        toks.join(F.broadcast(dim), "tok")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )
    spine = df.select(F.col(id_col).alias("id"))
    out = (
        spine.join(per_doc, "id", "left")
        .join(bad, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_bad", F.lit(0)).cast("long").alias("n_bad"),
        )
    )
    ppm = F.floor(
        (F.lit(1_000_000) * F.col("n_bad"))
        / F.greatest(F.col("n_tokens"), F.lit(1))
    ).cast("long")
    return out.select(
        "id",
        "n_tokens",
        "n_bad",
        ppm.alias("bad_ppm"),
        (ppm <= max_bad_ppm).cast("int").alias("keep"),
    )
