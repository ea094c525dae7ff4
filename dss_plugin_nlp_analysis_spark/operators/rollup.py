"""Time-series rollups and a deterministic distinct-count sketch.

``rollup_time`` is the hypertable-style continuous-aggregate shape
(TimescaleDB's public concept): the same measure pre-aggregated at
several time granularities in one pass, labeled by granularity, so
dashboards read the coarse rows and drill into the fine ones.

``kmv_distinct`` is a K-Minimum-Values cardinality sketch (Bar-Yossef
et al. 2002, public): the k smallest md5 hashes of the distinct values;
estimate = (k−1) · 2^60 / kth_min (hashes uniform on [0, 2^60) via the
15-hex-digit prefix). Unlike HLL it is fully DETERMINISTIC given the
data — the oracle replicates it bit-for-bit — and mergeable (min-k of a
union). The plan is scale-safe: distinct on the hash, then Spark's
sort+limit (TakeOrderedAndProject = per-partition partial top-k, no
global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rollup_time", "kmv_distinct", "burst_buckets", "transition_counts", "funnel_counts", "cohort_retention", "cube_aggregate", "group_percentiles", "event_paths"]


def rollup_time(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    granularities: dict[str, int],
    key_col: str | None = None,
) -> DataFrame:
    """Union of per-granularity aggregates of ``value_col``:
    (gran, bucket_start, [key], n, sum_value, min_value, max_value).

    ``granularities`` maps label → seconds (e.g. {'1m': 60, '1h': 3600});
    ``ts_col`` is integer epoch seconds (cast upstream — integer bucket
    arithmetic ``ts - ts % g`` is engine-exact, unlike date_trunc whose
    timezone/week rules differ across engines). Every aggregate is
    map-side combinable; the union is G independent groupBys over one
    scan each (Spark caches nothing here — persist upstream if the
    source is expensive)."""
    if not granularities:
        raise ValueError("granularities must be non-empty")
    outs = []
    keys = [F.col(key_col).alias("key")] if key_col else []
    for label, g in sorted(granularities.items()):
        bucket = (F.col(ts_col) - F.col(ts_col) % F.lit(int(g))).alias("bucket_start")
        outs.append(
            df.groupBy(F.lit(label).alias("gran"), bucket, *keys).agg(
                F.count("*").alias("n"),
                F.sum(value_col).alias("sum_value"),
                F.min(value_col).alias("min_value"),
                F.max(value_col).alias("max_value"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """K-Minimum-Values sketch of ``col``'s distinct cardinality.

    Returns ONE row: (k_used, kth_hash, estimate) where ``k_used`` =
    min(k, observed distinct count), ``kth_hash`` is the k_used-th
    smallest 60-bit md5 hash, and ``estimate`` = (k_used−1)·2^60 /
    kth_hash (the exact distinct count when fewer than k values exist —
    the sketch degrades to exact below its capacity). NULLs are ignored.
    Deterministic: same data ⇒ same sketch, any partitioning."""
    hashed = (
        df.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .select(F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 15), 16, 10)
                .cast("long").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = hashed.agg(
        F.count("*").alias("k_used"), F.max("h").alias("kth_hash")
    )
    two60 = float(1 << 60)
    return agg.select(
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise((F.col("k_used") - 1) * F.lit(two60) / F.col("kth_hash"))
        .alias("estimate"),
    )


def burst_buckets(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    *,
    sigma: int = 3,
) -> DataFrame:
    """Deterministic burst detection over bucketed event counts: for each
    (key, bucket), flag the bucket whose count sits more than ``sigma``
    standard deviations above the key's mean bucket count — the
    crawl-rate / ingest-anomaly monitor (a domain whose fetch count
    explodes in one hour is a crawler trap or a site dump; a tag whose
    mention count bursts is a news event).

    The test is evaluated ENTIRELY in integer arithmetic — the
    variance inequality cleared of divisions::

        (n*x - s)^2  >  sigma^2 * (n*ssq - s^2)    and    n*x > s

    (x = bucket count, n = #buckets for the key, s = sum of counts,
    ssq = sum of squared counts; the second conjunct keeps the flag
    one-sided — only bursts, not droughts). Identical on every engine:
    no doubles, no sqrt, no libm. Intermediates are decimal(38,0)
    (Spark) / int128 (DuckDB's HUGEINT) — n*ssq overflows int64 at web
    scale (1e4 buckets x (1e6 events)^2 = 1e20), so 128-bit
    intermediates are part of the operator contract, not an
    implementation nicety.

    Returns (key, bucket, cnt, is_burst) with is_burst as int 0/1.
    Scale shape: two map-side-combinable groupBys (per-(key,bucket),
    then per-key moments riding the same key) + one key-keyed equi-join
    — counts only, never raw rows; AQE skew-splits hot keys. Keys with
    a single bucket have zero variance and n*x == s: never flagged.
    """
    if sigma < 1:
        raise ValueError(f"sigma must be >= 1, got {sigma}")
    counts = df.groupBy(
        F.col(key_col).alias("key"), F.col(bucket_col).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    d = "cast(cnt as decimal(38, 0))"
    stats = counts.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"sum({d})").alias("s"),
        F.expr(f"sum({d} * {d})").alias("ssq"),
    )
    j = counts.join(stats, "key")
    lhs = "(cast(n as decimal(38,0)) * cnt - s)"
    var_n2 = "(cast(n as decimal(38,0)) * ssq - s * s)"
    return j.select(
        "key",
        "bucket",
        "cnt",
        F.expr(
            f"cast(({lhs} * {lhs} > {sigma} * {sigma} * {var_n2})"
            f" and (cast(n as decimal(38,0)) * cnt > s) as int)"
        ).alias("is_burst"),
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition statistics over per-user event
    sequences: (from_type, to_type, n_transitions, prob_ppm) where
    ``prob_ppm`` is the conditional next-event probability in integer
    parts-per-million (``(1e6 * n) div total-from-from_type`` — floor
    division, engine-portable). The training-data pass behind
    next-action / session-recommendation models, and the transition
    matrix a behavioral-anomaly monitor baselines against.

    Ordering contract: each user's stream is ordered by ``(ts, seq)`` —
    the sequence id breaks timestamp ties so the transition set is
    deterministic under any partitioning. Rows with a NULL type or NULL
    timestamp are dropped BEFORE sequencing (Spark orders NULLS FIRST,
    ANSI engines NULLS LAST — excluding them is the only portable
    contract, and an event with no timestamp has no position anyway).

    Scale shape: the one ordered window is partitioned by user —
    bounded by a single user's activity, never corpus-global (the
    degenerate-key hazard of unordered windows doesn't apply; per-user
    cardinality is the natural shard). Downstream is two map-side-
    combinable groupBys joined on from_type (event-type-count rows — a
    dimension join AQE broadcasts)."""
    w = Window.partitionBy(F.col("u")).orderBy(F.col("_ts"), F.col("_seq"))
    base = events.where(
        F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("from_type"),
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
    )
    pairs = base.withColumn(
        "to_type", F.lead("from_type").over(w)
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("_total")
    )
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr(
            "(cast(1000000 as bigint) * n_transitions) div _total"
        ).alias("prob_ppm"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel analysis: for the step sequence [s1, s2, ...],
    how many users performed s1, then s2 strictly after it, then s3
    strictly after that, ... — (step_idx, step, n_users). The classic
    conversion funnel, and the event-sequence labeling pass a
    behavior-model training set starts from.

    Semantics: a user converts step i+1 iff they have an event of that
    type strictly after their earliest qualifying completion of step i,
    where "after" is the total order (ts, seq) — the sequence id breaks
    timestamp ties, so the funnel is deterministic under any
    partitioning. Greedy earliest-completion is exact for existence: if
    ANY ordered chain exists, the earliest one does. Rows with a NULL
    user, type, timestamp, OR sequence id are excluded — the portable
    contract (``transition_counts`` docstring): Spark's struct ordering
    puts a NULL seq FIRST within a timestamp tie while ANSI engines
    sort it last, a NULL user would otherwise count as one phantom
    step-0 "user" who can never convert, and a NULL ts/seq has no
    position.

    Scale shape: per step one map-side-combinable min-struct groupBy
    over that step's (filtered) events + one user-keyed equi-join to
    the previous frontier — k-1 joins for a k-step funnel, frontier
    always user-count-sized and shrinking. No windows, no collects."""
    if not steps:
        raise ValueError("steps must be non-empty")
    base = events.where(
        F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(seq_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.struct(F.col(ts_col).alias("ts"), F.col(seq_col).alias("seq"))
        .alias("pos"),
    )
    frontier = (
        base.where(F.col("t") == steps[0])
        .groupBy("u")
        .agg(F.min("pos").alias("pos"))
    )
    rows = [frontier.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit(0).alias("step_idx"), F.lit(steps[0]).alias("step"), "n_users"
    )]
    for i, step in enumerate(steps[1:], start=1):
        cand = base.where(F.col("t") == step).select(
            "u", F.col("pos").alias("cpos")
        )
        frontier = (
            frontier.join(cand, "u")
            .where(F.col("cpos") > F.col("pos"))
            .groupBy("u")
            .agg(F.min("cpos").alias("pos"))
        )
        rows.append(
            frontier.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step_idx"), F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.union(r)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST active
    week, counted in every later week they were active —
    (cohort_week, week_offset, n_users). The standard curation metric
    for longitudinal corpora (does a crawl keep seeing the same hosts?)
    and the product-analytics staple.

    Weeks are integer epoch-day buckets (``days_since_1970 div 7``) —
    pure int arithmetic both engines evaluate identically; calendar
    date_trunc('week') semantics (ISO vs locale week starts) are
    deliberately avoided. NULL timestamps are excluded.

    ``ts_col`` accepts BOTH contracts in this module: a timestamp/date
    column (days via datediff) or integer epoch SECONDS (days via
    ``ts div 86400`` — the portable contract rollup_time documents);
    the branch is on the column's schema type, so the two operators no
    longer silently require different ts types.

    Scale shape: distinct (user, week) activity -> per-user min week
    (map-side combinable) -> user-keyed equi-join -> (cohort, offset)
    count. No windows, no collects."""
    from pyspark.sql import types as T

    # Column refs (not f-string name interpolation) so quoted/dotted
    # column names work like everywhere else in this module; the divs
    # stay in name-free exprs over locally-aliased columns
    base = events.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("_ts")
    )
    if isinstance(
        events.schema[ts_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    ):
        base = base.select(
            "u", F.expr("cast(_ts as bigint) div 86400").alias("_days")
        )
    else:
        base = base.select(
            "u",
            F.datediff(
                F.col("_ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("_days"),
        )
    weeks = base.select(
        "u", F.expr("cast(_days as bigint) div 7").alias("week")
    ).distinct()
    first = weeks.groupBy("u").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(first, "u")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cube_aggregate(
    df: DataFrame,
    dims: list[str],
    *,
    measure_col: str | None = None,
) -> DataFrame:
    """Full OLAP CUBE over ``dims``: one row per cell of EVERY dimension
    subset — the all-margins report (per type, per segment, per
    type×segment, grand total) a dashboard layer reads without
    re-aggregating. ``gid`` is the grouping bitmask (leftmost dim = most
    significant bit, 1 = that dim is rolled away in this row) — the
    standard disambiguation between a genuine NULL dimension value and a
    rolled-up cell, which a bare NULL cannot provide.

    Returns ``(dims..., gid, n_rows[, measure_sum])``; ``measure_col``
    (when given) must be integer-summable — cast money upstream.

    Scale shape: Spark plans a CUBE as ONE Expand (each input row
    replicated 2^|dims| times with the corresponding dim-NULLing) into a
    single map-side-combinable hash aggregate — one scan and one
    shuffle, NOT 2^d separate jobs; the 2^d factor rides the combiner,
    so keep |dims| small (2-4) at the 10^12-row scale, same as every
    warehouse. Grand-total and heavy margins are single keys by nature —
    the map-side partials are what keep them from becoming stragglers.
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    if len(dims) > 6:
        raise ValueError(
            f"CUBE over {len(dims)} dims expands 2^{len(dims)}x per row — cap is 6"
        )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    if measure_col is not None:
        aggs.append(F.sum(measure_col).cast("long").alias("measure_sum"))
    return df.cube(*dims).agg(
        F.grouping_id().cast("long").alias("gid"), *aggs
    )


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact per-group percentiles of an integer metric
    (percentile_disc semantics: the value at sorted position
    ``ceil(p·N/100)``) — the per-dimension latency/quality report
    (p50/p90/p99 per event type, per language, per domain) in pure
    integer arithmetic, bit-identical on any engine; float
    interpolation is deliberately avoided, same stance as
    ``textstats.quantile_buckets``.

    Returns one row per (group, pct): ``(group, pct, value)``. NULL
    metrics and NULL groups are excluded (the module's NULL-key
    contract).

    Scale shape: the corpus is never sorted — thresholds come from a
    per-group VALUE-SPACE histogram (``groupBy(group, value).count``,
    map-side combinable); the cumulative window runs over histogram
    rows, bounded by the metric's value range per group, independent of
    corpus row count. Groups are assumed dimension-like (event types,
    languages); a group column with corpus-scale cardinality makes the
    histogram the corpus itself — use a coarser dimension.
    """
    if not percentiles:
        raise ValueError("percentiles must be non-empty")
    for p in percentiles:
        if not 1 <= p <= 100:
            raise ValueError(f"percentiles must be in [1, 100], got {p}")
    from pyspark.sql import Window

    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
    ).where(F.col("g").isNotNull() & F.col("v").isNotNull())
    hist = vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n = vals.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    th = (
        cum.join(n, "g")
        .groupBy("g")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum")
                        >= F.expr(f"({p} * n + 99) div 100"),
                        F.col("v"),
                    )
                ).alias(f"_p{p}")
                for p in percentiles
            ]
        )
    )
    stack_args = ", ".join(
        f"cast({p} as bigint), _p{p}" for p in percentiles
    )
    return th.select(
        F.col("g").alias(group_col),
        F.expr(
            f"stack({len(percentiles)}, {stack_args}) as (pct, value)"
        ),
    )


def event_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    *,
    steps: int = 3,
    top_k: int | None = None,
) -> DataFrame:
    """k-step journey mining: counts of CONSECUTIVE event-type sequences
    per user ((a, b, c) for steps=3) — the higher-order extension of
    ``transition_counts`` that surfaces whole flows (signup → purchase →
    error) instead of single hops; the per-sequence counts feed funnel
    design and next-k-action models.

    Ordering within a user is (ts, seq) — the same deterministic
    tie-break as ``transition_counts``. Returns ``(step_1..step_k,
    n_paths)``, optionally truncated to the ``top_k`` most frequent
    (ties broken by the path's lexicographic order, deterministic).

    Scale shape: one window partitioned BY USER (bounded by events-per-
    user) computing k-1 leads in a single pass, then one map-side-
    combinable count on the sequence key. ``top_k`` uses a single
    ORDER BY + LIMIT — Spark executes it as a TakeOrdered (per-partition
    top-k then a k-row merge), never a full global sort materialization.
    """
    if steps < 2:
        raise ValueError(f"steps must be >= 2, got {steps}")
    if top_k is not None and top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pyspark.sql import Window

    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("step_1"),
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
    ).where(F.col("u").isNotNull() & F.col("step_1").isNotNull())
    w2 = Window.partitionBy("u").orderBy("_ts", "_seq")
    cols = [F.col("step_1")]
    cur = base
    for k in range(2, steps + 1):
        cur = cur.withColumn(f"step_{k}", F.lead("step_1", k - 1).over(w2))
        cols.append(F.col(f"step_{k}"))
    full = cur.where(F.col(f"step_{steps}").isNotNull())
    out = full.groupBy(*[f"step_{k}" for k in range(1, steps + 1)]).agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("n_paths").desc(),
            *[F.col(f"step_{k}") for k in range(1, steps + 1)],
        ).limit(top_k)
    return out
