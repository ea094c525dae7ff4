"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk`` — exact brute-force: broadcast the (small) query set,
  score every corpus vector with a native ``F.aggregate``/``F.zip_with``
  dot product (whole-stage codegen, no Python), window top-k. This is the
  correctness baseline and is oracle-checkable (DuckDB
  list_cosine_similarity computes the same doubles).
- ``lsh_ann_topk`` — scale path: random-hyperplane LSH. Hyperplane
  components are derived deterministically from md5 (no RNG — resumable
  and seed-stable across engines). Candidates = vectors sharing the
  sign-bucket; exact re-rank within bucket. At 100 TB the bucket join
  replaces the full cross product; recall tunes via ``num_planes`` and
  multi-probe ``probes``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = [
    "dot", "l2_norm", "cosine", "cosine_topk",
    "hard_negatives",
    "hyperplane_buckets", "multiprobe_buckets", "lsh_ann_topk",
    "kmeans_centroids", "ivf_topk",
    "cosine_dup_pairs",
    "rrf_fuse",
    "semantic_dedup",
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _brute_rank_topk(
    c: DataFrame, q: DataFrame, pair_filter: Column, k: int, out_cols: list[str]
) -> DataFrame:
    """Shared core of the brute-force per-query rankers: broadcast query
    side × corpus, ``pair_filter`` applied BEFORE ranking (so rank is the
    position within the admissible set), native double cosine, window
    row_number with ties broken by neighbor id. ``c`` must carry
    ``neighbor_id``/``_cv`` (plus any extra output columns), ``q``
    ``query_id``/``_qv``."""
    # hoist the double cast and the L2 norm to per-ROW projections before
    # the cross join: each is evaluated once per corpus/query row instead
    # of once per (corpus × query) pair (the higher-order aggregate folds
    # evaluate interpreted, so per-pair norms dominated the query wall).
    # The norm value and the dot fold are the same expressions over the
    # same doubles, so sim is bit-identical to the unhoisted form.
    c = c.withColumn("_cv", F.col("_cv").cast("array<double>")).withColumn(
        "_cn", l2_norm(F.col("_cv"))
    )
    q = q.withColumn("_qv", F.col("_qv").cast("array<double>")).withColumn(
        "_qn", l2_norm(F.col("_qv"))
    )
    scored = c.crossJoin(F.broadcast(q)).where(pair_filter)
    sim = (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("sim")
    ranked = scored.select(
        *[x for x in out_cols if x != "rank"], sim
    ).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        ),
    )
    return ranked.where(F.col("rank") <= k).select(*out_cols)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): broadcast query
    set × corpus, native cosine, window rank. Returns
    (query_id, neighbor_id, rank) — ids only, so the oracle compare is
    float-robust (ranking by the same doubles on both sides)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    return _brute_rank_topk(
        c,
        q,
        F.col("neighbor_id") != F.col("query_id"),
        k,
        ["query_id", "neighbor_id", "rank"],
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Metric-learning hard-negative mining: for each query vector, the
    ``k`` most-similar corpus vectors with a DIFFERENT label —
    (query_id, neighbor_id, neighbor_label, rank). The training-pair
    generator for contrastive/triplet embedding fine-tuning: the
    near-miss negatives (high similarity, wrong class) are the ones that
    move the loss.

    The label filter runs BEFORE ranking, so rank is the position within
    the admissible (different-label) set, not a post-filtered exact-topk
    (which could return fewer than k). Same plan shape as
    ``cosine_topk``: broadcast query side x corpus, native cosine,
    per-query window rank — the query set is the small side by contract
    (mining runs per training batch); use the LSH/IVF variants to
    pre-narrow candidates when the query side grows.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("_ql"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col(label_col).alias("neighbor_label"),
    )
    return _brute_rank_topk(
        c,
        q,
        F.col("neighbor_label") != F.col("_ql"),
        k,
        ["query_id", "neighbor_id", "neighbor_label", "rank"],
    )


def _plane_vector(plane: int, dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1)^dim: each component
    derived from md5(seed|plane|d) — no RNG state, identical on any engine.
    Computed driver-side so the Spark plan carries one array literal per
    plane (a per-component md5 expression tree would bloat codegen)."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{seed}|{plane}|{d}".encode()).hexdigest()[:15], 16)
        out.append(h / float(2 ** 60) * 2.0 - 1.0)
    return out


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    out_col: str = "bucket",
    tables: int = 1,
) -> DataFrame:
    """Sign-bucket ids from deterministic hyperplanes.

    ``tables`` independent hash tables (plane sets seeded by table index)
    raise recall multiplicatively — the standard LSH trade; the output is
    an array of per-table bucket ids (table index encoded in the high bits
    so buckets never collide across tables).

    ``dim`` is required: the embedding width is part of the table's
    contract and the caller always knows it — probing the data for it
    would cost an extra Spark job per call."""
    if dim is None:
        raise ValueError(
            "dim is required (embedding width from the table contract); "
            "probing the data for it would run an extra Spark job"
        )
    v = F.col(vec_col).cast("array<double>")
    buckets = []
    for t in range(tables):
        bits = []
        for p in range(num_planes):
            plane = F.lit(_plane_vector(t * 10_000 + p, dim, seed))
            proj = dot(v, plane)
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        buckets.append((sum(bits[1:], bits[0]) + F.lit(t << num_planes)).cast("int"))
    return df.withColumn(out_col, F.array(*buckets))


def multiprobe_buckets(
    bucket_array: Column, num_planes: int, probes: int
) -> Column:
    """Expand a per-table bucket array with its Hamming-ball probes:
    ``probes`` ∈ {0, 1} — with 1, every single-bit flip of each table's
    sign vector is probed too (the standard multi-probe LSH trade: the
    nearest misses are the vectors that disagree on exactly one
    hyperplane, so probing distance-1 buckets buys most of an extra
    table's recall for no extra storage). The table-offset high bits are
    preserved because only plane bits (< num_planes) are flipped."""
    if probes == 0:
        return bucket_array
    if probes != 1:
        raise ValueError("probes supports 0 (exact bucket) or 1 (Hamming-1)")
    return F.flatten(
        F.transform(
            bucket_array,
            lambda b: F.array(b, *[b.bitwiseXOR(F.lit(1 << p)) for p in range(num_planes)]),
        )
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    seed: int = 42,
    tables: int = 4,
    dim: int | None = None,
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share any table's sign-bucket, exact
    cosine re-rank over the deduped candidate set. Equi-join on bucket
    replaces the cross product (the 100 TB path); ``tables`` trades
    compute for recall, and ``probes=1`` additionally probes every
    Hamming-distance-1 bucket on the QUERY side (multi-probe LSH — more
    join fan-out on the small broadcast side, no growth of the corpus
    index).

    ``dim`` (the embedding width, known from the table's contract) is
    required — see ``hyperplane_buckets``."""
    # explode_OUTER everywhere a bucket ARRAY attribute is exploded: plain
    # explode triggers InferFiltersFromGenerate, whose size(bucket)>0
    # filter pushes below the projection and re-evaluates the whole
    # hyperplane aggregate a second time per row; bucket arrays are
    # constant-size (one entry per table), so outer semantics are
    # identical and the inferred filter never existed to begin with.
    c = hyperplane_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        "_cv", num_planes, seed, dim, tables=tables,
    ).withColumn("bucket", F.explode_outer("bucket"))
    q = hyperplane_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "_qv", num_planes, seed, dim, tables=tables,
    ).withColumn(
        "bucket", F.explode(multiprobe_buckets(F.col("bucket"), num_planes, probes))
    )
    cand = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cosine(
        F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")
    ).alias("sim")
    ranked = cand.select("query_id", "neighbor_id", sim).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        ),
    )
    return ranked.where(F.col("rank") <= k).select("query_id", "neighbor_id", "rank")


def _centroid_sims(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """array<struct<neg_sim, cid>> sorted ascending = cosine desc, cid asc
    (deterministic tie rule shared with the SQL oracle)."""
    entries = [
        F.struct(
            (-cosine(vec, F.lit(cvec))).alias("neg_sim"),
            F.lit(cid).alias("cid"),
        )
        for cid, cvec in centroids
    ]
    return F.array_sort(F.array(*entries))


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 2,
    sample_mod: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means over the embedding column, seeded deterministically
    with the first ``k`` vectors in id order (reproducible across runs up
    to FP summation order — assignments use argmax cosine, robust away
    from knife-edge ties).

    Each iteration is one pass: assign (pure map — centroid sims are
    literal expressions) then per-(cid, dim) partial sums (one shuffle of
    k×dim aggregates, map-side combined). ``sample_mod`` fits centroids on
    a deterministic 1/sample_mod hash-sample — at 100 TB you refine on a
    sample, never the full corpus."""
    work = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    if sample_mod:
        work = work.where(F.pmod(F.xxhash64(F.col("_id")), F.lit(sample_mod)) == 0)
    seed_rows = (
        corpus.select(F.col(id_col), F.col(vec_col)).orderBy(id_col).limit(k).collect()
    )
    cents = [(i, [float(x) for x in r[1]]) for i, r in enumerate(seed_rows)]
    for _ in range(iters):
        assigned = work.select(
            "_v", _centroid_sims(F.col("_v"), cents)[0]["cid"].alias("cid")
        )
        stats = (
            assigned.select("cid", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["s"] / r["n"]
        cents = [
            (cid, [d[p] for p in range(len(vec))] if (d := by_cid.get(cid)) else vec)
            for cid, vec in cents
        ]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
    centroid_rounding: int | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus to its nearest centroid,
    probe the query's ``n_probe`` nearest centroid lists, exact re-rank.

    Default centroids are the first ``n_centroids`` corpus vectors in id
    order — deterministic and engine-reproducible (and exactly what the
    SQL oracle replicates); ``refine_iters > 0`` runs that many Lloyd's
    k-means passes (``kmeans_centroids``) for data-adaptive cells without
    changing the dataflow. The corpus scan is a pure map (centroid sims
    are literal-array expressions); the only shuffle is the candidate
    equi-join on centroid id — the 100 TB path, like LSH but with
    data-adaptive cells.

    ``centroid_rounding``: quantize centroid components to that many
    decimals before assignment. Refined centroids are per-cell MEANS, and
    FP summation order differs across engines (and across Spark runs), so
    raw means can differ in the last ulp; quantizing to 1e-6 (errors are
    ~1e-12) makes the assignment step engine-reproducible — which is what
    lets a SQL oracle replicate the refined path value-for-value.
    """
    if refine_iters > 0:
        centroids = kmeans_centroids(
            corpus, id_col, vec_col, k=n_centroids, iters=refine_iters
        )
    else:
        cent_rows = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .orderBy(id_col)
            .limit(n_centroids)
            .collect()
        )
        centroids = [(int(r[0]), [float(x) for x in r[1]]) for r in cent_rows]
    if centroid_rounding is not None:
        centroids = [
            (cid, [round(x, centroid_rounding) for x in vec])
            for cid, vec in centroids
        ]

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _centroid_sims(F.col(vec_col).cast("array<double>"), centroids)[0]["cid"].alias("cid"),
    )
    q_sims = _centroid_sims(F.col(vec_col).cast("array<double>"), centroids)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            F.transform(F.slice(q_sims, 1, n_probe), lambda s: s["cid"])
        ).alias("cid"),
    )
    cand = c.join(F.broadcast(q), "cid").where(F.col("neighbor_id") != F.col("query_id"))
    sim = cosine(
        F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")
    ).alias("sim")
    ranked = cand.select("query_id", "neighbor_id", sim).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        ),
    )
    return ranked.where(F.col("rank") <= k).select("query_id", "neighbor_id", "rank")


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    *,
    use_lsh: bool,
    num_planes: int = 8,
    tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine ≥
    threshold). ``use_lsh`` is a REQUIRED keyword so the recall trade is
    always an explicit caller decision, never a silent default:

    - ``use_lsh=True`` pre-blocks candidates by hyperplane sign-bucket —
      the 100 TB path (near-dups at high cosine collide in some table with
      high probability; the bucket math is md5-deterministic so a SQL
      oracle can replicate it exactly), but pairs missing every table's
      bucket are lost. Requires ``dim``.
    - ``use_lsh=False`` scores all pairs exactly — the oracle baseline;
      its crossJoin is quadratic and only for modest inputs."""
    # per-row double cast + L2 norm BEFORE the pair step (same hoist as
    # _brute_rank_topk): the interpreted norm fold runs N times instead of
    # N² (exact mode) / per-candidate (LSH mode); dot/(na*nb) is the same
    # expression tree over the same doubles, so cos_sim is bit-identical
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    ).withColumn("_na", l2_norm(F.col("_va")))
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    ).withColumn("_nb", l2_norm(F.col("_vb")))
    if use_lsh:
        ab = hyperplane_buckets(a, "_va", num_planes, seed, dim, tables=tables) \
            .withColumn("bucket", F.explode_outer("bucket"))
        bb = hyperplane_buckets(b, "_vb", num_planes, seed, dim, tables=tables) \
            .withColumn("bucket", F.explode_outer("bucket"))
        cand = (
            ab.join(bb, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    sim = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        cand.withColumn("cos_sim", sim)
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k: int = 60,
    scale: int = 10**6,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N retrieval
    rankings — the standard hybrid sparse+dense merge (BM25 candidates +
    embedding candidates into one list), computed in integers::

        rrf_micro(d) = sum over systems of  scale div (k + rank_d)

    Each input must provide (id, 1-based rank); only ids a system
    returned contribute that system's term (the usual top-k RRF —
    missing means rank infinity). Returns (id, rrf_micro, n_systems)
    with n_systems = how many rankings contained the id. Floor division
    makes the fused score engine-portable; float RRF ties at the merge
    boundary differ across summation orders, integer RRF cannot.

    Scale shape: a union of rank-table projections (each top-k-sized —
    candidate lists, not corpora) + one map-side-combinable groupBy.
    The expensive part of hybrid retrieval is producing the input
    rankings (bm25_topk, cosine_topk — each already scale-shaped);
    fusion itself is candidate-sized."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    parts = [
        r.select(
            F.col(id_col).alias("id"),
            F.expr(
                f"cast({scale} as bigint)"
                f" div (cast({k} as bigint) + cast({rank_col} as bigint))"
            ).alias("_term"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    return u.groupBy("id").agg(
        F.sum("_term").alias("rrf_micro"),
        F.count(F.lit(1)).alias("n_systems"),
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_centroids: int = 16,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): drop documents whose
    EMBEDDINGS nearly coincide — paraphrases, templated rewrites, and
    machine translations that no lexical dedup (minhash/simhash/winnow)
    can see — by clustering the embedding space and pruning near-
    duplicates WITHIN each cluster only.

    Returns (id, cid, keep): cluster id and an integer keep flag.
    Keep rule: a vector is dropped iff some SMALLER-id vector in the
    SAME cluster has cosine >= threshold — first-occurrence-wins, the
    line_dedup/latest_by_key house contract, one pass, deterministic.
    (DIV from the paper: SemDeDup keeps the point farthest from the
    centroid per duplicate group; id-min is deterministic across engines
    and retries, which the pipeline values more. Chains coarsen: in
    a~b~c with a!~c, only a survives — same semantics as cluster_dedup;
    use that operator when exact connected components matter.)

    Scale shape: centroids are the first ``n_centroids`` vectors in id
    order (the ivf_topk default — deterministic, oracle-replicable;
    swap in kmeans_centroids for data-adaptive cells). Assignment is a
    pure map (centroid sims are literal expressions); the pair stage is
    an equi-join ON CLUSTER ID — the quadratic blow-up is bounded per
    cluster, which is exactly the paper's trick for running at web
    scale (size n_centroids so clusters stay ~10^4-10^5 vectors; skewed
    clusters split under AQE). No windows, no corpus-sized collects —
    the one collect is the k seed vectors.
    """
    if n_centroids < 1:
        raise ValueError(f"n_centroids must be >= 1, got {n_centroids}")
    cent_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    centroids = [(int(r[0]), [float(x) for x in r[1]]) for r in cent_rows]
    assigned = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("_v"),
        _centroid_sims(F.col(vec_col).cast("array<double>"), centroids)[0][
            "cid"
        ].alias("cid"),
    )
    a = assigned.select("cid", F.col("id").alias("id_a"), F.col("_v").alias("_va"))
    b = assigned.select("cid", F.col("id").alias("id_b"), F.col("_v").alias("_vb"))
    dom = (
        a.join(b, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            cosine(
                F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")
            )
            >= threshold
        )
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return assigned.join(dom.withColumn("_dup", F.lit(1)), "id", "left").select(
        F.col("id").alias(id_col),
        "cid",
        F.when(F.col("_dup").isNull(), 1).otherwise(0).alias("keep"),
    )
