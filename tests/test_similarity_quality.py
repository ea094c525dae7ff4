"""Quality properties of the ANN family (beyond oracle value-parity):
planted near-duplicates must be found by the LSH path (the property that
matters for web dedup), k-means must recover planted cluster structure,
and IVF must hold high recall vs the exact baseline on real testdata.

Note: the testdata embeddings are near-random (web-scale worst case for
hyperplane LSH — nearest neighbors are barely more aligned than random),
so generic recall@k is NOT asserted for LSH; its contract is high-cosine
pairs, which provably collide (a positively scaled copy projects to the
same sign-bucket in every table)."""

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_lsh_ann_finds_planted_copy_at_rank1(spark):
    from dss_plugin_nlp_analysis_spark.operators.similarity import lsh_ann_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # plant a scaled copy of each query vector at id+10000 (cosine 1.0)
    q = emb.where(F.col("vec_id") < 10)
    copies = q.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias("embedding"),
        "label",
    )
    corpus = emb.union(copies)
    top = lsh_ann_topk(corpus, q, k=1, num_planes=6, dim=64).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    assert all(got[i] == i + 10000 for i in range(10))


def test_kmeans_recovers_planted_clusters(spark):
    from dss_plugin_nlp_analysis_spark.operators.similarity import kmeans_centroids

    # 3 tight clusters on orthogonal axes; seed ids interleave the clusters
    rows = []
    for i in range(30):
        axis = i % 3
        v = [0.0, 0.0, 0.0, 0.0]
        v[axis] = 1.0
        v[3] = 0.01 * (i // 3)  # small within-cluster spread
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(df, "vec_id", "embedding", k=3, iters=2)

    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for axis in range(3):
        mean = [0.0] * 4
        mean[axis] = 1.0
        mean[3] = 0.01 * 4.5
        assert max(cos(c, mean) for _, c in cents) > 0.999


def test_ivf_recall_vs_exact_with_and_without_refinement(spark):
    from dss_plugin_nlp_analysis_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = {(r[0], r[1]) for r in cosine_topk(emb, q, k=5).collect()}
    for iters in (0, 2):
        ivf = {
            (r[0], r[1])
            for r in ivf_topk(
                emb, q, k=5, n_centroids=16, n_probe=4, refine_iters=iters
            ).collect()
        }
        assert len(exact & ivf) / len(exact) >= 0.8
