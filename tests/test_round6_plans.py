"""Round-6 plan-shape pins: the shuffle-removal restructures stay removed.

- minhash_candidate_pairs: single pipeline execution — no self-join, no
  count+join bucket capping (the old shape executed the shingle→signature
  pipeline four times).
- line_dedup: no join back to the exploded lines (the min-struct aggregate
  IS the survivor set); only the final per-id reassembly join remains.
- _brute_rank_topk: norms/casts are per-row projections below the join —
  the join itself stays broadcast (no shuffle of the corpus side).
"""

from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_pairs_no_selfjoin_single_pipeline(spark):
    from dss_plugin_nlp_analysis_spark.operators.dedup import (
        minhash_candidate_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common text body {i % 3}") for i in range(40)],
        "id long, t string",
    )
    plan = plan_of(minhash_candidate_pairs(docs, "id", "t", 8, 4))
    assert "Join" not in plan, plan
    # one signature pipeline: the shingle regex appears exactly once
    assert plan.count("regexp_extract_all") == 1, plan


def test_line_dedup_single_reassembly_join(spark):
    from dss_plugin_nlp_analysis_spark.operators.webclean import line_dedup

    docs = spark.createDataFrame(
        [(i, f"line a\nline b{i % 3}\nline a") for i in range(20)],
        "id long, t string",
    )
    plan = plan_of(line_dedup(docs, "id", "t"))
    # exactly one join: the final left join attaching clean_text to ids;
    # the old lines-vs-firsts survivor join is gone
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1, plan
    # the posexplode pipeline is executed once, not as a join probe side too
    assert plan.count("PosExplode") + plan.count("posexplode") <= 2, plan


def test_brute_topk_broadcast_join_only(spark):
    from dss_plugin_nlp_analysis_spark.operators.similarity import cosine_topk

    vecs = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    plan = plan_of(cosine_topk(vecs, vecs.limit(3), k=2))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
