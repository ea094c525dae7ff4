"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Throughput queries run over a deterministically replicated corpus
(documents × REPLICAS) so the numbers reflect engine throughput, not
5k-row fixed costs. ``--scaling`` runs the flagship job at two
parallelism levels (local[N] vs local[4N]) on the same input and reports
scaling efficiency (BASELINE.md north-rule proxy).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("KG_BENCH_REPLICAS", "20"))


def make_spark(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("kg-bench")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("KG_BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def replicated_docs(spark: SparkSession, sf_dir: str, replicas: int):
    """Deterministic corpus amplification: replicas × documents with
    distinct doc ids (same text distribution; exercises partitioning)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    return (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
        .drop("rep")
        .repartition(CPUS * 2, "doc_id")
    )


def bench_queries(spark: SparkSession) -> tuple[dict, int]:
    from dss_plugin_nlp_analysis_spark.demo import demo_ontology_df
    from dss_plugin_nlp_analysis_spark.operators.tagger import tag_documents

    docs = replicated_docs(spark, SF_DIR, REPLICAS).cache()
    n_docs = docs.count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    onto = demo_ontology_df(spark)
    onto_cat = demo_ontology_df(spark, with_category=True)

    timed(
        "tag_match",
        lambda: tag_documents(docs, onto, lang_col="lang")
        .select(F.count("*"), F.count("tag")).collect(),
    )
    timed(
        "tag_match_category",
        lambda: tag_documents(docs, onto_cat, lang_col="lang", category_col="category")
        .select(F.count("*")).collect(),
    )
    timed(
        "tag_doc_json",
        lambda: tag_documents(docs, onto, lang_col="lang", output_format="one_row_per_doc_json")
        .select(F.count("tag_json_full")).collect(),
    )
    docs.unpersist()
    return timings, n_docs


def run_scaling() -> dict:
    """Same flagship job at local[N] and local[4N]; efficiency = T_N/(4·T_4N)."""
    n = max(2, CPUS // 4)
    out = {}
    for cores in (n, CPUS):
        spark = make_spark(cores)
        try:
            from dss_plugin_nlp_analysis_spark.demo import demo_ontology_df
            from dss_plugin_nlp_analysis_spark.operators.tagger import tag_documents

            docs = replicated_docs(spark, SF_DIR, REPLICAS).cache()
            n_docs = docs.count()
            t0 = time.perf_counter()
            tag_documents(docs, demo_ontology_df(spark), lang_col="lang").select(
                F.count("*")
            ).collect()
            dt = time.perf_counter() - t0
            out[cores] = {"sec": round(dt, 3), "docs_per_sec": round(n_docs / dt, 1)}
        finally:
            spark.stop()
    speedup = out[n]["sec"] / out[CPUS]["sec"]
    efficiency = round(speedup / (CPUS / n), 3)
    return {
        "n_cores": n,
        "four_n_cores": CPUS,
        **{str(k): v for k, v in out.items()},
        "efficiency": efficiency,
    }


def main() -> None:
    if "--scaling" in sys.argv:
        print(json.dumps({"scaling": run_scaling(), "sf_dir": SF_DIR}))
        return
    spark = make_spark(CPUS)
    try:
        t0 = time.perf_counter()
        timings, n_docs = bench_queries(spark)
        total = round(time.perf_counter() - t0, 3)
        sf = SF_DIR.rstrip("/").split("sf")[-1]
        print(
            json.dumps(
                {
                    "metric": "docs_per_sec_tag_match",
                    "value": round(n_docs / timings["tag_match"], 1),
                    "unit": "docs/sec",
                    "queries": timings,
                    "total_sec": total,
                    "n_docs": n_docs,
                    "sf": float(sf),
                    "cpus": CPUS,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
