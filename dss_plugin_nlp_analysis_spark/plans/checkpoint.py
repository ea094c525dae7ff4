"""Per-partition checkpoint manifest: resumable KG builds with lineage.

North rule: "resumable from checkpoint with per-partition lineage +
metrics". The reference has no fault tolerance at all (SURVEY.md §4.2);
this module adds it at the partition level:

- input is bucketed by ``xxhash64(url) % num_buckets`` (also the skew
  defuser — hot domains spread across buckets)
- each completed bucket writes its triples under ``output/bucket=<b>/``
  and appends a manifest row (bucket, input_rows, triples, wall_s,
  input_fingerprint, completed_at) to ``<checkpoint_dir>/manifest/``
- a restart reads the manifest and processes only missing buckets.

Atomicity: a bucket's output directory is written with mode=overwrite and
its manifest row is appended only after the write commits, so a crash
mid-bucket re-runs just that bucket. (On a real lakehouse this manifest
becomes an Iceberg snapshot/metadata table; parquet keeps the sandbox
dependency-free — sources/catalog.py gates the Iceberg path.)
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["KGBuildResult", "run_checkpointed_build", "read_manifest"]

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("input_rows", T.LongType()),
        T.StructField("triples", T.LongType()),
        T.StructField("wall_s", T.DoubleType()),
        T.StructField("input_fingerprint", T.StringType()),
        T.StructField("completed_at", T.DoubleType()),
    ]
)


@dataclass
class KGBuildResult:
    processed_buckets: list[int]
    skipped_buckets: list[int]
    total_triples: int


def read_manifest(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    path = f"{checkpoint_dir}/manifest"
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def run_checkpointed_build(
    spark: SparkSession,
    docs_df: DataFrame,
    triple_fn,
    output_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
    num_buckets: int = 16,
    buckets_per_job: int = 8,
) -> KGBuildResult:
    """Run ``triple_fn(bucket_docs) -> DataFrame`` over url-hash buckets,
    skipping buckets already recorded in the manifest.

    ``buckets_per_job`` groups buckets into jobs: at 100 TB you want few
    large jobs (amortized scans); the manifest granularity stays per-bucket
    because the output is partitioned by bucket and recorded per-bucket.
    """
    done = {r["bucket"] for r in read_manifest(spark, checkpoint_dir).collect()}
    todo = [b for b in range(num_buckets) if b not in done]
    docs_b = docs_df.withColumn(
        "_bucket", (F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_buckets))).cast("int")
    )
    # dynamic partition overwrite: re-running a bucket replaces exactly that
    # bucket's directory — idempotent resume, no duplicate appends
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    total_triples = 0
    processed: list[int] = []
    for i in range(0, len(todo), buckets_per_job):
        group = todo[i:i + buckets_per_job]
        t0 = time.perf_counter()
        part = docs_b.where(F.col("_bucket").isin(group))
        triples = triple_fn(part.drop("_bucket")).withColumn(
            "_bucket",
            (F.pmod(F.xxhash64(F.col("subj")), F.lit(num_buckets))).cast("int"),
        )
        triples.write.mode("overwrite").partitionBy("_bucket").parquet(output_dir)
        wall = time.perf_counter() - t0
        # lineage: per-bucket input/output counts + input fingerprint
        in_counts = {
            r["_bucket"]: r["n"]
            for r in part.groupBy("_bucket").agg(F.count("*").alias("n")).collect()
        }
        out_stats = {
            r["_bucket"]: (r["n"], r["fp"])
            for r in spark.read.parquet(output_dir)
            .where(F.col("_bucket").isin(group))
            .groupBy("_bucket")
            .agg(
                F.count("*").alias("n"),
                F.md5(F.concat_ws("", F.sort_array(F.collect_list(F.concat_ws("|", "subj", "pred", "obj"))))).alias("fp"),
            )
            .collect()
        }
        rows = []
        now = time.time()
        for b in group:
            n_out, fp = out_stats.get(b, (0, None))
            rows.append((b, in_counts.get(b, 0), n_out, wall / len(group), fp, now))
            total_triples += n_out
        spark.createDataFrame(rows, MANIFEST_SCHEMA).write.mode("append").parquet(
            f"{checkpoint_dir}/manifest"
        )
        processed.extend(group)
    return KGBuildResult(
        processed_buckets=processed,
        skipped_buckets=sorted(done),
        total_triples=total_triples,
    )
