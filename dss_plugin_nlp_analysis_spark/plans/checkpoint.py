"""Per-partition checkpoint manifest: resumable KG builds with lineage.

North rule: "resumable from checkpoint with per-partition lineage +
metrics". The reference has no fault tolerance at all (SURVEY.md §4.2);
this module adds it at the partition level:

- input is bucketed by ``xxhash64(url) % num_buckets`` (also the skew
  defuser — hot domains spread across buckets)
- each completed bucket writes its triples under ``output/bucket=<b>/``
  and appends a manifest row (bucket, input_rows, triples, group_wall_s,
  output_fingerprint, completed_at) to ``<checkpoint_dir>/manifest/``
- a restart reads the manifest and processes only missing buckets.

Atomicity: a bucket's output directory is written with dynamic partition
overwrite and its manifest row is appended only after the write commits,
so a crash mid-bucket re-runs just that bucket. (On a real lakehouse this
manifest becomes an Iceberg snapshot/metadata table; parquet keeps the
sandbox dependency-free — sources/catalog.py gates the Iceberg path.)

Lineage fingerprint: a COMMUTATIVE per-bucket hash — sum of per-row
xxhash64(subj|pred|obj) widened to decimal(38,0). Order-insensitive (rows
arrive in any partition order), duplicate-sensitive (unlike XOR, a
re-appended row changes the sum), and constant-memory per aggregation
buffer — a sort_array(collect_list(...)) fingerprint would materialize
every triple string of a bucket in one buffer and OOM at 100 TB.

Bucket-partition safety: ``triple_fn`` may keep the input ``_bucket``
column on its output — then the write partitions by the *input* bucket
with zero extra cost. If it drops the column, the bucket is re-derived
from ``xxhash64(subj)``, which silently corrupts resume state when subj
differs from the input url (a later job group would overwrite partitions
owned by earlier groups); ``validate_buckets=True`` therefore fuses a
guard into the bucket expression — the write job aborts before commit on
the first stray row (zero extra scan when all rows are valid) and the
violation surfaces as ValueError.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["KGBuildResult", "run_checkpointed_build", "read_manifest"]

_BUCKET_CONTRACT_MARKER = "KG_BUCKET_CONTRACT_VIOLATION:"

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("input_rows", T.LongType()),
        T.StructField("triples", T.LongType()),
        # wall time of the JOB GROUP that produced this bucket (buckets in a
        # group share one Spark job; a per-bucket wall time does not exist)
        T.StructField("group_wall_s", T.DoubleType()),
        # commutative hash of this bucket's OUTPUT triples (see module doc)
        T.StructField("output_fingerprint", T.StringType()),
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


def _output_fingerprint() -> F.Column:
    """Commutative, duplicate-sensitive, constant-memory bucket fingerprint:
    sum of per-row xxhash64 in decimal(38,0) (no overflow below ~10^19 rows
    per bucket, far past any real partition)."""
    row_hash = F.xxhash64(F.concat_ws("|", "subj", "pred", "obj"))
    return F.sum(row_hash.cast("decimal(38,0)")).cast("string")


def run_checkpointed_build(
    spark: SparkSession,
    docs_df: DataFrame,
    triple_fn,
    output_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
    num_buckets: int = 16,
    buckets_per_job: int = 8,
    validate_buckets: bool = True,
) -> KGBuildResult:
    """Run ``triple_fn(bucket_docs) -> DataFrame`` over url-hash buckets,
    skipping buckets already recorded in the manifest.

    ``bucket_docs`` carries a ``_bucket`` column (the url-hash bucket);
    ``triple_fn`` may preserve it on its output to pin each triple to its
    input bucket for free. Outputs without ``_bucket`` must satisfy the
    subj == url contract (the bucket is re-derived from subj and, when
    ``validate_buckets``, checked against the group before writing).

    ``buckets_per_job`` groups buckets into jobs: at 100 TB you want few
    large jobs (amortized scans); the manifest granularity stays per-bucket
    because the output is partitioned by bucket and recorded per-bucket.
    """
    done = {r["bucket"] for r in read_manifest(spark, checkpoint_dir).collect()}
    todo = [b for b in range(num_buckets) if b not in done]
    docs_b = docs_df.withColumn(
        "_bucket", (F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_buckets))).cast("int")
    )
    total_triples = 0
    processed: list[int] = []
    for i in range(0, len(todo), buckets_per_job):
        group = todo[i:i + buckets_per_job]
        t0 = time.perf_counter()
        part = docs_b.where(F.col("_bucket").isin(group))
        triples = triple_fn(part)
        derived = "_bucket" not in triples.columns
        if derived:
            bucket = (F.pmod(F.xxhash64(F.col("subj")), F.lit(num_buckets))).cast("int")
            if validate_buckets:
                # fused guard: a stray bucket aborts the write job BEFORE
                # commit (dynamic overwrite commits at job end) — zero extra
                # scan in the common all-valid case
                bucket = F.when(bucket.isin(group), bucket).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(_BUCKET_CONTRACT_MARKER + " derived bucket "),
                            bucket.cast("string"),
                            F.lit(f" outside current group {group}"),
                        )
                    )
                )
            triples = triples.withColumn("_bucket", bucket)
        # dynamic partition overwrite (writer-scoped, not session config):
        # re-running a bucket replaces exactly that bucket's directory —
        # idempotent resume, no duplicate appends
        writer = (
            triples.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
        )
        try:
            writer.parquet(output_dir)
        except Exception as exc:  # surface the contract violation as ValueError
            if derived and validate_buckets and _BUCKET_CONTRACT_MARKER in str(exc):
                raise ValueError(
                    "triple_fn dropped _bucket and emitted subj values outside "
                    f"the current bucket group {group}: writing would overwrite "
                    "partitions owned by other groups. Preserve the input "
                    "_bucket column or keep subj equal to the input url column."
                ) from exc
            raise
        wall = time.perf_counter() - t0
        # lineage: per-bucket input/output counts + output fingerprint
        in_counts = {
            r["_bucket"]: r["n"]
            for r in part.groupBy("_bucket").agg(F.count("*").alias("n")).collect()
        }
        out_stats = {
            r["_bucket"]: (r["n"], r["fp"])
            for r in spark.read.parquet(output_dir)
            .where(F.col("_bucket").isin(group))
            .groupBy("_bucket")
            .agg(F.count("*").alias("n"), _output_fingerprint().alias("fp"))
            .collect()
        }
        rows = []
        now = time.time()
        for b in group:
            n_out, fp = out_stats.get(b, (0, None))
            rows.append((b, in_counts.get(b, 0), n_out, wall, fp, now))
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
