"""Batch compactor for the streaming-dedup sink: the lambda split's exact
half.

The TTL stream (``stateful_dedup.streaming_exact_dedup`` with a watermark)
is exact only *within* the watermark horizon: a fingerprint re-appearing
after its state was evicted re-emits, so the accumulated epoch-partitioned
sink can hold more than one row per fingerprint over a long-running crawl.
This module is the periodic batch job that restores whole-corpus exactness
(documented in stateful_dedup.py — "exact nightly batch"):

- ``compact_dedup_snapshot`` re-derives first-seen-only rows from the whole
  accumulated sink with a map-side-combinable ``groupBy(fingerprint).min``
  (the exact_dedup shape — never a window, which would buffer degenerate
  fingerprint groups in one reducer), and writes an immutable snapshot
  directory named by the newest epoch it covers. Re-running on the same
  sink state rewrites the same directory — idempotent, safe to schedule.
- ``latest_snapshot`` resolves the newest *complete* snapshot (``_SUCCESS``
  present, so a compactor that died mid-write is never served) through the
  Hadoop FileSystem API — works on HDFS/S3A, not just local paths.

At 100 TB the compactor is one shuffle on the fingerprint key over the
*deduped stream output* (already ~unique per horizon), not the raw corpus;
AQE splits skewed fingerprints like any equi-key aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact_dedup_snapshot", "compact_raw_snapshot", "latest_snapshot"]

_SNAP_PREFIX = "as_of_epoch_"


def _fs_for(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def compact_dedup_snapshot(
    spark: SparkSession, stream_dir: str, snapshot_dir: str
) -> str:
    """Collapse the accumulated stream sink (``id, fingerprint`` rows under
    ``epoch_id=<n>`` partitions) to one first-seen row per fingerprint and
    write it as ``<snapshot_dir>/as_of_epoch_<max_epoch>``. Returns the
    snapshot path. First-seen = smallest ``(epoch_id, id)`` — deterministic
    across retries because epoch replay is idempotent (write_epoch)."""
    sink = spark.read.parquet(stream_dir)
    max_epoch = sink.agg(F.max("epoch_id")).first()[0]
    if max_epoch is None:
        raise ValueError(f"stream sink at {stream_dir} has no epochs to compact")
    first = (
        sink.groupBy("fingerprint")
        .agg(F.min(F.struct("epoch_id", "id")).alias("_w"))
        .select(F.col("_w.id").alias("id"), "fingerprint")
    )
    out = f"{snapshot_dir.rstrip('/')}/{_SNAP_PREFIX}{max_epoch}"
    first.write.mode("overwrite").parquet(out)
    return out


def compact_raw_snapshot(
    spark: SparkSession,
    raw_dir: str,
    snapshot_dir: str,
    id_col: str,
    text_col: str,
    as_of: int,
) -> str:
    """Exact first-seen snapshot derived from the durable RAW archive
    instead of the dedup-stream sink: ``<snapshot_dir>/as_of_epoch_<as_of>``
    with one ``(id, fingerprint)`` row per distinct fingerprint,
    smallest id winning.

    This is the completeness half of the lambda split: the TTL stream
    DISCARDS late-beyond-horizon rows (Spark's stateful late-event filter
    removes them before the state function — stateful_dedup's late-data
    contract), so a late-but-unique document never reaches the stream
    sink and ``compact_dedup_snapshot`` cannot recover it. The raw
    archive (the crawl's append-only input, which a production pipeline
    retains anyway) does contain it; this job recomputes fingerprints
    from text and takes the same map-side-combinable
    ``groupBy(fingerprint).min`` — exactness AND completeness, at the
    cost of scanning raw instead of the much smaller deduped sink. Run it
    on the nightly cadence; serve ``latest_snapshot`` in between.

    ``as_of`` names the snapshot (e.g. the newest raw epoch/partition it
    covers) so re-runs on the same raw state are idempotent."""
    from ..operators.dedup import fingerprint as _fp

    raw = spark.read.parquet(raw_dir).select(
        F.col(id_col).alias("id"), _fp(F.col(text_col)).alias("fingerprint")
    )
    first = (
        raw.groupBy("fingerprint")
        .agg(F.min("id").alias("id"))
        .select("id", "fingerprint")
    )
    out = f"{snapshot_dir.rstrip('/')}/{_SNAP_PREFIX}{as_of}"
    first.write.mode("overwrite").parquet(out)
    return out


def latest_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Read the newest complete snapshot (highest covered epoch with a
    ``_SUCCESS`` marker)."""
    fs, hpath, jvm = _fs_for(spark, snapshot_dir)
    best, best_epoch = None, -1
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(_SNAP_PREFIX)):
            continue
        try:
            epoch = int(name[len(_SNAP_PREFIX):])
        except ValueError:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
        if epoch > best_epoch and fs.exists(marker):
            best, best_epoch = status.getPath().toString(), epoch
    if best is None:
        raise ValueError(f"no complete snapshot under {snapshot_dir}")
    return spark.read.parquet(best)
