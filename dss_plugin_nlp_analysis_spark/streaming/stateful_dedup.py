"""Stateful streaming dedup: drop documents whose fingerprint was already
seen in an earlier micro-batch (applyInPandasWithState — the custom
stateful-operator path from the build brief).

State per fingerprint-prefix group: the fingerprints seen so far (with a
last-seen event time in TTL mode). Grouping by a short fingerprint prefix
bounds per-group state and spreads it across partitions (2 hex chars →
256 groups; tune for the cluster).

Two retention modes:

- **event-time TTL** (``ts_col`` + ``watermark`` set — the 100 TB mode):
  exact first-seen semantics *within the watermark horizon*. Fingerprints
  whose last sighting has fallen behind the watermark are evicted from
  state each time the group is touched, and a group-level
  ``EventTimeTimeout`` reaps groups that stop receiving data entirely —
  so state size is O(docs inside the horizon), NOT O(corpus over the
  stream lifetime). A fingerprint re-appearing after the horizon re-emits,
  and a row arriving late-beyond-horizon is DROPPED by Spark's stateful
  late-event filter (see ``streaming_exact_dedup``'s late-data contract);
  ``streaming.compaction.compact_dedup_snapshot`` is the periodic batch
  compactor that restores whole-corpus exactness over the accumulated
  sink, and ``compact_raw_snapshot`` over the raw archive additionally
  recovers late-discarded documents (the standard lambda split:
  bounded-state stream + exact nightly batch — wired end-to-end in
  tests/test_round3_fixes.py).
- **unbounded** (default, no ``ts_col``): exact across the whole stream
  lifetime. State grows with every distinct fingerprint — fine for
  bounded backfills, a scale-killer for a long-running crawl stream; use
  the TTL mode there.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import fingerprint

__all__ = ["streaming_exact_dedup"]

OUT_SCHEMA = "id long, fingerprint string"
STATE_SCHEMA = "seen array<string>"
TTL_STATE_SCHEMA = "seen array<string>, seen_ts array<long>"


def _evict_expired(seen: dict[str, int], watermark_ms: int) -> dict[str, int]:
    """Drop fingerprints last seen strictly before the watermark. Exactness
    is scoped to the horizon: anything at or after the watermark can still
    receive (non-late) duplicate rows, so it must be retained."""
    if watermark_ms <= 0:
        return seen
    return {fp: ts for fp, ts in seen.items() if ts >= watermark_ms}


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out_ids, out_fps = [], []
    for pdf in pdfs:
        for i, fp in zip(pdf["id"], pdf["fingerprint"]):
            if fp not in seen:
                seen.add(fp)
                out_ids.append(i)
                out_fps.append(fp)
    state.update((list(seen),))
    yield pd.DataFrame({"id": out_ids, "fingerprint": out_fps})


def _dedup_group_ttl(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    wm = state.getCurrentWatermarkMs()
    if state.hasTimedOut:
        # no data reached this group since its newest fingerprint's TTL —
        # every entry is behind the watermark; release the group entirely
        state.remove()
        yield pd.DataFrame({"id": [], "fingerprint": []})
        return
    if state.exists:
        prev_seen, prev_ts = state.get
        seen = _evict_expired(dict(zip(prev_seen, prev_ts)), wm)
    else:
        seen = {}
    out_ids, out_fps = [], []
    for pdf in pdfs:
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
        for i, fp, ts in zip(pdf["id"], pdf["fingerprint"], ts_ms):
            if ts < wm:
                # defensive only: Spark's stateful-operator late-event
                # filter drops pre-watermark rows BEFORE the function runs
                # (verified empirically — see test_late_rows_are_dropped_
                # by_spark_and_recovered_by_raw_compactor), so this branch
                # is unreachable in practice. The real recovery path for
                # late-beyond-horizon documents is compact_raw_snapshot
                # over the durable raw archive (compaction.py).
                continue
            if fp not in seen:
                out_ids.append(i)
                out_fps.append(fp)
                seen[fp] = ts
            elif ts > seen[fp]:
                seen[fp] = ts  # sliding TTL: last sighting extends retention
    if seen:
        fps = list(seen)
        state.update((fps, [seen[f] for f in fps]))
        # group reaped once the watermark passes its newest entry (must be
        # strictly above the current watermark; max(ts) >= wm by eviction)
        state.setTimeoutTimestamp(max(seen.values()) + 1)
    else:
        state.remove()
    yield pd.DataFrame({"id": out_ids, "fingerprint": out_fps})


def streaming_exact_dedup(
    pages: DataFrame,
    id_col: str,
    text_col: str,
    prefix_len: int = 2,
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """First-seen rows only. With ``ts_col`` + ``watermark`` (e.g.
    ``"1 hour"``): exact within the watermark horizon, state bounded by it
    (the long-running-stream mode).

    **Late-data contract (TTL mode):** rows whose event time has fallen
    behind the watermark are DISCARDED — Spark's stateful-operator
    late-event filter removes them before the state function runs, so
    they never reach the dedup output or its sink. A late-but-unique
    document is therefore *lost on the stream path*, not merely exempt
    from the exactness claim. The recovery path is the batch half of the
    lambda split: ``compaction.compact_raw_snapshot`` derives an exact
    first-seen snapshot from the durable raw archive (which retains late
    arrivals), so nightly compaction restores both whole-corpus
    exactness AND late-document completeness.

    Without ``ts_col``: exact across the stream lifetime, state
    O(distinct fingerprints) — bounded backfills only."""
    if (ts_col is None) != (watermark is None):
        raise ValueError("ts_col and watermark must be set together")
    cols = [
        F.col(id_col).alias("id"),
        fingerprint(F.col(text_col)).alias("fingerprint"),
    ]
    if ts_col is not None:
        cols.append(F.col(ts_col).cast("timestamp").alias("ts"))
    fps = pages.select(*cols).withColumn(
        "fp_group", F.substring("fingerprint", 1, prefix_len)
    )
    if ts_col is None:
        return fps.groupBy("fp_group").applyInPandasWithState(
            _dedup_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return (
        fps.withWatermark("ts", watermark)
        .groupBy("fp_group")
        .applyInPandasWithState(
            _dedup_group_ttl,
            outputStructType=OUT_SCHEMA,
            stateStructType=TTL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
