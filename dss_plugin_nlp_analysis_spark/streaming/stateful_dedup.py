"""Stateful streaming dedup: drop documents whose fingerprint was already
seen in any earlier micro-batch (applyInPandasWithState — the custom
stateful-operator path from the build brief).

State per fingerprint-prefix group: the set of fingerprints seen so far.
Grouping by a short fingerprint prefix bounds per-group state and spreads
it across partitions (2 hex chars → 256 groups; tune for the cluster).
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


def streaming_exact_dedup(
    pages: DataFrame, id_col: str, text_col: str, prefix_len: int = 2
) -> DataFrame:
    """First-seen rows only, across the whole stream lifetime."""
    fps = pages.select(
        F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fingerprint")
    ).withColumn("fp_group", F.substring("fingerprint", 1, prefix_len))
    return fps.groupBy("fp_group").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
