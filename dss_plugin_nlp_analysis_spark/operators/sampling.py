"""Deterministic sampling for corpus rebalancing.

Training-data pipelines downsample over-represented strata (e.g. English
web text) and keep rare strata whole. Spark's ``DataFrame.sample`` is
seed-dependent on partitioning and not reproducible across engines, so
these operators derive the keep/drop decision from ``md5(seed|id)`` —
the same engine-portable construction as the LSH hyperplane literals
(``similarity.hyperplane_buckets``): first 15 hex chars as an integer,
uniform in [0, 2^60), kept iff below ``fraction · 2^60``.

Properties: exactly reproducible on any engine (the DuckDB oracle runs
the same arithmetic), stable under repartitioning/retries (a pure
function of the id), and composable (different ``seed`` values give
independent samples). Pure per-row filter — zero shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sample_hash", "deterministic_sample", "stratified_sample"]

_SPACE = 1 << 60


def sample_hash(id_col: Column, seed: str = "") -> Column:
    """Uniform [0, 2^60) hash of ``seed|id`` (md5-derived, engine-portable)."""
    key = F.concat(F.lit(seed + "|"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _SPACE)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by ``md5(seed|id)``."""
    return df.where(sample_hash(F.col(id_col), seed) < F.lit(_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum keep fractions (e.g. ``{"en": 0.1, "de": 0.5}`` keeps
    10% of English, 50% of German, and ``default_fraction`` of everything
    else, NULL strata included). Thresholds ship as a CASE expression —
    a pure map, no join."""
    thr: Column = F.lit(_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_threshold(frac))).otherwise(thr)
    return df.where(sample_hash(F.col(id_col), seed) < thr)
