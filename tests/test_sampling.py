"""Deterministic sampling operators (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)


def test_deterministic_sample_reproducible_and_partition_stable(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3, seed="s").collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(df.repartition(7), "doc_id", 0.3, seed="s").collect()}
    assert a == b                      # stable under repartitioning
    assert 0.2 < len(a) / 2000 < 0.4   # ~fraction
    # different seeds give (near-)independent samples
    c = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3, seed="t").collect()}
    assert a != c
    # nested property: a 0.1 sample is a subset of the 0.3 sample (same seed)
    d = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.1, seed="s").collect()}
    assert d <= a


def test_deterministic_sample_fraction_bounds(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        deterministic_sample(df, "doc_id", 1.5)
    assert deterministic_sample(df, "doc_id", 0.0).count() == 0
    assert deterministic_sample(df, "doc_id", 1.0).count() == 10


def test_stratified_sample_per_stratum_and_null(spark):
    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else None))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.1}, default_fraction=1.0)
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert by[None] == 1000 and by["de"] == 1000      # default keeps all, incl. NULL
    assert 50 < by.get("en", 0) < 200                  # ~10% of 1000
    # pure map: no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
