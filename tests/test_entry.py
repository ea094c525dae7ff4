"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values."""

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NAN"
        # integral floats canonicalize to the int form: DuckDB HUGEINT
        # results reach the DRIVER as pandas float64 but this mirror's
        # fetchall() as Python int, so queries that deliberately emit
        # DOUBLE on the Spark side to match the driver's float64 hash
        # (truth_discovery, corpus_mixture) must compare equal here too
        if v.is_integer():
            return str(int(v))
        return f"{v:.6f}"
    # midnight naive datetimes canonicalize to the date form: a DATE column
    # surfaces as datetime.date via this mirror's fetchall()/collect() but
    # as a midnight datetime64 via the DRIVER's pandas path, so queries
    # that deliberately emit TIMESTAMP on the Spark side to match the
    # driver's render (burst_days) must compare equal to the oracle's DATE
    if (
        isinstance(v, datetime.datetime)
        and v.tzinfo is None
        and (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0)
    ):
        return v.date().isoformat()
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = "\x1f".join(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = ddb.sql(sql)
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    ms_spark = rows_to_multiset([c.lower() for c in spark_cols], spark_rows)
    ms_duck = rows_to_multiset([c.lower() for c in duck_cols], duck_rows)
    if ms_spark != ms_duck:
        only_s = {k: v for k, v in ms_spark.items() if ms_duck.get(k) != v}
        only_d = {k: v for k, v in ms_duck.items() if ms_spark.get(k) != v}
        sample_s = list(only_s.items())[:3]
        sample_d = list(only_d.items())[:3]
        pytest.fail(f"{name}: value mismatch\n spark-only: {sample_s}\n duck-only: {sample_d}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None
