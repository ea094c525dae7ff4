"""Physical-plan assertions: the scale claims (zero shuffle, column
pruning, broadcast-only joins) hold in the executed plan, not just in
docstrings."""

import pytest
from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.demo import demo_ontology_df, kg_oracle_ontology_df
from dss_plugin_nlp_analysis_spark.operators.kg import build_triples
from dss_plugin_nlp_analysis_spark.operators.tagger import tag_documents

SF = "/root/testdata/sf0.001"
LANGS = ["en", "de", "zh", "fr", "es"]


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_per_match_format_zero_shuffle(spark, docs):
    out = tag_documents(docs, demo_ontology_df(spark), lang_col="lang", languages=LANGS)
    plan = plan_of(out)
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython


def test_per_doc_format_zero_shuffle(spark, docs):
    out = tag_documents(
        docs, demo_ontology_df(spark), lang_col="lang", languages=LANGS,
        output_format="one_row_per_doc",
    )
    assert "Exchange" not in plan_of(out)


def test_per_doc_json_zero_shuffle(spark, docs):
    out = tag_documents(
        docs, demo_ontology_df(spark), lang_col="lang", languages=LANGS,
        output_format="one_row_per_doc_json",
    )
    assert "Exchange" not in plan_of(out)


def test_triples_only_broadcast_exchange(spark, docs):
    t = build_triples(
        docs, kg_oracle_ontology_df(spark), url_col="doc_id", lang_col="lang",
        ts_col=None, category_col=None, languages=LANGS,
    )
    plan = plan_of(t)
    assert "BroadcastHashJoin" in plan
    # the only exchange is the broadcast of the tiny canonical dimension
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan


def test_scan_column_pruning(spark, docs):
    out = tag_documents(
        docs, demo_ontology_df(spark), lang_col="lang", languages=LANGS
    ).select("doc_id", "tag")
    plan = plan_of(out)
    # documents has 5 columns; only the 3 needed reach the parquet scan
    assert "ReadSchema: struct<doc_id:bigint,text:string,lang:string>" in plan, plan


def test_no_row_at_a_time_python_anywhere(spark, docs):
    out = tag_documents(docs, demo_ontology_df(spark), lang_col="lang", languages=LANGS)
    assert "BatchEvalPython" not in plan_of(out)
