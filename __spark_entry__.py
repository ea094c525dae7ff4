"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a
training-data-pipeline op) run over the driver testdata; ``oracle_sql()``
holds the equivalent DuckDB SQL. Column names are aliased identically on
both sides (the driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dss_plugin_nlp_analysis_spark.demo import (
    DEMO_KEYWORD_REGEX,
    DEMO_ONTOLOGY_SQL,
    demo_ontology_df,
    kg_oracle_ontology_df,
    load_table,
)
from dss_plugin_nlp_analysis_spark.operators.kg import build_triples
from dss_plugin_nlp_analysis_spark.operators.ontology import TagOptions, clean_ontology
from dss_plugin_nlp_analysis_spark.operators.tagger import tag_documents
from dss_plugin_nlp_analysis_spark.operators.textprep import (
    clean_linebreaks_col,
    extract_text_udf,
    split_sentences_udf,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ontology tagging, one row per match, over sf0.001 docs."""
    return _q_tag_match(spark, SF0001)


# --- tagging pipeline (SURVEY.md §2.6, M1/M2 + J1/J4 + S1) ---------------

def _q_tag_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = tag_documents(docs, demo_ontology_df(spark), text_col="text", lang_col="lang")
    return out.select("doc_id", "tag", "tag_keyword", "tag_sentence")


def _q_tag_match_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = tag_documents(
        docs,
        demo_ontology_df(spark, with_category=True),
        text_col="text",
        lang_col="lang",
        category_col="category",
    )
    return out.select("doc_id", "tag_category", "tag", "tag_keyword")


def _q_tag_doc_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = tag_documents(
        docs, demo_ontology_df(spark), text_col="text", lang_col="lang",
        output_format="one_row_per_doc",
    )
    return out.select("doc_id", "tag_list", "tag_keywords")


# --- ontology prep (P1, P2) ----------------------------------------------

def _q_ontology_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame(
        [
            ("tag1", "keyword1", ""),
            ("tag2", "keyword2", None),
            ("tag3", None, "cat"),
            ("", "keyword4", "cat"),
            ("tag5", "keyword5", "catX"),
        ],
        "tag string, keyword string, category string",
    )
    return clean_ontology(raw, "tag", "keyword", "category")


# --- KG materialization (SEMANTICS.md §8, north_star) ---------------------

def _q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = build_triples(
        docs,
        kg_oracle_ontology_df(spark),
        url_col="doc_id",
        text_col="text",
        lang_col="lang",
        ts_col=None,
        category_col=None,
    )
    return t.select("subj", "pred", "obj", "keyword", "sentence", "sent_idx", "category", "lang")


# --- text prep (P3/P4 native, T1 UDF, HTML extraction) --------------------

def _q_linebreak_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    derived = F.replace(
        F.replace(
            F.replace(F.trim(F.col("text")), F.lit(" agg "), F.lit("\n\n")),
            F.lit(" sort "), F.lit("\n"),
        ),
        F.lit(" key "), F.lit("\r"),
    )
    return docs.select("doc_id", clean_linebreaks_col(derived).alias("clean_text"))


def _q_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    derived = F.replace(F.trim(F.col("text")), F.lit(" merge "), F.lit(". "))
    split = split_sentences_udf()
    return docs.select(
        "doc_id", F.size(split(derived, F.col("lang"))).alias("n_sentences")
    )


def _q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><style>p{}</style></head><body><h1>Doc</h1><p>"),
        F.col("text"),
        F.lit("</p><script>var x=1;</script></body></html>"),
    )
    extract = extract_text_udf()
    return docs.select("doc_id", extract(html).alias("extracted"))


# --- language ops (A6, P8) -------------------------------------------------

def _q_distinct_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("lang").where(F.col("lang").isNotNull()).distinct()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tag_match": _q_tag_match,
        "tag_match_category": _q_tag_match_category,
        "tag_doc_list": _q_tag_doc_list,
        "ontology_clean": _q_ontology_clean,
        "distinct_langs": _q_distinct_langs,
        "kg_triples": _q_kg_triples,
        "linebreak_norm": _q_linebreak_norm,
        "sentence_split": _q_sentence_split,
        "html_extract": _q_html_extract,
    }


def oracle_sql() -> dict[str, str]:
    pat = DEMO_KEYWORD_REGEX
    onto = DEMO_ONTOLOGY_SQL
    return {
        "tag_match": f"""
            WITH {onto},
            m AS (
              SELECT doc_id, unnest(regexp_extract_all(trim(text), '{pat}')) AS kw
              FROM documents
            ),
            md AS (SELECT DISTINCT doc_id, kw FROM m)
            SELECT d.doc_id,
                   o.tag AS tag,
                   md.kw AS tag_keyword,
                   CASE WHEN md.kw IS NOT NULL THEN trim(d.text) END AS tag_sentence
            FROM documents d
            LEFT JOIN md ON d.doc_id = md.doc_id
            LEFT JOIN onto o ON o.keyword = md.kw
        """,
        "tag_match_category": f"""
            WITH {onto},
            m AS (
              SELECT doc_id, unnest(regexp_extract_all(trim(text), '{pat}')) AS kw
              FROM documents
            ),
            md AS (SELECT DISTINCT doc_id, kw FROM m)
            SELECT d.doc_id,
                   o.category AS tag_category,
                   o.tag AS tag,
                   md.kw AS tag_keyword
            FROM documents d
            LEFT JOIN md ON d.doc_id = md.doc_id
            LEFT JOIN onto o ON o.keyword = md.kw
        """,
        "tag_doc_list": f"""
            WITH {onto},
            m AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(trim(text), '{pat}')) AS kw,
                     generate_subscripts(regexp_extract_all(trim(text), '{pat}'), 1) AS pos
              FROM documents
            ),
            mt AS (
              SELECT m.doc_id, o.tag, min(m.pos) AS fp
              FROM m JOIN onto o ON o.keyword = m.kw
              GROUP BY 1, 2
            ),
            mk AS (
              SELECT doc_id, kw, min(pos) AS fp FROM m GROUP BY 1, 2
            ),
            agg AS (
              SELECT doc_id, to_json(list(tag ORDER BY fp))::VARCHAR AS tag_list
              FROM mt GROUP BY 1
            ),
            aggk AS (
              SELECT doc_id, to_json(list(kw ORDER BY fp))::VARCHAR AS tag_keywords
              FROM mk GROUP BY 1
            )
            SELECT d.doc_id, agg.tag_list, aggk.tag_keywords
            FROM documents d
            LEFT JOIN agg ON d.doc_id = agg.doc_id
            LEFT JOIN aggk ON d.doc_id = aggk.doc_id
        """,
        "ontology_clean": """
            WITH raw(tag, keyword, category) AS (VALUES
              ('tag1', 'keyword1', ''),
              ('tag2', 'keyword2', NULL),
              ('tag3', NULL, 'cat'),
              ('', 'keyword4', 'cat'),
              ('tag5', 'keyword5', 'catX'))
            SELECT nullif(tag, '') AS tag,
                   nullif(keyword, '') AS keyword,
                   coalesce(nullif(category, ''), 'uncategorized') AS category
            FROM raw
            WHERE nullif(tag, '') IS NOT NULL AND nullif(keyword, '') IS NOT NULL
        """,
        "distinct_langs": "SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL",
        "kg_triples": r"""
            WITH m AS (
              SELECT doc_id, lang, trim(text) AS sentence,
                     unnest(regexp_extract_all(trim(text), '\b(window|stream|table scan)\b')) AS kw
              FROM documents
            )
            SELECT doc_id AS subj,
                   CASE kw WHEN 'window' THEN 'alpha_op'
                           WHEN 'stream' THEN 'zeta_op'
                           ELSE 'scan_op' END AS pred,
                   CASE kw WHEN 'table scan' THEN 'scan_op'
                           ELSE 'alpha_op' END AS obj,
                   kw AS keyword,
                   sentence,
                   0 AS sent_idx,
                   NULL::VARCHAR AS category,
                   lang
            FROM m
        """,
        "linebreak_norm": r"""
            SELECT doc_id,
                   array_to_string(
                     list_transform(
                       list_filter(
                         string_split_regex(
                           replace(replace(replace(trim(text), ' agg ', chr(10) || chr(10)),
                                           ' sort ', chr(10)),
                                   ' key ', chr(13)),
                           '\r\n|\r|\n'),
                         x -> x <> ''),
                       x -> trim(x)),
                     chr(10)) AS clean_text
            FROM documents
        """,
        "sentence_split": """
            SELECT doc_id,
                   len(string_split(replace(trim(text), ' merge ', '. '), '. '))::INT AS n_sentences
            FROM documents
        """,
        "html_extract": """
            SELECT doc_id, 'Doc' || chr(10) || trim(text) AS extracted
            FROM documents
        """,
    }
