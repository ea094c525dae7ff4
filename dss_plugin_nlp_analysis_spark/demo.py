"""Demo ontology + query builders over the driver test corpus.

The driver's `documents` table (TESTDATA.md) is space-separated lowercase
words over a ~31-word vocabulary — ideal for DuckDB-oracle-checkable
projections of the tagging pipeline: keywords below are chosen with
*pairwise-disjoint token sets*, so all-overlaps (PhraseMatcher) and
leftmost-longest (EntityRuler) yield the same match set and a word-boundary
regex is an exact relational oracle. Overlap/nesting semantics are pinned
separately in tests/test_tagger_parity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (tag, keyword, category) — keywords have pairwise-disjoint token sets;
# merge_op carries two keywords to exercise per-tag dedup (A1).
DEMO_ONTOLOGY = [
    ("scan_op", "table scan", "operator"),
    ("merge_op", "merge", "operator"),
    ("merge_op", "slow", "operator"),
    ("window_op", "window", "operator"),
    ("customer_ent", "customer", "entity"),
    ("spark_ent", "spark", "entity"),
]

DEMO_KEYWORD_REGEX = r"\b(table scan|merge|slow|window|customer|spark)\b"

# SQL fragment: the same ontology as a VALUES CTE (for DuckDB oracles)
DEMO_ONTOLOGY_SQL = (
    "onto(tag, keyword, category) AS (VALUES "
    + ", ".join(f"('{t}', '{k}', '{c}')" for t, k, c in DEMO_ONTOLOGY)
    + ")"
)


# KG-oracle ontology: 'window' is an ambiguous alias shared by two tags
# (zeta_op resolves to canonical alpha_op via the alias graph); the expected
# pred/obj mapping is statically derivable for the DuckDB oracle.
KG_ORACLE_ONTOLOGY = [
    ("zeta_op", "window"),
    ("alpha_op", "window"),
    ("zeta_op", "stream"),
    ("scan_op", "table scan"),
]

KG_KEYWORD_REGEX = r"\b(window|stream|table scan)\b"


def kg_oracle_ontology_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(KG_ORACLE_ONTOLOGY, "tag string, keyword string")


def demo_ontology_df(spark: SparkSession, with_category: bool = False) -> DataFrame:
    if with_category:
        return spark.createDataFrame(DEMO_ONTOLOGY, "tag string, keyword string, category string")
    return spark.createDataFrame(
        [(t, k) for t, k, _c in DEMO_ONTOLOGY], "tag string, keyword string"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
