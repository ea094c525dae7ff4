"""Print the measured triple-extraction precision/recall vs the
reference tagger's frozen semantics (BASELINE.json target ≥ 0.95) as one
JSON line. Corpus + goldens: tests/pr_corpus.py.

Usage: python scripts/measure_pr.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("measure-pr")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        from tests.pr_corpus import score_scenarios

        result = score_scenarios(spark)
        slim = {k: v for k, v in result.items() if k != "per_scenario"}
        slim["failing_scenarios"] = {
            k: v
            for k, v in result["per_scenario"].items()
            if v["extra"] or v["missing"]
        }
        print(json.dumps(slim, ensure_ascii=False))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
