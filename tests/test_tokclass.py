"""Token classifier predicates (T4; reference spacy_tokenizer.py:30-98)."""

from dss_plugin_nlp_analysis_spark.functions.tokclass import (
    is_datetime_token,
    is_emoji_token,
    is_hashtag,
    is_measure,
    is_space_token,
    is_symbol,
    is_username,
)


def test_predicates():
    assert is_hashtag("#OMG") and not is_hashtag("OMG")
    assert is_username("@alice") and not is_username("alice")
    assert is_emoji_token("👍") and not is_emoji_token("a")
    assert is_symbol("$") and is_symbol("©") and not is_symbol("a$")
    assert is_datetime_token("2024-01-01") and is_datetime_token("12:30")
    assert not is_datetime_token("12345")
    assert is_measure("10km") and is_measure("3.5kg") and not is_measure("10x")
    assert is_space_token("\n") and not is_space_token("a")


def test_classify_column(spark):
    from pyspark.sql import functions as F

    from dss_plugin_nlp_analysis_spark.functions.tokclass import classify_token_col

    df = spark.createDataFrame(
        [("#tag",), ("@bob",), ("2024-01-01",), ("10km",), ("$",), ("word",)],
        "tok string",
    )
    got = {r["tok"]: r["cls"] for r in df.select("tok", classify_token_col(F.col("tok")).alias("cls")).collect()}
    assert got == {
        "#tag": "hashtag", "@bob": "username", "2024-01-01": "datetime",
        "10km": "measure", "$": "symbol", "word": "word",
    }
