"""Structured Streaming smoke: file-source pages → match UDF → triples →
exactly-once parquet sink (SURVEY.md §2.9 new surface)."""

from dss_plugin_nlp_analysis_spark.operators.ontology import TagOptions, compile_ontology
from dss_plugin_nlp_analysis_spark.sources.webpages import WEB_PAGE_SCHEMA, pages_df
from dss_plugin_nlp_analysis_spark.streaming.stream_tagger import (
    run_stream_to_parquet,
    stream_pages,
    stream_triples,
)


def test_stream_triples_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages_df(spark, 60, seed=42).coalesce(2).write.parquet(src)

    rows = [("spark_engine", "spark engine", None), ("nyc", "New York", None)]
    compiled = compile_ontology(rows, ["en", "fr", "es", "de"], TagOptions(), False)

    pages = stream_pages(spark, src, WEB_PAGE_SCHEMA)
    assert pages.isStreaming
    triples = stream_triples(pages, compiled)
    q = run_stream_to_parquet(triples, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    assert got.count() > 0
    preds = {r["pred"] for r in got.select("pred").distinct().collect()}
    assert preds <= {"spark_engine", "nyc"}
    # epoch lineage recorded per batch
    assert got.select("epoch_id").distinct().count() >= 1


def test_stream_mention_rate_windowed_watermark(spark, tmp_path):
    import pyspark.sql.functions as F

    from dss_plugin_nlp_analysis_spark.streaming.stream_tagger import (
        stream_mention_rate,
    )

    src = str(tmp_path / "src_rate")
    pages_df(spark, 60, seed=7).coalesce(2).write.parquet(src)

    rows = [("spark_engine", "spark engine", None), ("nyc", "New York", None)]
    compiled = compile_ontology(rows, ["en", "fr", "es", "de"], TagOptions(), False)

    pages = stream_pages(spark, src, WEB_PAGE_SCHEMA)
    rate = stream_mention_rate(pages, compiled, window="1 hour", watermark="2 hours")
    assert rate.isStreaming
    q = (
        rate.writeStream.outputMode("complete")
        .format("memory")
        .queryName("mention_rate")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM mention_rate")
    assert got.count() > 0
    r = got.agg(F.sum("n_pages").alias("p"), F.sum("n_mentions").alias("m")).collect()[0]
    assert r["p"] == 60  # every page lands in exactly one window
    assert r["m"] >= 0
    # window struct carries event-time bounds
    assert {f.name for f in got.schema["window"].dataType.fields} == {"start", "end"}
