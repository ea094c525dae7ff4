"""Structured Streaming variant of the tagging/KG pipeline.

The reference is strictly batch (SURVEY.md §2.9); this is new surface for
continuous crawl ingestion: a stream of web pages → the same Arrow match
UDF → triples, with exactly-once sinks via foreachBatch + the per-batch
manifest. The extraction UDF is stateless per document, so it drops into a
streaming plan unchanged — watermarks/windows only matter for the optional
rate aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ontology import CompiledOntology
from ..operators.tagger import extract_mentions, sentence_of

__all__ = [
    "stream_pages", "stream_triples", "stream_mention_rate",
    "write_epoch", "run_stream_to_parquet",
]


def stream_pages(spark: SparkSession, source_dir: str, schema) -> DataFrame:
    """File-source stream of web pages (one file batch per trigger)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def stream_triples(
    pages: DataFrame,
    compiled: CompiledOntology,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Streaming mention extraction → per-match triple rows."""
    tagged = extract_mentions(
        pages, compiled, text_col, lang_col, result_col="_t",
        skip_unknown=True, broadcast=False,  # broadcast vars don't restart cleanly in streams
    )
    # sentence resolved inside the per-row transform, before exploding
    # (same shape as kg.build_triples: never duplicate the sentences array
    # once per match row)
    m_structs = F.transform(
        F.col("_t")["matches"],
        lambda m: F.struct(
            m["tag"].alias("pred"),
            m["tag"].alias("obj"),
            m["keyword"].alias("keyword"),
            sentence_of("_t", m).alias("sentence"),
        ),
    )
    return tagged.select(
        F.col(url_col).alias("subj"), F.explode(m_structs).alias("m")
    ).select(
        "subj",
        F.col("m")["pred"].alias("pred"),
        F.col("m")["obj"].alias("obj"),
        F.col("m")["keyword"].alias("keyword"),
        F.col("m")["sentence"].alias("sentence"),
    )


def stream_mention_rate(
    pages: DataFrame,
    compiled: CompiledOntology,
    ts_col: str = "warc_ts",
    lang_col: str = "lang",
    text_col: str = "text",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed crawl-rate aggregation: per (event-time window,
    lang), the number of pages and extracted mentions.

    The watermark bounds state for late data: events later than
    ``watermark`` behind the max seen event time are dropped and their
    window finalized — the standard Structured Streaming pattern for
    continuous ingestion monitoring (emit to an append sink once windows
    close, or a memory/update sink for live dashboards)."""
    tagged = extract_mentions(
        pages, compiled, text_col, lang_col, result_col="_t",
        skip_unknown=True, broadcast=False,
    )
    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(lang_col).alias("lang"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.size(F.col("_t")["matches"])).alias("n_mentions"),
        )
    )


def run_stream_to_parquet(
    triples: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
):
    """Start the stream with an exactly-once parquet sink. Caller
    awaits/stops.

    foreachBatch alone is at-least-once (a micro-batch retried after a
    failure would re-run its writer); the sink is made IDEMPOTENT per epoch
    by partitioning the output on ``epoch_id`` and writing with dynamic
    partition overwrite — a retried epoch replaces exactly its own
    partition instead of appending a second copy, which upgrades the
    end-to-end guarantee to exactly-once (checkpointed offsets + an
    idempotent sink)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_epoch(batch_df, epoch_id, output_dir)

    return (
        triples.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def write_epoch(batch_df: DataFrame, epoch_id: int, output_dir: str) -> None:
    """Idempotent per-epoch parquet write: a retried epoch replaces its own
    ``epoch_id=<n>`` partition (dynamic overwrite) instead of appending."""
    (
        batch_df.withColumn("epoch_id", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(output_dir)
    )
