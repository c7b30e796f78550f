"""Streaming extraction: file-source pages stream → stateless
parse+extract (mapInArrow is stateless, so it runs unchanged inside a
micro-batch) → parquet sink with exactly-once checkpointing, plus a
watermarked per-host windowed metrics stream for late-arriving
captures.

Deployment shape at scale: the file source is the landing zone of a
crawler (one dir per warc dump); ``trigger=availableNow`` drains the
backlog with bounded batches (maxFilesPerTrigger) and shuts down —
the resumable-batch analog. A long-lived ``processingTime`` trigger
serves the continuous mode; both share the same checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parse import parse_and_extract

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the extraction stream.
    Returns the StreamingQuery."""
    pages = read_pages_stream(spark, input_dir)
    parsed = parse_and_extract(pages)
    writer = (
        parsed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


def stream_host_window_metrics(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window per-host capture counts: late
    captures within the watermark still update their window; older ones
    are dropped (state is bounded — mandatory at crawl scale)."""
    pages = read_pages_stream(spark, input_dir)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .withColumn("host", F.regexp_extract("url", r"https?://([^/]+)/", 1))
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("n_captures"),
            F.sum(F.length("html")).alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "n_captures", "bytes_in",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
