"""Structured Streaming surface (SURVEY.md §2.8).

The crawl itself is an iterative batch loop — determinism and bit-identical
resume are the contract, so epochs are NOT a streaming job.  Streaming
still has two real roles around the engine:

  * **live crawl monitoring**: the checkpoint catalog is append-only
    parquet, so a file-source stream over `epoch=*/results` tails the crawl
    as it runs — per-classification counters, error-rate alarms — without
    touching the crawl job itself;
  * **event-stream analytics**: watermarked windowed aggregation over an
    event table (the late-data / watermark semantics the reference has no
    analog for).

Both run with `trigger(availableNow=True)` in tests — real streaming
machinery, deterministic finite input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkkchecker_net_spark import schemas


def crawl_monitor_stream(spark: SparkSession, ckpt_dir: str) -> DataFrame:
    """File-source stream over the crawl's append-only results dirs →
    running per-classification counts (the live console the reference's
    BasicLogger approximates, as a streaming aggregation)."""
    stream = (
        spark.readStream.schema(schemas.RESULTS)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{ckpt_dir}/epoch=*/results")
    )
    return stream.groupBy("classification").agg(
        F.count("*").alias("n"),
        F.max("discovery_rank").alias("max_rank"),
    )


def run_monitor_once(spark: SparkSession, ckpt_dir: str, query_name: str = "crawl_monitor"):
    """Drain everything currently in the checkpoint into a memory sink."""
    agg = crawl_monitor_stream(spark, ckpt_dir)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def windowed_event_stats(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    late rows beyond the watermark are dropped (the streaming analog of
    J1 dropping re-discovered URLs, SURVEY.md §2.8)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )


def run_event_stats_once(
    spark: SparkSession, sf_dir: str, query_name: str = "event_stats_stream"
):
    """Stream the events table (file source) through the windowed agg."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        # the file source needs a DIRECTORY; events.parquet is a single
        # file, so stream the sf dir with a glob filter
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        # parquet NTZ timestamps can't carry a watermark — normalize
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = windowed_event_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
