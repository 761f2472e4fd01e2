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


def rate_alert(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 hour",
    slide: str = "30 minutes",
    threshold: int = 5,
) -> DataFrame:
    """Sliding-window per-key event-rate alert, BATCH twin — the
    crawl-ops shape is a per-host fetch-rate breaker (a host suddenly
    serving 10× its baseline is a trap or a misbehaving scheduler;
    the breaker must see it within a slide, not a tumble).  Sliding
    windows (window, slide) are the §2.8 machinery tumbling windows
    can't express: each event lands in window/slide overlapping
    windows, all epoch-aligned exactly as Spark's `F.window` defines
    them, which is what the oracle replays with integer microsecond
    arithmetic.

    Output: (window_start_us, key, n, alert = n ≥ threshold) —
    window_start_us as unix micros so the driver compare stays
    dtype-exact cross-engine.

    Scale: one (window, key)-keyed partial agg; the window explosion
    is bounded by window/slide (here 2×).
    """
    w = F.window(F.col("ts").cast("timestamp"), window, slide)
    return (
        events.groupBy(w.alias("w"), F.col(key_col).alias("key"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "key",
            F.col("n").cast("long").alias("n"),
            (F.col("n") >= F.lit(int(threshold))).alias("alert"),
        )
    )


def rate_alert_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    window: str = "1 hour",
    slide: str = "30 minutes",
    threshold: int = 5,
    watermark: str = "2 hours",
) -> DataFrame:
    """Structured-Streaming twin of :func:`rate_alert`: watermarked
    sliding-window counts; late rows beyond the watermark drop.  The
    batch==stream equality across a micro-batch split is pinned in
    tests (the sessionize/dedup twin discipline).

    The cast happens BEFORE withWatermark and the window groups the
    watermarked column itself — windowing a fresh cast expression
    detaches the watermark and append mode rejects the plan."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "key",
            F.col("n").cast("long").alias("n"),
            (F.col("n") >= F.lit(int(threshold))).alias("alert"),
        )
    )


def rollup_stream(
    events_stream: DataFrame,
    key_col: str = "event_type",
    bucket_seconds: int = 60,
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Structured-Streaming twin of `pipeline/temporal.
    hypertable_rollup` at one granularity — the Lambda pair: the batch
    operator materializes history, this watermarked tumbling-window
    aggregation maintains the live head of the same table, and because
    the batch side's bucket floor and Spark's epoch-aligned window
    start coincide for tumbling windows, the two sides emit
    IDENTICAL (bucket_seconds, bucket_start, key) rows — equality
    across a micro-batch split is pinned in tests (the rate_alert twin
    discipline; same cast-before-withWatermark rule).

    Output matches hypertable_rollup: (bucket_seconds, bucket_start,
    key, n_events, sum_cents, min_cents, max_cents).
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .withColumn("cents", cents)
        .groupBy(
            F.window("ts", f"{int(bucket_seconds)} seconds").alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .select(
            F.lit(int(bucket_seconds)).cast("long").alias("bucket_seconds"),
            F.unix_seconds(F.col("w.start")).alias("bucket_start"),
            "key", "n_events", "sum_cents", "min_cents", "max_cents",
        )
    )
