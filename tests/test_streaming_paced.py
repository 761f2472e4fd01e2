"""Streaming surface + paced-fetch politeness tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_crawl_monitor_stream(spark, golden_spark_crawl):
    from linkkchecker_net_spark.streaming.monitor import run_monitor_once

    ckpt = golden_spark_crawl.cfg.ckpt_dir
    live = run_monitor_once(spark, ckpt, query_name="mon_test")
    got = {r["classification"]: r["n"] for r in live.collect()}
    want = {
        r["classification"]: r["n"]
        for r in golden_spark_crawl.results()
        .groupBy("classification")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_windowed_event_stats_stream(spark):
    from linkkchecker_net_spark.streaming.monitor import run_event_stats_once

    sf = "/root/testdata/sf0.001"
    streamed = run_event_stats_once(spark, sf, query_name="ev_test")
    rows = streamed.collect()
    assert rows, "stream must emit closed windows"
    # streamed (append-mode) rows = windows closed below the final
    # watermark; every emitted row must match the batch computation
    ev = spark.read.parquet(f"{sf}/events.parquet")
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["avg_value"])
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "avg_value")
        .collect()
    }
    for r in rows:
        assert batch[(r["window_start"], r["event_type"])] == (r["n"], r["avg_value"])


def test_paced_fetch_politeness(spark, golden_fixtures):
    from linkkchecker_net_spark.engine import tables
    from linkkchecker_net_spark.engine.paced_fetch import fetch_with_pacing

    fx = golden_fixtures
    web = tables.web_df(spark, fx["web"])
    batch = web.select("url", "url_hash", "host").limit(40)
    delay = 0.02
    robots = [dict(host=h, crawl_delay=delay) for h in ("site-a.test", "site-b.test", "cdn.test")]
    fetched = fetch_with_pacing(batch, web, robots)
    rows = fetched.select("host", "fetch_ts").collect()
    assert len(rows) == 40
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["fetch_ts"])
    for host, stamps in by_host.items():
        stamps.sort()
        # pacing: within a host, consecutive fetches >= crawl_delay apart
        gaps = [b - a for a, b in zip(stamps, stamps[1:])]
        assert all(g >= delay * 0.9 for g in gaps), (host, gaps[:5])


def test_rate_alert_stream_subset_of_batch(spark, tmp_path):
    """Sliding-window rate alert: append-mode stream over a two-file
    split emits only watermark-closed windows, and every emitted
    (window, key) row must equal the batch twin's — including rows
    whose window straddles the micro-batch split (state carry-over)."""
    import os

    from linkkchecker_net_spark.streaming.monitor import (
        rate_alert,
        rate_alert_stream,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    split_ts = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    ev.filter(F.col("ts") <= split_ts).coalesce(1).write.parquet(
        str(tmp_path / "a")
    )
    ev.filter(F.col("ts") > split_ts).coalesce(1).write.parquet(
        str(tmp_path / "b")
    )
    for i, stage in enumerate(("a", "b")):
        src = [f for f in os.listdir(str(tmp_path / stage))
               if f.endswith(".parquet")][0]
        os.rename(
            str(tmp_path / stage / src),
            os.path.join(inbox, f"part{i}.parquet"),
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    out = rate_alert_stream(stream, threshold=3, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("rate_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rate_test").collect()
    assert rows, "stream must emit closed windows"
    batch = {
        (r["window_start_us"], r["key"]): (r["n"], r["alert"])
        for r in rate_alert(ev, threshold=3).collect()
    }
    for r in rows:
        assert batch[(r["window_start_us"], r["key"])] == (
            r["n"], r["alert"],
        ), r
    # a window that straddles the split must still count both halves
    split_us = int(split_ts.timestamp() * 1_000_000)
    straddlers = [
        r for r in rows
        if r["window_start_us"] <= split_us < r["window_start_us"] + 3_600_000_000
    ]
    assert straddlers, "the split-straddling windows must close too"
