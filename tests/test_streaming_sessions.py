"""Stateful-streaming sessionization: the applyInPandasWithState operator
must stitch sessions across micro-batch boundaries and emit exactly the
batch spec's closed sessions.

The stream is fed the events table split into two time-ordered halves
(two files, maxFilesPerTrigger=1), so sessions spanning the split prove
the GroupState carry-over: their first half arrives in batch 1, stays in
state, and is closed (or extended) by batch 2.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
GAP_MIN = 30


def _events_with_straddler(spark):
    """The events table plus a synthetic user 9999 whose 3 events pin a
    session across the median split: two events 20 min apart bracketing
    the split (one session) and a third 2 h later that closes it."""
    from datetime import timedelta

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    split_ts = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    stamps = [
        split_ts - timedelta(minutes=10),
        split_ts + timedelta(minutes=10),
        split_ts + timedelta(hours=2),
    ]
    synth = None
    for i, t in enumerate(stamps):
        row = (
            ev.limit(1)
            .withColumn("event_id", F.lit(10_000_000 + i).cast("long"))
            .withColumn("ts", F.lit(t).cast("timestamp_ntz"))
            .withColumn("user_id", F.lit(9999).cast("long"))
            .withColumn("value", F.lit(1.0))
        )
        synth = row if synth is None else synth.unionByName(row)
    return ev.unionByName(synth), split_ts


def _write_split(spark, out_dir: str):
    """Two time-ordered halves of the events table as separate files.

    File names are lexically ordered (part0 < part1) and written in
    order, so maxFilesPerTrigger=1 processes them as two micro-batches
    with every user's events in global time order across batches —
    the operator's documented arrival contract."""
    ev, split_ts = _events_with_straddler(spark)
    a = ev.filter(F.col("ts") <= split_ts)
    b = ev.filter(F.col("ts") > split_ts)
    a.coalesce(1).write.parquet(os.path.join(out_dir, "stage_a"))
    b.coalesce(1).write.parquet(os.path.join(out_dir, "stage_b"))
    inbox = os.path.join(out_dir, "inbox")
    os.makedirs(inbox)
    for i, stage in enumerate(("stage_a", "stage_b")):
        src = [
            f
            for f in os.listdir(os.path.join(out_dir, stage))
            if f.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(out_dir, stage, src),
            os.path.join(inbox, f"part{i}.parquet"),
        )


def test_sessionize_stream_equals_batch(spark, tmp_path):
    from linkkchecker_net_spark.streaming.sessions import (
        sessionize,
        sessionize_stream,
    )

    out_dir = str(tmp_path / "sess")
    os.makedirs(out_dir)
    _write_split(spark, out_dir)
    inbox = os.path.join(out_dir, "inbox")

    ev_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    sessions = sessionize_stream(stream, gap_minutes=GAP_MIN)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["session_start_us"],
            r["session_end_us"],
            r["total_value"],
        )
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }

    batch = sessionize(_events_with_straddler(spark)[0], gap_minutes=GAP_MIN)
    # the stream emits a session only when a later event closes it by
    # gap — each user's final session is still open in state, so the
    # expected emitted set is the batch sessions minus per-user maxima
    last = batch.groupBy("user_id").agg(
        F.max("session_idx").alias("session_idx")
    )
    closed = batch.join(last, ["user_id", "session_idx"], "left_anti")
    want = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["session_start_us"],
            r["session_end_us"],
            r["total_value"],
        )
        for r in closed.collect()
    }
    assert want, "fixture must produce at least one closed session"
    assert got == want

    # cross-batch stitching really happened: at least one emitted session
    # must straddle the file split (starts in batch 1, closed by batch 2)
    split_us = (
        spark.read.parquet(os.path.join(inbox, "part0.parquet"))
        .agg(F.unix_micros(F.max("ts").cast("timestamp")))
        .collect()[0][0]
    )
    straddlers = [
        k
        for k, (_, start_us, end_us, _) in got.items()
        if start_us <= split_us < end_us
    ]
    assert straddlers, "split must cut through at least one session"
