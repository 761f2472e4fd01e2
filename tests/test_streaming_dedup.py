"""Stateful-streaming dedup: dropDuplicatesWithinWatermark must drop
at-least-once redeliveries ACROSS micro-batch boundaries and emit exactly
the batch spec's keep-first row set.

The stream is fed two files (maxFilesPerTrigger=1): batch 1 = every
original event (some ids twice — within-batch dedup), batch 2 = a full
redelivery of every id%5==0 event — every batch-2 row is a duplicate of a
batch-1 key, so anything emitted from batch 2 would prove the key state
did NOT survive the split."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _originals(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "value"
    )


def test_dedup_stream_equals_batch_keepfirst(spark, tmp_path):
    from linkkchecker_net_spark.streaming.dedup import (
        dedup_events,
        dedup_events_stream,
    )

    ev = _originals(spark)
    dup_in_batch1 = ev.filter(F.col("event_id") % 10 == 0)
    redelivery = ev.filter(F.col("event_id") % 5 == 0)

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    for i, df in enumerate(
        (ev.unionByName(dup_in_batch1), redelivery)
    ):
        stage = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.parquet(stage)
        src = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, src), os.path.join(inbox, f"part{i}.parquet"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    q = (
        dedup_events_stream(stream, horizon_minutes=60)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["us"], r["value"])
        for r in spark.sql(
            "SELECT event_id, unix_micros(CAST(ts AS timestamp)) AS us,"
            " value FROM dedup_test"
        ).collect()
    }

    batch = dedup_events(
        ev.unionByName(dup_in_batch1).unionByName(redelivery)
    )
    want = {
        (r["event_id"], r["first_ts_us"], r["value"])
        for r in batch.collect()
    }
    assert got == want
    # the redelivered keys were NOT emitted twice
    assert len(got) == ev.count()


def test_dedup_batch_counts(spark):
    from linkkchecker_net_spark.streaming.dedup import dedup_events

    ev = _originals(spark)
    union = ev.unionByName(ev.filter(F.col("event_id") % 5 == 0))
    counts = {
        r["n_seen"]
        for r in dedup_events(union).select("n_seen").distinct().collect()
    }
    assert counts == {1, 2}
