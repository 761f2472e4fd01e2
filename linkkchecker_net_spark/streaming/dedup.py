"""At-least-once event dedup — batch and stateful-streaming twins.

Ingestion pipelines that feed the crawl monitor (streaming/monitor.py)
are at-least-once: the same event row can arrive more than once, across
micro-batch boundaries.  The batch operator is the executable spec —
keep the FIRST occurrence per event_id (ts, then payload tiebreak) and
count how many deliveries were seen; the streaming twin is Spark's
built-in stateful dedup, ``dropDuplicatesWithinWatermark`` on event_id,
which holds each seen key in the state store for the watermark horizon
and emits only the first arrival.

Equality contract (tests/test_streaming_dedup.py): feeding the same
event stream through multiple micro-batches — with duplicates that
STRADDLE the batch split — emits exactly the batch operator's keep-first
row set, because the key state survives the split.

Scale: batch = one shuffle on event_id with map-side partial min
(keep-first is an agg, not a window — no sort); streaming state is one
(key, expiry) entry per event inside the horizon, the exact sizing knob
the watermark exposes.  Reference analog: the reference's insert-once
seen-claim (ScanResults.cs:16-45) is this same idempotency contract,
applied to events instead of URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events(events: DataFrame) -> DataFrame:
    """Batch spec: per event_id — the first delivery's (ts, value) and
    the delivery count.  (event_id, first_ts_us, value, n_seen).

    min_by(struct) keeps the whole first row in ONE partial-aggregated
    pass: no window, no sort, map-side combine absorbs hot keys.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    first = F.min(F.struct(us.alias("us"), F.col("value"))).alias("f")
    return (
        events.groupBy("event_id")
        .agg(first, F.count("*").alias("n_seen"))
        .select(
            "event_id",
            F.col("f.us").alias("first_ts_us"),
            F.col("f.value").alias("value"),
            "n_seen",
        )
    )


def dedup_events_stream(
    events_stream: DataFrame, horizon_minutes: int = 60
) -> DataFrame:
    """Streaming twin: first-arrival-wins dedup on event_id with a
    watermark-bounded state store.  A duplicate arriving within
    ``horizon_minutes`` of the first copy's event time is dropped even
    across micro-batch boundaries; beyond the horizon the key has been
    evicted (the documented at-least-once window every streaming dedup
    must declare).
    """
    # watermarks need TIMESTAMP (not NTZ); the session tz is pinned UTC
    # (session.py), so the cast is a micros-identity
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", f"{int(horizon_minutes)} minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
