"""Gap-based event sessionization — batch and stateful-streaming twins.

The batch operator is the executable spec: per-user sessions split on
idle gaps > ``gap_minutes``, computed with lag + running-sum windows
(pure JVM codegen, one shuffle on user_id).  The streaming operator is
the SAME semantics as a custom stateful operator over
``applyInPandasWithState`` (SURVEY.md §2.8 / brief: "custom stateful
operators") — per-user GroupState carries the open session across
micro-batches and emits a session row the moment a gap closes it.

Equality contract (tests/test_streaming_sessions.py): feeding the same
events through the stream in multiple micro-batches emits exactly the
batch operator's sessions minus each user's final (still-open) session —
the only rows a gap never closes.

Scale: batch plan shuffles once on user_id (the window + the groupBy
share the partitioning, no second exchange); the streaming state is
O(1) per user (5 scalars), so 10^9 users is a state-store sizing
problem, not a memory one.  Timestamps are compared in integer epoch
micros (unix_micros / epoch_us) so the Spark and DuckDB twins agree
bit-exactly.

Reference analog: none — /root/reference has no streaming surface; this
is from-scratch pipeline surface per the brief.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_idx", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: per-user sessions split on gaps >
    ``gap_minutes`` of inactivity.

    Plan: one shuffle on user_id; lag → gap flag → running sum assigns
    session_idx, then the per-(user, session) aggregate reuses the same
    hash partitioning (no second exchange — user_id is a prefix of the
    groupBy key).  All codegen; ordering key (ts, event_id) is total, so
    the result is deterministic under any partitioning.
    """
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so the cast is a micros-identity and unix_micros
    # agrees bit-exactly with DuckDB's epoch_us on the same naive value
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flag = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("session_idx", F.sum(flag).over(run))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("session_end_us"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def _session_state_fn(gap_us: int):
    """Build the applyInPandasWithState function for one gap setting."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        # normalize to ns first — Arrow may hand pandas datetime64[us] or
        # [ns] depending on the type mapping, and a raw int64 cast of the
        # former would be micros (silently 1000x off vs unix_micros)
        ts_us = (
            rows["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
            // 1_000
        )
        vals = rows["value"].to_numpy()

        if state.exists:
            sess_idx, start_us, last_us, n_ev, total = state.get
        else:
            sess_idx, start_us, last_us, n_ev, total = 0, None, None, 0, 0.0

        out = []
        for t, v in zip(ts_us, vals):
            if start_us is None:
                sess_idx += 1
                start_us, last_us, n_ev, total = int(t), int(t), 1, float(v)
            elif t - last_us > gap_us:
                out.append(
                    (user_id, sess_idx, n_ev, start_us, last_us, round(total, 6))
                )
                sess_idx += 1
                start_us, last_us, n_ev, total = int(t), int(t), 1, float(v)
            else:
                last_us, n_ev, total = int(t), n_ev + 1, total + float(v)

        state.update((sess_idx, start_us, last_us, n_ev, total))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_idx",
                    "n_events",
                    "session_start_us",
                    "session_end_us",
                    "total_value",
                ],
            )

    return fn


def sessionize_stream(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Stateful-streaming twin of :func:`sessionize` over
    ``applyInPandasWithState``.

    Per-user GroupState = (session_idx, start_us, last_us, n_events,
    total_value) — 5 scalars, O(1) per user.  A session row is emitted
    the moment a later event closes it by gap; the open session rides the
    state store across micro-batches, so a session split across batches
    is stitched exactly (asserted against the batch spec in
    tests/test_streaming_sessions.py).  Events must arrive per-user
    time-ordered across batches (true for the checkpoint-tail monitor
    source; a production kafka source would add a watermark + in-state
    reorder buffer — noted, not needed for the file source).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_minutes) * 60_000_000
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_state_fn(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
