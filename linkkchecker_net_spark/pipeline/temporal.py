"""Temporal joins the built-in operators don't express directly: AS-OF
join (latest state at event time) and RANGE join (point-in-interval),
both named by the brief as custom-operator classes Spark lacks.

Crawl framings: the as-of join answers "which robots.txt policy was in
force when this fetch happened" (joining the fetch log against the
policy-change stream `robots_delta` emits); the range join answers
"which outage / maintenance / rate-limit window was this fetch inside"
(joining fetches against host incident intervals from
`host_error_streak`).

Both implementations avoid the naive theta join (ON key AND s.ts <=
e.ts), which degenerates to an O(|E_k| x |S_k|) per-key nested loop:

  * as-of: the LOCF (last-observation-carried-forward) union — events
    and states interleave into ONE frame sorted per key by time, and a
    window `last(value, ignorenulls)` carries each state forward to
    the events that follow it.  One shuffle (the key partition), work
    linear in |E| + |S|.
  * range: bucket-explode — each interval explodes to the time buckets
    it covers, points hash to their bucket, and the join is a plain
    equi-join on bucket with an exact residual filter.  Interval
    fanout = length/bucket_size; never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    states: DataFrame,
    key_col: str = "host",
    event_ts_col: str = "ts",
    state_ts_col: str = "ts",
    value_col: str = "value",
    tolerance: int | None = None,
) -> DataFrame:
    """For each event row, attach the LATEST state of the same key with
    state_ts <= event_ts (and state_ts >= event_ts - tolerance when
    given) — pandas' merge_asof / kdb's aj, as a Spark plan.

    Determinism contract: a state at exactly the event's timestamp IS
    visible to it (states sort before events on ties); callers must
    keep (key, state_ts) unique — the fixture and oracle do.

    Returns events' (key, event_ts) plus (state_ts, state_value),
    NULLs when no state qualifies.

    Scale: one union (schema-aligned), one key-partitioned window pass
    ordered by (ts, is_state desc) with ignorenulls last() — linear
    work, single exchange keyed by `key_col`; a hot key (one host's
    entire fetch log) is the partition bound, salt upstream if a
    single key exceeds a task (the W2 bucketing note applies).
    """
    e = events.select(
        F.col(key_col).alias("k"),
        F.col(event_ts_col).cast("long").alias("t"),
        F.lit(0).alias("is_state"),
        F.lit(None).cast("string").alias("v"),
    )
    s = states.select(
        F.col(key_col).alias("k"),
        F.col(state_ts_col).cast("long").alias("t"),
        F.lit(1).alias("is_state"),
        F.col(value_col).cast("string").alias("v"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_state").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = e.unionByName(s).select(
        "k",
        "t",
        "is_state",
        F.last("v", ignorenulls=True).over(w).alias("state_value"),
        F.last(
            F.when(F.col("is_state") == 1, F.col("t")), ignorenulls=True
        ).over(w).alias("state_ts"),
    )
    out = merged.filter(F.col("is_state") == 0)
    if tolerance is not None:
        fresh = F.col("t") - F.col("state_ts") <= F.lit(int(tolerance))
        out = out.select(
            "k",
            "t",
            F.when(fresh, F.col("state_ts")).alias("state_ts"),
            F.when(fresh, F.col("state_value")).alias("state_value"),
        )
    return out.select(
        F.col("k").alias(key_col),
        F.col("t").alias(event_ts_col),
        "state_ts",
        "state_value",
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_id_col: str = "pid",
    point_ts_col: str = "ts",
    interval_id_col: str = "iid",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: int = 64,
) -> DataFrame:
    """(point, interval) pairs with start_ts <= ts < end_ts — the
    point-in-interval join, via bucket-explode so Catalyst gets an
    EQUI-join key instead of a pure theta condition (which it would
    execute as BroadcastNestedLoop / cartesian at scale).

    Each interval emits one row per `bucket`-sized time cell it
    overlaps; points hash to their cell; the equi-join on cell is
    followed by the exact residual predicate.  Fanout per interval is
    ceil(length/bucket)+1 — pick `bucket` near the median interval
    length so fanout stays O(1); skew from one giant interval is the
    bucket-count, not a cross join.

    Returns (point_id, point_ts, interval_id).
    """
    p = points.select(
        F.col(point_id_col).alias("pid"),
        F.col(point_ts_col).cast("long").alias("pt"),
    ).withColumn("cell", (F.col("pt") / bucket).cast("long"))
    i = intervals.select(
        F.col(interval_id_col).alias("iid"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    ).filter(F.col("e") > F.col("s"))
    cells = i.select(
        "iid",
        "s",
        "e",
        F.explode(
            F.sequence(
                (F.col("s") / bucket).cast("long"),
                ((F.col("e") - 1) / bucket).cast("long"),
            )
        ).alias("cell"),
    )
    return (
        p.join(cells, "cell")
        .filter((F.col("pt") >= F.col("s")) & (F.col("pt") < F.col("e")))
        .select(
            F.col("pid").alias(point_id_col),
            F.col("pt").alias(point_ts_col),
            F.col("iid").alias(interval_id_col),
        )
    )


def hypertable_rollup(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: tuple = (60, 3600, 86400),
) -> DataFrame:
    """Multi-granularity time-bucketed continuous aggregate — the
    TimescaleDB continuous-aggregate / Druid-rollup shape the brief
    names: one pass over the raw event stream materializes EVERY
    requested granularity (minute/hour/day) keyed by
    (bucket_seconds, bucket_start, key), and every emitted statistic
    is MERGEABLE, so the rollup is incrementally maintainable:
    `merge_rollups(hypertable_rollup(A), hypertable_rollup(B))` equals
    `hypertable_rollup(A ∪ B)` exactly (pinned by test) — yesterday's
    materialization never re-reads yesterday's raw events.

    Values aggregate in integer CENTS (round(value*100)) so sums are
    order-independent and the DuckDB oracle replays them bit-exactly;
    min/max stay exact in cents too.  bucket_start is epoch seconds
    floored to the bucket (session TZ pinned UTC in session.py).

    Per row: (bucket_seconds, bucket_start, key, n_events,
    sum_cents, min_cents, max_cents).

    Scale: explode factor = len(buckets) (3x, not a shuffle concern);
    ONE partial-aggregated groupBy keyed by (bucket_seconds,
    bucket_start, key) — map-side combine absorbs the raw stream, the
    result is the rollup's own (tiny) cardinality.  At 10^10 events
    the same plan runs as the batch leg of a Lambda pipeline next to
    the watermarked streaming twin (`streaming/monitor.py`).
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    sec = F.unix_timestamp(F.col(ts_col))
    b = F.explode(
        F.array(*[F.lit(int(x)) for x in buckets])
    ).alias("bucket_seconds")
    rows = events.select(
        F.col(key_col).alias("key"), sec.alias("sec"),
        cents.alias("cents"), b,
    )
    return (
        rows.withColumn(
            "bucket_start",
            (F.col("sec") / F.col("bucket_seconds")).cast("long")
            * F.col("bucket_seconds"),
        )
        .groupBy("bucket_seconds", "bucket_start", "key")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
    )


def merge_rollups(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two hypertable rollups (same schema) into one — the
    incremental-maintenance step: union + re-aggregate with the
    mergeable combiners (count->sum, sum->sum, min->min, max->max).
    Work is proportional to the ROLLUP sizes, never the raw streams.
    """
    return (
        a.unionByName(b)
        .groupBy("bucket_seconds", "bucket_start", "key")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
            F.min("min_cents").cast("long").alias("min_cents"),
            F.max("max_cents").cast("long").alias("max_cents"),
        )
    )
