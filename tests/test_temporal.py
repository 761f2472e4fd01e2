"""Unit + plan contracts for the temporal joins (as-of, range)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_semantics(spark):
    """Equal-ts state is visible; earlier events get NULL; tolerance
    expires stale states; multiple keys stay independent."""
    from linkkchecker_net_spark.pipeline.temporal import asof_join

    ev = spark.createDataFrame(
        [("h1", 5), ("h1", 10), ("h1", 25), ("h1", 35), ("h2", 50)],
        "host string, ts long",
    )
    st = spark.createDataFrame(
        [("h1", 10, "A"), ("h1", 20, "B"), ("h2", 100, "C")],
        "host string, ts long, value string",
    )
    out = {
        (r["host"], r["ts"]): (r["state_ts"], r["state_value"])
        for r in asof_join(ev, st).collect()
    }
    assert out[("h1", 5)] == (None, None)
    assert out[("h1", 10)] == (10, "A")     # tie visible
    assert out[("h1", 25)] == (20, "B")
    assert out[("h1", 35)] == (20, "B")
    assert out[("h2", 50)] == (None, None)  # h2 state is in the future
    tol = {
        (r["host"], r["ts"]): (r["state_ts"], r["state_value"])
        for r in asof_join(ev, st, tolerance=10).collect()
    }
    assert tol[("h1", 25)] == (20, "B")     # age 5 <= 10
    assert tol[("h1", 35)] == (None, None)  # age 15 > 10 -> expired


def test_asof_join_single_exchange_no_join(spark):
    """The LOCF plan is ONE key-partitioned exchange and a window —
    never a per-key theta join."""
    from linkkchecker_net_spark.pipeline.temporal import asof_join

    ev = spark.range(100).select(
        F.concat(F.lit("h"), (F.col("id") % 3)).alias("host"),
        F.col("id").alias("ts"),
    )
    st = spark.range(20).select(
        F.concat(F.lit("h"), (F.col("id") % 3)).alias("host"),
        (F.col("id") * 5).alias("ts"),
        F.col("id").cast("string").alias("value"),
    )
    p = _plan(asof_join(ev, st))
    assert "Join" not in p, p
    assert p.count("Exchange") == 1, p


def test_range_join_boundaries_and_plan(spark):
    """start inclusive / end exclusive; a point on a bucket boundary
    matches intervals in both neighboring cells; the plan is an
    equi-join (SortMerge/Hash), never a nested-loop cartesian."""
    from linkkchecker_net_spark.pipeline.temporal import range_join

    pts = spark.createDataFrame(
        [(1, 5), (2, 64), (3, 100), (4, 200)], "pid long, ts long"
    )
    iv = spark.createDataFrame(
        [(10, 0, 70), (11, 64, 101), (12, 199, 200)],
        "iid long, start_ts long, end_ts long",
    )
    out = sorted(
        (r["pid"], r["iid"]) for r in range_join(pts, iv).collect()
    )
    assert out == [(1, 10), (2, 10), (2, 11), (3, 11)]
    p = _plan(range_join(pts, iv))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoop" not in p, p


def test_hypertable_rollup_merge_property(spark):
    """rollup(A ∪ B) == merge(rollup(A), rollup(B)) — the incremental
    maintenance contract; per-bucket stats check against hand values."""
    from linkkchecker_net_spark.pipeline.temporal import (
        hypertable_rollup,
        merge_rollups,
    )

    ev = spark.createDataFrame(
        [
            (0, "2024-01-01 00:00:10", "a", 1.25),
            (1, "2024-01-01 00:00:50", "a", 2.00),
            (2, "2024-01-01 00:01:10", "a", 4.00),
            (3, "2024-01-01 00:00:20", "b", 8.00),
        ],
        "event_id long, ts string, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts").alias("ts"),
             "event_type", "value")
    r = hypertable_rollup(ev, buckets=(60, 3600))
    rows = {
        (x["bucket_seconds"], x["bucket_start"], x["key"]): x
        for x in r.collect()
    }
    m0 = rows[(60, 1704067200, "a")]
    assert (m0["n_events"], m0["sum_cents"]) == (2, 325)
    assert (m0["min_cents"], m0["max_cents"]) == (125, 200)
    h = rows[(3600, 1704067200, "a")]
    assert (h["n_events"], h["sum_cents"]) == (3, 725)
    a = ev.filter("event_id % 2 = 0")
    b = ev.filter("event_id % 2 = 1")
    merged = merge_rollups(
        hypertable_rollup(a, buckets=(60, 3600)),
        hypertable_rollup(b, buckets=(60, 3600)),
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, r.collect())
    )


def test_rollup_stream_equals_batch_across_split(spark, tmp_path):
    """The streaming rollup (append mode, two-file micro-batch split)
    emits exactly the batch hypertable_rollup rows for every closed
    minute bucket — including buckets straddling the split."""
    import os

    from linkkchecker_net_spark.pipeline.temporal import hypertable_rollup
    from linkkchecker_net_spark.streaming.monitor import rollup_stream

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    split_ts = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    for i, part in enumerate(
        (ev.filter(F.col("ts") <= split_ts), ev.filter(F.col("ts") > split_ts))
    ):
        part.coalesce(1).write.parquet(str(tmp_path / f"s{i}"))
        src = [f for f in os.listdir(str(tmp_path / f"s{i}"))
               if f.endswith(".parquet")][0]
        os.rename(str(tmp_path / f"s{i}" / src),
                  os.path.join(inbox, f"part{i}.parquet"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    q = (
        rollup_stream(stream, bucket_seconds=60, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rollup_test").collect()
    assert rows, "stream must emit closed buckets"
    batch = {
        (r["bucket_start"], r["key"]): (
            r["n_events"], r["sum_cents"], r["min_cents"], r["max_cents"]
        )
        for r in hypertable_rollup(ev, buckets=(60,)).collect()
    }
    for r in rows:
        assert batch[(r["bucket_start"], r["key"])] == (
            r["n_events"], r["sum_cents"], r["min_cents"], r["max_cents"]
        ), r
