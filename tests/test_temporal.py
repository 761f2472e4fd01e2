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
