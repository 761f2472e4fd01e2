"""Per-URL change-rate estimation from snapshot history → recrawl
intervals (the freshness side of crawl scheduling; Cho & Garcia-Molina,
"Estimating frequency of change", TOIT'03, simplified).

`reports/reports.py:recrawl_schedule` ranks hosts by OBSERVED staleness
of the last crawl; this operator closes the loop with a per-URL change
RATE estimated from consecutive content fingerprints, so the scheduler
can assign intervals proportional to how often each page actually
changes instead of a global cadence.

Estimator: over n observation intervals with X observed changes and mean
gap Δ, the change period is estimated as Δ·n/X (the harmonic / inverse-
frequency estimator); X = 0 falls back to 2·n·Δ ("not seen changing yet
→ wait at least twice the observed span").  The textbook Poisson-MLE
refinement (−ln(1−X/n)) is deliberately NOT used: it diverges at X = n
(a page that changed every interval) and its transcendental output
complicates bit-exact cross-engine verification, while the ordering it
induces on pages is identical for scheduling purposes.

Scale: one window (partitioned by URL — millions of independent
partitions, no global sort) + one partial-aggregated groupBy.  Per-URL
snapshot counts are bounded by retention policy, so window state is
O(snapshots-per-URL), not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rate(
    snapshots: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """(url, n_intervals, n_changes, avg_gap, recrawl_interval).

    ``snapshots`` = one row per (url, fetch time, content fingerprint).
    URLs with a single snapshot carry no rate signal and are emitted
    with n_intervals = 0 and NULL interval (scheduler treats them as
    new pages).  avg_gap and recrawl_interval are in ``ts`` units,
    rounded to 6 dp for cross-engine comparability.
    """
    w = Window.partitionBy("url").orderBy("t")
    flagged = snapshots.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("t"),
        F.col(hash_col).alias("h"),
    ).withColumn(
        "changed",
        F.when(F.lag("h").over(w).isNull(), F.lit(None).cast("int"))
        .when(F.col("h") != F.lag("h").over(w), F.lit(1))
        .otherwise(F.lit(0)),
    )
    agg = flagged.groupBy("url").agg(
        (F.count("*") - 1).alias("n_intervals"),
        F.coalesce(F.sum("changed"), F.lit(0)).alias("n_changes"),
        (F.max("t") - F.min("t")).alias("span"),
    )
    gap = F.col("span") / F.col("n_intervals")
    interval = F.when(
        F.col("n_intervals") == 0, F.lit(None).cast("double")
    ).when(
        F.col("n_changes") == 0, 2 * F.col("n_intervals") * gap
    ).otherwise(gap * F.col("n_intervals") / F.col("n_changes"))
    return agg.select(
        "url",
        "n_intervals",
        "n_changes",
        F.round(
            F.when(F.col("n_intervals") == 0, F.lit(None)).otherwise(gap), 6
        ).alias("avg_gap"),
        F.round(interval, 6).alias("recrawl_interval"),
    )


# ---------------------------------------------------------------------------
# Per-host fetch-budget allocation — the scheduling step between "how
# big/good is each host" and W1's per-host politeness top-K.  The
# reference has no analog (single-site scan); at web scale the global
# fetch budget of an epoch must be SPLIT before the politeness window
# runs, or one mega-host starves the tail.
# ---------------------------------------------------------------------------


def budget_alloc(
    host_stats: DataFrame,
    total_budget: int,
    min_per_host: int = 1,
    max_per_host: int | None = None,
) -> DataFrame:
    """(host, n_urls, weight, alloc) — proportional-√size allocation.

    weight = quality_scaled · ⌊√n_urls·1000⌋ (INTEGER on purpose: the
    global weight sum is then exact, so the proportional split
    ⌊total·w/Σw⌋ is pure integer arithmetic — bit-identical across
    engines and across partition orders; a float Σw would make the floor
    boundary depend on double summation order).  √n_urls damps mega-host
    dominance (politeness bounds per-host throughput at ~1/host anyway,
    so linear-in-size allocation over-promises on big hosts).  The
    result is clamped to [min_per_host, max_per_host] and never exceeds
    n_urls.

    host_stats columns: host, n_urls (long), quality_scaled (long ≥ 1 —
    an integer quality tier, e.g. 1-5).  Scale: one partial-aggregated
    groupBy upstream of this, then a 1-row global sum broadcast back —
    map-only after that.
    """
    w = (
        F.col("quality_scaled")
        * F.floor(F.sqrt(F.col("n_urls").cast("double")) * 1000)
    ).cast("long")
    weighted = host_stats.withColumn("weight", w)
    total_w = weighted.agg(F.sum("weight").alias("sum_w"))
    raw = F.expr(f"CAST({total_budget} AS BIGINT) * weight div sum_w")
    alloc = F.greatest(F.lit(int(min_per_host)).cast("long"), raw)
    if max_per_host is not None:
        alloc = F.least(alloc, F.lit(int(max_per_host)).cast("long"))
    alloc = F.least(alloc, F.col("n_urls"))
    return (
        weighted.crossJoin(F.broadcast(total_w))  # 1-row scalar dim
        .select("host", "n_urls", "weight", alloc.alias("alloc"))
    )
