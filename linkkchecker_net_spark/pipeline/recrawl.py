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
