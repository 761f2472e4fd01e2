"""Host-reputation rollup — the crawl-policy score over per-page signals.

The reference reports per-URL failures only (`Reporter.cs` console
table); a web-scale scheduler needs the HOST-level synthesis: soft-404
share (fetch waste), duplicate-content share (mirror/template smell),
broken-link share, and mean page quality fold into one score that
`pipeline/recrawl.budget_alloc` consumes as its quality tier and the
trap damper (`engine/driver.CrawlConfig.trap_explosion_threshold`)
cross-checks.

All rates are INTEGER parts-per-million and the score is integer
arithmetic end-to-end — the same engine-exactness discipline as
budget_alloc: no float sums cross an aggregation boundary, so the score
is bit-identical regardless of partition order (and of the engine
computing it).

Scale: one partial-aggregated groupBy on host (count-distinct of the
content digest is the only shuffle-heavy term; at 10^10 pages swap the
exact distinct for approx_count_distinct — the score formula is
unchanged, the ppm becomes an estimate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def host_reputation(pages: DataFrame) -> DataFrame:
    """(host, n_pages, soft404_ppm, broken_ppm, dup_ppm, quality_centi,
    reputation) from per-page rows.

    ``pages`` columns: host, status (int), soft404 (boolean),
    content_hash (string), quality_scaled (long, 1-5 tier).

    reputation = 10·quality_centi − soft404_ppm div 500 − dup_ppm div 500
    − broken_ppm div 1000 — quality sets the ceiling (≤5000), waste and
    duplication eat it; the constants weigh a 100% soft-404 host as −2000
    (uncrawlable) and a fully-duplicated mirror as −2000 below its
    quality tier.
    """
    agg = pages.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.col("soft404").cast("long")).alias("n_soft"),
        F.sum(
            ((F.col("status") >= 400) & ~F.col("soft404")).cast("long")
        ).alias("n_broken"),
        F.countDistinct("content_hash").alias("n_distinct"),
        F.sum("quality_scaled").alias("sum_q"),
    )
    soft_ppm = F.expr(f"{PPM} * n_soft div n_pages")
    broken_ppm = F.expr(f"{PPM} * n_broken div n_pages")
    dup_ppm = F.expr(f"{PPM} * (n_pages - n_distinct) div n_pages")
    quality_centi = F.expr("100 * sum_q div n_pages")
    return agg.select(
        "host",
        "n_pages",
        soft_ppm.alias("soft404_ppm"),
        broken_ppm.alias("broken_ppm"),
        dup_ppm.alias("dup_ppm"),
        quality_centi.alias("quality_centi"),
        (
            F.lit(10) * quality_centi
            - F.expr(f"({PPM} * n_soft div n_pages) div 500")
            - F.expr(f"({PPM} * (n_pages - n_distinct) div n_pages) div 500")
            - F.expr(f"({PPM} * n_broken div n_pages) div 1000")
        ).alias("reputation"),
    )
