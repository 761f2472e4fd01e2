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

from pyspark.sql import DataFrame, Window
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


def host_concentration(pages: DataFrame, top_k: int = 5) -> DataFrame:
    """Corpus host-concentration audit — the dataset-card diversity
    block: per-host document counts with corpus share, cumulative share
    in descending-count order, top-k membership, and the corpus Gini
    coefficient — all exact integer ppm (the Gini via the rank
    formulation G = (2·Σ(i·x_i) − (n+1)·Σx) / (n·Σx) over counts
    sorted ascending, floor-ppm'd; no float sums anywhere).

    A pretraining corpus where three hosts carry half the documents
    needs per-domain caps (pipeline/curation.domain_cap) before any
    quality filter matters — this is the audit that says so.

    Input: (host) one row per document/page.  Output: one row per host
    (host, n_docs, share_ppm, cum_share_ppm, in_top_k, gini_ppm) —
    gini_ppm repeated per row (corpus scalar).

    Scale: one host-keyed count (partial-agg), then windows over the
    HOST TABLE (≤ 10^7 rows at web scale, not the doc stream); the
    corpus scalars ride a 1-row broadcast cross join.
    """
    counts = pages.groupBy("host").agg(F.count("*").alias("n_docs"))
    asc = Window.orderBy(F.asc("n_docs"), F.asc("host"))
    desc = Window.orderBy(F.desc("n_docs"), F.asc("host")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = counts.select(
        "host", "n_docs",
        F.row_number().over(asc).alias("_i"),
        F.row_number().over(
            Window.orderBy(F.desc("n_docs"), F.asc("host"))
        ).alias("_ri"),
        F.sum("n_docs").over(desc).alias("_cum"),
    )
    tot = rk.agg(
        F.sum("n_docs").alias("_tot"),
        F.count("*").alias("_n"),
        F.sum(F.col("_i") * F.col("n_docs")).alias("_iwx"),
    )
    return (
        rk.crossJoin(F.broadcast(tot))
        .select(
            "host",
            "n_docs",
            F.floor(F.col("n_docs") * 1_000_000 / F.col("_tot")).alias(
                "share_ppm"
            ),
            F.floor(F.col("_cum") * 1_000_000 / F.col("_tot")).alias(
                "cum_share_ppm"
            ),
            (F.col("_ri") <= F.lit(int(top_k))).alias("in_top_k"),
            F.floor(
                (2 * F.col("_iwx") - (F.col("_n") + 1) * F.col("_tot"))
                * 1_000_000
                / (F.col("_n") * F.col("_tot"))
            ).alias("gini_ppm"),
        )
    )


def fetch_fairness(fetches: DataFrame) -> DataFrame:
    """Jain's fairness index over per-host fetch counts — the
    politeness-scheduler health metric: J = (Σx)² / (n·Σx²), 1.0 when
    every host gets equal service, → 1/n when one host hogs the
    crawl.  Reported in exact floor-ppm integers (numerator and
    denominator are integer sums, no float path).

    Input: (host) one row per fetch.  Output: ONE row
    (n_hosts, n_fetches, jain_ppm, max_host_share_ppm).

    Scale: host-keyed count (partial-agg) then a single-row aggregate
    of the host table — the same two-level rollup shape as
    host_reputation; nothing doc-stream-sized crosses a shuffle twice.
    """
    counts = fetches.groupBy("host").agg(F.count("*").alias("x"))
    agg = counts.agg(
        F.count("*").alias("n_hosts"),
        F.sum("x").alias("n_fetches"),
        F.sum(F.col("x") * F.col("x")).alias("_sq"),
        F.max("x").alias("_mx"),
    )
    return agg.select(
        "n_hosts",
        "n_fetches",
        F.floor(
            F.col("n_fetches") * F.col("n_fetches") * 1_000_000
            / (F.col("n_hosts") * F.col("_sq"))
        ).alias("jain_ppm"),
        F.floor(F.col("_mx") * 1_000_000 / F.col("n_fetches")).alias(
            "max_host_share_ppm"
        ),
    )


def host_language_profile(
    pages: DataFrame,
    host_col: str = "host",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-host language mix — the targeting view a language-scoped
    crawl (or a per-language corpus budget) schedules from: most hosts
    are monolingual, and the ones that aren't are either genuinely
    multilingual sites (crawl all variants, see `bitext_candidates`)
    or template farms serving the same chrome under every locale.

    pages: (host, lang) per page (lang from `lang_id` /
    `content_language`).  Output per host: (host, n_pages, n_langs,
    dominant_lang, dominant_ppm) — dominant by count with
    lexicographic tie-break, share in floor-ppm.

    Scale: one (host, lang)-keyed partial agg; the dominant pick is a
    window over the per-(host, lang) table PARTITIONED BY host —
    per-host state bounded by |languages|, never the page stream.
    """
    per = (
        pages.select(
            F.col(host_col).alias("host"), F.col(lang_col).alias("lang")
        )
        .groupBy("host", "lang")
        .agg(F.count("*").alias("n"))
    )
    tot = per.groupBy("host").agg(
        F.sum("n").alias("n_pages"), F.count("*").alias("n_langs")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n").desc(), F.col("lang")
    )
    top = per.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") == 1
    )
    return top.join(tot, "host").select(
        "host",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_langs").cast("int").alias("n_langs"),
        F.col("lang").alias("dominant_lang"),
        F.floor(F.col("n") * 1_000_000 / F.col("n_pages"))
        .cast("long")
        .alias("dominant_ppm"),
    )
