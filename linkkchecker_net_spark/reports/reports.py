"""The four report extensions as pure DataFrame queries (SURVEY.md §3.3).

The reference runs these as plugin `Done()` passes over accumulated
in-memory lists; here each is a declarative query over the `results` /
`page_meta` tables — Catalyst handles pushdown/pruning, and each report is
incrementally recomputable per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkkchecker_net_spark.kernels.canonicalize import (
    canonical_match_udf,
    canonicalize_udf,
)
from linkkchecker_net_spark.kernels.sitemapparse import sitemap_locs_udf

IMAGE_MIMES = ["image/jpeg", "image/jpg", "image/png", "image/gif", "image/tiff"]


def canonical_report(page_meta: DataFrame) -> DataFrame:
    """CanonicalChecker (/root/reference/SpiderEngine/CanonicalChecker.cs:32-84):
    per in-site html page — canonical link missing / ok / mismatch."""
    return page_meta.select(
        "url",
        F.when(F.col("canonical_href").isNull(), F.lit("missing"))
        .when(canonical_match_udf("url", "canonical_href"), F.lit("ok"))
        .otherwise(F.lit("mismatch"))
        .alias("verdict"),
    )


def description_report(page_meta: DataFrame) -> DataFrame:
    """DescriptionLengthChecker (DescriptionLengthChecker.cs:41-69):
    meta-description length classified, sorted desc by length (O1)."""
    length = F.coalesce(F.length("meta_description"), F.lit(0))
    return (
        page_meta.select(
            "url",
            length.alias("length"),
            F.when(length >= 160, F.lit("ok"))
            .when(length == 0, F.lit("missing"))
            .otherwise(F.lit("too_short"))
            .alias("verdict"),
        )
        .orderBy(F.desc("length"), "url")
    )


def sitemap_xml_locs(sitemap_bodies: DataFrame) -> DataFrame:
    """S5 ingestion — parse fetched ``sitemap.xml`` documents into
    (host, loc) rows, namespace- and Descendants-faithful to
    SiteMapChecker.cs:26-28 (kernel in kernels/sitemapparse.py).

    Input: (host string, body binary|string).  Output: one row per
    namespaced <loc>, trimmed; unparseable documents contribute nothing.
    """
    return (
        sitemap_bodies.select(
            "host", F.explode_outer(sitemap_locs_udf("body")).alias("loc")
        )
        .filter(F.col("loc").isNotNull())
    )


def sitemap_report(
    sitemaps: DataFrame, results: DataFrame, web: DataFrame, seed_hosts: list[str]
) -> DataFrame:
    """SiteMapChecker (SiteMapChecker.cs:40-58): every sitemap loc of a
    crawled site — already crawled → ok iff 2xx; un-crawled → probe (the
    J5 left join + fetch micro-epoch) and classify."""
    locs = (
        sitemaps.filter(F.col("host").isin(seed_hosts))
        .select(F.explode("loc").alias("raw_loc"))
        .select(canonicalize_udf(F.lit(None), F.col("raw_loc")).alias("loc"))
        .filter(F.col("loc").isNotNull())
        .dropDuplicates(["loc"])
    )
    res = results.select(F.col("url").alias("loc"), F.col("status").alias("r_status"))
    probe = web.select(F.col("url").alias("loc"), F.col("status").alias("w_status"))
    ok = lambda c: c.isNotNull() & (c >= 200) & (c < 300)  # noqa: E731
    return (
        locs.join(res, "loc", "left")
        .join(probe, "loc", "left")
        .select(
            "loc",
            F.when(ok(F.col("r_status")) | ok(F.col("w_status")), F.lit("ok"))
            .otherwise(F.lit("not_ok"))
            .alias("verdict"),
        )
        .orderBy("loc")
    )


def used_images_report(corpus: DataFrame, results: DataFrame) -> DataFrame:
    """UsedImagesChecker (UsedImagesChecker.cs:70-125): J3/J4 set
    differences between project images (corpus) and images actually fetched
    from the site — both directions, as anti-joins."""
    site_ids = (
        results.filter(
            F.col("content_type").isin(IMAGE_MIMES) & F.col("image_id").isNotNull()
        )
        .select("image_id")
        .dropDuplicates()
    )
    corpus_ids = corpus.select("image_id").dropDuplicates()
    not_used = corpus_ids.join(site_ids, "image_id", "left_anti").select(
        "image_id", F.lit("not_used_in_site").alias("verdict")
    )
    not_in_project = site_ids.join(corpus_ids, "image_id", "left_anti").select(
        "image_id", F.lit("not_in_project").alias("verdict")
    )
    return not_used.unionByName(not_in_project).orderBy("verdict", "image_id")


def crawl_log(results: DataFrame) -> DataFrame:
    """S7 — the severity-colored console log sink
    (/root/reference/LinkChecker/BasicLogger.cs:19-51, message format at
    Engine.cs:253-262 LogResult) as an append-only table: one line per
    fetched URL, Info for 2xx, Warn for unsupported schemes
    (Engine.cs:263-273), Error otherwise."""
    severity = (
        F.when(F.col("classification") == "ok", F.lit("Info"))
        .when(F.col("classification") == "unsupported", F.lit("Warn"))
        .otherwise(F.lit("Error"))
    )
    message = F.when(
        F.col("unsupported_scheme"),
        F.concat(F.lit("Unsupported scheme for "), F.col("url")),
    ).otherwise(
        F.concat(
            F.coalesce(F.col("status").cast("string"), F.col("error"), F.lit("-")),
            F.lit(" for "),
            F.col("url"),
            F.when(
                F.col("parent_url").isNotNull(),
                F.concat(F.lit(" in "), F.col("parent_url")),
            ).otherwise(F.lit("")),
        )
    )
    return results.select(
        "epoch",
        "url",
        severity.alias("severity"),
        message.alias("message"),
        "discovery_rank",
    )


def failure_count(results: DataFrame) -> int:
    """S8/A1 — the exit-code aggregate.  The reference's predicate is
    inverted (counts successes+exceptions, ScanResults.cs:15); we implement
    the intended semantics: rows that are NOT 2xx-ok (broken, redirect
    asserted, error, unsupported, robots_blocked)."""
    return results.filter(F.col("classification") != "ok").count()
