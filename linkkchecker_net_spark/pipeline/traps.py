"""Crawl-trap detection: URL-template explosion statistics.

A crawler trap is a host whose URL space is synthetically unbounded
(calendars, session ids, faceted search) — the frontier fills with
millions of URLs that collapse to a handful of path TEMPLATES.  The
reference engine has no defense beyond its visited set (it crawls one
site; `SpiderEngine/Engine.cs` enqueues every in-site href); at 10^10
frontier scale template explosion is THE budget killer, so the candidate
stream itself must carry the signal.

The template function collapses variable runs deterministically:
long hex runs (ids, hashes) -> ``{hex}`` first, then digit runs ->
``{n}``.  Both passes are JVM-side ``regexp_replace`` (global) — the
whole operator is map-only expression work plus two partial-aggregated
groupBys; no UDF, no shuffle beyond the (host, template) and host keys,
and the (host, template) keyspace is bounded by real site structure, not
by crawl size, so reducers stay small even when a trap host contributes
10^8 candidate URLs (map-side combine collapses them per partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_PATTERN = r"^[a-z][a-z0-9+.-]*://([^/]+)"


def url_template(col) -> Column:
    """Collapse a URL to its template: lowercase, 8+-char hex runs ->
    ``{hex}``, digit runs -> ``{n}``.  Order matters (hex eats digits);
    the DuckDB oracle mirrors both passes with the 'g' flag."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[0-9a-f]{8,}", "{hex}")
    return F.regexp_replace(c, "[0-9]+", "{n}")


def template_stats(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per (host, template): candidate hits and distinct URLs.

    ``urls`` is the raw candidate stream (pre-dedup — every discovered
    link occurrence), the point where a trap is visible EARLY, before the
    seen-filter pays for it.  Non-hierarchical schemes (mailto:) carry no
    ``://`` authority and are dropped, mirroring the engine's F1 gate.
    """
    t = urls.select(
        F.regexp_extract(F.col(url_col), HOST_PATTERN, 1).alias("host"),
        url_template(F.col(url_col)).alias("template"),
        F.col(url_col).alias("u"),
    ).filter(F.col("host") != "")
    return t.groupBy("host", "template").agg(
        F.count("*").alias("n_hits"),
        F.countDistinct("u").alias("n_urls"),
    )


def trap_hosts(
    urls: DataFrame, url_col: str = "url", explosion_threshold: float = 50.0
) -> DataFrame:
    """Host-level explosion rollup: (host, n_candidates, n_urls,
    n_templates, explosion, trap).

    ``explosion`` = distinct URLs per distinct template; a host whose
    ratio clears ``explosion_threshold`` generates URL variety far beyond
    its structural page-type count — the crawl-trap signature.  The
    threshold is a policy knob: production pipelines feed ``trap`` hosts
    into the politeness budget (cap, don't ban — some large legit hosts
    are template-heavy too).
    """
    per_tpl = template_stats(urls, url_col)
    return per_tpl.groupBy("host").agg(
        F.sum("n_hits").alias("n_candidates"),
        F.sum("n_urls").alias("n_urls"),
        F.count("*").alias("n_templates"),
        F.round(F.sum("n_urls") / F.count("*"), 6).alias("explosion"),
        (F.sum("n_urls") / F.count("*") >= F.lit(explosion_threshold)).alias(
            "trap"
        ),
    )
