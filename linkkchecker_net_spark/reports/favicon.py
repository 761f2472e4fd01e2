"""Favicon discovery + best-per-host selection.

The reference inventories a site's *used images* against the disk
image directory (/root/reference/SpiderEngine/ImagesChecker.cs) but
never looks at the one image every browser fetches unconditionally:
the favicon.  A crawl frontier wants exactly one icon URL per host —
it renders in result UIs, doubles as a cheap brand fingerprint for
mirror-host detection, and (because browsers hit it on every visit)
/favicon.ico 404s are the most common dead asset on the web.

Selection semantics (the browser preference ladder, flattened):

* declared candidates = ``<link rel="icon" | "shortcut icon" |
  "apple-touch-icon" href=...>`` across ALL of the host's pages,
  distinct by (href, rel, size);
* ``sizes="NxN"`` ranks by N; absent sizes ranks 0; ``sizes="any"``
  (scalable SVG) ranks above every raster (size 1,000,000);
* best per host = highest size, then href/rel lexicographic — fully
  deterministic;
* hosts that declare nothing fall back to the conventional
  ``http://host/favicon.ico`` (declared=false).

Scale: tag harvest is map-only codegen (same RE2-safe whole-tag
extraction as the SRI audit); the candidate set collapses to a
distinct per-host dimension (tiny — icons per host is single-digit),
so the pick window and the fallback anti-join both run on host-grain
data, never on the page stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LINK_TAG_PAT = r"(?i)<link\b[^>]*>"
REL_ATTR_PAT = r'(?i)(?:^|[\s"])rel="([^"]*)"'
HREF_ATTR_PAT = r'(?i)(?:^|[\s"])href="([^"]*)"'
SIZES_ATTR_PAT = r'(?i)(?:^|[\s"])sizes="([^"]*)"'
ICON_RELS = ("icon", "shortcut icon", "apple-touch-icon")
ANY_SIZE = 1_000_000


def favicon_pick(pages: DataFrame) -> DataFrame:
    """pages: (url, host, body) → one row per host:
    (host, href, rel, size_px, declared, n_declared)."""
    tags = pages.select(
        "host",
        F.explode(
            F.regexp_extract_all("body", F.lit(LINK_TAG_PAT), 0)
        ).alias("tag"),
    )
    rel = F.lower(F.regexp_extract("tag", REL_ATTR_PAT, 1))
    href = F.nullif(F.regexp_extract("tag", HREF_ATTR_PAT, 1), F.lit(""))
    sizes = F.nullif(F.regexp_extract("tag", SIZES_ATTR_PAT, 1), F.lit(""))
    size_px = F.when(sizes == "any", F.lit(ANY_SIZE)).otherwise(
        F.coalesce(
            F.nullif(F.regexp_extract(sizes, r"^(\d+)", 1), F.lit(""))
            .cast("int"),
            F.lit(0),
        )
    )
    cand = (
        tags.select(
            "host",
            rel.alias("rel"),
            href.alias("href0"),
            size_px.alias("size_px"),
        )
        .filter(F.col("rel").isin(*ICON_RELS) & F.col("href0").isNotNull())
        .select(
            "host",
            F.when(F.col("href0").startswith("http"), F.col("href0"))
            .otherwise(F.concat(F.lit("http://"), "host", "href0"))
            .alias("href"),
            "rel",
            "size_px",
        )
        .distinct()
    )
    wh = Window.partitionBy("host")
    ranked = (
        cand.withColumn("n_declared", F.count("*").over(wh).cast("long"))
        .withColumn(
            "_rk",
            F.row_number().over(
                wh.orderBy(F.col("size_px").desc(), "href", "rel")
            ),
        )
        .filter(F.col("_rk") == 1)
        .select(
            "host", "href", "rel", "size_px",
            F.lit(True).alias("declared"), "n_declared",
        )
    )
    fallback = (
        pages.select("host")
        .distinct()
        .join(cand.select("host").distinct(), "host", "left_anti")
        .select(
            "host",
            F.concat(F.lit("http://"), "host", F.lit("/favicon.ico"))
            .alias("href"),
            F.lit("fallback").alias("rel"),
            F.lit(0).cast("int").alias("size_px"),
            F.lit(False).alias("declared"),
            F.lit(0).cast("long").alias("n_declared"),
        )
    )
    return ranked.unionByName(fallback)


def favicon_clusters(icons: DataFrame) -> DataFrame:
    """icons: (host, icon_digest) → per host: (host, icon_digest,
    cluster_size, is_shared) — hosts grouped by the content hash of the
    favicon they serve.

    Favicon pivoting (the Shodan/censys technique, OWASP favicon-hash
    fingerprinting): operators of mirror farms, phishing kits and
    parked-domain networks deploy the same icon byte-for-byte across
    every storefront, so a shared digest across unrelated registrable
    domains is one of the cheapest mirror-network signals a crawler
    gets — it composes with `mirror_hosts` (content-side) and
    `host_components` (link-side) as the asset-side vote.

    Scale: one partial-aggregated count keyed by icon_digest (distinct
    hosts per digest) joined back to the skinny (host, digest) table —
    the `title_audit` duplicate-count shape; a default-icon digest
    shared by millions of hosts is a hot key only inside the map-side-
    combined count, never in the join input.
    """
    per_digest = icons.groupBy("icon_digest").agg(
        F.countDistinct("host").cast("long").alias("cluster_size")
    )
    return (
        icons.select("host", "icon_digest")
        .dropDuplicates()
        .join(per_digest, "icon_digest")
        .select(
            "host",
            "icon_digest",
            "cluster_size",
            (F.col("cluster_size") >= 2).alias("is_shared"),
        )
    )
