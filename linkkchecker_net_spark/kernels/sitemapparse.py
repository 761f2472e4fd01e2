"""S5 — sitemap.xml parse kernel.

Mirrors the reference's sitemap load
(/root/reference/SpiderEngine/SiteMapChecker.cs:26-28):

    XElement.Load(sitemapUri)
    root.Descendants(XName.Get("loc",
        "http://www.sitemaps.org/schemas/sitemap/0.9"))
        .Select(elt => elt.Value.Trim())

i.e. every ``<loc>`` element at ANY depth (``Descendants``) that is in the
sitemaps.org 0.9 namespace — elements named ``loc`` in another (or no)
namespace are ignored — with the text value whitespace-trimmed.  A document
that fails to parse yields no URLs (the reference catches the exception,
logs, and leaves the page list empty).

Exposed as an Arrow-vectorized pandas UDF over fetched ``sitemap.xml``
bodies (binary), so sitemap ingestion is one columnar pass over however
many sites a crawl covers — no per-row Python crosses the JVM boundary.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_LOC_TAG = f"{{{SITEMAP_NS}}}loc"


def parse_sitemap(body: bytes | str | None) -> list[str] | None:
    """All namespaced <loc> values (trimmed), or None on a parse error."""
    if body is None:
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None  # SiteMapChecker.cs:30-33 — error logged, no urls
    return [(el.text or "").strip() for el in root.iter(_LOC_TAG)]


@F.pandas_udf(T.ArrayType(T.StringType()))
def sitemap_locs_udf(body: pd.Series) -> pd.Series:
    return pd.Series([parse_sitemap(b) for b in body], dtype="object")


# ---------------------------------------------------------------------------
# Full <url> block parsing — the scheduling metadata the reference's
# loc-only load (SiteMapChecker.cs:26-28) throws away.  lastmod /
# changefreq / priority are the site operator's own recrawl hints; joined
# against pipeline/recrawl.change_rate they seed the scheduler before any
# observed history exists.
# ---------------------------------------------------------------------------

_URL_TAG = f"{{{SITEMAP_NS}}}url"
_URL_FIELDS = ("loc", "lastmod", "changefreq", "priority")

URLSET_SCHEMA = T.ArrayType(
    T.StructType(
        [T.StructField(f, T.StringType()) for f in _URL_FIELDS]
    )
)


def parse_urlset(body: bytes | str | None) -> list[dict] | None:
    """All namespaced <url> blocks as dicts (children trimmed, absent →
    None); blocks without a <loc> are skipped; parse error → None —
    identical error contract to :func:`parse_sitemap`."""
    if body is None:
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None
    out = []
    for u in root.iter(_URL_TAG):
        rec = {}
        for f in _URL_FIELDS:
            el = u.find(f"{{{SITEMAP_NS}}}{f}")
            rec[f] = (el.text or "").strip() if el is not None else None
        if rec["loc"]:
            out.append(rec)
    return out


@F.pandas_udf(URLSET_SCHEMA)
def sitemap_urlset_udf(body: pd.Series) -> pd.Series:
    return pd.Series([parse_urlset(b) for b in body], dtype="object")


# ---------------------------------------------------------------------------
# Google image-sitemap extension (sitemap-image/1.1): <image:image> blocks
# nested in each <url>, declaring the page's images with optional caption /
# title.  For an image+caption harvest this is the *site operator's own*
# pairing — higher-precision supervision than alt-text scraping — so it is
# first-class here even though the reference's loc-only load discards it.
# ---------------------------------------------------------------------------

IMAGE_NS = "http://www.google.com/schemas/sitemap-image/1.1"
_IMG_TAG = f"{{{IMAGE_NS}}}image"
# Google caps image entries at 1,000 per <url> block — parse enforces it
MAX_IMAGES_PER_URL = 1000

IMAGE_URLSET_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("loc", T.StringType()),
            T.StructField("img_pos", T.IntegerType()),
            T.StructField("img_loc", T.StringType()),
            T.StructField("caption", T.StringType()),
            T.StructField("title", T.StringType()),
        ]
    )
)


def parse_image_urlset(body: bytes | str | None) -> list[dict] | None:
    """One dict per <image:image> block: (page loc, position, image loc,
    caption, title).  Blocks without an <image:loc> are skipped; <url>
    blocks without images contribute nothing; parse error → None (same
    contract as :func:`parse_sitemap`)."""
    if body is None:
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None
    out = []
    for u in root.iter(_URL_TAG):
        loc_el = u.find(f"{{{SITEMAP_NS}}}loc")
        loc = (loc_el.text or "").strip() if loc_el is not None else None
        if not loc:
            continue
        pos = 0
        for img in u.findall(_IMG_TAG)[:MAX_IMAGES_PER_URL]:
            il = img.find(f"{{{IMAGE_NS}}}loc")
            img_loc = (il.text or "").strip() if il is not None else None
            if not img_loc:
                continue
            cap = img.find(f"{{{IMAGE_NS}}}caption")
            tit = img.find(f"{{{IMAGE_NS}}}title")
            out.append(
                {
                    "loc": loc,
                    "img_pos": pos,
                    "img_loc": img_loc,
                    "caption": (cap.text or "").strip()
                    if cap is not None
                    else None,
                    "title": (tit.text or "").strip()
                    if tit is not None
                    else None,
                }
            )
            pos += 1
    return out


@F.pandas_udf(IMAGE_URLSET_SCHEMA)
def sitemap_images_udf(body: pd.Series) -> pd.Series:
    return pd.Series([parse_image_urlset(b) for b in body], dtype="object")


# ---------------------------------------------------------------------------
# <sitemapindex> expansion (sitemaps.org 0.9): large sites shard their
# sitemap into ≤50k-URL children and publish an index of <sitemap><loc>
# entries.  The reference's loader (SiteMapChecker.cs:26-28) would read an
# index's <loc> values as *page* URLs — here index expansion is explicit,
# so the crawl scheduler can enqueue child sitemaps as fetchable documents
# with their own lastmod-driven staleness, instead of misclassifying them.
# ---------------------------------------------------------------------------

_SITEMAP_TAG = f"{{{SITEMAP_NS}}}sitemap"

SITEMAPINDEX_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("seq", T.IntegerType()),
            T.StructField("loc", T.StringType()),
            T.StructField("lastmod", T.StringType()),
        ]
    )
)


def parse_sitemapindex(body: bytes | str | None) -> list[dict] | None:
    """One dict per <sitemap> block of a <sitemapindex> document:
    (seq = declaration order, child loc, optional lastmod).  Blocks
    without a <loc> are skipped (they advance no seq); a <urlset>
    document (no <sitemap> blocks) yields []; parse error → None —
    identical error contract to :func:`parse_sitemap`."""
    if body is None:
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None
    out = []
    for sm in root.iter(_SITEMAP_TAG):
        loc_el = sm.find(f"{{{SITEMAP_NS}}}loc")
        loc = (loc_el.text or "").strip() if loc_el is not None else None
        if not loc:
            continue
        lm = sm.find(f"{{{SITEMAP_NS}}}lastmod")
        out.append(
            {
                "seq": len(out),
                "loc": loc,
                "lastmod": (lm.text or "").strip() if lm is not None else None,
            }
        )
    return out


@F.pandas_udf(SITEMAPINDEX_SCHEMA)
def sitemapindex_udf(body: pd.Series) -> pd.Series:
    return pd.Series([parse_sitemapindex(b) for b in body], dtype="object")


def sitemap_index_plan(
    indexes: DataFrame, fetched: DataFrame
) -> DataFrame:
    """Expand <sitemapindex> documents into a child-sitemap fetch plan.

    ``indexes``: (index_url, body: binary) — fetched sitemap-index
    documents.  ``fetched``: (loc, fetched_lastmod) — child sitemaps the
    catalog already holds, keyed by their URL, with the lastmod they were
    fetched AT (NULL lastmod = held but of unknown vintage).

    Returns one row per declared child: (index_url, seq, loc, lastmod,
    held, stale) where ``held`` = the catalog has it and ``stale`` = held
    but the index now declares a strictly newer lastmod (string compare is
    correct for W3C datetime prefixes) — i.e. the re-fetch set is
    ``¬held ∨ stale``.

    Scale: the expansion is one Arrow-vectorized parse pass, map-only; the
    membership join broadcasts when the catalog side is small and falls to
    a hash join on ``loc`` otherwise — both engines see only the skinny
    (loc, lastmod) projection, never sitemap bodies.
    """
    kids = indexes.select(
        "index_url",
        F.explode(sitemapindex_udf(F.col("body"))).alias("s"),
    ).select(
        "index_url",
        F.col("s.seq").alias("seq"),
        F.col("s.loc").alias("loc"),
        F.col("s.lastmod").alias("lastmod"),
    )
    have = fetched.select(
        "loc", F.col("fetched_lastmod"), F.lit(True).alias("held")
    )
    out = kids.join(have, "loc", "left")
    stale = (
        F.col("held").isNotNull()
        & F.col("lastmod").isNotNull()
        & (
            F.col("fetched_lastmod").isNull()
            | (F.col("lastmod") > F.col("fetched_lastmod"))
        )
    )
    return out.select(
        "index_url",
        "seq",
        "loc",
        "lastmod",
        F.coalesce(F.col("held"), F.lit(False)).alias("held"),
        stale.alias("stale"),
    )


# changefreq → recrawl-hint seconds (sitemaps.org vocabulary; 'never' ⇒
# no recrawl (NULL), unknown/absent ⇒ the daily default)
CHANGEFREQ_SEC = {
    "always": 1800,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,
    "yearly": 31536000,
}


def changefreq_hint_expr(changefreq):
    """Column: changefreq string → recrawl hint in seconds (pure when-chain)."""
    c = F.lower(F.coalesce(changefreq, F.lit("")))
    expr = F.when(c == "never", F.lit(None).cast("long"))
    for k, v in CHANGEFREQ_SEC.items():
        expr = expr.when(c == k, F.lit(v))
    return expr.otherwise(F.lit(CHANGEFREQ_SEC["daily"]))


def sitemap_generate(
    urls: DataFrame, max_per_file: int = 50_000
) -> DataFrame:
    """The sink-side inverse of the sitemap parsers: emit
    spec-conformant sitemap XML (sitemaps.org 0.9) per host, chunked
    at the protocol's per-file URL limit (50k; parameterized for
    tests).  URLs sort lexicographically within host (deterministic
    chunking under any partitioning); all five spec entities — &, <,
    >, ' (&apos;) and " (&quot;) — are XML-escaped in <loc> as
    sitemaps.org 0.9 requires (r4 ADVICE: the last two were missing;
    order matters — & first so the later entities aren't re-escaped).

    urls: (host, url).  Output: (host, chunk, n_urls, xml).

    Scale: one host-keyed rank window (the usual hot-host caveat —
    a 10^8-URL host streams one task's disk sort; two-phase salting
    applies), then a (host, chunk) groupBy whose string aggregation
    is bounded at max_per_file locs per row.
    """
    from pyspark.sql import Window

    esc = F.col("url")
    for raw, ent in (
        ("&", "&amp;"),   # must run first
        ("<", "&lt;"),
        (">", "&gt;"),
        ("'", "&apos;"),
        ('"', "&quot;"),
    ):
        esc = F.replace(esc, F.lit(raw), F.lit(ent))
    w = Window.partitionBy("host").orderBy("url")
    ranked = urls.select(
        "host",
        "url",
        F.floor(
            (F.row_number().over(w) - F.lit(1)) / F.lit(int(max_per_file))
        )
        .cast("int")
        .alias("chunk"),
        F.concat(F.lit("<url><loc>"), esc, F.lit("</loc></url>")).alias(
            "entry"
        ),
    )
    return (
        ranked.groupBy("host", "chunk")
        .agg(
            F.count("*").alias("n_urls"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("url", "entry"))),
                    lambda s: s["entry"],
                ),
                "",
            ).alias("_body"),
        )
        .select(
            "host",
            "chunk",
            "n_urls",
            F.concat(
                F.lit(
                    '<?xml version="1.0" encoding="UTF-8"?><urlset '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.col("_body"),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )


def sitemap_delta(locs_v1: DataFrame, locs_v2: DataFrame) -> DataFrame:
    """URL-inventory diff between two sitemap snapshots — the sitemap
    sibling of :func:`~linkkchecker_net_spark.kernels.robotsparse.
    robots_delta`: a recrawl scheduler treats newly listed locs as
    fresh crawl work and delisted locs as removal candidates, and at
    10^10-URL scale the DIFF is the event stream (re-reading whole
    sitemaps per epoch is the naive O(inventory) loop the reference's
    single-site scan can afford and a web-scale crawler cannot).

    Inputs: (host, loc) per snapshot.  Output per host in either:
    (host, n_added, n_removed, n_unchanged, verdict ∈ unchanged /
    grew / shrank / churned / new_host / gone_host).

    Scale: one full-outer join on the (host, loc) key + a host-keyed
    partial agg — both sides collapse to distinct rows first, no
    windows.
    """
    key = ["host", "loc"]
    v1 = locs_v1.select(*key).distinct()
    v2 = locs_v2.select(*key).distinct()
    j = v1.withColumn("_in1", F.lit(1)).join(
        v2.withColumn("_in2", F.lit(1)), key, "full_outer"
    )
    added = F.col("_in2").isNotNull() & F.col("_in1").isNull()
    removed = F.col("_in1").isNotNull() & F.col("_in2").isNull()
    per_host = j.groupBy("host").agg(
        F.sum(F.when(added, 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(removed, 1).otherwise(0)).alias("n_removed"),
        F.sum(
            F.when(F.col("_in1").isNotNull() & F.col("_in2").isNotNull(), 1)
            .otherwise(0)
        ).alias("n_unchanged"),
        F.max(F.when(F.col("_in1").isNotNull(), 1).otherwise(0)).alias(
            "_any1"
        ),
        F.max(F.when(F.col("_in2").isNotNull(), 1).otherwise(0)).alias(
            "_any2"
        ),
    )
    verdict = (
        F.when(F.col("_any1") == 0, F.lit("new_host"))
        .when(F.col("_any2") == 0, F.lit("gone_host"))
        .when(
            (F.col("n_added") > 0) & (F.col("n_removed") > 0),
            F.lit("churned"),
        )
        .when(F.col("n_added") > 0, F.lit("grew"))
        .when(F.col("n_removed") > 0, F.lit("shrank"))
        .otherwise(F.lit("unchanged"))
    )
    return per_host.select(
        "host",
        F.col("n_added").cast("long").alias("n_added"),
        F.col("n_removed").cast("long").alias("n_removed"),
        F.col("n_unchanged").cast("long").alias("n_unchanged"),
        verdict.alias("verdict"),
    )
