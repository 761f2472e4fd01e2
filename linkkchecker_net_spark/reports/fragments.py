"""Fragment (in-page anchor) link audit.

The reference extracts ``<a href>`` candidates and validates the page
the href names (/root/reference/SpiderEngine/Engine.cs:307-326), but a
``href="...#section"`` link is only *half*-checked by that: the page
can be 200 while the ``#section`` anchor it promises does not exist,
which renders exactly like a broken link to a reader (the browser
lands at the top of the wrong place).  Classic link checkers grew an
anchor-check mode for this; this operator is that mode, Spark-first.

Semantics per fragment-carrying href:

* ``href="#frag"``            → in-page link; target is the page itself;
* ``href="http://…/p#frag"``  → cross-page link; target is the base URL;
* ``target_exists``           → the target base URL is a known page;
* ``resolved``                → target exists AND it declares the anchor
  (an ``id="frag"`` on any tag, or a legacy ``<a name="frag">``).

Scale: the anchor inventory and the fragment-link harvest are both
map-only codegen (``regexp_extract_all`` — no Python, no shuffle); the
check is two equi-joins keyed by target URL — the same canonical-URL
key the engine's seen-set and frontier are already bucketed by, so on
a bucketed catalog both joins are exchange-free on the big side.  The
anchor dimension is ``distinct (url, anchor)`` — far smaller than the
body stream, broadcast under AQE at report scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# any tag's id= attribute, plus the HTML4 legacy <a name=...> anchor
ID_PAT = r'(?i)(?:^|[\s"])id="([^"]*)"'
NAME_PAT = r'(?i)<a\b[^>]*(?:^|[\s"])name="([^"]*)"'
# hrefs that carry a fragment (the only links this audit concerns)
FRAG_HREF_PAT = r'(?i)<a\b[^>]*(?:^|[\s"])href="([^"]*#[^"]*)"'


def fragment_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → one row per fragment-carrying href:
    (url, target_url, fragment, in_page, target_exists, resolved)."""
    anchors = (
        pages.select(
            F.col("url").alias("target_url"),
            F.explode(
                F.concat(
                    F.regexp_extract_all("body", F.lit(ID_PAT), 1),
                    F.regexp_extract_all("body", F.lit(NAME_PAT), 1),
                )
            ).alias("fragment"),
        )
        .distinct()
        .withColumn("_am", F.lit(True))
    )
    links = (
        pages.select(
            "url",
            F.explode(
                F.regexp_extract_all("body", F.lit(FRAG_HREF_PAT), 1)
            ).alias("ref"),
        )
        .withColumn("base", F.substring_index("ref", "#", 1))
        .select(
            "url",
            (F.col("base") == "").alias("in_page"),
            F.when(F.col("base") == "", F.col("url"))
            .otherwise(F.col("base"))
            .alias("target_url"),
            F.substring_index("ref", "#", -1).alias("fragment"),
        )
    )
    page_dim = (
        pages.select(F.col("url").alias("target_url"))
        .distinct()
        .withColumn("_te", F.lit(True))
    )
    return (
        links.join(page_dim, "target_url", "left")
        .join(anchors, ["target_url", "fragment"], "left")
        .select(
            "url",
            "target_url",
            "fragment",
            "in_page",
            F.coalesce("_te", F.lit(False)).alias("target_exists"),
            (
                F.coalesce("_te", F.lit(False))
                & F.coalesce("_am", F.lit(False))
            ).alias("resolved"),
        )
    )
