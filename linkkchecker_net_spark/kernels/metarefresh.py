"""Meta-refresh redirect extraction.

The reference follows *header* redirects transparently inside
``HttpWebResponse`` (/root/reference/SpiderEngine/Engine.cs — the fetch
loop never sees a 3xx Location as data); the engine's
``resolve_redirects`` made that edge first-class.  But the web also
redirects at the HTML level: ``<meta http-equiv="refresh"
content="N; url=...">``, which no status-code path ever surfaces.  An
instant (N=0) meta refresh is a redirect in every practical sense —
search engines treat it as a 301 — so a crawler that misses it both
under-counts redirects and mis-attributes the destination's content to
the hop page.  A delayed refresh with no URL is a self-reload (kiosk
pages); it is reported with ``target = NULL``.

Grammar handled (all case-insensitive, both engines replay the same
two patterns because RE2 has no lookahead to unify attribute order):

* ``http-equiv`` before or after ``content``;
* ``content="N"`` (reload) and ``content="N; url=T"``;
* ``url=`` value bare, single- or double-quoted, any spacing around
  ``;`` / ``=``; ``URL``/``Refresh`` in any case.

Scale: map-only codegen — two ``regexp_extract_all`` passes and a few
``regexp_extract`` projections; no Python, no shuffle.  Relative
targets resolve against the page's own scheme+host (passed as a base
column), so the output joins directly into the redirect-chain resolver
on canonical target URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# attribute-order variants (RE2-safe: no lookahead)
META_A_PAT = r'(?i)<meta\b[^>]*http-equiv="refresh"[^>]*content="([^"]*)"'
META_B_PAT = r'(?i)<meta\b[^>]*content="([^"]*)"[^>]*http-equiv="refresh"'
DELAY_PAT = r"^\s*(\d+)"
URL_PAT = "(?i);\\s*url\\s*=\\s*['\"]?([^'\"]*)"


def meta_refresh(pages: DataFrame) -> DataFrame:
    """pages: (url, base, body) → one row per page carrying a refresh
    meta: (url, delay_s, target, target_abs, instant).

    ``base`` is the page's scheme+authority (no trailing slash) used to
    absolutize path-relative targets; ``instant`` marks the rows a
    redirect resolver should treat as 301-equivalent edges.
    """
    content = F.try_element_at(
        F.concat(
            F.regexp_extract_all("body", F.lit(META_A_PAT), 1),
            F.regexp_extract_all("body", F.lit(META_B_PAT), 1),
        ),
        F.lit(1),
    )
    rows = pages.select("url", "base", content.alias("content")).filter(
        F.col("content").isNotNull()
    )
    delay = F.regexp_extract("content", DELAY_PAT, 1).cast("long")
    target = F.nullif(
        F.regexp_extract("content", URL_PAT, 1), F.lit("")
    )
    out = rows.select(
        "url",
        delay.alias("delay_s"),
        target.alias("target"),
        "base",
    )
    target_abs = F.when(F.col("target").isNull(), F.lit(None).cast("string")) \
        .when(F.col("target").startswith("http"), F.col("target")) \
        .otherwise(F.concat("base", "target"))
    return out.select(
        "url",
        "delay_s",
        "target",
        target_abs.alias("target_abs"),
        ((F.col("delay_s") == 0) & F.col("target").isNotNull()).alias(
            "instant"
        ),
    )
