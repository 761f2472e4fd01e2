"""Link-policy gates: robots META directives + anchor rel=nofollow.

The reference crawler obeys robots.txt only (`RobotsTxtHelper.cs`); the
in-page layer of the same protocol — `<meta name="robots">`, the
`X-Robots-Tag` response header, and per-anchor `rel="nofollow"` — is
what a web-scale crawler needs on top, because site operators use it to
mark infinite calendars, faceted-search explosions, and user-generated
link spam that robots.txt patterns can't reach:

  * ``noindex``  — fetch is fine, but the page must not appear in the
    results/report output (the crawl analog of a search index);
  * ``nofollow`` (page-level or per-anchor) — the page's outlinks (or
    that anchor) must not enter the candidate stream.

Everything here is a pure Column expression (regexp over the already-
fetched body — whole-stage codegen, zero shuffle, zero Python).  The
fixture corpus synthesizes attributes in canonical order
(name= before content=, rel= before href=); a production swap to the
full attribute-order-insensitive scanner is `kernels/htmlparse.scan_page`
growing a rel capture — the gates downstream are unchanged.  DuckDB
mirrors every regex 1:1 (Java regex and RE2 agree on this subset).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# directive tokens per RFC 9309's de-facto META extension: `none` is
# shorthand for noindex+nofollow; tokens are comma-separated, optionally
# padded, case-insensitive
_NOINDEX_PAT = r"(?i)(^|[,\s])(noindex|none)([,\s]|$)"
_NOFOLLOW_PAT = r"(?i)(^|[,\s])(nofollow|none)([,\s]|$)"

# content of the FIRST <meta name="robots" content="..."> tag
_META_ROBOTS_PAT = r'(?i)<meta\s+name="robots"\s+content="([^"]*)"'

# <a ...> attribute blobs (anchors only; comment masking is the full
# scanner's job — see module docstring)
_ANCHOR_PAT = r"(?i)<a\s+([^>]*)>"
_HREF_PAT = r'href="([^"]*)"'
_REL_NOFOLLOW_PAT = r'(?i)rel="[^"]*nofollow'


def _directives(content: Column) -> Column:
    return F.struct(
        content.rlike(_NOINDEX_PAT).alias("noindex"),
        content.rlike(_NOFOLLOW_PAT).alias("nofollow"),
    )


def meta_robots_expr(body: Column) -> Column:
    """struct(noindex, nofollow) from the page's `<meta name="robots">`.

    A page without the tag yields (false, false) — the crawl default is
    index+follow.
    """
    return _directives(F.regexp_extract(body, _META_ROBOTS_PAT, 1))


def x_robots_expr(header: Column) -> Column:
    """struct(noindex, nofollow) from an `X-Robots-Tag` header value
    (NULL header ⇒ both false).  Header directives and META directives
    are OR-combined by the effective gate — either source can restrict,
    neither can re-allow."""
    return _directives(F.coalesce(header, F.lit("")))


def anchor_policy_expr(body: Column) -> Column:
    """array<struct(href, nofollow)> — one entry per `<a>` tag with an
    href, carrying its per-anchor rel=nofollow bit.

    The candidate-stream gate is then a single `F.filter`:
    anchors survive iff NOT (page_nofollow OR anchor.nofollow).
    """
    return F.filter(
        F.transform(
            F.regexp_extract_all(body, F.lit(_ANCHOR_PAT), 1),
            lambda a: F.struct(
                F.regexp_extract(a, _HREF_PAT, 1).alias("href"),
                a.rlike(_REL_NOFOLLOW_PAT).alias("nofollow"),
            ),
        ),
        lambda s: s["href"] != "",
    )
