"""<base href> resolution audit.

The reference absolutizes every extracted link against the PAGE URI
(`new Uri(baseUri, relativeUrl)` — SpiderEngine/UriExtensions.cs:12-24,
wired at Engine.cs:327-333) and never consults the document's <base>
element — so on pages that declare one, a reference-style crawler
requests the wrong URLs.  This operator resolves each anchor href twice
(HTML-spec base vs page-naive) and flags the links whose targets
diverge: at crawl scale that is both a site-quality lint and the measure
of how much frontier a base-unaware crawler corrupts.

Resolution grammar (shared verbatim by the DuckDB oracle):
  * absolute ``http(s)://…``     → itself
  * scheme-relative ``//host/…`` → ``http:`` + href (fixture pages are http)
  * root-relative ``/…``         → base origin + href
  * path-relative                → base directory (through the last '/') + href
Dot-segment (``../``) normalization is NOT performed here — that is the
canonicalization kernel's job (P1, kernels/canonicalize.py) downstream of
any resolver.  The effective base = the FIRST <base> element carrying an
href (HTML5 §4.2.3: later bases are ignored), itself resolved against the
page URL by the same grammar; absent ⇒ the page URL.

Map-only whole-stage-codegen regex/array expressions; the explode fans
out to one row per anchor and nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BASE_TAG_PAT = r"(?i)<base\b[^>]*>"
_A_TAG_PAT = r"(?i)<a\b[^>]*>"
_HREF_PAT = r'(?i)(?:^|[\s"])href="([^"]*)"'


def _dir_of(u):
    # everything through the last '/' (page URLs always carry a path)
    return F.regexp_replace(u, r"[^/]*$", "")


def _origin_of(u):
    return F.regexp_extract(u, r"^(https?://[^/]+)", 1)


def _resolve(base_dir, base_origin, href):
    return (
        F.when(href.rlike(r"^https?://"), href)
        .when(href.startswith("//"), F.concat(F.lit("http:"), href))
        .when(href.startswith("/"), F.concat(base_origin, href))
        .otherwise(F.concat(base_dir, href))
    )


def base_href_links(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → one row per anchor href: (url, base_href,
    effective_base, href, resolved, naive_resolved, diverges)."""
    bases = F.filter(
        F.transform(
            F.regexp_extract_all("body", F.lit(_BASE_TAG_PAT), 0),
            lambda t: F.regexp_extract(t, _HREF_PAT, 1),
        ),
        lambda h: h != "",
    )
    base_raw = F.when(F.size(bases) > 0, F.element_at(bases, 1))
    hrefs = F.filter(
        F.transform(
            F.regexp_extract_all("body", F.lit(_A_TAG_PAT), 0),
            lambda t: F.regexp_extract(t, _HREF_PAT, 1),
        ),
        lambda h: h != "",
    )
    eff = F.coalesce(
        _resolve(_dir_of(F.col("url")), _origin_of(F.col("url")), base_raw),
        F.col("url"),
    )
    rows = pages.select(
        "url",
        base_raw.alias("base_href"),
        eff.alias("effective_base"),
        F.explode(hrefs).alias("href"),
    )
    resolved = _resolve(
        _dir_of(F.col("effective_base")),
        _origin_of(F.col("effective_base")),
        F.col("href"),
    )
    naive = _resolve(_dir_of(F.col("url")), _origin_of(F.col("url")), F.col("href"))
    return rows.select(
        "url",
        "base_href",
        "effective_base",
        "href",
        resolved.alias("resolved"),
        naive.alias("naive_resolved"),
        (resolved != naive).alias("diverges"),
    )
