"""Page-performance lints: render-blocking resources, preconnect hygiene.

The Lighthouse-shaped audits a crawl naturally feeds — per-page counts
of resources that gate first paint and of declared-vs-actually-used
third-party origins.  Reference analog: none (the C# engine checks link
liveness only); part of the from-scratch 100 TB-pipeline surface.

All extraction is whole-stage-codegen regexp over the raw body (the
same open-tag grammar family as reports/seo.py / reports/security.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEAD_PAT = r"(?is)^(.*?)</head>"
_SCRIPT_TAG = r"(?i)<script\b[^>]*>"
_LINK_TAG = r"(?i)<link\b[^>]*>"
_SRC_ATTR = r'(?i)(?:^|[\s"])src="([^"]*)"'
_HREF_ATTR = r'(?i)(?:^|[\s"])href="([^"]*)"'
_ORIGIN_PAT = r"(?i)^(https?://[^/\"]+)"


def render_blocking_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → render-blocking resource counts:
    (url, n_head_scripts, n_blocking_scripts, n_blocking_styles,
    render_blocking).

    A <script> in <head> blocks parsing unless it carries ``defer``,
    ``async`` or ``type="module"``; every <link rel=stylesheet> in
    <head> blocks first paint unconditionally (media queries and
    preload tricks are the fix, not the default).  Only the head
    (everything before the first </head>, case-insensitive) counts —
    body scripts don't gate first paint the same way.

    Scale: map-only codegen (one lazy head extraction + two tag
    harvests + array filters), zero shuffles.
    """
    head = F.regexp_extract("body", _HEAD_PAT, 1)
    scripts = F.regexp_extract_all(head, F.lit(_SCRIPT_TAG), 0)
    src_scripts = F.filter(
        scripts, lambda t: F.regexp_extract(t, _SRC_ATTR, 1) != ""
    )
    blocking_scripts = F.filter(
        src_scripts,
        lambda t: ~t.rlike(r"(?i)\s(defer|async)(\s|>|=)")
        & ~t.rlike(r'(?i)(?:^|[\s"])type="module"'),
    )
    links = F.regexp_extract_all(head, F.lit(_LINK_TAG), 0)
    styles = F.filter(
        links,
        lambda t: F.lower(F.regexp_extract(t, r'(?i)(?:^|[\s"])rel="([^"]*)"', 1))
        == "stylesheet",
    )
    return pages.select(
        "url",
        F.size(src_scripts).alias("n_head_scripts"),
        F.size(blocking_scripts).alias("n_blocking_scripts"),
        F.size(styles).alias("n_blocking_styles"),
        ((F.size(blocking_scripts) + F.size(styles)) > 0).alias(
            "render_blocking"
        ),
    )


def preconnect_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → preconnect hygiene:
    (url, n_preconnect, n_third_party_origins, n_preconnect_used,
    n_preconnect_unused, n_unconnected_origins).

    Declared = <link rel=preconnect href=origin> (plus dns-prefetch,
    the weaker form — counted together, lowercased, trailing slash
    trimmed).  Used = the set of distinct absolute http(s) origins in
    script src / img src / link href references (excluding the
    preconnect links themselves).  Unused preconnects waste a
    connection per page view; used-but-undeclared origins are the
    missed hint.

    Scale: map-only codegen — tag harvests + array_distinct /
    array_intersect / array_except per row, zero shuffles.
    """

    def _origin(h):
        return F.lower(F.regexp_extract(h, _ORIGIN_PAT, 1))

    links = F.regexp_extract_all("body", F.lit(_LINK_TAG), 0)
    pre_tags = F.filter(
        links,
        lambda t: F.lower(F.regexp_extract(t, r'(?i)(?:^|[\s"])rel="([^"]*)"', 1))
        .isin("preconnect", "dns-prefetch"),
    )
    # _origin's regex stops at the first '/', so a trailing-slash href
    # ('https://cdn.test/') already normalizes to the bare origin
    declared = F.array_distinct(
        F.filter(
            F.transform(
                pre_tags,
                lambda t: _origin(F.regexp_extract(t, _HREF_ATTR, 1)),
            ),
            lambda o: o != "",
        )
    )
    scripts = F.regexp_extract_all("body", F.lit(_SCRIPT_TAG), 0)
    imgs = F.regexp_extract_all("body", F.lit(r"(?i)<img\b[^>]*>"), 0)
    other_links = F.filter(
        links,
        lambda t: ~F.lower(F.regexp_extract(t, r'(?i)(?:^|[\s"])rel="([^"]*)"', 1))
        .isin("preconnect", "dns-prefetch"),
    )
    refs = F.concat(
        F.transform(scripts, lambda t: F.regexp_extract(t, _SRC_ATTR, 1)),
        F.transform(imgs, lambda t: F.regexp_extract(t, _SRC_ATTR, 1)),
        F.transform(other_links, lambda t: F.regexp_extract(t, _HREF_ATTR, 1)),
    )
    used = F.array_distinct(
        F.filter(F.transform(refs, _origin), lambda o: o != "")
    )
    n_used_pre = F.size(F.array_intersect(declared, used))
    return pages.select(
        "url",
        F.size(declared).alias("n_preconnect"),
        F.size(used).alias("n_third_party_origins"),
        n_used_pre.alias("n_preconnect_used"),
        (F.size(declared) - n_used_pre).alias("n_preconnect_unused"),
        F.size(F.array_except(used, declared)).alias(
            "n_unconnected_origins"
        ),
    )


def preload_audit(pages: DataFrame) -> DataFrame:
    """Preload hygiene (the <link rel=preload> spec lints browsers
    warn about): a preload without ``as=`` is ignored entirely; a font
    preload without ``crossorigin`` double-fetches (fonts are CORS
    requests even same-origin); modulepreload is counted separately.

    Output: (url, n_preload, n_preload_no_as, n_font_no_crossorigin,
    n_modulepreload, preload_ok).

    Scale: map-only codegen (one tag harvest + array filters),
    zero shuffles.
    """
    links = F.regexp_extract_all("body", F.lit(_LINK_TAG), 0)

    def rel_is(value):
        return lambda t: (
            F.lower(F.regexp_extract(t, r'(?i)(?:^|[\s"])rel="([^"]*)"', 1)) == value
        )

    pre = F.filter(links, rel_is("preload"))
    no_as = F.filter(
        pre, lambda t: F.regexp_extract(t, r'(?i)(?:^|[\s"])as="([^"]*)"', 1) == ""
    )
    font_no_co = F.filter(
        pre,
        lambda t: (
            F.lower(F.regexp_extract(t, r'(?i)(?:^|[\s"])as="([^"]*)"', 1)) == "font"
        )
        & ~t.rlike(r"(?i)\scrossorigin(\s|>|=)"),
    )
    modpre = F.filter(links, rel_is("modulepreload"))
    return pages.select(
        "url",
        F.size(pre).alias("n_preload"),
        F.size(no_as).alias("n_preload_no_as"),
        F.size(font_no_co).alias("n_font_no_crossorigin"),
        F.size(modpre).alias("n_modulepreload"),
        ((F.size(no_as) + F.size(font_no_co)) == 0).alias("preload_ok"),
    )
