"""On-page SEO audits: <title> duplication, heading structure, image alt
coverage.

The natural widening of the reference's one on-page content check —
DescriptionLengthChecker.cs:41-53 pulls a single meta node per page and
reports on its length; these operators apply the same harvest-then-report
shape to the other classic link-checker lints (duplicate titles across a
host, heading hierarchy, alt-text coverage).

All three are whole-stage-codegen regex/array expressions — map-only per
page, with title_audit adding ONE skinny aggregation keyed by
(host, title) for the cross-page duplicate count.  No Python in any path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TITLE_PAT = r"(?is)<title\b[^>]*>(.*?)</title>"
_HEADING_PAT = r"(?i)<h([1-6])\b"
_IMG_TAG_PAT = r"(?i)<img\b[^>]*>"
_ALT_ATTR_PAT = r'(?i)(?:^|[\s"])alt="([^"]*)"'

TITLE_MAX = 60
TITLE_MIN = 10


def title_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, host, body) → one row per page: (url, host, title,
    title_len, n_pages_same_title, verdict).

    ``title`` = the FIRST <title> element's inner text, whitespace
    collapsed and trimmed (empty ⇒ missing).  ``n_pages_same_title`` =
    how many of the host's pages share exactly this title — the classic
    duplicate-title SEO lint, and the only cross-page part of the audit.
    Verdict precedence: missing → duplicate (shared by ≥2 pages) →
    too_long (>60 chars) → too_short (<10) → ok.

    Scale: the harvest is map-only codegen; the duplicate count is one
    partial-aggregated groupBy on (host, title) — cardinality ≈ distinct
    titles, skinny rows — broadcast-joined back when small, hash-joined
    otherwise (Catalyst/AQE picks; both sides carry only the key + one
    long).  A boilerplate mill emitting one title across 10^8 pages is a
    hot key ONLY in the count agg (map-side combine absorbs it), never
    in the join input.
    """
    title = F.nullif(
        F.trim(
            F.regexp_replace(
                F.regexp_extract("body", _TITLE_PAT, 1), r"\s+", " "
            )
        ),
        F.lit(""),
    )
    rows = pages.select("url", "host", title.alias("title"))
    counts = (
        rows.filter(F.col("title").isNotNull())
        .groupBy("host", "title")
        .agg(F.count("*").alias("n_pages_same_title"))
    )
    j = rows.join(counts, ["host", "title"], "left")
    tlen = F.length("title")
    verdict = (
        F.when(F.col("title").isNull(), "missing")
        .when(F.col("n_pages_same_title") >= 2, "duplicate")
        .when(tlen > TITLE_MAX, "too_long")
        .when(tlen < TITLE_MIN, "too_short")
        .otherwise("ok")
    )
    return j.select(
        "url",
        "host",
        "title",
        tlen.alias("title_len"),
        F.coalesce("n_pages_same_title", F.lit(0)).alias(
            "n_pages_same_title"
        ),
        verdict.alias("verdict"),
    )


def heading_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → (url, n_headings, n_h1, first_level,
    max_jump, verdict) — heading-outline lint.

    Levels are harvested in document order from <h1>-<h6> OPEN tags.
    ``max_jump`` = the largest downward level skip between consecutive
    headings (h2 directly after h1 is 1; h4 after h1 is 3; upward moves
    don't count).  Verdict precedence: no_headings → no_h1 (headings
    exist, none is h1) → multiple_h1 → skip (max_jump ≥ 2) → ok.

    Map-only: regexp_extract_all → int array → zip_with pairwise diffs;
    every expression is codegen, nothing shuffles.
    """
    levels = F.transform(
        F.regexp_extract_all("body", F.lit(_HEADING_PAT), 1),
        lambda s: s.cast("int"),
    )
    rows = pages.select("url", levels.alias("_lv"))
    n = F.size("_lv")
    n_h1 = F.size(F.filter("_lv", lambda x: x == 1))
    jumps = F.zip_with(
        F.slice("_lv", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("_lv", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.greatest(b - a, F.lit(0)),
    )
    max_jump = F.coalesce(F.array_max(jumps), F.lit(0))
    verdict = (
        F.when(n == 0, "no_headings")
        .when(n_h1 == 0, "no_h1")
        .when(n_h1 > 1, "multiple_h1")
        .when(max_jump >= 2, "skip")
        .otherwise("ok")
    )
    return rows.select(
        "url",
        n.alias("n_headings"),
        n_h1.alias("n_h1"),
        F.when(n > 0, F.element_at("_lv", 1)).alias("first_level"),
        max_jump.alias("max_jump"),
        verdict.alias("verdict"),
    )


def alt_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → (url, n_imgs, n_with_alt, n_empty_alt,
    coverage_ppm, verdict) — image alt-text coverage lint.

    ``n_with_alt`` counts <img> tags carrying a NON-empty alt attribute;
    ``n_empty_alt`` counts explicit alt="" (the decorative-image idiom —
    valid accessibility markup, tracked separately, NOT counted as
    covered).  ``coverage_ppm`` = floor(1e6 × (n_with_alt + n_empty_alt)
    / n_imgs) — decorative markup IS coverage for the ppm (the author
    made a decision), NULL when the page has no images.  Verdict:
    no_images / ok (coverage complete) / partial / none.

    Map-only codegen: one regexp_extract_all for the img tags, array
    filters for the alt forms.
    """
    tags = F.regexp_extract_all("body", F.lit(_IMG_TAG_PAT), 0)
    alts = F.transform(
        tags, lambda t: F.regexp_extract(t, _ALT_ATTR_PAT, 1)
    )
    has_attr = F.transform(tags, lambda t: t.rlike(_ALT_ATTR_PAT))
    rows = pages.select(
        "url",
        F.size(tags).alias("n_imgs"),
        F.size(
            F.filter(
                F.zip_with(alts, has_attr, lambda a, h: h & (a != "")),
                lambda x: x,
            )
        ).alias("n_with_alt"),
        F.size(
            F.filter(
                F.zip_with(alts, has_attr, lambda a, h: h & (a == "")),
                lambda x: x,
            )
        ).alias("n_empty_alt"),
    )
    covered = F.col("n_with_alt") + F.col("n_empty_alt")
    ppm = F.when(
        F.col("n_imgs") > 0,
        (covered * 1_000_000 / F.col("n_imgs")).cast("long"),
    )
    verdict = (
        F.when(F.col("n_imgs") == 0, "no_images")
        .when(covered == F.col("n_imgs"), "ok")
        .when(covered == 0, "none")
        .otherwise("partial")
    )
    return rows.select(
        "url",
        "n_imgs",
        "n_with_alt",
        "n_empty_alt",
        ppm.alias("coverage_ppm"),
        verdict.alias("verdict"),
    )


_META_TAG_PAT = r"(?i)<meta\b[^>]*>"
_CONTENT_PAT = r'(?i)(?:^|[\s"])content="([^"]*)"'


def _first_meta_content(metas, key: str):
    # first <meta> whose property= OR name= equals key (case-insensitive;
    # crawlers accept both spellings in the wild), its content attr;
    # empty content counts as absent
    hit = F.filter(
        metas,
        lambda t: t.rlike(
            rf'(?i)(?:^|[\s"])(?:property|name)="{key}"'
        ),
    )
    return F.nullif(
        F.regexp_extract(
            F.when(F.size(hit) > 0, F.element_at(hit, 1)), _CONTENT_PAT, 1
        ),
        F.lit(""),
    )


def social_meta_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → Open Graph / Twitter-card completeness:
    (url, og_title, og_image, og_description, twitter_card, verdict).

    First matching <meta> per key wins (document order), matched on
    property= or name= case-insensitively.  Verdict: 'full' when all
    three og fields are present, 'none' when none is, else 'partial' —
    the share lint every link checker ships, and for the image+caption
    corpus the og:title×og:image pair is caption_pairs' harvest source.

    Map-only codegen: one regexp_extract_all for the meta tags, array
    filters per key; nothing shuffles.
    """
    metas = F.regexp_extract_all("body", F.lit(_META_TAG_PAT), 0)
    rows = pages.select(
        "url",
        _first_meta_content(metas, "og:title").alias("og_title"),
        _first_meta_content(metas, "og:image").alias("og_image"),
        _first_meta_content(metas, "og:description").alias("og_description"),
        _first_meta_content(metas, "twitter:card").alias("twitter_card"),
    )
    n = (
        F.col("og_title").isNotNull().cast("int")
        + F.col("og_image").isNotNull().cast("int")
        + F.col("og_description").isNotNull().cast("int")
    )
    verdict = (
        F.when(n == 3, "full").when(n == 0, "none").otherwise("partial")
    )
    return rows.select(
        "url", "og_title", "og_image", "og_description", "twitter_card",
        verdict.alias("verdict"),
    )


_CANONICAL_LINK_PAT = r"(?i)<link\b[^>]*>"


def canonical_consistency(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → rel=canonical vs og:url consistency:
    (url, canonical_href, og_url, verdict ∈ both_missing /
    canonical_only / og_only / match / mismatch).

    The two "this is the real URL" declarations crawlers read — when
    they disagree, dedup clustering (rel_canonical) and share previews
    (og) route the same page to different identities; this lint
    surfaces it.  First matching tag per declaration wins; both values
    are compared exactly after trim (normalization beyond that is the
    canonicalize kernel's job downstream).

    Map-only codegen — two tag harvests over the same body.
    """
    links = F.regexp_extract_all("body", F.lit(_CANONICAL_LINK_PAT), 0)
    canon_tags = F.filter(
        links, lambda t: F.lower(F.regexp_extract(t, r'(?i)(?:^|[\s"])rel="([^"]*)"', 1))
        == "canonical"
    )
    canonical = F.nullif(
        F.trim(
            F.regexp_extract(
                F.when(F.size(canon_tags) > 0, F.element_at(canon_tags, 1)),
                r'(?i)(?:^|[\s"])href="([^"]*)"',
                1,
            )
        ),
        F.lit(""),
    )
    metas = F.regexp_extract_all("body", F.lit(_META_TAG_PAT), 0)
    og_url = F.when(
        F.size(
            F.filter(
                metas, lambda t: t.rlike(r'(?i)(?:^|[\s"])(?:property|name)="og:url"')
            )
        )
        > 0,
        F.nullif(
            F.trim(
                F.regexp_extract(
                    F.element_at(
                        F.filter(
                            metas,
                            lambda t: t.rlike(
                                r'(?i)(?:^|[\s"])(?:property|name)="og:url"'
                            ),
                        ),
                        1,
                    ),
                    _CONTENT_PAT,
                    1,
                )
            ),
            F.lit(""),
        ),
    )
    rows = pages.select(
        "url", canonical.alias("canonical_href"), og_url.alias("og_url")
    )
    verdict = (
        F.when(
            F.col("canonical_href").isNull() & F.col("og_url").isNull(),
            "both_missing",
        )
        .when(F.col("og_url").isNull(), "canonical_only")
        .when(F.col("canonical_href").isNull(), "og_only")
        .when(F.col("canonical_href") == F.col("og_url"), "match")
        .otherwise("mismatch")
    )
    return rows.select(
        "url", "canonical_href", "og_url", verdict.alias("verdict")
    )


_A_TAG_PAT = r"(?i)<a\b[^>]*>"
_HREF_ATTR_PAT = r'(?i)(?:^|[\s"])href="([^"]*)"'
_REL_ATTR_PAT = r'(?i)(?:^|[\s"])rel="([^"]*)"'


def outlink_stats(pages: DataFrame) -> DataFrame:
    """pages: (url, host, body) → per-page outlink profile: (url,
    n_links, n_internal, n_external, n_nofollow, external_ppm) — the
    link-audit rollup SEO crawlers ship (excessive external ratio +
    blanket nofollow are the link-selling fingerprints anchor_spam
    scores from the other side of the edge).

    A link is external when its href is absolute http(s) with an
    authority ≠ the page's host (case-insensitive); relative and
    same-host absolute hrefs are internal; non-http schemes (mailto:,
    javascript:) are counted in n_links but in neither bucket.
    n_nofollow counts anchors whose rel token list contains nofollow
    (whole-token, case-insensitive).  external_ppm = floor(1e6·ext /
    (int+ext)), NULL when the page has no http links at all.

    Map-only codegen: one tag harvest + array filters; nothing
    shuffles.
    """
    tags = F.regexp_extract_all("body", F.lit(_A_TAG_PAT), 0)
    hrefs = F.filter(
        F.transform(tags, lambda t: F.regexp_extract(t, _HREF_ATTR_PAT, 1)),
        lambda h: h != "",
    )
    rels = F.filter(
        tags, lambda t: t.rlike(_HREF_ATTR_PAT)
    )  # only anchors WITH an href count at all
    n_nofollow = F.size(
        F.filter(
            rels,
            lambda t: F.array_contains(
                F.split(F.lower(F.regexp_extract(t, _REL_ATTR_PAT, 1)), r"\s+"),
                "nofollow",
            ),
        )
    )
    is_abs = lambda h: h.rlike(r"(?i)^https?://")  # noqa: E731
    authority = lambda h: F.lower(  # noqa: E731
        F.regexp_extract(h, r"(?i)^https?://([^/]+)", 1)
    )
    nonhttp_scheme = lambda h: h.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:") & ~is_abs(h)  # noqa: E731
    internal = F.size(
        F.filter(
            hrefs,
            lambda h: (~is_abs(h) & ~nonhttp_scheme(h))
            | (is_abs(h) & (authority(h) == F.lower(F.col("host")))),
        )
    )
    external = F.size(
        F.filter(
            hrefs,
            lambda h: is_abs(h) & (authority(h) != F.lower(F.col("host"))),
        )
    )
    rows = pages.select(
        "url",
        F.size(hrefs).alias("n_links"),
        internal.alias("n_internal"),
        external.alias("n_external"),
        n_nofollow.alias("n_nofollow"),
    )
    http_total = F.col("n_internal") + F.col("n_external")
    return rows.select(
        "url",
        "n_links",
        "n_internal",
        "n_external",
        "n_nofollow",
        F.when(
            http_total > 0,
            (F.col("n_external") * 1_000_000 / http_total).cast("long"),
        ).alias("external_ppm"),
    )


_HTML_TAG_PAT = r"(?i)<html\b[^>]*>"
_AMPHTML_LINK_PAT = r"(?i)<link\b[^>]*>"


def amp_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → AMP pairing audit, one row per page:
    (url, is_amp, amphtml_href, canonical_href, verdict).

    AMP detection follows the AMP HTML spec: the document's FIRST
    <html> open tag carries a bare ``amp`` or ``⚡`` attribute
    (word-boundary match — ``ampx``/"amp-custom" don't count).  The
    pairing contract the audit lints: a canonical page declares
    <link rel=amphtml href=…>, the AMP page declares <link
    rel=canonical …> back.  Verdicts:

    - non-AMP pages: ``plain`` (no amphtml link), ``paired`` (target
      fetched, is AMP, backlink returns here), ``amp_missing`` (link
      target not in the crawl), ``amp_not_amp`` (target fetched but
      carries no amp attribute), ``amp_backlink_mismatch`` (target's
      canonical points elsewhere or is absent).
    - AMP pages: ``amp_with_canonical`` / ``amp_orphan`` (no
      rel=canonical back-pointer — indexers will treat it as a dup).

    Scale: one map-only harvest pass, then a single url-keyed left
    self-join (amphtml_href → url) to recover the target's amp flag +
    backlink — same shape as the parent-recovery join in the epoch
    loop; AQE handles the hot-host side.
    """
    links = F.regexp_extract_all("body", F.lit(_AMPHTML_LINK_PAT), 0)

    def _first_rel_href(rel: str):
        # closure factory: a default-arg lambda would be read by PySpark
        # as the two-arg (element, index) filter form
        pred = (
            lambda r: lambda t: F.lower(
                F.regexp_extract(t, r'(?i)(?:^|[\s"])rel="([^"]*)"', 1)
            )
            == r
        )(rel)
        tags = F.filter(links, pred)
        return F.nullif(
            F.trim(
                F.regexp_extract(
                    F.when(F.size(tags) > 0, F.element_at(tags, 1)),
                    r'(?i)(?:^|[\s"])href="([^"]*)"',
                    1,
                )
            ),
            F.lit(""),
        )

    html_tag = F.regexp_extract("body", _HTML_TAG_PAT, 0)
    is_amp = html_tag.rlike(r"(?i)<html\b[^>]*\s(amp|⚡)(\s|>|=)")
    harvested = pages.select(
        "url",
        is_amp.alias("is_amp"),
        _first_rel_href("amphtml").alias("amphtml_href"),
        _first_rel_href("canonical").alias("canonical_href"),
    )
    target = harvested.select(
        F.col("url").alias("_t_url"),
        F.col("is_amp").alias("_t_amp"),
        F.col("canonical_href").alias("_t_canonical"),
    )
    joined = harvested.join(
        target, harvested["amphtml_href"] == target["_t_url"], "left"
    )
    verdict = (
        F.when(F.col("is_amp") & F.col("canonical_href").isNotNull(),
               F.lit("amp_with_canonical"))
        .when(F.col("is_amp"), F.lit("amp_orphan"))
        .when(F.col("amphtml_href").isNull(), F.lit("plain"))
        .when(F.col("_t_url").isNull(), F.lit("amp_missing"))
        .when(~F.col("_t_amp"), F.lit("amp_not_amp"))
        .when(F.col("_t_canonical") == F.col("url"), F.lit("paired"))
        .otherwise(F.lit("amp_backlink_mismatch"))
    )
    return joined.select(
        "url", "is_amp", "amphtml_href", "canonical_href",
        verdict.alias("verdict"),
    )


_GENERATOR_PAT = (
    r'(?i)<meta\b[^>]*(?:^|[\s"])name="generator"[^>]*(?:^|[\s"])content="([^"]*)"'
)


def tech_fingerprint(pages: DataFrame) -> DataFrame:
    """Wappalyzer-style platform fingerprinting, the crawl-inventory
    classifier: the <meta name=generator> declaration (first match,
    name-before-content attribute order; the reverse order rides the
    second alternation), plus two content fingerprints that survive
    generator-tag stripping — wp-content/ asset paths (WordPress) and
    cdn.shopify.com references (Shopify).  Output: (url, generator,
    platform, version) with platform from the fingerprint ladder
    (declared generator ≻ asset fingerprints ≻ 'unknown') and version
    = the first dotted-number token of the generator string.

    Scale: map-only codegen (two regexp extracts + two rlikes),
    zero shuffles.
    """
    gen_a = F.regexp_extract("body", _GENERATOR_PAT, 1)
    gen_b = F.regexp_extract(
        "body",
        r'(?i)<meta\b[^>]*(?:^|[\s"])content="([^"]*)"[^>]*(?:^|[\s"])name="generator"',
        1,
    )
    generator = F.nullif(
        F.when(gen_a != "", gen_a).otherwise(gen_b), F.lit("")
    )
    wp = F.col("body").rlike(r"(?i)/wp-content/")
    shopify = F.col("body").rlike(r"(?i)\bcdn\.shopify\.com\b")
    platform = (
        F.when(
            generator.rlike(r"(?i)^wordpress"), F.lit("wordpress")
        )
        .when(generator.rlike(r"(?i)^drupal"), F.lit("drupal"))
        .when(generator.rlike(r"(?i)^joomla"), F.lit("joomla"))
        .when(generator.rlike(r"(?i)^hugo"), F.lit("hugo"))
        .when(generator.isNotNull(), F.lit("other_declared"))
        .when(wp, F.lit("wordpress"))
        .when(shopify, F.lit("shopify"))
        .otherwise(F.lit("unknown"))
    )
    version = F.nullif(
        F.regexp_extract(
            F.coalesce(generator, F.lit("")), r"([0-9]+(?:\.[0-9]+)+)", 1
        ),
        F.lit(""),
    )
    return pages.select(
        "url",
        generator.alias("generator"),
        platform.alias("platform"),
        version.alias("version"),
    )


def lazy_loading_audit(pages: DataFrame) -> DataFrame:
    """Image lazy-loading audit — the LCP anti-pattern lint: per page,
    total <img> tags, how many carry loading="lazy", and whether the
    FIRST image (the likely Largest-Contentful-Paint candidate) is
    lazy — lazy-loading your hero image delays LCP by a full network
    round trip, the single most common Core-Web-Vitals footgun.

    Output: (url, n_imgs, n_lazy, first_img_lazy, lazy_ppm).

    Scale: map-only codegen (one tag harvest + array filter),
    zero shuffles.
    """
    imgs = F.regexp_extract_all("body", F.lit(_IMG_TAG_PAT), 0)
    lazy = F.filter(imgs, lambda t: t.rlike(r'(?i)(?:^|[\s"])loading="lazy"'))
    first_lazy = F.when(
        F.size(imgs) > 0,
        F.element_at(imgs, 1).rlike(r'(?i)(?:^|[\s"])loading="lazy"'),
    )
    return pages.select(
        "url",
        F.size(imgs).alias("n_imgs"),
        F.size(lazy).alias("n_lazy"),
        first_lazy.alias("first_img_lazy"),
        F.when(
            F.size(imgs) > 0,
            F.floor(F.size(lazy) * 1_000_000 / F.size(imgs)),
        ).alias("lazy_ppm"),
    )


_PRICE_PAT = r"[$€£][ ]?([0-9]{1,3}(?:,[0-9]{3})+|[0-9]{1,7})(\.([0-9]{2}))?"


def price_extract(pages: DataFrame) -> DataFrame:
    """Price harvest for e-commerce crawl analytics: currency-prefixed
    amounts ($ € £, optional single space, comma-grouped thousands
    ('$1,299.00' — the common US e-commerce format, r4 ADVICE) or up
    to 7 plain integer digits, optional 2-digit cents) extracted to
    exact integer cents — the product-datasheet signal feeding
    price-tracking and structured-data cross-checks (jsonld/microdata
    offers).  Commas are stripped before the cast, so '$1,299.00'
    yields 129900 cents (the old grammar silently matched '$1' → 100).

    Output: (url, n_prices, min_cents, max_cents) — NULLs when no
    price matches.

    Scale: map-only codegen (one regexp_extract_all + integer array
    fold), zero shuffles.
    """
    whole = F.regexp_extract_all("body", F.lit(_PRICE_PAT), 1)
    cents_part = F.regexp_extract_all("body", F.lit(_PRICE_PAT), 3)
    cents = F.zip_with(
        whole,
        cents_part,
        lambda d, c: F.replace(d, F.lit(","), F.lit("")).cast("long") * 100
        + F.when(c == "", F.lit(0)).otherwise(c.cast("long")),
    )
    return pages.select(
        "url",
        F.size(cents).alias("n_prices"),
        F.array_min(cents).alias("min_cents"),
        F.array_max(cents).alias("max_cents"),
    )


_LDJSON_BLOCK_PAT = (
    r'(?is)<script\b[^>]*type="application/ld\+json"[^>]*>(.*?)</script>'
)
_LD_PRICE_PAT = r'"price"\s*:\s*"?([0-9]+)(\.([0-9]{2}))?'


def price_consistency(pages: DataFrame) -> DataFrame:
    """Structured-vs-visible price cross-check: the first ``price`` key
    inside the page's first JSON-LD block (schema.org Offer shape)
    against the visible currency-prefixed prices
    (:func:`price_extract`), both in exact integer cents.  A declared
    offer price outside the page's visible [min, max] band is the
    classic stale-markup signal merchants ship after a repricing.

    Output: (url, ld_cents, min_cents, max_cents, verdict ∈
    no_structured / no_visible / match / mismatch).

    Scale: map-only codegen — two harvests over the same body, no
    joins (price_extract's columns are recomputed inline).
    """
    block = F.regexp_extract("body", _LDJSON_BLOCK_PAT, 1)
    whole = F.regexp_extract(block, _LD_PRICE_PAT, 1)
    frac = F.regexp_extract(block, _LD_PRICE_PAT, 3)
    ld_cents = F.when(
        whole != "",
        whole.cast("long") * 100
        + F.when(frac == "", F.lit(0)).otherwise(frac.cast("long")),
    )
    visible = F.zip_with(
        F.regexp_extract_all("body", F.lit(_PRICE_PAT), 1),
        F.regexp_extract_all("body", F.lit(_PRICE_PAT), 3),
        lambda d, c: F.replace(d, F.lit(","), F.lit("")).cast("long") * 100
        + F.when(c == "", F.lit(0)).otherwise(c.cast("long")),
    )
    mn, mx = F.array_min(visible), F.array_max(visible)
    verdict = (
        F.when(ld_cents.isNull(), F.lit("no_structured"))
        .when(mn.isNull(), F.lit("no_visible"))
        .when((ld_cents >= mn) & (ld_cents <= mx), F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return pages.select(
        "url",
        ld_cents.alias("ld_cents"),
        mn.alias("min_cents"),
        mx.alias("max_cents"),
        verdict.alias("verdict"),
    )


_VIEWPORT_TAG_PAT = (
    r'(?i)<meta\b[^>]*(?:^|[\s"])name="viewport"[^>]*'
    r'(?:^|[\s"])content="([^"]*)"'
)
_VIEWPORT_TAG_PAT_REV = (
    r'(?i)<meta\b[^>]*(?:^|[\s"])content="([^"]*)"[^>]*'
    r'(?:^|[\s"])name="viewport"'
)


def viewport_audit(pages: DataFrame) -> DataFrame:
    """Mobile-viewport lint — the mobile-friendliness gate search
    consoles lead with: a page without a viewport meta renders
    desktop-scaled on phones, `user-scalable=no` / `maximum-scale=1`
    block pinch-zoom (a WCAG 1.4.4 failure), and a fixed pixel width
    defeats responsive layout.  Attribute order is free in HTML, so
    the grammar matches both (name, content) orders — the
    tech_fingerprint idiom, with the anchored `name=` class (never
    \\b, the data-name decoy lesson).

    pages: (url, body) → (url, has_viewport, device_width,
    no_zoom, fixed_width, verdict ∈ missing / fixed_width / no_zoom /
    ok).

    Scale: map-only codegen, zero shuffles; slots into the SEO audit
    battery beside `amp_audit` / `canonical_consistency`.
    """
    content = F.coalesce(
        F.nullif(F.regexp_extract("body", _VIEWPORT_TAG_PAT, 1), F.lit("")),
        F.nullif(
            F.regexp_extract("body", _VIEWPORT_TAG_PAT_REV, 1), F.lit("")
        ),
    )
    has_vp = content.isNotNull()
    lc = F.lower(content)
    device_width = F.coalesce(
        lc.contains("width=device-width"), F.lit(False)
    )
    no_zoom = F.coalesce(
        lc.rlike(r"user-scalable\s*=\s*(no|0)")
        | lc.rlike(r"maximum-scale\s*=\s*1(\.0*)?(\s*,|$)"),
        F.lit(False),
    )
    fixed_width = F.coalesce(
        lc.rlike(r"width\s*=\s*[0-9]+"), F.lit(False)
    )
    verdict = (
        F.when(~has_vp, F.lit("missing"))
        .when(fixed_width & ~device_width, F.lit("fixed_width"))
        .when(no_zoom, F.lit("no_zoom"))
        .otherwise(F.lit("ok"))
    )
    return pages.select(
        "url",
        has_vp.alias("has_viewport"),
        device_width.alias("device_width"),
        no_zoom.alias("no_zoom"),
        fixed_width.alias("fixed_width"),
        verdict.alias("verdict"),
    )


# consent-management-platform fingerprints (script src / global object
# names, all public): OneTrust, Cookiebot, Quantcast Choice, Didomi,
# TrustArc
_CMP_VENDORS = (
    ("onetrust", r"(?i)cdn\.cookielaw\.org|onetrust"),
    ("cookiebot", r"(?i)consent\.cookiebot\.com|cookiebot"),
    ("quantcast", r"(?i)quantcast\.mgr\.consensu\.org|__tcfapi"),
    ("didomi", r"(?i)sdk\.privacy-center\.org|didomi"),
    ("trustarc", r"(?i)consent\.trustarc\.com|truste"),
)
_CONSENT_TEXT_PAT = (
    r"(?i)(?:accept all cookies|we use cookies|cookie (?:policy|"
    r"preferences|settings)|manage consent)"
)


def consent_banner(pages: DataFrame) -> DataFrame:
    """Cookie-consent banner detection — a corpus-cleaning gate as much
    as a site audit: consent boilerplate ("We use cookies to improve
    your experience...") is among the most duplicated English text on
    the web and pollutes extracted corpora (`main_content` strips
    chrome but banners often live in the main flow), while the CMP
    vendor fingerprint feeds `tracker_audit`'s privacy picture.

    pages: (url, body) → (url, n_consent_phrases, cmp_vendor — first
    match in fingerprint order or NULL, has_banner).

    Scale: map-only codegen (one phrase-count regex + a short vendor
    ladder), zero shuffles.
    """
    n_phrases = F.size(
        F.regexp_extract_all(
            F.col("body"), F.lit(_CONSENT_TEXT_PAT), F.lit(0)
        )
    )
    vendor = F.lit(None).cast("string")
    for name, pat in reversed(_CMP_VENDORS):
        vendor = F.when(F.col("body").rlike(pat), F.lit(name)).otherwise(
            vendor
        )
    return pages.select(
        "url",
        n_phrases.cast("int").alias("n_consent_phrases"),
        vendor.alias("cmp_vendor"),
        ((n_phrases > 0) | vendor.isNotNull()).alias("has_banner"),
    )


_PAYWALL_TEXT_PAT = (
    r"(?i)(?:subscribe to (?:continue|read)|to continue reading|"
    r"already a subscriber|this (?:article|content) is for "
    r"subscribers|remaining free articles?)"
)
_PAYWALL_VENDOR_PAT = (
    r"(?i)cdn\.tinypass\.com|piano\.io|cdn\.ampproject\.org/v0/"
    r"amp-subscriptions|laterpay"
)
_PAYWALL_SCHEMA_PAT = r'(?i)"isAccessibleForFree"\s*:\s*(?:"?false"?)'


def paywall_detect(pages: DataFrame) -> DataFrame:
    """Paywall detection — the truncation gate a corpus builder runs
    before trusting extracted article text: a metered or hard paywall
    ships a teaser plus boilerplate ("Subscribe to continue reading"),
    and training on it teaches the model to stop mid-article.  Three
    independent signals: teaser phrases, paywall-vendor scripts
    (Piano/Tinypass, amp-subscriptions, LaterPay), and the schema.org
    ``isAccessibleForFree: false`` declaration (the honest signal —
    publishers set it FOR crawlers).

    pages: (url, body) → (url, n_phrases, vendor_hit, declared_paid,
    paywalled = any signal).

    Scale: map-only codegen, zero shuffles; composes with
    `main_content` (text side) and `quality_keep` (drop policy).
    """
    n_phrases = F.size(
        F.regexp_extract_all(
            F.col("body"), F.lit(_PAYWALL_TEXT_PAT), F.lit(0)
        )
    )
    vendor_hit = F.col("body").rlike(_PAYWALL_VENDOR_PAT)
    declared = F.col("body").rlike(_PAYWALL_SCHEMA_PAT)
    return pages.select(
        "url",
        n_phrases.cast("int").alias("n_phrases"),
        vendor_hit.alias("vendor_hit"),
        declared.alias("declared_paid"),
        ((n_phrases > 0) | vendor_hit | declared).alias("paywalled"),
    )


def canonical_chains(canonical_edges: DataFrame) -> DataFrame:
    """Cross-page canonical indirection resolved to its terminal —
    the SEO failure Google's documentation warns about by name:
    chained rel=canonical (A→B→C) is treated as unreliable and often
    ignored wholesale, and a canonical LOOP (A→B→A) discards the
    signal entirely.  At crawl scale the canonical edges are bulk data
    exactly like Location redirects, so this REUSES the pointer-
    doubling resolver (`pipeline/graph.resolve_redirects` — O(log L)
    shuffle rounds, loop classification included) and adds the SEO
    verdict: ``chain_problem`` = loop OR ≥2 hops.

    canonical_edges: (src, dst) — one row per page declaring a
    canonical OTHER than itself.  Output: (url, final_url, hops,
    terminal, chain_problem).

    Scale: inherited from the resolver — self-joins on the canonical
    subgraph only, never the corpus.
    """
    from ..pipeline.graph import resolve_redirects

    resolved = resolve_redirects(canonical_edges)
    return resolved.select(
        "url",
        "final_url",
        "hops",
        "terminal",
        (
            (F.col("terminal") == "loop")
            | (F.coalesce(F.col("hops"), F.lit(0)) >= 2)
        ).alias("chain_problem"),
    )


def hotlink_audit(img_refs: DataFrame) -> DataFrame:
    """img_refs: (page_url, img_url) → per page-host hotlinking profile:
    (page_host, n_imgs, n_offsite, offsite_ppm, n_img_hosts).

    Hotlinking = embedding an image whose REGISTRABLE domain differs
    from the page's (cdn.example.com serving www.example.com is
    same-site; imgur.com serving example.com is offsite).  Both a
    bandwidth-theft lint for site owners and a corpus signal: pages
    built almost entirely from offsite images are aggregator/scraper
    shells, and an image-caption pipeline prefers the origin copy over
    the hotlinked duplicate (`image_dedup_keep` picks a canonical row —
    this report says which host actually owns the asset class).

    eTLD+1 comes from the same `registrable_domain_expr` the
    registrable_domains/url_score queries use (kernels/domains.py), so
    the same-site rule is identical across the engine.

    Scale: host extraction is map-only codegen; the roll-up is ONE
    partial-aggregated groupBy on page_host (count + conditional count
    + approx-free exact distinct via count(DISTINCT) — Spark rewrites
    it to a two-phase expand/agg, still key-partitioned).  Boilerplate
    mills concentrate a page_host key, absorbed map-side.
    """
    from linkkchecker_net_spark.kernels.domains import (
        registrable_domain_expr,
    )

    host_of = lambda c: F.lower(  # noqa: E731
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    refs = img_refs.select(
        host_of(F.col("page_url")).alias("page_host"),
        host_of(F.col("img_url")).alias("img_host"),
    ).filter((F.col("page_host") != "") & (F.col("img_host") != ""))
    offsite = registrable_domain_expr(F.col("page_host")) != (
        registrable_domain_expr(F.col("img_host"))
    )
    return (
        refs.withColumn("offsite", offsite)
        .groupBy("page_host")
        .agg(
            F.count("*").cast("long").alias("n_imgs"),
            F.sum(F.col("offsite").cast("long"))
            .cast("long")
            .alias("n_offsite"),
            F.countDistinct("img_host").cast("long").alias("n_img_hosts"),
        )
        .select(
            "page_host",
            "n_imgs",
            "n_offsite",
            (F.col("n_offsite") * 1_000_000 / F.col("n_imgs"))
            .cast("long")
            .alias("offsite_ppm"),
            "n_img_hosts",
        )
    )
