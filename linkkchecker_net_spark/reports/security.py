"""Mixed-content audit + scheme-upgrade candidates.

The reference validates links but never looks at the *scheme
relationship* between a page and its subresources.  For a production
crawl that feeds a training corpus this is a first-class quality/
security gate: an https page that loads http subresources ("mixed
content") is blocked or degraded by every modern browser, so its
images frequently never render for users — a harvest that keeps them
inherits captions for pixels nobody sees.  Browsers split the policy
by tag family (the W3C mixed-content spec): *active* content
(script/iframe/stylesheet) is hard-blocked, *passive* content
(img/video/audio) is merely warned — the audit reports both counts so
a curation funnel can choose its own severity.

``upgradable`` additionally counts http refs whose https twin is a
known page (the HSTS-upgrade candidate set): those are fixable by URL
rewrite rather than refetch, which at corpus scale is the difference
between a string transform and a new crawl epoch.

Scale: the harvest is map-only codegen (three ``regexp_extract_all``
inventories over the body — no Python); the upgrade check is ONE
equi-join of the exploded http refs against the page-URL dimension
(broadcast under AQE when the dimension is small; hash-partitioned on
the URL otherwise — the same key the seen-set is already bucketed by),
then a partial-aggregated count back to page grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# W3C mixed-content tag families.  Anchored http:// in the capture so
# https/relative refs never enter the exploded stream (pushdown by
# construction — the join input is only the at-risk refs).
PASSIVE_PAT = r'(?i)<(?:img|video|audio|source)\b[^>]*(?:^|[\s"])src="(http://[^"]*)"'
ACTIVE_SRC_PAT = r'(?i)<(?:script|iframe)\b[^>]*(?:^|[\s"])src="(http://[^"]*)"'
ACTIVE_HREF_PAT = r'(?i)<link\b[^>]*(?:^|[\s"])href="(http://[^"]*)"'


def mixed_content_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → one row per page:
    (url, page_https, passive_http, active_http, mixed, upgradable).

    ``upgradable`` = http refs (either family) whose ``https://``
    rewrite equals some page URL in ``pages`` itself.
    """
    refs = pages.select(
        "url",
        F.startswith(F.col("url"), F.lit("https://")).alias("page_https"),
        F.regexp_extract_all("body", F.lit(PASSIVE_PAT), 1).alias("pas"),
        F.concat(
            F.regexp_extract_all("body", F.lit(ACTIVE_SRC_PAT), 1),
            F.regexp_extract_all("body", F.lit(ACTIVE_HREF_PAT), 1),
        ).alias("act"),
    )
    base = refs.select(
        "url",
        "page_https",
        F.size("pas").alias("passive_http"),
        F.size("act").alias("active_http"),
    ).withColumn(
        "mixed",
        F.col("page_https") & ((F.col("passive_http") + F.col("active_http")) > 0),
    )
    twins = (
        refs.select("url", F.explode(F.concat("pas", "act")).alias("ref"))
        .withColumn(
            "https_twin", F.concat(F.lit("https://"), F.substring("ref", 8, 2 ** 30))
        )
        .join(
            pages.select(F.col("url").alias("https_twin")).distinct(),
            "https_twin",
        )
        .groupBy("url")
        .agg(F.count("*").cast("long").alias("upgradable"))
    )
    return base.join(twins, "url", "left").select(
        "url",
        "page_https",
        "passive_http",
        "active_http",
        "mixed",
        F.coalesce("upgradable", F.lit(0).cast("long")).alias("upgradable"),
    )


# ---------------------------------------------------------------------------
# Subresource Integrity (SRI) audit.  A cross-origin <script> or
# stylesheet <link> without an integrity= hash lets the third-party host
# (or anyone who compromises it) run code on every page that embeds it —
# the W3C SRI spec exists precisely for this.  For corpus curation the
# flag doubles as a provenance signal: pages shipping unpinned third-party
# code are the ones whose *rendered* content can drift from the crawl.
#
# Tag-level harvest keeps the grammar RE2-safe and attribute-order-
# independent: whole <script>/<link> tags are extracted first (group 0),
# then src/href/integrity/crossorigin are pulled out of the tag string —
# no lookahead, no ordering assumption.  Map-only codegen; no shuffle.
# ---------------------------------------------------------------------------

SCRIPT_TAG_PAT = r"(?i)<script\b[^>]*>"
LINK_TAG_PAT = r"(?i)<link\b[^>]*>"
SRC_ATTR_PAT = r'(?i)(?:^|[\s"])src="([^"]*)"'
HREF_ATTR_PAT = r'(?i)(?:^|[\s"])href="([^"]*)"'
INTEGRITY_ATTR_PAT = r'(?i)(?:^|[\s"])integrity="([^"]*)"'
REL_STYLESHEET_PAT = r'(?i)(?:^|[\s"])rel="stylesheet"'
SRI_ALGO_PAT = r"^(sha256|sha384|sha512)-"
REF_HOST_PAT = r"^https?://([^/]+)"


def sri_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, host, body) → one row per external script/stylesheet
    ref: (url, kind, ref, integrity_algo, has_integrity, cross_origin,
    sri_missing).  Inline scripts (no src) and non-stylesheet links are
    excluded; ``sri_missing`` = cross-origin AND no integrity attribute.
    """
    tags = pages.select(
        "url",
        "host",
        F.explode(
            F.concat(
                F.regexp_extract_all("body", F.lit(SCRIPT_TAG_PAT), 0),
                F.regexp_extract_all("body", F.lit(LINK_TAG_PAT), 0),
            )
        ).alias("tag"),
    )
    kind = (
        F.when(F.lower(F.substring("tag", 1, 7)) == "<script", F.lit("script"))
        .when(
            F.regexp_extract("tag", REL_STYLESHEET_PAT, 0) != "",
            F.lit("stylesheet"),
        )
    )
    ref = F.when(
        F.col("kind") == "script",
        F.nullif(F.regexp_extract("tag", SRC_ATTR_PAT, 1), F.lit("")),
    ).otherwise(
        F.nullif(F.regexp_extract("tag", HREF_ATTR_PAT, 1), F.lit(""))
    )
    rows = (
        tags.withColumn("kind", kind)
        .filter(F.col("kind").isNotNull())
        .withColumn("ref", ref)
        .filter(F.col("ref").isNotNull())
        .withColumn(
            "integrity",
            F.nullif(F.regexp_extract("tag", INTEGRITY_ATTR_PAT, 1), F.lit("")),
        )
        .withColumn(
            "ref_host",
            F.nullif(F.regexp_extract("ref", REF_HOST_PAT, 1), F.lit("")),
        )
    )
    cross = F.col("ref_host").isNotNull() & (F.col("ref_host") != F.col("host"))
    has_sri = F.col("integrity").isNotNull()
    return rows.select(
        "url",
        "kind",
        "ref",
        F.nullif(F.regexp_extract("integrity", SRI_ALGO_PAT, 1), F.lit(""))
        .alias("integrity_algo"),
        has_sri.alias("has_integrity"),
        cross.alias("cross_origin"),
        (cross & ~has_sri).alias("sri_missing"),
    )


# ---------------------------------------------------------------------------
# Content-Security-Policy directive parse.  Completes the transport-
# security suite (mixed_content: what a page loads; sri_audit: whether
# third-party code is pinned; cookie_audit: credential hygiene): CSP is
# the host's own declaration of what it is ALLOWED to load.  For a
# crawler the interesting bits are the inline/eval escape hatches and
# wildcard sources — pages whose policy permits 'unsafe-inline' script
# are the ones whose rendered DOM can diverge arbitrarily from the
# fetched HTML.
#
# Grammar (CSP3 §2.2): policy = directives joined by ';', directive =
# name + whitespace-separated source list.  Map-only codegen: one
# anchored header extract, one split/explode, per-directive array ops;
# the only shuffle is whatever the caller aggregates downstream.
# ---------------------------------------------------------------------------

CSP_HEADER_PAT = r"(?im)^content-security-policy:[ \t]*([^\r\n]*)"


# ---------------------------------------------------------------------------
# Referrer-Policy audit.  The last transport-security surface a crawler
# sees: the page's declaration of how much of ITS OWN URL it leaks when
# users follow the links we just extracted.  Two delivery channels (W3C
# Referrer Policy §8.1/§8.2): the ``Referrer-Policy`` response header —
# a comma-separated token list where the LAST recognized token wins —
# and ``<meta name=referrer content=...>`` in the document, which is
# processed after the header and therefore overrides it when valid.
# Legacy meta values (``never``/``always``/``origin-when-crossorigin``)
# map to their modern spellings per the spec's legacy-keyword table;
# unknown tokens are ignored (they fall through to the previous valid
# one, or to the browser default ``strict-origin-when-cross-origin``).
#
# For corpus curation the flags matter two ways: ``full_url_cross_origin``
# pages broadcast their complete URL (query strings and all — session
# tokens, search terms) to every third-party host they link, a privacy
# signal that correlates with low-trust templated sites; ``private``
# pages (no-referrer / same-origin) are the ones whose inbound-traffic
# analytics cannot be reconstructed from referrer logs.
#
# Scale: map-only codegen — one anchored header extract, one meta-tag
# harvest, array lambdas; no shuffle, no Python.
# ---------------------------------------------------------------------------

REFERRER_HEADER_PAT = r"(?im)^referrer-policy:[ \t]*([^\r\n]*)"
META_TAG_PAT = r"(?i)<meta\b[^>]*>"
META_NAME_REFERRER_PAT = r'(?i)(?:^|[\s"])name="referrer"'
CONTENT_ATTR_PAT = r'(?i)(?:^|[\s"])content="([^"]*)"'

VALID_REFERRER_POLICIES = [
    "no-referrer",
    "no-referrer-when-downgrade",
    "same-origin",
    "origin",
    "strict-origin",
    "origin-when-cross-origin",
    "strict-origin-when-cross-origin",
    "unsafe-url",
]
DEFAULT_REFERRER_POLICY = "strict-origin-when-cross-origin"


def _map_legacy(c):
    return (
        F.when(c == "never", F.lit("no-referrer"))
        .when(c == "always", F.lit("unsafe-url"))
        .when(c == "origin-when-crossorigin", F.lit("origin-when-cross-origin"))
        .otherwise(c)
    )


def referrer_policy_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, headers, body) → one row per page:
    (url, header_policy, meta_policy, effective, is_default,
    full_url_cross_origin, private).

    ``header_policy`` = last recognized token of the Referrer-Policy
    header list; ``meta_policy`` = last valid (legacy-mapped) referrer
    meta in document order; ``effective`` = meta over header over the
    spec default.  ``full_url_cross_origin`` marks policies that send
    the complete page URL to same-scheme cross-origin targets."""
    hdr_tokens = F.filter(
        F.transform(
            F.split(F.regexp_extract("headers", REFERRER_HEADER_PAT, 1), ","),
            lambda t: F.lower(F.trim(t)),
        ),
        lambda t: t.isin(VALID_REFERRER_POLICIES),
    )
    meta_tokens = F.filter(
        F.transform(
            F.filter(
                F.regexp_extract_all("body", F.lit(META_TAG_PAT), 0),
                lambda t: t.rlike(META_NAME_REFERRER_PAT),
            ),
            lambda t: _map_legacy(
                F.lower(F.trim(F.regexp_extract(t, CONTENT_ATTR_PAT, 1)))
            ),
        ),
        lambda c: c.isin(VALID_REFERRER_POLICIES),
    )
    rows = pages.select(
        "url", hdr_tokens.alias("_h"), meta_tokens.alias("_m")
    ).select(
        "url",
        F.when(F.size("_h") > 0, F.element_at("_h", -1)).alias(
            "header_policy"
        ),
        F.when(F.size("_m") > 0, F.element_at("_m", -1)).alias(
            "meta_policy"
        ),
    )
    effective = F.coalesce(
        "meta_policy", "header_policy", F.lit(DEFAULT_REFERRER_POLICY)
    )
    return rows.select(
        "url",
        "header_policy",
        "meta_policy",
        effective.alias("effective"),
        (
            F.col("meta_policy").isNull() & F.col("header_policy").isNull()
        ).alias("is_default"),
        effective.isin("unsafe-url", "no-referrer-when-downgrade").alias(
            "full_url_cross_origin"
        ),
        effective.isin("no-referrer", "same-origin").alias("private"),
    )


def csp_parse(responses: DataFrame) -> DataFrame:
    """responses: (url, headers) → one row per CSP directive:
    (url, directive, n_sources, unsafe_inline, unsafe_eval, wildcard,
    self_only).  Pages without a CSP header contribute no rows; empty
    directives (from ';;' or trailing ';') are dropped."""
    policy = F.nullif(
        F.regexp_extract("headers", CSP_HEADER_PAT, 1), F.lit("")
    )
    dirs = (
        responses.select("url", policy.alias("policy"))
        .select("url", F.explode(F.split("policy", ";")).alias("d"))
        .select("url", F.trim("d").alias("d"))
        .filter(F.col("d") != "")
    )
    tok = F.split("d", r"\s+")
    rows = dirs.select(
        "url",
        F.lower(F.element_at(tok, 1)).alias("directive"),
        F.slice(tok, 2, F.greatest(F.size(tok) - 1, F.lit(0))).alias("srcs"),
    )
    n_src = F.size("srcs")
    return rows.select(
        "url",
        "directive",
        n_src.alias("n_sources"),
        F.array_contains("srcs", "'unsafe-inline'").alias("unsafe_inline"),
        F.array_contains("srcs", "'unsafe-eval'").alias("unsafe_eval"),
        F.array_contains("srcs", "*").alias("wildcard"),
        ((n_src == 1) & F.array_contains("srcs", "'self'")).alias(
            "self_only"
        ),
    )


# ---------------------------------------------------------------------------
# target=_blank noopener audit (reverse tabnabbing).  An <a target="_blank">
# without rel=noopener/noreferrer hands the opened page a live
# ``window.opener`` handle back into the linking page — the opened site
# can rewrite ``opener.location`` and phish the user ("reverse
# tabnabbing").  Modern browsers default _blank to noopener, but the
# audit is still the standard lint for legacy-browser exposure, and for
# corpus curation the *density* of unprotected cross-origin blank-target
# links is a low-trust template signal (ad/affiliate farms).
#
# Grammar (shared verbatim with the DuckDB oracle): harvest ``<a ...>``
# open tags (``<a\b`` — excludes <area>/<abbr> by the word boundary),
# keep tags whose double-quoted target attribute equals ``_blank``
# case-insensitively, require a non-empty href; rel is a lowercased
# whitespace-split token LIST (HTML spec) — ``rel="noopener2"`` must not
# count, so membership is token equality, never substring.  Cross-origin
# = absolute http(s) href whose lowercased authority differs from the
# page's; relative hrefs are same-origin by construction.
#
# Scale: map-only codegen — one tag inventory per page, explode to link
# grain (no shuffle; explode is a generator inside the same stage), a
# handful of anchored extracts per link.  No joins, no Python.
# ---------------------------------------------------------------------------

A_TAG_PAT = r"(?i)<a\b[^>]*>"
TARGET_ATTR_PAT = r'(?i)(?:^|[\s"])target="([^"]*)"'
REL_ATTR_PAT = r'(?i)(?:^|[\s"])rel="([^"]*)"'
ABS_HTTP_PAT = r"(?i)^https?://"


def blank_target_audit(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → one row per target=_blank anchor:
    (url, href, noopener, noreferrer, cross_origin, unprotected).

    ``unprotected`` = cross-origin ∧ ¬noopener ∧ ¬noreferrer — the
    reverse-tabnabbing exposure bit."""
    tags = pages.select(
        "url",
        F.explode(
            F.regexp_extract_all("body", F.lit(A_TAG_PAT), 0)
        ).alias("tag"),
    ).filter(
        F.lower(F.regexp_extract("tag", TARGET_ATTR_PAT, 1)) == "_blank"
    )
    links = tags.select(
        "url",
        F.regexp_extract("tag", HREF_ATTR_PAT, 1).alias("href"),
        F.split(
            F.lower(F.regexp_extract("tag", REL_ATTR_PAT, 1)), r"\s+"
        ).alias("rel_toks"),
    ).filter(F.col("href") != "")
    page_host = F.lower(F.regexp_extract("url", REF_HOST_PAT, 1))
    href_host = F.lower(F.regexp_extract("href", REF_HOST_PAT, 1))
    noopener = F.array_contains("rel_toks", "noopener")
    noreferrer = F.array_contains("rel_toks", "noreferrer")
    cross = F.when(
        F.col("href").rlike(ABS_HTTP_PAT), href_host != page_host
    ).otherwise(F.lit(False))
    return links.select(
        "url",
        "href",
        noopener.alias("noopener"),
        noreferrer.alias("noreferrer"),
        cross.alias("cross_origin"),
        (cross & ~noopener & ~noreferrer).alias("unprotected"),
    )


_HSTS_PAT = r"(?im)^strict-transport-security:[ \t]*([^\r\n]*)"
# RFC 6797 + hstspreload.org submission bar
HSTS_PRELOAD_MIN_AGE = 31_536_000


def hsts_audit(responses: DataFrame) -> DataFrame:
    """responses: (url, headers) → (url, has_hsts, max_age,
    include_subdomains, preload, preload_eligible).

    Parses the Strict-Transport-Security header (RFC 6797 §6.1:
    ';'-separated directives, names case-insensitive, order free):
    ``max_age`` NULL when the mandatory max-age directive is missing or
    non-numeric (such a header is invalid per spec — has_hsts stays
    true, eligibility false).  ``preload_eligible`` replays the
    hstspreload.org bar: max-age ≥ 31536000 ∧ includeSubDomains ∧
    preload.  Map-only codegen."""
    raw = F.nullif(F.regexp_extract("headers", _HSTS_PAT, 1), F.lit(""))
    toks = F.transform(
        F.split(raw, ";"), lambda t: F.lower(F.trim(t))
    )
    max_age = F.nullif(
        F.regexp_extract(
            F.array_join(
                F.filter(toks, lambda t: t.startswith("max-age=")), " "
            ),
            r"^max-age=(\d+)",
            1,
        ),
        F.lit(""),
    ).cast("long")
    inc = F.array_contains(toks, "includesubdomains")
    pre = F.array_contains(toks, "preload")
    rows = responses.select(
        "url",
        raw.isNotNull().alias("has_hsts"),
        F.when(raw.isNotNull(), max_age).alias("max_age"),
        F.when(raw.isNotNull(), inc).alias("include_subdomains"),
        F.when(raw.isNotNull(), pre).alias("preload"),
    )
    return rows.select(
        "url", "has_hsts", "max_age", "include_subdomains", "preload",
        F.coalesce(
            (F.col("max_age") >= HSTS_PRELOAD_MIN_AGE)
            & F.col("include_subdomains")
            & F.col("preload"),
            F.lit(False),
        ).alias("preload_eligible"),
    )


_OR_A_TAG = r"(?i)<a\b[^>]*>"
_OR_HREF = r'(?i)(?:^|[\s"])href="([^"]*)"'
# a query parameter whose VALUE starts with an absolute http(s) URL,
# plain or percent-encoded — the open-redirect smell
_OR_EMBEDDED = r"(?i)[?&][^=&#]*=(https?://|https?%3a%2f%2f)"


def open_redirect_audit(pages: DataFrame) -> DataFrame:
    """Open-redirect lint: anchors whose href carries another absolute
    URL inside a query-parameter value (``/out?url=https://...``, also
    the percent-encoded form) — the redirector pattern phishing
    campaigns ride; security scanners (and Google's lizard-brain
    devaluation of redirector domains) both flag it.

    Per page: total anchors, anchors with an embedded-URL parameter,
    the FIRST offending href, and the flag.  Pure harvest — whether a
    given endpoint actually redirects is the crawler's fetch-stage
    business; this surfaces the candidates.

    Scale: map-only codegen (one tag harvest + one array filter),
    zero shuffles.
    """
    tags = F.regexp_extract_all("body", F.lit(_OR_A_TAG), 0)
    hrefs = F.filter(
        F.transform(tags, lambda t: F.regexp_extract(t, _OR_HREF, 1)),
        lambda h: h != "",
    )
    offending = F.filter(hrefs, lambda h: h.rlike(_OR_EMBEDDED))
    return pages.select(
        "url",
        F.size(hrefs).alias("n_links"),
        F.size(offending).alias("n_embedded_url_links"),
        F.when(
            F.size(offending) > 0, F.element_at(offending, 1)
        ).alias("first_offender"),
        (F.size(offending) > 0).alias("open_redirect_suspect"),
    )


_TRACKER_HOST_RE = (
    r"(?i)//(www\.)?(googletagmanager\.com|google-analytics\.com|"
    r"connect\.facebook\.net|analytics\.[a-z0-9.-]+)"
)


def tracker_audit(pages: DataFrame) -> DataFrame:
    """Tracking-technology audit — the privacy inventory a crawl
    publishes per host: 1×1 tracking pixels (<img> with width="1" and
    height="1" — the beacon idiom), and script/img references to the
    classic tracker origins (GTM, GA, Facebook connect, analytics.*
    subdomains).

    Output: (url, n_pixels, n_tracker_refs, has_tracking).

    Scale: map-only codegen (two tag harvests + filters), zero
    shuffles.
    """
    imgs = F.regexp_extract_all("body", F.lit(r"(?i)<img\b[^>]*>"), 0)
    pixels = F.filter(
        imgs,
        lambda t: t.rlike(r'(?i)(?:^|[\s"])width="1"') & t.rlike(r'(?i)(?:^|[\s"])height="1"'),
    )
    refs = F.concat(
        F.transform(
            F.regexp_extract_all("body", F.lit(r"(?i)<script\b[^>]*>"), 0),
            lambda t: F.regexp_extract(t, r'(?i)(?:^|[\s"])src="([^"]*)"', 1),
        ),
        F.transform(imgs, lambda t: F.regexp_extract(t, r'(?i)(?:^|[\s"])src="([^"]*)"', 1)),
    )
    trackers = F.filter(refs, lambda h: h.rlike(_TRACKER_HOST_RE))
    return pages.select(
        "url",
        F.size(pixels).alias("n_pixels"),
        F.size(trackers).alias("n_tracker_refs"),
        ((F.size(pixels) + F.size(trackers)) > 0).alias("has_tracking"),
    )


def idn_audit(hosts: DataFrame) -> DataFrame:
    """IDN / homograph-attack host audit — the hostname-level sibling of
    the body-level mixed-script check (`pipeline/text.script_mix`): a
    crawler deciding trust per host (and a corpus builder deciding
    keep/drop per domain) needs to see (a) Punycode labels (xn--) that
    hide non-ASCII identity, and (b) labels mixing Latin with Cyrillic
    or Greek letters — the classic paypаl.com spoof (Unicode TR39
    restriction-level idea, reduced to the two script pairs that carry
    virtually all real-world homograph abuse).

    hosts: (host).  Output: (host, n_labels, n_puny, n_mixed,
    has_nonascii, verdict ∈ ascii / punycode / unicode / mixed_script)
    — mixed_script dominates punycode dominates plain unicode.

    Scale: map-only codegen (label split + per-label regexp counts),
    zero shuffles; composes with host_reputation / url_blocklist as
    another keep-signal column.
    """
    labels = F.split(F.lower(F.col("host")), r"\.")
    n_puny = F.size(
        F.filter(labels, lambda x: x.startswith("xn--"))
    )
    mixed = F.size(
        F.filter(
            labels,
            lambda x: (
                x.rlike(r"\p{IsLatin}")
                & (x.rlike(r"\p{IsCyrillic}") | x.rlike(r"\p{IsGreek}"))
            ),
        )
    )
    nonascii = F.col("host").rlike(r"[^\x00-\x7f]")
    verdict = (
        F.when(mixed > 0, F.lit("mixed_script"))
        .when(n_puny > 0, F.lit("punycode"))
        .when(nonascii, F.lit("unicode"))
        .otherwise(F.lit("ascii"))
    )
    return hosts.select(
        "host",
        F.size(labels).cast("int").alias("n_labels"),
        n_puny.cast("int").alias("n_puny"),
        mixed.cast("int").alias("n_mixed"),
        nonascii.alias("has_nonascii"),
        verdict.alias("verdict"),
    )


# bidi control characters (Trojan Source, CVE-2021-42574 shape):
# embeddings/overrides open with LRE/RLE/LRO/RLO and close with PDF;
# isolates open with LRI/RLI/FSI and close with PDI
_BIDI_OPENERS = "‪‫‭‮⁦⁧⁨"
_BIDI_CLOSERS = "‬⁩"


def bidi_audit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bidirectional-control-character audit — the Trojan Source vector
    (Boucher & Anderson 2021): RLO/LRE embeddings reorder what a READER
    sees without changing what a parser consumes, so spoofed URLs,
    reversed filenames and disguised code all ride on these controls.
    A corpus builder wants them counted (and unbalanced runs flagged —
    an opener without its PDF/PDI poisons all following text), and a
    crawler scoring trust per page treats presence as a signal next to
    `idn_audit`'s homograph check.

    Output: (doc_id, n_openers, n_closers, has_bidi, unbalanced,
    verdict ∈ clean / bidi_present / unbalanced).

    Scale: map-only codegen (two character-class counts), zero
    shuffles.
    """
    t = F.col(text_col)
    n_open = F.length(t) - F.length(
        F.regexp_replace(t, f"[{_BIDI_OPENERS}]", "")
    )
    n_close = F.length(t) - F.length(
        F.regexp_replace(t, f"[{_BIDI_CLOSERS}]", "")
    )
    has_bidi = (n_open + n_close) > 0
    unbalanced = n_open != n_close
    verdict = (
        F.when(~has_bidi, F.lit("clean"))
        .when(unbalanced, F.lit("unbalanced"))
        .otherwise(F.lit("bidi_present"))
    )
    return docs.select(
        "doc_id",
        n_open.cast("int").alias("n_openers"),
        n_close.cast("int").alias("n_closers"),
        has_bidi.alias("has_bidi"),
        unbalanced.alias("unbalanced"),
        verdict.alias("verdict"),
    )
