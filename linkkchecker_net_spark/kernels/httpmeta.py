"""HTTP response-metadata sniffing: charset detection + cache policy.

The reference trusts the .NET HttpClient's own charset handling and
ignores caching headers entirely (one-shot scan —
`SpiderEngine/Spider.cs` fetch loop).  A continuous web-scale crawler
needs both:

  * charset — mis-decoded bodies corrupt link extraction and every text
    operator downstream; the HTML5 prescan precedence (BOM ≻
    Content-Type header ≻ in-page META ≻ windows-1252 default) is the
    de-facto law of the web.
  * cache policy — Cache-Control/ETag/Last-Modified decide whether the
    NEXT visit is a free conditional GET or a full refetch; at 10^10
    URLs the revalidation ratio is a first-order bandwidth term.  The
    ttl feeds the same scheduler as `pipeline/recrawl.change_rate`
    (server hint vs observed rate — the scheduler takes the min).

Both are pure Column expressions (hex/substring on the raw bytes +
regexp on header strings — whole-stage codegen, zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BOM signatures, hex of the leading bytes
_BOM_UTF8 = "EFBBBF"
_BOM_UTF16LE = "FFFE"
_BOM_UTF16BE = "FEFF"

_HDR_CHARSET_PAT = r'(?i)charset=["\']?([a-zA-Z0-9_.:-]+)'
_META_CHARSET_PAT = r'(?i)<meta\s+charset=["\']?([a-zA-Z0-9_.:-]+)'
_META_HTTPEQUIV_PAT = (
    r'(?i)<meta\s+http-equiv=["\']?content-type["\']?'
    r'\s+content="[^"]*charset=([a-zA-Z0-9_.:-]+)'
)

CHARSET_DEFAULT = "windows-1252"


def charset_sniff_expr(body: Column, content_type: Column) -> Column:
    """struct(charset, source) per HTML5-prescan precedence.

    ``body`` is the raw BINARY payload (BOM check = hex of the first
    bytes; the META scan decodes a UTF-8 view, which is sound for the
    ASCII-superset encodings the prescan is defined over).  ``source``
    ∈ {bom, header, meta, default} records which rung won — the audit
    column a recrawl of mis-labeled hosts filters on.
    """
    h3 = F.hex(F.substring(body, 1, 3))
    h2 = F.hex(F.substring(body, 1, 2))
    text = F.decode(body, "UTF-8")
    hdr = F.lower(
        F.regexp_extract(F.coalesce(content_type, F.lit("")),
                         _HDR_CHARSET_PAT, 1)
    )
    meta = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(text, _META_CHARSET_PAT, 1), F.lit("")),
            F.nullif(F.regexp_extract(text, _META_HTTPEQUIV_PAT, 1),
                     F.lit("")),
        )
    )
    return (
        F.when(h3 == _BOM_UTF8,
               F.struct(F.lit("utf-8").alias("charset"),
                        F.lit("bom").alias("source")))
        .when(h2 == _BOM_UTF16LE,
              F.struct(F.lit("utf-16le").alias("charset"),
                       F.lit("bom").alias("source")))
        .when(h2 == _BOM_UTF16BE,
              F.struct(F.lit("utf-16be").alias("charset"),
                       F.lit("bom").alias("source")))
        .when(hdr != "",
              F.struct(hdr.alias("charset"), F.lit("header").alias("source")))
        .when(meta.isNotNull(),
              F.struct(meta.alias("charset"), F.lit("meta").alias("source")))
        .otherwise(
            F.struct(F.lit(CHARSET_DEFAULT).alias("charset"),
                     F.lit("default").alias("source"))
        )
    )


# Cache-Control directive extraction (RFC 9111 §5.2, response side)
_MAX_AGE_PAT = r"(?i)(^|[,\s])max-age=(\d+)"
_NO_STORE_PAT = r"(?i)(^|[,\s])no-store([,\s]|$)"
_NO_CACHE_PAT = r"(?i)(^|[,\s])no-cache([,\s=]|$)"

CACHE_DEFAULT_TTL = 86400


def cache_policy_expr(
    cache_control: Column, etag: Column, last_modified: Column
) -> Column:
    """struct(no_store, no_cache, max_age, revalidatable, ttl_sec,
    conditional_get) from response caching headers.

    ttl_sec: 0 under no-store/no-cache, else max-age when present, else
    the 1-day heuristic default (RFC 9111 allows heuristic freshness;
    10%-of-Last-Modified-age is the classic rule — age isn't modeled
    here, so the flat default stands in).  conditional_get is true when
    a validator (ETag / Last-Modified) exists and no-store doesn't
    forbid reuse — the rows a scheduler may revalidate for free.
    """
    cc = F.coalesce(cache_control, F.lit(""))
    no_store = cc.rlike(_NO_STORE_PAT)
    no_cache = cc.rlike(_NO_CACHE_PAT)
    max_age = F.nullif(
        F.regexp_extract(cc, _MAX_AGE_PAT, 2), F.lit("")
    ).cast("long")
    reval = etag.isNotNull() | last_modified.isNotNull()
    ttl = (
        F.when(no_store | no_cache, F.lit(0).cast("long"))
        .when(max_age.isNotNull(), max_age)
        .otherwise(F.lit(CACHE_DEFAULT_TTL).cast("long"))
    )
    return F.struct(
        no_store.alias("no_store"),
        no_cache.alias("no_cache"),
        max_age.alias("max_age"),
        reval.alias("revalidatable"),
        ttl.alias("ttl_sec"),
        (reval & ~no_store).alias("conditional_get"),
    )


# ------------------------------------------------------- RFC 8288 Link header
# The reference reads only the Location header (SpiderEngine/Engine.cs
# redirect handling); HTTP `Link:` headers carry rel=next/canonical/
# preload edges that never appear in the body — pagination APIs and
# image preloads ship exclusively here, so a crawler parsing bodies only
# is blind to them.  Subset note: link-values are split on commas, which
# per RFC 8288 is correct unless a quoted parameter itself contains a
# comma — URLs inside <> are safe (commas there don't split because the
# pattern anchors each value at '<').
_LINK_VALUE_PAT = r"<[^>]*>[^,]*"
_LINK_TARGET_PAT = r"<([^>]*)>"
_LINK_REL_PAT = r'(?i);\s*rel="?([^";,]*)"?'
_LINK_AS_PAT = r'(?i);\s*as="?([^";,]*)"?'


def link_header_edges(
    df,
    url_col: str = "url",
    header_col: str = "link_header",
):
    """(url, pos, target, rel, as_attr) per relation type in a Link
    header.

    One row per (link-value, relation): RFC 8288 §3.3 allows
    ``rel="next prefetch"`` — space-separated relation types — and each
    becomes its own edge row (lowercased; relation types are
    case-insensitive).  ``pos`` is the link-value index, shared by the
    multi-rel rows it expands to.  A link-value with no rel parameter
    yields one row with rel '' (kept: the target URL is still a
    discovery edge).  ``as_attr`` surfaces preload typing (as=image is
    how hero images are declared before the body arrives).

    Whole-stage codegen end-to-end: regexp_extract_all + two
    posexplodes + per-value regexps — zero Python, zero shuffles.
    """
    vals = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(
                F.col(header_col), F.lit(_LINK_VALUE_PAT), 0
            )
        ).alias("pos", "val"),
    ).select(
        "url",
        "pos",
        F.regexp_extract("val", _LINK_TARGET_PAT, 1).alias("target"),
        F.lower(
            F.trim(F.regexp_extract("val", _LINK_REL_PAT, 1))
        ).alias("rels"),
        F.lower(F.regexp_extract("val", _LINK_AS_PAT, 1)).alias("as_attr"),
    )
    return vals.select(
        "url",
        "pos",
        "target",
        F.explode(F.split("rels", r"\s+")).alias("rel"),
        "as_attr",
    )


# ---------------------------------------------------------------------------
# Set-Cookie security audit (RFC 6265bis attribute grammar).  The
# reference reads only status + content-type from responses
# (/root/reference/SpiderEngine/Engine.cs fetch loop); a production
# crawl also wants the cookie posture of every host it touches —
# Secure/HttpOnly/SameSite hygiene is a ranking/compliance signal, and
# SameSite=None WITHOUT Secure is rejected by every modern browser, so
# sites relying on such cookies break silently.  The __Host- name
# prefix carries spec-mandated invariants (Secure, Path=/, no Domain)
# that make a good grammar conformance check.
#
# Map-only codegen: one header-line harvest + per-cookie attribute
# regexps; no Python, no shuffle.
# ---------------------------------------------------------------------------

_SET_COOKIE_PAT = r"(?im)^set-cookie:[ \t]*([^\r\n]*)"
_COOKIE_NAME_PAT = r"^([^=;]+)="
_SECURE_PAT = r"(?i);\s*secure\s*(;|$)"
_HTTPONLY_PAT = r"(?i);\s*httponly\s*(;|$)"
_SAMESITE_PAT = r"(?i);\s*samesite=([a-z]+)"
_MAXAGE_PAT = r"(?i);\s*max-age=(\d+)"
_EXPIRES_PAT = r"(?i);\s*expires="
_DOMAIN_PAT = r"(?i);\s*domain="
_PATH_PAT = r'(?i);\s*path=([^;]*)'


def cookie_audit(responses: DataFrame) -> DataFrame:
    """responses: (url, page_https, headers) → one row per Set-Cookie:
    (url, name, secure, httponly, samesite, max_age, session_cookie,
    secure_missing, samesite_none_insecure, host_prefix_ok).

    ``host_prefix_ok`` is NULL for cookies not named ``__Host-*``;
    for prefixed cookies it verifies Secure ∧ Path=/ ∧ no Domain.
    """
    cookies = responses.select(
        "url",
        "page_https",
        F.explode(
            F.regexp_extract_all("headers", F.lit(_SET_COOKIE_PAT), 1)
        ).alias("c"),
    )
    secure = F.regexp_extract("c", _SECURE_PAT, 0) != ""
    httponly = F.regexp_extract("c", _HTTPONLY_PAT, 0) != ""
    samesite = F.nullif(
        F.lower(F.regexp_extract("c", _SAMESITE_PAT, 1)), F.lit("")
    )
    max_age = F.nullif(F.regexp_extract("c", _MAXAGE_PAT, 1), F.lit("")) \
        .cast("long")
    has_expires = F.regexp_extract("c", _EXPIRES_PAT, 0) != ""
    has_domain = F.regexp_extract("c", _DOMAIN_PAT, 0) != ""
    path = F.nullif(F.trim(F.regexp_extract("c", _PATH_PAT, 1)), F.lit(""))
    name = F.trim(F.regexp_extract("c", _COOKIE_NAME_PAT, 1))
    out = cookies.select(
        "url",
        name.alias("name"),
        secure.alias("secure"),
        httponly.alias("httponly"),
        samesite.alias("samesite"),
        max_age.alias("max_age"),
        (max_age.isNull() & ~has_expires).alias("session_cookie"),
        (F.col("page_https") & ~secure).alias("secure_missing"),
        ((samesite == "none") & ~secure).alias("samesite_none_insecure"),
        F.when(
            name.startswith("__Host-"),
            secure & (path == "/") & ~has_domain,
        ).alias("host_prefix_ok"),
    )
    # samesite_none_insecure: NULL samesite means the comparison is NULL;
    # coalesce to false (absent SameSite is legal)
    return out.withColumn(
        "samesite_none_insecure",
        F.coalesce("samesite_none_insecure", F.lit(False)),
    )


_CONTENT_LENGTH_PAT = r"(?im)^content-length:[ \t]*(\d+)"


def content_length_audit(responses: DataFrame) -> DataFrame:
    """Declared-vs-actual body length — the truncation/over-read QA
    every fetch pipeline needs (a connection dropped mid-body yields a
    2xx row whose payload silently lies; downstream parse/decode then
    blames the wrong stage).  responses: (url, headers, body binary) →
    (url, declared_len, actual_len, truncated, overlong, verdict ∈
    undeclared / match / truncated / overlong).

    Map-only codegen: one header regex + octet_length; a NULL body
    counts as 0 octets (the fetch stored nothing).
    """
    declared = F.nullif(
        F.regexp_extract("headers", _CONTENT_LENGTH_PAT, 1), F.lit("")
    ).cast("long")
    actual = F.coalesce(F.octet_length("body"), F.lit(0)).cast("long")
    rows = responses.select(
        "url", declared.alias("declared_len"), actual.alias("actual_len")
    )
    verdict = (
        F.when(F.col("declared_len").isNull(), "undeclared")
        .when(F.col("actual_len") < F.col("declared_len"), "truncated")
        .when(F.col("actual_len") > F.col("declared_len"), "overlong")
        .otherwise("match")
    )
    return rows.select(
        "url",
        "declared_len",
        "actual_len",
        (
            F.col("declared_len").isNotNull()
            & (F.col("actual_len") < F.col("declared_len"))
        ).alias("truncated"),
        (
            F.col("declared_len").isNotNull()
            & (F.col("actual_len") > F.col("declared_len"))
        ).alias("overlong"),
        verdict.alias("verdict"),
    )


def redirect_edge_audit(responses: DataFrame) -> DataFrame:
    """Per-edge redirect lint: (url, status, location) → (url, status,
    location, permanent, method_preserving, https_upgrade, cross_host,
    verdict).  301/308 are permanent (link-maintenance should rewrite
    the source; 308 also preserves the method), 302/303/307 temporary
    (307 method-preserving, 303 forces GET); ``https_upgrade`` marks
    the canonical scheme-upgrade edge (same authority+path+query, http
    → https) that mixed-content/HSTS remediation looks for; non-3xx
    rows keep verdict 'not_redirect'.  The chain view is
    pipeline/graph.resolve_redirects; this is the single-hop policy
    audit feeding it.

    Map-only codegen — string surgery on two columns, no shuffle.
    """
    st = F.col("status")
    is_redirect = st.isin(301, 302, 303, 307, 308)
    permanent = st.isin(301, 308)
    method_preserving = st.isin(307, 308)
    rest = lambda u: F.regexp_replace(u, r"(?i)^https?://", "")  # noqa: E731
    https_upgrade = (
        F.col("location").isNotNull()
        & F.col("url").rlike(r"(?i)^http://")
        & F.col("location").rlike(r"(?i)^https://")
        & (rest(F.col("url")) == rest(F.col("location")))
    )
    host = lambda u: F.lower(  # noqa: E731
        F.regexp_extract(u, r"(?i)^https?://([^/]+)", 1)
    )
    cross_host = (
        F.col("location").isNotNull()
        & F.col("location").rlike(r"(?i)^https?://")
        & (host(F.col("url")) != host(F.col("location")))
    )
    verdict = (
        F.when(~is_redirect, "not_redirect")
        .when(F.col("location").isNull(), "missing_location")
        .when(https_upgrade, "https_upgrade")
        .when(permanent, "permanent")
        .otherwise("temporary")
    )
    return responses.select(
        "url",
        st.alias("status"),
        "location",
        (is_redirect & permanent).alias("permanent"),
        (is_redirect & method_preserving).alias("method_preserving"),
        F.coalesce(is_redirect & https_upgrade, F.lit(False)).alias(
            "https_upgrade"
        ),
        F.coalesce(is_redirect & cross_host, F.lit(False)).alias(
            "cross_host"
        ),
        verdict.alias("verdict"),
    )


def etag_stability(old: DataFrame, new: DataFrame) -> DataFrame:
    """ETag stability audit across two crawl snapshots — the
    revalidation-trust lint: join per url and classify
    (RFC 9110 §8.8.3 semantics, strong compare on the literal ETag):

    - ``stable``       — etag and content digest both unchanged
    - ``etag_rotates`` — digest unchanged but etag changed (rotating /
      deploy-stamped etags: every conditional GET transfers the full
      body for nothing — the bytes-saved ledger of warc_revisit
      evaporates)
    - ``stale_etag``   — etag unchanged but digest CHANGED (the
      dangerous arm: caches revalidate 304 against stale content)
    - ``changed``      — both moved (honest change)
    - ``no_etag``      — either side lacks an ETag

    Inputs: (url, etag?, digest) each.  Output: (url, etag_changed,
    digest_changed, verdict).

    Scale: one url-keyed equi-join (both sides crawl-snapshot-sized,
    co-partitionable by url), map-only classification after it.
    """
    o = old.select(
        "url", F.col("etag").alias("_eo"), F.col("digest").alias("_do")
    )
    n = new.select(
        "url", F.col("etag").alias("_en"), F.col("digest").alias("_dn")
    )
    j = o.join(n, "url")
    etag_changed = F.col("_eo") != F.col("_en")
    digest_changed = F.col("_do") != F.col("_dn")
    verdict = (
        F.when(
            F.col("_eo").isNull() | F.col("_en").isNull(), F.lit("no_etag")
        )
        .when(~etag_changed & ~digest_changed, F.lit("stable"))
        .when(etag_changed & ~digest_changed, F.lit("etag_rotates"))
        .when(~etag_changed & digest_changed, F.lit("stale_etag"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "url",
        F.when(
            F.col("_eo").isNotNull() & F.col("_en").isNotNull(), etag_changed
        ).alias("etag_changed"),
        digest_changed.alias("digest_changed"),
        verdict.alias("verdict"),
    )


def vary_audit(responses: DataFrame) -> DataFrame:
    """Vary header audit (RFC 9111 §4.1) — the shared-cache
    fragmentation lint: tokenize the comma-separated field-name list
    (trim + lowercase), and flag the two practical poisons: ``*``
    (response never matches a stored response — effectively
    uncacheable) and per-user axes (user-agent explodes the cache key
    across browser builds; cookie makes every user a cache miss).

    Input: (url, vary?).  Output: (url, n_vary_tokens, vary_star,
    varies_user_agent, varies_cookie, shared_cacheable).

    Scale: map-only codegen (one split + array ops), zero shuffles.
    """
    toks = F.when(
        F.col("vary").isNotNull(),
        F.filter(
            F.transform(
                F.split(F.col("vary"), ","), lambda t: F.lower(F.trim(t))
            ),
            lambda t: t != "",
        ),
    ).otherwise(F.array().cast("array<string>"))
    star = F.array_contains(toks, "*")
    ua = F.array_contains(toks, "user-agent")
    cookie = F.array_contains(toks, "cookie")
    return responses.select(
        "url",
        F.size(toks).alias("n_vary_tokens"),
        star.alias("vary_star"),
        ua.alias("varies_user_agent"),
        cookie.alias("varies_cookie"),
        (~star & ~cookie).alias("shared_cacheable"),
    )


_CONTENT_ENCODING_PAT = r"(?im)^content-encoding:[ \t]*([^\r\n]*)"
_CT_HEADER_PAT = r"(?im)^content-type:[ \t]*([^\r\n;]*)"
_COMPRESSIBLE_CT_PAT = (
    r"^(?:text/|application/(?:json|javascript|xml|xhtml\+xml|rss\+xml"
    r"|atom\+xml|x-ndjson))"
)


def compression_audit(
    responses: DataFrame, min_bytes: int = 1024
) -> DataFrame:
    """Transfer-compression QA — at crawl scale, bandwidth is the
    budget: a host serving multi-KB text/HTML/JSON without
    Content-Encoding costs the fetcher (and the host) gzip-sized
    multiples of transfer for nothing, and a frontier that knows this
    can deprioritize or flag the host (composes with `budget_alloc` /
    `host_reputation`).

    responses: (url, headers, body binary).  Per row: encoding (first
    Content-Encoding token, lowercased; 'identity' when absent),
    content_type (media type only), compressible (text/* and the
    usual application/* text formats), n_bytes (stored octets), and
    uncompressed_compressible — compressible ∧ identity ∧ n_bytes ≥
    min_bytes, the actionable flag.

    Map-only codegen: two header regexes + octet_length, zero
    shuffles.
    """
    raw_enc = F.nullif(
        F.trim(F.regexp_extract("headers", _CONTENT_ENCODING_PAT, 1)),
        F.lit(""),
    )
    # first token of a multi-coding chain ("gzip, br" -> gzip)
    enc = F.coalesce(
        F.lower(F.trim(F.split_part(raw_enc, F.lit(","), F.lit(1)))),
        F.lit("identity"),
    )
    ct = F.lower(
        F.nullif(
            F.trim(F.regexp_extract("headers", _CT_HEADER_PAT, 1)),
            F.lit(""),
        )
    )
    compressible = F.coalesce(
        ct.rlike(_COMPRESSIBLE_CT_PAT), F.lit(False)
    )
    n_bytes = F.coalesce(F.octet_length("body"), F.lit(0)).cast("long")
    return responses.select(
        "url",
        enc.alias("encoding"),
        ct.alias("content_type"),
        compressible.alias("compressible"),
        n_bytes.alias("n_bytes"),
        (
            compressible
            & (enc == "identity")
            & (n_bytes >= F.lit(int(min_bytes)))
        ).alias("uncompressed_compressible"),
    )


def mime_sniff(responses: DataFrame) -> DataFrame:
    """Declared Content-Type vs body-magic sniff — the response-level
    sibling of `charset_sniff` (encoding) and the image table's
    `format_sniff`: servers mislabel constantly (HTML error pages as
    image/*, binaries as text/html), and dispatching the parse stage
    on the header alone either wastes a parse or feeds garbage to it.
    Sniffing is byte-prefix only (the WHATWG mime-sniff spirit,
    reduced to the signatures a crawler routes on).

    sniffed ∈ html (leading optional-whitespace '<' after BOM strip —
    any markup), png / jpeg / gif (real signatures), pdf ('%PDF'),
    gzip (1F8B), unknown.  declared = the media type from the
    Content-Type header.  verdict: match (sniff agrees or is a
    refinement, e.g. html vs text/*), mismatch, undeclared, empty.

    Scale: map-only codegen (hex prefix ladder + one header regex),
    zero shuffles.
    """
    ct = F.lower(
        F.nullif(
            F.trim(F.regexp_extract("headers", _CT_HEADER_PAT, 1)),
            F.lit(""),
        )
    )
    hex8 = F.upper(F.hex(F.expr("substring(body, 1, 4)")))
    body_str = F.expr("substring(CAST(body AS STRING), 1, 64)")
    sniffed = (
        F.when(F.coalesce(F.octet_length("body"), F.lit(0)) == 0,
               F.lit("empty"))
        .when(hex8.startswith("89504E47"), F.lit("png"))
        .when(hex8.startswith("FFD8FF"), F.lit("jpeg"))
        .when(hex8.startswith("47494638"), F.lit("gif"))
        .when(hex8.startswith("25504446"), F.lit("pdf"))
        .when(hex8.startswith("1F8B"), F.lit("gzip"))
        .when(body_str.rlike(r"^\s*<"), F.lit("html"))
        .otherwise(F.lit("unknown"))
    )
    is_texty = ct.startswith("text/") | ct.isin(
        "application/xhtml+xml", "application/xml"
    )
    matches = (
        F.when(sniffed == "html", F.coalesce(is_texty, F.lit(False)))
        .when(sniffed == "png", ct == "image/png")
        .when(sniffed == "jpeg", ct == "image/jpeg")
        .when(sniffed == "gif", ct == "image/gif")
        .when(sniffed == "pdf", ct == "application/pdf")
        .when(sniffed == "gzip", ct.isin("application/gzip", "application/x-gzip"))
        .otherwise(F.lit(None).cast("boolean"))
    )
    verdict = (
        F.when(sniffed == "empty", F.lit("empty"))
        .when(ct.isNull(), F.lit("undeclared"))
        .when(matches.isNull(), F.lit("unknown"))
        .when(matches, F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return responses.select(
        "url",
        ct.alias("declared"),
        sniffed.alias("sniffed"),
        verdict.alias("verdict"),
    )


def alt_svc_audit(responses: DataFrame) -> DataFrame:
    """RFC 7838 Alt-Svc parse → per-URL HTTP/3 / HTTP/2 advertisement
    audit — the protocol-upgrade signal a large crawler feeds its fetch
    layer (an h3 endpoint halves handshake RTTs on lossy paths, and at
    10^10 fetches the negotiated protocol is a first-order latency
    term).  Grammar (RE2-safe, both engines): a comma-separated list of
    `protocol-id=":port"` alternatives with optional `ma=<seconds>`
    freshness, or the literal `clear` which retracts all alternatives.

    Per row: (url, has_alt_svc, advertises_h3, advertises_h2, max_age,
    cleared) — h3 matches h3 and the h3-NN draft ids; max_age is the
    FIRST ma= value (RFC: parameters apply per-alternative; the first
    alternative is the preferred one), NULL when absent or cleared.

    Scale: pure Column regexps on an already-fetched header column —
    whole-stage codegen, zero shuffle, zero Python.
    """
    v = F.coalesce(F.col("alt_svc"), F.lit(""))
    cleared = F.trim(v) == "clear"
    has = (F.length(F.trim(v)) > 0) & ~cleared
    h3 = has & v.rlike('(^|,)\\s*h3(-[0-9]+)?="')
    h2 = has & v.rlike('(^|,)\\s*h2(c)?="')
    ma = F.when(
        has & (F.regexp_extract(v, "ma=([0-9]+)", 1) != ""),
        F.regexp_extract(v, "ma=([0-9]+)", 1).cast("long"),
    )
    return responses.select(
        "url",
        has.alias("has_alt_svc"),
        h3.alias("advertises_h3"),
        h2.alias("advertises_h2"),
        ma.alias("max_age"),
        cleared.alias("cleared"),
    )
