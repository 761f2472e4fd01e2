"""DUST — Different URLs with Similar Text (Bar-Yossef et al., WWW'07)
— plus mirror-host detection over content fingerprints.

The reference engine's visited set is keyed by the *exact* URL string
(`SpiderEngine/Engine.cs` — `_urls` dictionary), so every alias family
(`/a` vs `/a/`, http vs https, `?b=2&a=1` vs `?a=1&b=2`) is fetched
once per spelling.  At 10^10-URL frontier scale, alias families are a
double-digit share of fetch traffic; mining the REWRITE RULES from pages
already fetched lets the canonicalizer collapse them *before* the seen
anti-join pays for them.

Scale design:
  * pairs are generated ONLY inside (host, content_hash) groups — an
    inverted index on the content fingerprint, never an all-pairs join;
  * groups larger than ``max_group`` distinct URLs are dropped (soft-404
    floods / empty-page boilerplate would otherwise contribute O(G²)
    pairs that carry no rule signal) — the classic stop-hash guard;
  * rule classification is a pure ``F.when`` chain over string built-ins
    (whole-stage codegen, no UDF);
  * the output is a (host, rule)-keyed rollup — bounded by real site
    structure, so the final aggregate's map-side combine collapses the
    pair stream per partition.

Mirror detection is the cross-host twin: two hosts sharing most of their
content fingerprints (a CDN alias, a www/apex split, a scraped mirror)
should be crawled once.  Same inverted-index shape, one level up:
join per content_hash across hosts (stop-hashes dropped), roll up to
host pairs, Jaccard against per-host fingerprint totals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkkchecker_net_spark.kernels.canonicalize import normalize_query_expr

HOST_PATTERN = r"^[a-z][a-z0-9+.-]*://([^/]+)"

# classification order matters: first match wins, most specific first
DUST_RULES = (
    "trailing_slash",
    "index_file",
    "scheme",
    "query_order",
    "query_strip",
    "case",
    "other",
)


def _strip_scheme(u: Column) -> Column:
    return F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")


def dust_rule_expr(a: Column, b: Column) -> Column:
    """Classify the rewrite rule relating two same-content URLs.

    First match wins (DUST_RULES order); ``other`` = same content but no
    recognized syntactic relation (e.g. a true duplicate page).  Each arm
    is symmetric in (a, b) so pair orientation cannot change the verdict.
    """
    base_a = F.substring_index(a, "?", 1)
    base_b = F.substring_index(b, "?", 1)
    return (
        F.when(
            (a == F.concat(b, F.lit("/"))) | (b == F.concat(a, F.lit("/"))),
            F.lit("trailing_slash"),
        )
        .when(
            (F.regexp_replace(a, r"index\.html?$", "")
             == F.regexp_replace(b, r"index\.html?$", ""))
            & (a != b),
            F.lit("index_file"),
        )
        .when(
            (_strip_scheme(a) == _strip_scheme(b)) & (a != b),
            F.lit("scheme"),
        )
        .when(
            normalize_query_expr(a) == normalize_query_expr(b),
            F.lit("query_order"),
        )
        .when((base_a == base_b) & (a != b), F.lit("query_strip"))
        .when(F.lower(a) == F.lower(b), F.lit("case"))
        .otherwise(F.lit("other"))
    )


def dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    max_group: int = 64,
) -> DataFrame:
    """Mine per-host DUST rule support: (host, rule, n_pairs).

    ``pages`` = fetched pages with a content fingerprint column (the
    engine's crawl_results carries ``content_md5`` from the tiered decode
    pass; any exact fingerprint works).  Only groups with 2..max_group
    distinct URLs generate pairs; ``a < b`` keeps each unordered pair
    once.  Shuffles: one groupBy(host, hash) for the group guard, one
    equi-join on (host, hash) for pair generation (both partial-
    aggregated / co-keyed), one final (host, rule) rollup.
    """
    u = (
        pages.select(
            F.regexp_extract(F.col(url_col), HOST_PATTERN, 1).alias("host"),
            F.col(url_col).alias("u"),
            F.col(hash_col).alias("h"),
        )
        .filter(F.col("host") != "")
        .distinct()
    )
    sized = u.groupBy("host", "h").agg(F.count("*").alias("g"))
    keyed = u.join(
        sized.filter((F.col("g") >= 2) & (F.col("g") <= max_group)).select(
            "host", "h"
        ),
        on=["host", "h"],
    )
    a = keyed.select("host", "h", F.col("u").alias("a"))
    b = keyed.select("host", "h", F.col("u").alias("b"))
    pairs = a.join(b, on=["host", "h"]).filter(F.col("a") < F.col("b"))
    return (
        pairs.select(
            "host", dust_rule_expr(F.col("a"), F.col("b")).alias("rule")
        )
        .groupBy("host", "rule")
        .agg(F.count("*").alias("n_pairs"))
    )


def mirror_hosts(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    max_hosts_per_hash: int = 16,
    min_shared: int = 2,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Detect mirror host pairs by content-fingerprint overlap.

    Output: (host_a, host_b, shared, n_a, n_b, jaccard) for pairs with
    ``shared >= min_shared`` and ``jaccard >= min_jaccard``; host_a <
    host_b.  Fingerprints present on more than ``max_hosts_per_hash``
    hosts are dropped before pairing (shared boilerplate — privacy pages,
    empty bodies — would otherwise quadratically pair every host on the
    web).  Join work is bounded by sum over hashes of (hosts-per-hash)²
    ≤ max_hosts_per_hash × |fingerprints|, i.e. linear in the corpus.
    """
    hh = (
        pages.select(
            F.regexp_extract(F.col(url_col), HOST_PATTERN, 1).alias("host"),
            F.col(hash_col).alias("h"),
        )
        .filter(F.col("host") != "")
        .distinct()
    )
    totals = hh.groupBy("host").agg(F.count("*").alias("n"))
    fanout = hh.groupBy("h").agg(F.count("*").alias("nh"))
    narrow = hh.join(
        fanout.filter(
            (F.col("nh") >= 2) & (F.col("nh") <= max_hosts_per_hash)
        ).select("h"),
        on="h",
    )
    pa = narrow.select("h", F.col("host").alias("host_a"))
    pb = narrow.select("h", F.col("host").alias("host_b"))
    shared = (
        pa.join(pb, on="h")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(
            totals.select(
                F.col("host").alias("host_a"), F.col("n").alias("n_a")
            ),
            on="host_a",
        )
        .join(
            totals.select(
                F.col("host").alias("host_b"), F.col("n").alias("n_b")
            ),
            on="host_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ),
        )
        .filter(
            (F.col("shared") >= min_shared)
            & (F.col("jaccard") >= min_jaccard)
        )
        .select("host_a", "host_b", "shared", "n_a", "n_b", "jaccard")
    )


def session_params(
    urls: DataFrame,
    min_occurrences: int = 5,
    distinct_ppm_threshold: int = 800_000,
) -> DataFrame:
    """Session-id / tracking-parameter detection by value entropy (the
    Heritrix/Nutch heuristic that seeds DUST rules): a query parameter
    whose VALUE is nearly unique per occurrence (sid=, phpsessid=,
    timestamps, cache busters) multiplies every page into unbounded URL
    aliases — the #1 crawl-trap and dedup-waste source.  Parameters
    with few distinct values (page=, lang=, sort=) are real content
    axes and must NOT be stripped.

    urls: (host, url) → per (host, param): (host, param, n_occurrences,
    n_distinct_values, distinct_ppm, session_param) where distinct_ppm
    = floor(1e6·distinct/occurrences) and the flag requires BOTH the
    ratio ≥ threshold AND ≥ min_occurrences sightings (a parameter seen
    twice with two values is evidence of nothing).

    Downstream: flagged params feed normalize_query_expr's strip list
    (kernels/canonicalize) the same way dust_rules feeds rewrites.

    Scale: explode query params (map-side), ONE partial-aggregated
    groupBy on (host, param) with an exact distinct — the count_distinct
    is per-group exact because the group is the decision unit; at
    10^10 URLs swap in approx_count_distinct once groups exceed memory,
    the flag tolerates sketch error at these thresholds.
    """
    q = F.parse_url(F.col("url"), F.lit("QUERY"))
    kv = F.explode(
        F.filter(F.split(q, "&"), lambda p: p.contains("="))
    ).alias("kv")
    pairs = urls.filter(q.isNotNull() & (q != "")).select("host", kv)
    per = (
        pairs.select(
            "host",
            F.substring_index("kv", "=", 1).alias("param"),
            F.substring_index("kv", "=", -1).alias("val"),
        )
        .groupBy("host", "param")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("val").alias("n_distinct_values"),
        )
    )
    ppm = (
        F.col("n_distinct_values") * 1_000_000 / F.col("n_occurrences")
    ).cast("long")
    return per.select(
        "host",
        "param",
        "n_occurrences",
        "n_distinct_values",
        ppm.alias("distinct_ppm"),
        (
            (ppm >= F.lit(int(distinct_ppm_threshold)))
            & (F.col("n_occurrences") >= F.lit(int(min_occurrences)))
        ).alias("session_param"),
    )


_UTM_PARAM_RE = r"(?i)[?&](utm_[a-z]+)="


def utm_params(urls: DataFrame) -> DataFrame:
    """Marketing-parameter rollup per host — the frontier-hygiene
    cousin of :func:`session_params`: utm_* query parameters are pure
    analytics decoration (Google's own canonical advice: strip before
    dedup), so their per-host density tells the normalizer which hosts
    need the tracking-strip list applied before the seen-check.

    Input: (host, url).  Output per host: (host, n_urls, n_with_utm,
    utm_ppm, n_distinct_params) — n_distinct_params = distinct utm_*
    parameter NAMES observed (lowercased).

    Scale: map-only harvest, then a host-keyed aggregate; the distinct
    parameter names ride a per-host collect_set of a ≤ dozen-element
    domain (bounded — utm_ has five canonical params).
    """
    pars = F.transform(
        F.regexp_extract_all("url", F.lit(_UTM_PARAM_RE), 1),
        F.lower,
    )
    rows = urls.select(
        "host",
        F.size(pars).alias("_n"),
        F.array_distinct(pars).alias("_p"),
    )
    return (
        rows.groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum((F.col("_n") > 0).cast("long")).alias("n_with_utm"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("_p")))
            ).alias("n_distinct_params"),
        )
        .select(
            "host",
            "n_urls",
            "n_with_utm",
            F.floor(
                F.col("n_with_utm") * 1_000_000 / F.col("n_urls")
            ).alias("utm_ppm"),
            "n_distinct_params",
        )
    )
