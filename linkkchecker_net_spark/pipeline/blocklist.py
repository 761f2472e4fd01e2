"""URL/domain blocklist gate — the FIRST stage of a web-scale curation
pipeline (C4 §2.2's "bad words"/blocklist URL filter, RefinedWeb §3.1's
curated-blocklist + URL-scoring gate), which the reference has no analog
for: linkkchecker.net scans one site the operator chose, so it never
needs to reject whole domains (`Scanner.cs` takes the seed as trusted).
At 100 TB the blocklist gate runs BEFORE fetch/parse/quality — it is the
cheapest filter per dropped byte in the whole funnel.

Two rule families, matching what production corpus builders ship:

  * **registrable-domain blocklist** — adult/spam/SEO-farm domains,
    matched on eTLD+1 (`kernels/domains.registrable_domain_expr`) so
    `cdn.bad.example.com` and `bad.example.com` fall together, while
    `a.github.io` is independent of `b.github.io` (private registry);
  * **URL substring rules** — C4-style case-insensitive needles over
    the full URL (path + query), catching `/casino/`, `sessionid=`,
    printer-view mirrors, etc.  First matching rule (list order) is
    reported, so rule precedence is deterministic and auditable.

Verdict precedence: blocked_domain ≻ blocked_url ≻ ok — domain rules are
curated (high precision) and win over substring heuristics.

Scale: the blocklist joins BROADCAST (a curated list is ≤ a few million
skinny rows — megabytes; plan-pinned in tests/test_plan_contracts.py) and
the substring scan is a codegen array `filter` over an inlined literal —
the page stream itself never shuffles: the whole gate is map-side.  A
blocklist too large to broadcast degrades gracefully to a shuffled hash
join on `registrable_domain` (drop the broadcast hint), which is still
skew-safe — domain cardinality is bounded and the blocklist side carries
one row per domain.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkkchecker_net_spark.kernels.domains import registrable_domain_expr


DEFAULT_URL_BADWORDS = (
    "casino", "porn", "xxx", "viagra", "loan", "bet",
    "download", "torrent", "crack", "warez",
)


def url_score(
    pages: DataFrame,
    badwords: "Sequence[str]" = DEFAULT_URL_BADWORDS,
) -> DataFrame:
    """RefinedWeb §3.1.2-style SOFT URL scoring — the scored sibling of
    the hard :func:`url_blocklist` gate: instead of a binary verdict,
    each URL gets an integer penalty built from the signals the
    RefinedWeb authors describe (bad-word hits in the URL, excessive
    subdomain depth, digit-heavy paths, extreme length), so a curation
    pipeline can THRESHOLD or SAMPLE by score rather than drop on one
    rule.  All integer arithmetic (ppm/centi units) — exactly
    replayable on the oracle.

    Signals and weights (centi-points, larger = worse):
      * bad-word substring hits: 100 each (`n_badwords`);
      * subdomain depth beyond host.tld: 25 per extra label
        (`n_subdomains` — www does not count);
      * digit share of the URL ≥ 20%: 50 (`digit_heavy`);
      * URL length > 128: 50 (`too_long`).

    Output: (url, host, n_badwords, n_subdomains, digit_ppm,
    url_len, score_centi) — score_centi = the weighted sum.

    Scale: pure map-only codegen (substring counts, label split,
    regexp digit count) — zero shuffles, zero Python; composes with
    `url_blocklist` and `quality_keep` as another keep-signal column.
    """
    url_lc = F.lower(F.col("url"))
    n_bad = sum(
        [
            F.when(F.contains(url_lc, F.lit(w)), 1).otherwise(0)
            for w in badwords
        ],
        F.lit(0),
    )
    labels = F.split(F.lower(F.col("host")), r"\.")
    extra = F.size(labels) - F.lit(2)
    www = F.when(F.element_at(labels, 1) == "www", 1).otherwise(0)
    n_sub = F.greatest(extra - www, F.lit(0))
    n_digits = F.length(F.regexp_replace("url", r"[^0-9]", ""))
    url_len = F.length("url")
    digit_ppm = F.when(
        url_len > 0, F.floor(n_digits * 1_000_000 / url_len)
    ).otherwise(F.lit(0))
    digit_heavy = digit_ppm >= 200_000
    too_long = url_len > 128
    score = (
        n_bad * 100
        + n_sub * 25
        + F.when(digit_heavy, 50).otherwise(0)
        + F.when(too_long, 50).otherwise(0)
    )
    return pages.select(
        "url",
        "host",
        n_bad.cast("int").alias("n_badwords"),
        n_sub.cast("int").alias("n_subdomains"),
        digit_ppm.cast("long").alias("digit_ppm"),
        url_len.cast("int").alias("url_len"),
        score.cast("int").alias("score_centi"),
    )


def url_blocklist(
    pages: DataFrame,
    blocked_domains: DataFrame | None = None,
    url_rules: Sequence[str] = (),
) -> DataFrame:
    """pages: (url, host) → (url, host, registrable_domain,
    blocked_domain, matched_rule, keep, reason).

    `blocked_domains`: one-column DataFrame (`domain`) of registrable
    domains (case-insensitive; deduplicated here).  `url_rules`:
    ordered substring needles, matched case-insensitively against the
    full URL; `matched_rule` is the FIRST hit in list order.

    reason ∈ {blocked_domain, blocked_url, NULL}; keep = reason IS NULL
    — the same verdict contract as `curation_funnel`, so the two gates
    compose with a plain join on the keep column (funnel integration
    test: tests/test_curation.py).
    """
    dom = registrable_domain_expr("host")
    out = pages.select(
        "url", "host", dom.alias("registrable_domain")
    )
    if blocked_domains is not None:
        bl = (
            blocked_domains.select(
                F.lower(F.col("domain")).alias("_bl_domain")
            )
            .distinct()
        )
        out = out.join(
            F.broadcast(bl),
            F.col("registrable_domain") == F.col("_bl_domain"),
            "left",
        )
    else:
        out = out.withColumn("_bl_domain", F.lit(None).cast("string"))

    if url_rules:
        rules = F.array(*[F.lit(str(r).lower()) for r in url_rules])
        hits = F.filter(
            rules, lambda r: F.contains(F.lower(F.col("url")), r)
        )
        matched_rule = F.when(F.size(hits) > 0, F.element_at(hits, 1))
    else:
        matched_rule = F.lit(None).cast("string")

    reason = (
        F.when(F.col("_bl_domain").isNotNull(), F.lit("blocked_domain"))
        .when(matched_rule.isNotNull(), F.lit("blocked_url"))
    )
    return out.select(
        "url",
        "host",
        "registrable_domain",
        F.col("_bl_domain").isNotNull().alias("blocked_domain"),
        matched_rule.alias("matched_rule"),
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )
