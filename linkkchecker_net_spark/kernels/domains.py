"""Registrable-domain (eTLD+1) extraction — the crawl-policy unit above
the host.

Politeness budgets, trap damping, and domain quota caps (C4-style,
`pipeline/curation.py:domain_cap`) all want the REGISTRABLE domain, not
the raw host: `a.shop.example.co.uk` and `b.example.co.uk` are one
operator and should share one budget, while `x.github.io` and
`y.github.io` are different operators and must NOT.  The reference
compares raw authorities only (`UriHelpers.cs` host equality), which is
the right call for its single-site scan but wrong at web scale.

Implementation is a pure Column expression over a compiled-in suffix
set — the public-suffix list's *algorithm* (longest matching suffix
wins; unlisted TLD ⇒ last label is the suffix) over a deterministic,
bounded excerpt of multi-label suffixes.  No UDF, no join: the suffix
set is small enough to inline as an `isin` literal (Catalyst compiles it
to a hash-set probe in codegen).  Swapping in the full Mozilla PSL is a
data change (extend the tuples), not a code change.

Oracle parity: DuckDB mirrors with string_split + list slicing; both
engines split on '.' and compare bytewise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# multi-label public suffixes (PSL excerpt, deterministic): the
# registrable domain is ONE label deeper than these
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
    # private-registry suffixes: every subdomain is an independent site
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "cloudfront.net", "s3.amazonaws.com",
)

_IPV4 = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def registrable_domain_expr(host_col) -> Column:
    """eTLD+1 of a lowercase hostname.

    Rules, in order:
      * IPv4 literal → the address itself (no registrable domain);
      * last TWO labels in MULTI_SUFFIXES → last THREE labels;
      * host with ≥2 labels → last TWO labels (the PSL fallback rule:
        an unlisted TLD is itself the public suffix);
      * single-label host (`localhost`, intranet names) → the host.
    A host that IS a public suffix (`co.uk` itself) has no registrable
    domain; this returns the host unchanged — callers grouping by the
    result still get a stable, collision-free key.
    """
    host = F.col(host_col) if isinstance(host_col, str) else host_col
    host = F.lower(host)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(host.rlike(_IPV4), host)
        .when((n >= 3) & last2.isin(*MULTI_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


# spam-heavy TLDs (public abuse-ranking staples — Spamhaus/SURBL "most
# abused TLD" lists' stable members): a URL here isn't auto-dropped, it
# just prices into url_score/host_reputation as one more keep-signal
RISKY_TLDS = (
    "tk", "ml", "ga", "cf", "gq",
    "xyz", "top", "icu", "work", "click", "link", "loan", "zip",
    "country", "stream", "download", "racing", "win", "bid",
)


def tld_risk(urls, url_col: str = "url"):
    """TLD distribution + abuse-risk flag over a URL table — the
    cheapest corpus-mix / crawl-policy diagnostic there is: a frontier
    whose .xyz/.tk share is exploding is being led into spam space,
    and a training corpus skewed to risky TLDs inherits their content.

    Per TLD (last host label, lowercased; IPv4 literals pool under
    'ipv4'): n_urls, share_ppm, risky (compile-in RISKY_TLDS set —
    swapping in a fuller abuse list is a data change).

    Output: (tld, n_urls, share_ppm, risky).

    Scale: map-only extraction → |TLDs|-row partial agg + 1-row
    broadcast total; composes with `registrable_domains`, `url_score`,
    `host_reputation` as a keep-signal.
    """
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/:]+)", 1)
    )
    labels = F.split(host, r"\.")
    tld = F.when(host.rlike(_IPV4), F.lit("ipv4")).otherwise(
        F.element_at(labels, -1)
    )
    counts = (
        urls.select(tld.alias("tld"))
        .groupBy("tld")
        .agg(F.count("*").alias("n_urls"))
    )
    tot = counts.agg(F.sum("n_urls").alias("_t"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "tld",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.floor(F.col("n_urls") * 1_000_000 / F.col("_t"))
        .cast("long")
        .alias("share_ppm"),
        F.col("tld").isin(*RISKY_TLDS).alias("risky"),
    )


DGA_ENTROPY_MIN = 3.0  # bits; english words sit ~2.2-2.9
DGA_LEN_MIN = 12


def dga_score(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """Algorithmically-generated-domain (DGA) heuristic over the
    second-level label — botnet C2, spam and throwaway-phishing infra
    generate domains (xkqvbz3h7f.com) whose label statistics separate
    cleanly from human-registered names; a crawler that scores this at
    frontier time deprioritizes whole campaigns for the cost of a
    map-only pass.  Signals (each replayed by the oracle):

      * ``entropy`` — Shannon entropy (bits, round-6) of the label's
        character distribution; randomized labels approach log2(36),
        English words sit near 2.2-2.9;
      * ``digit_ppm`` — digit share of the label;
      * ``max_consonant_run`` — longest run without a vowel/digit
        (pronounceable names break runs every 1-3 chars);
      * ``label_len``.

    ``is_dga`` fires on (entropy >= 3.0 AND label_len >= 12) OR
    max_consonant_run >= 6 OR digit_ppm >= 400000 — thresholds from the
    published DGA-detection literature's classic feature splits (Yadav
    2010's entropy test; Schiavoni 2014's pronounceability runs).

    Scale: pure per-row expressions (split/explode only inside a
    per-label aggregate whose key is the host — map-side combined);
    no joins, no windows.
    """
    label = F.element_at(
        F.split(registrable_domain_expr(F.col(host_col)), r"\."), 1
    )
    base = hosts.select(
        F.col(host_col).alias("host"), F.lower(label).alias("lab")
    )
    chars = base.select(
        "host",
        "lab",
        F.explode(F.split(F.col("lab"), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    dist = (
        chars.groupBy("host", "lab", "ch")
        .agg(F.count("*").alias("n"))
        .groupBy("host", "lab")
        .agg(
            F.sum("n").alias("tot"),
            F.sum(
                F.col("n")
                * F.log2(F.col("n").cast("double"))
            ).alias("nlogn"),
        )
        .select(
            "host",
            "lab",
            F.round(
                F.log2(F.col("tot").cast("double"))
                - F.col("nlogn") / F.col("tot"),
                6,
            ).alias("entropy"),
        )
    )
    digit_ppm = (
        F.length(F.regexp_replace("lab", "[^0-9]", ""))
        * F.lit(1_000_000)
        / F.greatest(F.length("lab"), F.lit(1))
    ).cast("long")
    # longest vowel/digit-free run: split on [aeiou0-9-] and take the
    # max fragment length
    runs = F.array_max(
        F.transform(
            F.split(F.col("lab"), "[aeiou0-9-]"),
            lambda x: F.length(x),
        )
    )
    feat = base.join(dist, ["host", "lab"]).select(
        "host",
        F.col("lab").alias("sld_label"),
        "entropy",
        digit_ppm.alias("digit_ppm"),
        F.coalesce(runs, F.lit(0)).cast("int").alias("max_consonant_run"),
        F.length("lab").cast("int").alias("label_len"),
    )
    return feat.withColumn(
        "is_dga",
        (
            (F.col("entropy") >= DGA_ENTROPY_MIN)
            & (F.col("label_len") >= DGA_LEN_MIN)
        )
        | (F.col("max_consonant_run") >= 6)
        | (F.col("digit_ppm") >= 400_000),
    )
