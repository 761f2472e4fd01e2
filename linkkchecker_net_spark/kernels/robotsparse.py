"""robots.txt text parsing — the production front of the F10 politeness
gate (engine/driver.py consumes a pre-parsed robots table; this kernel
produces that table from raw robots.txt bodies fetched at crawl start).

Reference analog: none — /root/reference/SpiderEngine/Engine.cs has no
robots support; this is from-scratch crawl surface the north rule names
("robots.txt-gated fetch").

Semantics (RFC 9309, simplified to the deterministic core):

  * a **group** is a maximal run of consecutive ``User-agent:`` lines
    followed by its rule lines (``Disallow`` / ``Allow`` /
    ``Crawl-delay``);
  * a group **matches** at level 2 if any of its agents equals the
    crawler's product token (case-insensitive), level 1 if any is ``*``,
    else 0;
  * the rules applied are the union over ALL groups at the host's highest
    match level (RFC merge rule for repeated groups of the same agent);
  * rule lines before any ``User-agent:`` line belong to no group and are
    ignored; comments (``#``) and blank lines are stripped; directive
    keys are case-insensitive.

Scale: lines explode per host then group via two windows partitioned by
host — ONE shuffle keyed on host, and the robots corpus is tiny next to
the crawl (one row per host, KB-sized).  All parsing is JVM codegen
(split / regexp_extract / window / agg) — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KEY_RE = r"^([A-Za-z][A-Za-z-]*)\s*:"
_VAL_RE = r"^[A-Za-z][A-Za-z-]*\s*:\s*(.*)$"


def parse_robots(robots_txt: DataFrame, agent: str = "linkkchecker") -> DataFrame:
    """Parse raw robots.txt bodies into the engine's politeness table.

    Input: ``(host string, txt string)``.  Output, one row per input host
    (hosts with no matching group are anchored with empty rules — "no
    rules" must read as "allow all", not vanish):

      host, matched ('exact' | 'wildcard' | 'none'), n_rules,
      disallow ('|'-joined sorted prefix list), crawl_delay (double,
      max over merged groups — the conservative pick).
    """
    agent_lc = agent.lower()

    lines = robots_txt.select(
        "host", F.posexplode(F.split("txt", "\n")).alias("ln", "raw")
    )
    d = (
        lines.select(
            "host",
            "ln",
            F.trim(F.regexp_replace("raw", "#.*", "")).alias("line"),
        )
        .filter(F.col("line") != "")
        .select(
            "host",
            "ln",
            F.lower(F.regexp_extract("line", _KEY_RE, 1)).alias("key"),
            F.trim(F.regexp_extract("line", _VAL_RE, 1)).alias("val"),
        )
        .filter(F.col("key").isin("user-agent", "disallow", "allow", "crawl-delay"))
    )

    w = Window.partitionBy("host").orderBy("ln")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_ua = (F.col("key") == "user-agent").cast("int")
    # a group starts at a user-agent line NOT preceded by another
    # user-agent line (consecutive UA lines share one group)
    start = F.when((is_ua == 1) & (F.lag(is_ua, 1, 0).over(w) == 0), 1).otherwise(0)
    g = d.withColumn("gid", F.sum(start).over(run)).filter(F.col("gid") > 0)

    per_group = g.groupBy("host", "gid").agg(
        F.max(
            F.when((F.col("key") == "user-agent") & (F.col("val") == "*"), 1)
            .when(
                (F.col("key") == "user-agent")
                & (F.lower("val") == F.lit(agent_lc)),
                2,
            )
            .otherwise(0)
        ).alias("level"),
        F.sort_array(
            F.collect_list(
                F.when((F.col("key") == "disallow") & (F.col("val") != ""), F.col("val"))
            )
        ).alias("dis"),
        F.max(
            F.when(F.col("key") == "crawl-delay", F.col("val").cast("double"))
        ).alias("delay"),
    )

    best = per_group.groupBy("host").agg(F.max("level").alias("best_level"))
    chosen = (
        per_group.join(best, "host")
        .filter((F.col("level") == F.col("best_level")) & (F.col("level") > 0))
        .groupBy("host")
        .agg(
            F.max("level").alias("level"),
            F.array_join(
                F.array_sort(F.flatten(F.collect_list("dis"))), "|"
            ).alias("disallow"),
            F.size(F.flatten(F.collect_list("dis"))).cast("long").alias("n_rules"),
            F.max("delay").alias("crawl_delay"),
        )
    )

    return (
        robots_txt.select("host")
        .join(chosen, "host", "left")
        .select(
            "host",
            F.when(F.col("level") == 2, F.lit("exact"))
            .when(F.col("level") == 1, F.lit("wildcard"))
            .otherwise(F.lit("none"))
            .alias("matched"),
            F.coalesce("n_rules", F.lit(0).cast("long")).alias("n_rules"),
            F.coalesce("disallow", F.lit("")).alias("disallow"),
            F.col("crawl_delay"),
        )
    )


def robots_table(
    robots_txt: DataFrame, agent: str = "linkkchecker"
) -> DataFrame:
    """Engine-ready politeness table (schemas.ROBOTS) from raw robots.txt
    bodies: the production path is fetch /robots.txt per host at crawl
    start → this function → CrawlDriver(robots=...).

    ``budget`` is NULL — per-host fetch budgets are an operator knob, not
    a robots.txt directive; callers overlay them (tables.robots_df rows
    do).  Hosts whose robots.txt matched no group get disallow=NULL /
    crawl_delay=NULL, which the engine's F10 gate already reads as
    "allow all" (epoch.py robots join is a left join with a NULL-guarded
    exists)."""
    parsed = parse_robots(robots_txt, agent)
    return parsed.select(
        "host",
        F.when(F.col("n_rules") > 0, F.split("disallow", "\\|"))
        .otherwise(F.lit(None).cast("array<string>"))
        .alias("disallow"),
        F.col("crawl_delay").cast("double"),
        F.lit(None).cast("int").alias("budget"),
    )


def extract_sitemaps(robots_txt: DataFrame) -> DataFrame:
    """``Sitemap:`` directives from raw robots.txt bodies — the crawl's
    S5 seed feed (sitemap URLs discovered at politeness-fetch time, RFC
    9309 §2.3: the directive is GROUP-INDEPENDENT, so no group selection
    applies — every line counts regardless of user-agent context).

    Input ``(host, txt)``; output ``(host, ln, sitemap_url)`` with ``ln``
    the 0-based line number (deterministic dedup/ordering key).  A line
    yields a URL iff, after comment stripping and trimming, it is exactly
    ``sitemap: <single-token-url>`` case-insensitively; malformed lines
    (trailing junk, empty value) yield nothing.  Hosts without directives
    emit no rows — anchoring "no sitemap" verdicts is the join site's
    job (same contract as htmlparse's extract tables).

    Scale: pure map-side codegen (split + regexp per line) — the robots
    corpus is one KB-row per host, so this never shuffles at all.
    """
    lines = robots_txt.select(
        "host", F.posexplode(F.split(F.col("txt"), "\n")).alias("ln", "line")
    )
    stripped = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    url = F.regexp_extract(stripped, r"(?i)^sitemap\s*:\s*(\S+)$", 1)
    return lines.select("host", "ln", url.alias("sitemap_url")).filter(
        F.col("sitemap_url") != ""
    )


def robots_match(
    urls: DataFrame,
    rules: DataFrame,
    broadcast_rules: bool = True,
) -> DataFrame:
    """Full RFC 9309 §2.2.2-2.2.3 rule matching: '*' matches any octet
    sequence, a trailing '$' anchors at path end, the applied rule is
    the LONGEST (most octets) matching pattern, and on an exact length
    tie the Allow rule wins (the documented Google/REP tiebreak).  Empty
    rule paths match nothing (an empty Disallow means "no restriction")
    and an unmatched URL is allowed.

    urls: (host, path); rules: (host, rule_type ∈ {allow, disallow},
    path).  Output one row per input url row: (host, path, allowed,
    rule_type, rule_path) with the winning rule (NULLs when nothing
    matched).

    This is the compliance superset of the engine's F10 gate
    (engine/epoch.py robots join, plain path-prefix containment — the
    overwhelmingly common rule shape, kept codegen-cheap in the inner
    loop); swap this operator into the gate when a host population
    actually uses wildcard rules.

    Scale: the rules side is a per-host dimension (robots.txt is KBs) —
    it broadcasts; the URL side joins + regex-filters map-side and the
    winner pick is one partial-aggregated groupBy on (host, path).
    Regex compilation per rule row is the cost knob: at 10^10 URLs
    pre-compile per distinct host×rule (the broadcast side), which is
    exactly what the expression does — the regex column is built once
    per rule row, not per URL.
    """
    ends = F.endswith(F.col("rpath"), F.lit("$"))
    body = F.when(
        ends, F.expr("substring(rpath, 1, length(rpath) - 1)")
    ).otherwise(F.col("rpath"))
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    rex = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(ends, F.lit("$")).otherwise(F.lit("")),
    )
    r = (
        rules.filter(F.col("path") != "")
        .select(
            "host",
            F.col("rule_type").alias("rtype"),
            F.col("path").alias("rpath"),
        )
        .withColumn("rex", rex)
    )
    if broadcast_rules:
        r = F.broadcast(r)
    matched = urls.join(r, "host").filter(
        F.regexp_like(F.col("path"), F.col("rex"))
    )
    win = matched.groupBy("host", "path").agg(
        F.max(
            F.struct(
                F.length("rpath").alias("l"),
                (F.col("rtype") == "allow").cast("int").alias("a"),
                F.col("rtype").alias("t"),
                F.col("rpath").alias("rp"),
            )
        ).alias("w")
    )
    out = urls.join(win, ["host", "path"], "left")
    return out.select(
        "host",
        "path",
        F.when(F.col("w").isNull(), F.lit(True))
        .otherwise(F.col("w.a") == 1)
        .alias("allowed"),
        F.col("w.t").alias("rule_type"),
        F.col("w.rp").alias("rule_path"),
    )


def sitemap_robots_conflict(
    locs: DataFrame, rules: DataFrame
) -> DataFrame:
    """Sitemap-vs-robots conflict lint: URLs a site DECLARES in its
    sitemap but DISALLOWS in its robots.txt — a self-contradiction
    every crawler team reports back to webmasters (the sitemap invites
    the fetch, the robots file forbids it; RFC 9309 wins and the URL
    silently never gets indexed).

    locs: (host, loc — absolute URL); rules: (host, rule_type, path) as
    :func:`robots_match` takes.  Output one row per declared loc:
    (host, loc, allowed, rule_path) — the conflict set is
    ``allowed=false``.

    Pure composition: strip the loc to its path and run the full
    RFC 9309 matcher — the broadcast-rules/map-side-regex scale shape
    is robots_match's.
    """
    urls = locs.select(
        "host",
        "loc",
        F.regexp_replace("loc", r"^https?://[^/]+", "").alias("path"),
    )
    verdicts = robots_match(urls.select("host", "path").distinct(), rules)
    j = urls.join(verdicts, ["host", "path"], "left")
    return j.select(
        "host",
        "loc",
        F.coalesce("allowed", F.lit(True)).alias("allowed"),
        "rule_path",
    )


def is_wildcard_rule_expr(pattern_col):
    """True when a rule path carries RFC 9309 metachars ('*' anywhere,
    '$' at end) and therefore needs the regex path."""
    return F.contains(pattern_col, F.lit("*")) | F.endswith(
        pattern_col, F.lit("$")
    )


def pattern_regex_expr(pattern_col):
    """RFC 9309 rule path → anchored regex string (the grammar
    :func:`robots_match` uses): strip a trailing '$' into an end
    anchor, escape regex metachars (a mid-pattern '$' is literal),
    expand '*' to '.*'."""
    ends = F.endswith(pattern_col, F.lit("$"))
    body = F.when(
        ends, F.regexp_replace(pattern_col, r"\$$", "")
    ).otherwise(pattern_col)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    return F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(ends, F.lit("$")).otherwise(F.lit("")),
    )


def rule_match_expr(path_col, pattern_col):
    """One RFC 9309 rule test as a pure codegen expression — usable
    inside array lambdas.  Plain patterns (no '*', no trailing '$')
    stay on the cheap startswith path; wildcard patterns build the same
    regex :func:`robots_match` uses.  The oracle twin is
    oracle/bfs.py:_rule_match — the two are pinned equal by
    test_crawl_golden's wildcard-robots crawl.

    The engine's F10 gate (engine/epoch.py) pre-SPLITS the broadcast
    disallow dim into prefix rules and pre-built regexes with the two
    helpers above instead, so the per-candidate hot loop never
    re-detects or re-builds anything; this combined form is for one-off
    rule tests.
    """
    return F.when(
        is_wildcard_rule_expr(pattern_col),
        F.regexp_like(path_col, pattern_regex_expr(pattern_col)),
    ).otherwise(F.startswith(path_col, pattern_col))


def robots_coverage(
    urls: DataFrame, rules: DataFrame, broadcast_rules: bool = True
) -> DataFrame:
    """Per-host robots coverage rollup over the full RFC 9309 matcher —
    the crawl-planning number robots_match's per-URL verdicts roll up
    to: how much of each host's known URL space is disallowed.  A host
    blocking 90% of its frontier wants its budget reassigned
    (pipeline/recrawl.budget_alloc consumes exactly this kind of
    signal), and a sudden coverage jump after a robots refetch is the
    classic accidental-Disallow-slash incident.

    Output: (host, n_urls, n_blocked, blocked_ppm).

    Scale: robots_match's broadcast-rules join + one host-keyed
    partial-aggregated rollup.
    """
    m = robots_match(urls, rules, broadcast_rules=broadcast_rules)
    return (
        m.groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum((~F.col("allowed")).cast("long")).alias("n_blocked"),
        )
        .select(
            "host",
            "n_urls",
            "n_blocked",
            F.floor(F.col("n_blocked") * 1_000_000 / F.col("n_urls")).alias(
                "blocked_ppm"
            ),
        )
    )


def robots_generate(
    rules: DataFrame, sitemaps: DataFrame | None = None
) -> DataFrame:
    """The sink-side inverse of :func:`parse_robots` (mirroring
    sitemapparse.sitemap_generate): emit an RFC 9309 robots.txt per
    host from the rules dimension — one `User-agent: *` group with the
    host's Allow/Disallow lines (sorted by (rule_type, path) for
    determinism) followed by its group-independent Sitemap directives.
    Round-trips through this repo's own parser (pinned by unit test).

    rules: (host, rule_type ∈ {allow, disallow}, path);
    sitemaps: (host, loc) optional.  Output: (host, n_rules,
    n_sitemaps, robots_txt).

    Scale: per-host groupBys with bounded string aggregation
    (robots.txt is KBs by construction); one host-keyed outer join to
    attach the sitemap block.
    """
    line = F.concat(
        F.when(F.col("rule_type") == "allow", F.lit("Allow: "))
        .otherwise(F.lit("Disallow: ")),
        F.col("path"),
    )
    rgrp = (
        rules.select("host", "rule_type", "path", line.alias("_l"))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_rules"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rule_type", "path", "_l"))
                    ),
                    lambda s: s["_l"],
                ),
                "\n",
            ).alias("_rules"),
        )
    )
    if sitemaps is not None:
        sgrp = (
            sitemaps.select(
                "host",
                F.concat(F.lit("Sitemap: "), F.col("loc")).alias("_s"),
            )
            .groupBy("host")
            .agg(
                F.count("*").alias("n_sitemaps"),
                F.array_join(F.array_sort(F.collect_list("_s")), "\n").alias(
                    "_smaps"
                ),
            )
        )
        rgrp = rgrp.join(sgrp, "host", "outer")
    else:
        rgrp = rgrp.select(
            "*",
            F.lit(0).alias("n_sitemaps"),
            F.lit(None).cast("string").alias("_smaps"),
        )
    txt = F.concat(
        F.lit("User-agent: *\n"),
        F.coalesce(F.col("_rules"), F.lit("")),
        F.when(
            F.col("_smaps").isNotNull(),
            F.concat(F.lit("\n"), F.col("_smaps")),
        ).otherwise(F.lit("")),
    )
    return rgrp.select(
        "host",
        F.coalesce("n_rules", F.lit(0)).cast("long").alias("n_rules"),
        F.coalesce("n_sitemaps", F.lit(0)).cast("long").alias("n_sitemaps"),
        txt.alias("robots_txt"),
    )


def robots_delta(rules_v1: DataFrame, rules_v2: DataFrame) -> DataFrame:
    """Policy diff between two robots.txt snapshots — the crawl-ops
    companion to :func:`parse_robots`/`crawl_diff`: a recrawl scheduler
    must notice when a host opens or tightens its policy (tightened ⇒
    purge newly-disallowed frontier entries; opened ⇒ new crawl space).
    The reference re-reads robots per run and keeps no history
    (`Engine.cs` init path); at 10^10-URL scale the delta IS the event
    stream.

    Inputs: (host, rule_type ∈ {allow, disallow}, path) per snapshot —
    the :func:`parse_robots` output shape.  Output one row per host
    present in either snapshot: (host, n_added, n_removed, n_unchanged,
    verdict ∈ unchanged / opened / tightened / mixed / new_host /
    gone_host).  opened = only allow-rules added and/or disallow-rules
    removed; tightened = the converse; mixed = both directions moved.

    Scale: two host-keyed partial-agg'd outer joins on the full rule
    key (host, rule_type, path) — rule tables are metadata-sized
    relative to the corpus (≤ tens of rules/host); no windows.
    """
    key = ["host", "rule_type", "path"]
    v1 = rules_v1.select(*key).distinct()
    v2 = rules_v2.select(*key).distinct()
    j = v1.withColumn("_in1", F.lit(1)).join(
        v2.withColumn("_in2", F.lit(1)), key, "full_outer"
    )
    opened_move = (
        (F.col("_in2").isNotNull() & F.col("_in1").isNull()
         & (F.col("rule_type") == "allow"))
        | (F.col("_in1").isNotNull() & F.col("_in2").isNull()
           & (F.col("rule_type") == "disallow"))
    )
    tightened_move = (
        (F.col("_in2").isNotNull() & F.col("_in1").isNull()
         & (F.col("rule_type") == "disallow"))
        | (F.col("_in1").isNotNull() & F.col("_in2").isNull()
           & (F.col("rule_type") == "allow"))
    )
    per_host = j.groupBy("host").agg(
        F.sum(
            F.when(F.col("_in2").isNotNull() & F.col("_in1").isNull(), 1)
            .otherwise(0)
        ).alias("n_added"),
        F.sum(
            F.when(F.col("_in1").isNotNull() & F.col("_in2").isNull(), 1)
            .otherwise(0)
        ).alias("n_removed"),
        F.sum(
            F.when(
                F.col("_in1").isNotNull() & F.col("_in2").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_unchanged"),
        F.max(F.when(opened_move, 1).otherwise(0)).alias("_op"),
        F.max(F.when(tightened_move, 1).otherwise(0)).alias("_ti"),
        F.max(F.when(F.col("_in1").isNotNull(), 1).otherwise(0)).alias(
            "_any1"
        ),
        F.max(F.when(F.col("_in2").isNotNull(), 1).otherwise(0)).alias(
            "_any2"
        ),
    )
    verdict = (
        F.when(F.col("_any1") == 0, F.lit("new_host"))
        .when(F.col("_any2") == 0, F.lit("gone_host"))
        .when((F.col("_op") == 1) & (F.col("_ti") == 1), F.lit("mixed"))
        .when(F.col("_op") == 1, F.lit("opened"))
        .when(F.col("_ti") == 1, F.lit("tightened"))
        .otherwise(F.lit("unchanged"))
    )
    return per_host.select(
        "host",
        F.col("n_added").cast("long").alias("n_added"),
        F.col("n_removed").cast("long").alias("n_removed"),
        F.col("n_unchanged").cast("long").alias("n_unchanged"),
        verdict.alias("verdict"),
    )
