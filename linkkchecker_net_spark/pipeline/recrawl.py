"""Per-URL change-rate estimation from snapshot history → recrawl
intervals (the freshness side of crawl scheduling; Cho & Garcia-Molina,
"Estimating frequency of change", TOIT'03, simplified).

`reports/reports.py:recrawl_schedule` ranks hosts by OBSERVED staleness
of the last crawl; this operator closes the loop with a per-URL change
RATE estimated from consecutive content fingerprints, so the scheduler
can assign intervals proportional to how often each page actually
changes instead of a global cadence.

Estimator: over n observation intervals with X observed changes and mean
gap Δ, the change period is estimated as Δ·n/X (the harmonic / inverse-
frequency estimator); X = 0 falls back to 2·n·Δ ("not seen changing yet
→ wait at least twice the observed span").  The textbook Poisson-MLE
refinement (−ln(1−X/n)) is deliberately NOT used: it diverges at X = n
(a page that changed every interval) and its transcendental output
complicates bit-exact cross-engine verification, while the ordering it
induces on pages is identical for scheduling purposes.

Scale: one window (partitioned by URL — millions of independent
partitions, no global sort) + one partial-aggregated groupBy.  Per-URL
snapshot counts are bounded by retention policy, so window state is
O(snapshots-per-URL), not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rate(
    snapshots: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """(url, n_intervals, n_changes, avg_gap, recrawl_interval).

    ``snapshots`` = one row per (url, fetch time, content fingerprint).
    URLs with a single snapshot carry no rate signal and are emitted
    with n_intervals = 0 and NULL interval (scheduler treats them as
    new pages).  avg_gap and recrawl_interval are in ``ts`` units,
    rounded to 6 dp for cross-engine comparability.
    """
    w = Window.partitionBy("url").orderBy("t")
    flagged = snapshots.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("t"),
        F.col(hash_col).alias("h"),
    ).withColumn(
        "changed",
        F.when(F.lag("h").over(w).isNull(), F.lit(None).cast("int"))
        .when(F.col("h") != F.lag("h").over(w), F.lit(1))
        .otherwise(F.lit(0)),
    )
    agg = flagged.groupBy("url").agg(
        (F.count("*") - 1).alias("n_intervals"),
        F.coalesce(F.sum("changed"), F.lit(0)).alias("n_changes"),
        (F.max("t") - F.min("t")).alias("span"),
    )
    gap = F.col("span") / F.col("n_intervals")
    interval = F.when(
        F.col("n_intervals") == 0, F.lit(None).cast("double")
    ).when(
        F.col("n_changes") == 0, 2 * F.col("n_intervals") * gap
    ).otherwise(gap * F.col("n_intervals") / F.col("n_changes"))
    return agg.select(
        "url",
        "n_intervals",
        "n_changes",
        F.round(
            F.when(F.col("n_intervals") == 0, F.lit(None)).otherwise(gap), 6
        ).alias("avg_gap"),
        F.round(interval, 6).alias("recrawl_interval"),
    )


# ---------------------------------------------------------------------------
# Per-host fetch-budget allocation — the scheduling step between "how
# big/good is each host" and W1's per-host politeness top-K.  The
# reference has no analog (single-site scan); at web scale the global
# fetch budget of an epoch must be SPLIT before the politeness window
# runs, or one mega-host starves the tail.
# ---------------------------------------------------------------------------


def budget_alloc(
    host_stats: DataFrame,
    total_budget: int,
    min_per_host: int = 1,
    max_per_host: int | None = None,
) -> DataFrame:
    """(host, n_urls, weight, alloc) — proportional-√size allocation.

    weight = quality_scaled · ⌊√n_urls·1000⌋ (INTEGER on purpose: the
    global weight sum is then exact, so the proportional split
    ⌊total·w/Σw⌋ is pure integer arithmetic — bit-identical across
    engines and across partition orders; a float Σw would make the floor
    boundary depend on double summation order).  √n_urls damps mega-host
    dominance (politeness bounds per-host throughput at ~1/host anyway,
    so linear-in-size allocation over-promises on big hosts).  The
    result is clamped to [min_per_host, max_per_host] and never exceeds
    n_urls.

    host_stats columns: host, n_urls (long), quality_scaled (long ≥ 1 —
    an integer quality tier, e.g. 1-5).  Scale: one partial-aggregated
    groupBy upstream of this, then a 1-row global sum broadcast back —
    map-only after that.
    """
    w = (
        F.col("quality_scaled")
        * F.floor(F.sqrt(F.col("n_urls").cast("double")) * 1000)
    ).cast("long")
    weighted = host_stats.withColumn("weight", w)
    total_w = weighted.agg(F.sum("weight").alias("sum_w"))
    raw = F.expr(f"CAST({total_budget} AS BIGINT) * weight div sum_w")
    alloc = F.greatest(F.lit(int(min_per_host)).cast("long"), raw)
    if max_per_host is not None:
        alloc = F.least(alloc, F.lit(int(max_per_host)).cast("long"))
    alloc = F.least(alloc, F.col("n_urls"))
    return (
        weighted.crossJoin(F.broadcast(total_w))  # 1-row scalar dim
        .select("host", "n_urls", "weight", alloc.alias("alloc"))
    )


# ---------------------------------------------------------------------------
# Conditional-GET revalidation planning — turns the per-URL cache policy
# (kernels/httpmeta.cache_policy_expr) plus the time since last fetch
# into a fetch ACTION and a bandwidth ledger.  The reference refetches
# everything every run (one-shot scan, SpiderEngine/Spider.cs); at 10^10
# URLs the fresh/revalidate/full split IS the bandwidth bill of a
# recrawl epoch.
# ---------------------------------------------------------------------------


def revalidation_plan(
    results,
    url_col: str = "url",
    cc_col: str = "cache_control",
    etag_col: str = "etag",
    lm_col: str = "last_modified",
    age_col: str = "age_sec",
    len_col: str = "body_len",
):
    """(url, action, ttl_sec, age_sec, bytes_fetched, bytes_saved).

    action ∈ {fresh, revalidate, full} per RFC 9111 response semantics:

      * ``fresh``       — age < ttl and the response is cacheable and
                          doesn't demand revalidation (no-cache) — no
                          request at all; saves the full body.
      * ``revalidate``  — a validator exists (ETag / Last-Modified) and
                          no-store doesn't forbid reuse — a conditional
                          GET whose 304 costs headers only; the body
                          bytes are saved (the planner assumes
                          unmodified; `change_rate` supplies the
                          probability refinement upstream).
      * ``full``        — everything else: full refetch.

    Pure Column codegen (regex on header strings + arithmetic) — zero
    shuffle, map-only at any scale.
    """
    from linkkchecker_net_spark.kernels.httpmeta import cache_policy_expr

    p = cache_policy_expr(F.col(cc_col), F.col(etag_col), F.col(lm_col))
    age = F.col(age_col).cast("long")
    blen = F.col(len_col).cast("long")
    with_p = results.select(
        F.col(url_col).alias("url"), age.alias("age_sec"),
        blen.alias("body_len"), p.alias("p"),
    )
    fresh = (
        (F.col("p.ttl_sec") > F.col("age_sec"))
        & ~F.col("p.no_cache")
        & ~F.col("p.no_store")
    )
    action = (
        F.when(fresh, F.lit("fresh"))
        .when(F.col("p.conditional_get"), F.lit("revalidate"))
        .otherwise(F.lit("full"))
    )
    return with_p.select(
        "url",
        action.alias("action"),
        F.col("p.ttl_sec").alias("ttl_sec"),
        "age_sec",
        F.when(action == "full", F.col("body_len"))
        .otherwise(F.lit(0)).cast("long").alias("bytes_fetched"),
        F.when(action == "full", F.lit(0))
        .otherwise(F.col("body_len")).cast("long").alias("bytes_saved"),
    )


# ---------------------------------------------------------------------------
# Retry-After / 429 adaptive backoff — the reactive side of politeness.
# W1's per-host window enforces a STATIC budget; real hosts talk back
# (429 Too Many Requests / 503 + Retry-After, RFC 9110 §10.2.3), and a
# crawler that ignores them gets IP-banned.  Consecutive-failure runs
# escalate an exponential backoff; an explicit Retry-After header is a
# floor, never ignored.
# ---------------------------------------------------------------------------

BACKOFF_BASE_SEC = 5
BACKOFF_MAX_DOUBLINGS = 6  # 5 * 2^6 = 320 s cap


def retry_after_backoff(
    events,
    host_col: str = "host",
    ts_col: str = "ts",
    status_col: str = "status",
    ra_col: str = "retry_after",
) -> "DataFrame":
    """(host, ts, status, is_fail, consec_fails, delay_sec,
    next_allowed_ts) — per fetch event.

    A *fail* is 429 or 503.  consec_fails counts the failure run the
    event extends (reset by any success): computed with one segmented
    window — segment id = running success count, so each segment is
    [success, fail, fail, ...] and the running fail-sum inside it is the
    consecutive index.  delay = max(base·2^min(run−1, cap), Retry-After)
    for fails, 0 for successes; next_allowed_ts = ts + delay.

    Scale: two windows over the SAME (host, ts) ordering — one shuffle
    by host, millions of independent partitions, state O(1) per row.
    """
    w = Window.partitionBy("host").orderBy("ts")
    fail = F.col("status").isin(429, 503)
    seg = F.sum(F.when(fail, 0).otherwise(1)).over(w)
    ev = events.select(
        F.col(host_col).alias("host"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(status_col).cast("int").alias("status"),
        F.col(ra_col).cast("long").alias("ra"),
    ).withColumn("is_fail", fail).withColumn("seg", seg)
    ws = Window.partitionBy("host", "seg").orderBy("ts")
    consec = F.sum(F.col("is_fail").cast("long")).over(ws)
    # shiftleft's numBits arg must be a literal — doubling count is data-
    # dependent, so the 2^k goes through F.expr (still pure codegen)
    backoff = F.expr(
        f"CAST({BACKOFF_BASE_SEC} * shiftleft(1L, CAST(LEAST("
        f"consec_fails - 1, {BACKOFF_MAX_DOUBLINGS}) AS INT)) AS BIGINT)"
    )
    delay = F.when(
        F.col("is_fail"),
        F.greatest(backoff, F.coalesce(F.col("ra"), F.lit(0).cast("long"))),
    ).otherwise(F.lit(0).cast("long"))
    return (
        ev.withColumn("consec_fails",
                      F.when(F.col("is_fail"), consec)
                      .otherwise(F.lit(0).cast("long")))
        .withColumn("delay_sec", delay)
        .select(
            "host", "ts", "status", "is_fail", "consec_fails", "delay_sec",
            (F.col("ts") + F.col("delay_sec")).alias("next_allowed_ts"),
        )
    )


def crawl_delay_audit(
    fetches: DataFrame, robots: DataFrame
) -> DataFrame:
    """Politeness-compliance audit over the fetch log: per host, the
    observed inter-fetch gaps vs the robots-declared Crawl-delay —
    the closing-the-loop check on the engine's pacing (paced_fetch
    enforces the delay going forward; this operator PROVES it from the
    log, which is what a crawl operator shows a complaining webmaster).

    fetches: (host, ts_ms); robots: (host, crawl_delay_sec, may be
    absent per host).  Output per host: (host, n_fetches, min_gap_ms,
    declared_ms, n_violations, compliant) — min_gap NULL for
    single-fetch hosts, declared NULL ⇒ nothing to violate ⇒ compliant.

    Scale: ONE window (lag over ts per host — the natural clustering of
    any fetch log) + a partial-aggregated groupBy + a broadcast robots
    dim join.  A mega-host with 10^8 fetches is one sort-partition;
    beyond that the log is normally bucketed by host already, making
    the window exchange-free (same layout argument as cdx_index).
    """
    w = Window.partitionBy("host").orderBy("ts_ms")
    gaps = fetches.select(
        "host",
        "ts_ms",
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
    )
    rob = robots.select(
        "host", (F.col("crawl_delay_sec") * 1000).cast("long").alias("declared_ms")
    )
    per = (
        gaps.join(F.broadcast(rob), "host", "left")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.min("gap_ms").alias("min_gap_ms"),
            F.max("declared_ms").alias("declared_ms"),
            F.sum(
                F.when(
                    F.col("gap_ms") < F.col("declared_ms"), 1
                ).otherwise(0)
            ).alias("n_violations"),
        )
    )
    return per.select(
        "host",
        "n_fetches",
        "min_gap_ms",
        "declared_ms",
        "n_violations",
        (F.col("n_violations") == 0).alias("compliant"),
    )


def freshness_audit(
    responses: DataFrame, now_epoch: int, heuristic_ppm: int = 100_000
) -> DataFrame:
    """RFC 9111 freshness estimation — the cache-side twin of
    :func:`revalidation_plan`: for responses WITHOUT explicit
    freshness (no max-age), apply the §4.2.2 heuristic lifetime
    = 10% of (Date - Last-Modified); with max-age, use it directly.

    current_age = (now - date_epoch) + Age  (the §4.2.3 estimate with
    zero transit correction — deterministic without clocks).  Verdicts:
    ``fresh`` (current_age < lifetime), ``stale``, ``no_estimate``
    (neither max-age nor Last-Modified — must revalidate).  The 10% is
    `heuristic_ppm` in integer ppm so the lifetime stays exact:
    lifetime = floor((date - last_modified) * ppm / 10^6).

    Input: (url, date_epoch, last_modified_epoch?, max_age?, age?).
    Output adds (current_age, lifetime, heuristic_used, verdict).

    Scale: map-only integer codegen, zero shuffles.
    """
    cur = (
        F.lit(int(now_epoch))
        - F.col("date_epoch")
        + F.coalesce(F.col("age"), F.lit(0))
    )
    heur = F.floor(
        (F.col("date_epoch") - F.col("last_modified_epoch"))
        * F.lit(int(heuristic_ppm))
        / 1_000_000
    )
    lifetime = F.when(
        F.col("max_age").isNotNull(), F.col("max_age").cast("long")
    ).otherwise(heur)
    heuristic_used = F.col("max_age").isNull() & F.col(
        "last_modified_epoch"
    ).isNotNull()
    verdict = (
        F.when(lifetime.isNull(), F.lit("no_estimate"))
        .when(cur < lifetime, F.lit("fresh"))
        .otherwise(F.lit("stale"))
    )
    return responses.select(
        "url",
        cur.cast("long").alias("current_age"),
        lifetime.cast("long").alias("lifetime"),
        heuristic_used.alias("heuristic_used"),
        verdict.alias("verdict"),
    )


def burst_detect(
    events: DataFrame,
    bucket_sec: int = 3600,
    trailing: int = 3,
    factor: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Traffic-burst anomaly detection over the event stream — the
    crawl-ops alarm for error spikes / hot-host stampedes: bucket
    events into `bucket_sec` windows per event_type, compare each
    bucket's count against the mean of the `trailing` PRECEDING
    buckets (a RANGE window over bucket indices, so empty buckets gap
    correctly rather than sliding over them), and flag
    cnt ≥ factor · trailing-mean — evaluated as the exact integer
    cross-product cnt · n_prev ≥ factor · prev_sum, full-history
    buckets only (n_prev = trailing), with a `min_count` floor so a
    2-events-vs-0.3-mean bucket doesn't page anyone.

    Output: (event_type, bucket, n_events, prev_sum, n_prev,
    ratio_ppm, burst).

    Scale: one (type, bucket) partial-aggregated count, then a range
    window over the BUCKET table (per type, ~seconds-per-epoch/
    bucket_sec rows) — never the raw event stream.
    """
    # integer micros (sessions.py contract: TIMESTAMP_NTZ + UTC session
    # tz makes unix_micros agree bit-exactly with DuckDB's epoch_us)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = F.floor(us / F.lit(int(bucket_sec) * 1_000_000)).cast("long")
    counts = events.select(
        "event_type", b.alias("bucket")
    ).groupBy("event_type", "bucket").agg(F.count("*").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rangeBetween(-int(trailing), -1)
    )
    prev_sum = F.coalesce(F.sum("n_events").over(w), F.lit(0))
    n_prev = F.count("n_events").over(w)
    ratio = F.when(
        prev_sum > 0,
        F.floor(F.col("n_events") * n_prev * 1_000_000 / prev_sum),
    )
    return counts.select(
        "event_type",
        "bucket",
        "n_events",
        prev_sum.alias("prev_sum"),
        n_prev.cast("int").alias("n_prev"),
        ratio.alias("ratio_ppm"),
        (
            (n_prev == F.lit(int(trailing)))
            & (F.col("n_events") * n_prev >= F.lit(int(factor)) * prev_sum)
            & (F.col("n_events") >= F.lit(int(min_count)))
        ).alias("burst"),
    )


def host_latency(
    fetches: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    slow_p95_ms: int = 2000,
) -> DataFrame:
    """Exact per-host fetch-latency quantiles + an adaptive politeness
    suggestion — the measurement loop behind polite crawling done
    right: a fixed crawl-delay over-throttles fast CDNs and hammers
    slow origins; real schedulers derive the delay from what the host
    actually serves (p95), which is exactly what this emits for
    `budget_alloc` / the engine's per-host min-gap pacing to consume.

    Quantiles are NEAREST-RANK (rank ⌈q·n/100⌉ in the sorted
    latencies, computed as (n·q+99) div 100 — integer-exact on any
    engine; the value at a rank is well-defined under ties, so no
    tie-break column is needed).  suggested_delay_ms = clamp(2·p95,
    100, 10000); slow_host = p95 ≥ slow_p95_ms.

    Output: (host, n_fetches, p50_ms, p95_ms, p99_ms,
    suggested_delay_ms, slow_host).

    Scale: one window PARTITIONED BY host (the frontier's own
    bucketing key — never a global sort) + a host-keyed conditional
    agg; one shuffle total.
    """
    lat = F.col(latency_col).cast("long")
    w = Window.partitionBy(host_col).orderBy(lat)
    ranked = fetches.select(
        F.col(host_col).alias("host"),
        lat.alias("_lat"),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy(host_col)).alias("_n"),
    )

    def pick(q: int):
        target = F.floor((F.col("_n") * q + 99) / 100)
        return F.max(F.when(F.col("_rn") == target, F.col("_lat")))

    agg = ranked.groupBy("host").agg(
        F.max("_n").alias("n_fetches"),
        pick(50).alias("p50_ms"),
        pick(95).alias("p95_ms"),
        pick(99).alias("p99_ms"),
    )
    suggest = F.least(
        F.lit(10_000), F.greatest(F.lit(100), F.col("p95_ms") * 2)
    )
    return agg.select(
        "host",
        F.col("n_fetches").cast("long").alias("n_fetches"),
        F.col("p50_ms").cast("long").alias("p50_ms"),
        F.col("p95_ms").cast("long").alias("p95_ms"),
        F.col("p99_ms").cast("long").alias("p99_ms"),
        suggest.cast("long").alias("suggested_delay_ms"),
        (F.col("p95_ms") >= F.lit(int(slow_p95_ms))).alias("slow_host"),
    )


def politeness_gap(
    robots_delays: DataFrame,
    latency_stats: DataFrame,
    floor_ms: int = 100,
) -> DataFrame:
    """Reconcile the two delay authorities a polite crawler answers to:
    the host's DECLARED Crawl-delay (robots.txt, `crawl_delay_audit`)
    and the MEASURED latency-derived suggestion (:func:`host_latency`).
    The scheduler must honor the max of both — robots is a contract,
    latency is self-preservation — and hosts where measurement demands
    far more than the declaration are exactly the overloaded origins a
    fixed-delay crawler hammers.

    Inputs: (host, crawl_delay_ms) and (host, suggested_delay_ms).
    Output per host in either table: (host, robots_delay_ms,
    suggested_delay_ms, effective_delay_ms = max(both, floor_ms),
    source ∈ robots / latency / agree / robots_only / latency_only).

    Scale: one host-keyed full-outer join of two host-sized tables —
    both are rollups, metadata-sized relative to the frontier.
    """
    r = robots_delays.select(
        "host", F.col("crawl_delay_ms").cast("long").alias("robots_delay_ms")
    )
    s = latency_stats.select(
        "host",
        F.col("suggested_delay_ms").cast("long").alias("suggested_delay_ms"),
    )
    j = r.join(s, "host", "full_outer")
    rd, sd = F.col("robots_delay_ms"), F.col("suggested_delay_ms")
    effective = F.greatest(
        F.coalesce(rd, F.lit(0)),
        F.coalesce(sd, F.lit(0)),
        F.lit(int(floor_ms)),
    )
    source = (
        F.when(rd.isNull(), F.lit("latency_only"))
        .when(sd.isNull(), F.lit("robots_only"))
        .when(rd > sd, F.lit("robots"))
        .when(sd > rd, F.lit("latency"))
        .otherwise(F.lit("agree"))
    )
    return j.select(
        "host",
        rd.alias("robots_delay_ms"),
        sd.alias("suggested_delay_ms"),
        effective.cast("long").alias("effective_delay_ms"),
        source.alias("source"),
    )


def host_error_streak(
    fetches: DataFrame,
    dead_after: int = 3,
) -> DataFrame:
    """Longest consecutive-error run per host — the dead-host detector:
    one 500 is weather, N in a row is an outage (or a ban), and the
    scheduler should park the host's frontier partition instead of
    burning budget.  Classic gaps-and-islands over the per-host fetch
    history.

    fetches: (host, fetch_seq long — the per-host fetch order, ok
    boolean).  Output per host: (host, n_fetches, n_errors,
    max_error_streak, current_streak — the streak touching the LAST
    fetch, dead = current_streak ≥ dead_after).  ``current`` matters
    more than ``max``: a host that failed 5 times last week and
    recovered is alive; one whose last 3 fetches all failed is dead
    NOW.

    Scale: windows PARTITIONED BY host ordered by fetch_seq (the
    frontier's own bucketing key) + one host-keyed rollup; one
    shuffle.
    """
    w = Window.partitionBy("host").orderBy("fetch_seq")
    marked = fetches.select(
        "host",
        "fetch_seq",
        F.col("ok").alias("ok"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .over(w)
        .alias("_grp"),
    )
    streaks = (
        marked.filter(~F.col("ok"))
        .groupBy("host", "_grp")
        .agg(F.count("*").alias("_len"), F.max("fetch_seq").alias("_last"))
    )
    last_seq = fetches.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("n_errors"),
        F.max("fetch_seq").alias("_max_seq"),
    )
    per_host = streaks.groupBy("host").agg(
        F.max("_len").alias("max_error_streak"),
        F.max(F.struct(F.col("_last"), F.col("_len"))).alias("_lastrun"),
    )
    joined = last_seq.join(per_host, "host", "left")
    current = F.when(
        F.col("_lastrun._last") == F.col("_max_seq"),
        F.col("_lastrun._len"),
    ).otherwise(F.lit(0))
    return joined.select(
        "host",
        F.col("n_fetches").cast("long").alias("n_fetches"),
        F.col("n_errors").cast("long").alias("n_errors"),
        F.coalesce(F.col("max_error_streak"), F.lit(0))
        .cast("long")
        .alias("max_error_streak"),
        current.cast("long").alias("current_streak"),
        (current >= F.lit(int(dead_after))).alias("dead"),
    )


def frontier_prefix_stats(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Shared-prefix compressibility of the per-host URL set — the
    frontier-storage sizing estimate: a 10^10-URL frontier stored raw
    is ~0.5-1 TB of strings, but URLs within a host share long
    prefixes, and front-coding (store each sorted URL as its LCP with
    the previous one + the suffix) recovers most of it.  This measures
    exactly that: per host, the total bytes and the bytes a
    front-coded layout saves.

    Output per host: (host, n_urls, total_chars, lcp_chars,
    savings_ppm = floor(lcp·1e6/total)).

    LCP uses the prefix property (prefixes of a sorted pair match on
    a contiguous 1..k range), so counting ALL matching prefix lengths
    IS the LCP — an O(L²)-char codegen fold that a production build
    would swap for a byte-compare loop in an Arrow UDF; the
    surrounding plan (host-partitioned sort window + host rollup) is
    the real shape either way.
    """
    url = F.col(url_col)
    w = Window.partitionBy("host").orderBy("u")
    base = urls.select(
        F.lower(
            F.regexp_extract(url, r"^[a-z]+://([^/:]+)", 1)
        ).alias("host"),
        url.alias("u"),
    )
    prev = F.lag("u").over(w)
    lcp = F.when(prev.isNull(), F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(
                    F.lit(1),
                    F.least(F.length(prev), F.length(F.col("u"))),
                ),
                lambda i: prev.substr(F.lit(1), i)
                == F.col("u").substr(F.lit(1), i),
            )
        )
    )
    ranked = base.select("host", "u", lcp.alias("_lcp"))
    agg = ranked.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum(F.length("u")).alias("total_chars"),
        F.sum("_lcp").alias("lcp_chars"),
    )
    return agg.select(
        "host",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("lcp_chars").cast("long").alias("lcp_chars"),
        F.floor(F.col("lcp_chars") * 1_000_000 / F.col("total_chars"))
        .cast("long")
        .alias("savings_ppm"),
    )


def status_transitions(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
) -> DataFrame:
    """Status-class transition matrix between two crawl snapshots —
    the recrawl health dashboard in one query: a heavy 2xx→4xx/5xx row
    means link rot or an outage window, 3xx→2xx means redirects were
    chased to their terminals, absent→2xx is discovery, 2xx→absent is
    frontier loss (the rows the reference's one-shot scan can never
    see, because it has no previous snapshot to diff against).

    Classes: '2xx'/'3xx'/'4xx'/'5xx' from the status floor, 'other'
    for anything outside 200-599, 'absent' for a URL present in only
    one snapshot.  Output: (from_class, to_class, n_urls).

    Scale: one full-outer join keyed by URL (both sides bucketed by
    the same url_hash at 10^10 rows — co-located, like the seen table)
    into a 36-cell partial-aggregated count matrix; nothing downstream
    of the join carries more than the two class columns.
    """

    def cls(c):
        s = F.col(c)
        return (
            F.when((s >= 200) & (s < 300), "2xx")
            .when((s >= 300) & (s < 400), "3xx")
            .when((s >= 400) & (s < 500), "4xx")
            .when((s >= 500) & (s < 600), "5xx")
            .when(s.isNull(), "absent")
            .otherwise("other")
        )

    o = old.select(
        F.col(url_col).alias("url"), F.col(status_col).alias("_so")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.col(status_col).alias("_sn")
    )
    return (
        o.join(n, "url", "full_outer")
        .select(cls("_so").alias("from_class"), cls("_sn").alias("to_class"))
        .groupBy("from_class", "to_class")
        .agg(F.count("*").cast("long").alias("n_urls"))
    )
