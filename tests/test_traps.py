"""pipeline.traps — URL-template collapse + explosion detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkkchecker_net_spark.pipeline.traps import (
    template_stats,
    trap_hosts,
    url_template,
)


def _templates(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(url_template(F.col("url"))).collect()]


def test_template_collapses_digits_and_hex(spark):
    got = _templates(
        spark,
        [
            "http://h.test/page/123",
            "http://h.test/item?id=9",
            "http://h.test/s/DEADBEEF42abc/x",  # 8+ hex run (case-folded)
            "http://h.test/v2/short/abc",  # 'abc': hex chars but < 8 chars
        ],
    )
    assert got == [
        "http://h.test/page/{n}",
        "http://h.test/item?id={n}",
        "http://h.test/s/{hex}/x",
        "http://h.test/v{n}/short/abc",
    ]


def test_template_hex_pass_runs_before_digit_pass(spark):
    # a 10-digit run is ALSO a hex run -> collapses to {hex}, not {n}
    assert _templates(spark, ["http://h.test/t/1234567890"]) == [
        "http://h.test/t/{hex}"
    ]


def test_template_stats_counts_hits_and_distinct(spark):
    urls = [
        "http://h.test/p/1",
        "http://h.test/p/1",  # duplicate hit, same URL
        "http://h.test/p/2",
        "http://other.test/q/7",
        "mailto:u@h.test",  # no authority -> dropped
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = template_stats(df).collect()
    got = {(r["host"], r["template"]): (r["n_hits"], r["n_urls"]) for r in rows}
    assert got == {
        ("h.test", "http://h.test/p/{n}"): (3, 2),
        ("other.test", "http://other.test/q/{n}"): (1, 1),
    }


def test_trap_hosts_flags_explosive_host_only(spark):
    # trap.test: 40 distinct urls, 1 template -> explosion 40 >= 10
    # flat.test: 4 urls, 4 templates -> explosion 1
    urls = [f"http://trap.test/cal/{i}" for i in range(40)] + [
        "http://flat.test/about",
        "http://flat.test/contact",
        "http://flat.test/pricing",
        "http://flat.test/blog",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = trap_hosts(df, explosion_threshold=10.0).collect()
    got = {r["host"]: (r["n_urls"], r["n_templates"], r["trap"]) for r in rows}
    assert got["trap.test"] == (40, 1, True)
    assert got["flat.test"] == (4, 4, False)


def test_trap_hosts_plan_is_two_partial_aggregates(spark):
    """Scale contract: the rollup is exactly two hash aggregates with
    map-side partials (template keyspace bounded by site structure) —
    no window, no join, no exchange beyond the two groupBys."""
    df = spark.createDataFrame([("http://h.test/p/1",)], "url string")
    plan = trap_hosts(df)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Window" not in plan and "Join" not in plan


def test_host_latency_nearest_rank_hand_values(spark):
    """10 latencies 100..1000 on one host: p50 = 5th value (500),
    p95 = 10th (1000), p99 = 10th; a single-fetch host returns its one
    value everywhere; ties at the rank boundary stay well-defined."""
    from linkkchecker_net_spark.pipeline.recrawl import host_latency

    rows = [("a", (k + 1) * 100) for k in range(10)] + [
        ("b", 42),
        ("c", 7), ("c", 7), ("c", 7),
    ]
    df = spark.createDataFrame(rows, "host string, latency_ms long")
    out = {r["host"]: r for r in host_latency(df, slow_p95_ms=900).collect()}
    a = out["a"]
    assert a["n_fetches"] == 10 and a["p50_ms"] == 500
    assert a["p95_ms"] == 1000 and a["p99_ms"] == 1000
    assert a["suggested_delay_ms"] == 2000 and a["slow_host"]
    b = out["b"]
    assert b["p50_ms"] == b["p95_ms"] == b["p99_ms"] == 42
    assert b["suggested_delay_ms"] == 100 and not b["slow_host"]
    assert out["c"]["p50_ms"] == 7 and out["c"]["n_fetches"] == 3


def test_politeness_gap_sources_and_floor(spark):
    from linkkchecker_net_spark.pipeline.recrawl import politeness_gap

    robots = spark.createDataFrame(
        [("a", 1000), ("b", 50), ("c", 400), ("d", 10)],
        "host string, crawl_delay_ms long",
    )
    lat = spark.createDataFrame(
        [("a", 200), ("b", 400), ("c", 400), ("e", 30)],
        "host string, suggested_delay_ms long",
    )
    out = {r["host"]: r for r in politeness_gap(robots, lat).collect()}
    assert out["a"]["source"] == "robots" and out["a"]["effective_delay_ms"] == 1000
    assert out["b"]["source"] == "latency" and out["b"]["effective_delay_ms"] == 400
    assert out["c"]["source"] == "agree"
    assert out["d"]["source"] == "robots_only"
    assert out["d"]["effective_delay_ms"] == 100  # floor beats 10ms
    assert out["e"]["source"] == "latency_only"
    assert out["e"]["effective_delay_ms"] == 100


def test_host_error_streak_islands(spark):
    """Hand history: host A errors at seq 2,3 (streak 2, recovers),
    then 7,8,9 ending the history (current 3, dead at dead_after=3);
    host B all ok; host C one mid-history error only."""
    from linkkchecker_net_spark.pipeline.recrawl import host_error_streak

    rows = []
    for s in range(10):
        rows.append(("A", s, s not in (2, 3, 7, 8, 9)))
    for s in range(5):
        rows.append(("B", s, True))
    rows += [("C", 0, True), ("C", 1, False), ("C", 2, True)]
    df = spark.createDataFrame(rows, "host string, fetch_seq long, ok boolean")
    out = {r["host"]: r for r in host_error_streak(df, dead_after=3).collect()}
    a = out["A"]
    assert a["max_error_streak"] == 3 and a["current_streak"] == 3
    assert a["n_errors"] == 5 and a["dead"] is True
    b = out["B"]
    assert b["max_error_streak"] == 0 and b["current_streak"] == 0
    assert b["dead"] is False
    c = out["C"]
    assert c["max_error_streak"] == 1 and c["current_streak"] == 0
    assert c["dead"] is False


def test_frontier_prefix_stats_lcp(spark):
    """Sorted front-coding: /a/page1, /a/page2 share 'http://h.test/a/page'
    (20 chars); a lone host saves nothing; savings_ppm is the floor-ppm
    of summed LCPs over summed lengths."""
    from linkkchecker_net_spark.pipeline.recrawl import frontier_prefix_stats

    urls = spark.createDataFrame(
        [
            ("http://h.test/a/page1",),
            ("http://h.test/a/page2",),
            ("http://h.test/b/x",),
            ("http://solo.test/only",),
        ],
        "url string",
    )
    out = {r["host"]: r for r in frontier_prefix_stats(urls).collect()}
    h = out["h.test"]
    # sorted: /a/page1, /a/page2 (lcp 20), /b/x (lcp 14: 'http://h.test/')
    assert h["n_urls"] == 3 and h["lcp_chars"] == 20 + 14
    assert h["total_chars"] == 21 + 21 + 17
    assert h["savings_ppm"] == (34 * 1_000_000) // 59
    s = out["solo.test"]
    assert s["lcp_chars"] == 0 and s["savings_ppm"] == 0


def test_status_transitions_matrix_arms(spark):
    """2xx->4xx rot, 3xx->2xx resolution, absent->2xx discovery,
    2xx->absent loss and the other class all land in the right cells."""
    from linkkchecker_net_spark.pipeline.recrawl import status_transitions

    old = spark.createDataFrame(
        [("a", 200), ("b", 301), ("c", 200), ("d", 999)],
        "url string, status int",
    )
    new = spark.createDataFrame(
        [("a", 404), ("b", 200), ("d", 200), ("e", 200)],
        "url string, status int",
    )
    out = {
        (r["from_class"], r["to_class"]): r["n_urls"]
        for r in status_transitions(old, new).collect()
    }
    assert out == {
        ("2xx", "4xx"): 1,
        ("3xx", "2xx"): 1,
        ("2xx", "absent"): 1,
        ("other", "2xx"): 1,
        ("absent", "2xx"): 1,
    }


def test_dga_score_arms(spark):
    """Random-looking hex label fires entropy+digits; an all-consonant
    label fires the run test; dictionary labels with a www prefix or a
    single digit stay benign."""
    from linkkchecker_net_spark.kernels.domains import dga_score

    hosts = spark.createDataFrame(
        [
            ("www.examplesite.com",),
            ("a7f3e9c1d508b2.net",),
            ("kjhgfdsmnbvcx.org",),
            ("news7.io",),
        ],
        "host string",
    )
    out = {r["sld_label"]: r for r in dga_score(hosts).collect()}
    assert out["examplesite"]["is_dga"] is False
    assert out["a7f3e9c1d508b2"]["is_dga"] is True
    k = out["kjhgfdsmnbvcx"]
    assert k["is_dga"] is True and k["max_consonant_run"] == 13
    n = out["news7"]
    assert n["is_dga"] is False and n["digit_ppm"] == 1_000_000 // 5
