"""Trap-aware politeness damping: pipeline/traps.py wired into the crawl
engine's F10 budget path (CrawlConfig.trap_explosion_threshold).

Scenario: trap.test serves a calendar-style URL explosion (40 distinct
/cal/{i} links, ONE template), ok.test a normal site map (3 links, 3
templates).  After epoch 0 the driver must flag trap.test from the
outgoing frontier's template stats and cap its per-epoch budget at
trap_budget for every later epoch, while ok.test stays unbounded."""

from __future__ import annotations

from linkkchecker_net_spark.engine import tables
from linkkchecker_net_spark.engine.driver import CrawlConfig, CrawlDriver

TRAP_LINKS = [f"http://trap.test/cal/{i}" for i in range(40)]
OK_LINKS = [
    "http://ok.test/about",
    "http://ok.test/contact",
    "http://ok.test/pricing",
]


def _web(spark):
    def page(url, host, links):
        body = (
            "<html><body>"
            + "".join(f'<a href="{u}">x</a>' for u in links)
            + "</body></html>"
        ).encode()
        return {
            "url": url,
            "host": host,
            "status": 200,
            "content_type": "text/html",
            "body": body,
        }

    # the /cal/ and /about pages are NOT in the web -> fetched as broken;
    # budget accounting is identical to live pages and the web stays tiny
    return tables.web_df(
        spark,
        [
            page("http://trap.test/", "trap.test", TRAP_LINKS),
            page("http://ok.test/", "ok.test", OK_LINKS),
        ],
    )


SEEDS = [
    {"seed_url": "http://trap.test/", "priority": 0},
    {"seed_url": "http://ok.test/", "priority": 0},
]


def _run(spark, ckpt, **trap_kw):
    driver = CrawlDriver(
        spark,
        _web(spark),
        tables.robots_df(spark, []),
        CrawlConfig(ckpt_dir=str(ckpt), max_epochs=3, **trap_kw),
    )
    driver.run(SEEDS)
    return driver


def _host_counts(driver, epoch):
    rows = (
        driver.results()
        .filter(f"epoch = {epoch}")
        .groupBy("host")
        .count()
        .collect()
    )
    return {r["host"]: r["count"] for r in rows}


def test_trap_host_flagged_and_budget_capped(spark, tmp_path):
    d = _run(
        spark,
        tmp_path / "on",
        trap_explosion_threshold=10.0,
        trap_budget=8,
        trap_min_urls=16,
    )
    assert d._trap_hosts == {"trap.test"}
    # epoch 1: trap.test capped at 8/epoch, ok.test untouched
    e1 = _host_counts(d, 1)
    assert e1["trap.test"] == 8
    assert e1["ok.test"] == 3
    # the cap is sticky: epoch 2 drains the NEXT 8 from the carry
    e2 = _host_counts(d, 2)
    assert e2 == {"trap.test": 8}


def test_trap_damping_off_by_default(spark, tmp_path):
    d = _run(spark, tmp_path / "off")
    assert d._trap_hosts == set()
    e1 = _host_counts(d, 1)
    assert e1["trap.test"] == 40  # whole explosion fetched in one epoch
    assert e1["ok.test"] == 3


def test_small_varied_host_never_flagged(spark, tmp_path):
    # ok.test: explosion ratio 1 (3 urls / 3 templates) — below any sane
    # threshold; trap_min_urls also shields small hosts from flagging
    d = _run(
        spark,
        tmp_path / "min",
        trap_explosion_threshold=1.0,  # pathological: ratio>=1 everywhere
        trap_budget=1,
        trap_min_urls=16,
    )
    # only the 40-URL host clears trap_min_urls despite the silly threshold
    assert d._trap_hosts == {"trap.test"}
