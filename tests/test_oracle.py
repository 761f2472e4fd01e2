"""Oracle BFS sanity tests over the golden fixture (SURVEY.md §5.2-5.3).

The oracle is the contract; these tests pin its invariants so the Spark
engine's equality tests (test_crawl_golden.py) rest on a checked base.
"""

from __future__ import annotations

import pytest

from linkkchecker_net_spark.fixtures import webgen
from linkkchecker_net_spark.oracle import bfs


@pytest.fixture(scope="module")
def fx():
    return webgen.make_fixtures("golden", seed=42)


@pytest.fixture(scope="module")
def crawl(fx):
    return bfs.crawl_oracle(fx["web"], fx["seeds"], fx["robots"])


def test_crawl_terminates_and_covers(fx, crawl):
    assert not crawl.frontier
    urls = [r["url"] for r in crawl.results]
    assert len(urls) == len(set(urls)), "no URL fetched twice"
    classes = {r["classification"] for r in crawl.results}
    assert classes == {
        "ok",
        "redirect",
        "broken",
        "error",
        "unsupported",
        "robots_blocked",
    }, f"fixture must exercise every classification branch, got {classes}"
    # a healthy fraction of the synthetic web is reachable
    assert sum(1 for r in crawl.results if r["classification"] == "ok") > 50


def test_depth_is_min_distance(crawl):
    # BFS property: parent depth + 1 >= child depth, with equality at
    # first discovery; seen stores first_depth
    by_url = {r["url"]: r for r in crawl.results}
    for r in crawl.results:
        if r["parent_url"] is not None and r["parent_url"] in by_url:
            assert r["crawl_depth"] <= by_url[r["parent_url"]]["crawl_depth"] + 1


def test_discovery_rank_unique_and_dense(crawl):
    ranks = sorted(r["discovery_rank"] for r in crawl.results)
    assert ranks == list(range(len(ranks)))


def test_deterministic(fx):
    a = bfs.crawl_oracle(fx["web"], fx["seeds"], fx["robots"])
    b = bfs.crawl_oracle(fx["web"], fx["seeds"], fx["robots"])
    assert a.results == b.results
    assert a.seen == b.seen


def test_politeness_budget_respected(fx):
    budget = 5
    robots = [dict(r, budget=budget) for r in fx["robots"]]
    crawl = bfs.crawl_oracle(fx["web"], fx["seeds"], robots)
    per_epoch_host: dict = {}
    for r in crawl.results:
        if r["classification"] in ("unsupported", "robots_blocked"):
            continue  # never fetched
        key = (r["epoch"], r["host"])
        per_epoch_host[key] = per_epoch_host.get(key, 0) + 1
    assert max(per_epoch_host.values()) <= budget
    # budgeted crawl reaches the same final seen set, just in more epochs
    free = bfs.crawl_oracle(fx["web"], fx["seeds"], fx["robots"])
    assert set(crawl.seen) == set(free.seen)
    assert crawl.epoch > free.epoch


def test_robots_gate(fx, crawl):
    blocked = [r for r in crawl.results if r["classification"] == "robots_blocked"]
    assert blocked, "fixture must exercise the robots gate"
    assert all("/private/" in r["url"] for r in blocked)
    fetched = {
        r["url"] for r in crawl.results if r["classification"] not in ("unsupported", "robots_blocked")
    }
    assert not any("/private/" in u for u in fetched)


def test_offsite_fetched_not_expanded(fx, crawl):
    # cdn.test images are fetched (classified) but never expanded:
    # no result may have a cdn.test PAGE parent unless via embedded css
    seed_hosts = {s["seed_url"].split("/")[2] for s in fx["seeds"]}
    assert "cdn.test" not in seed_hosts
    cdn_rows = [r for r in crawl.results if r["host"] == "cdn.test"]
    assert cdn_rows, "off-site cdn fetches must occur"
    for r in crawl.results:
        if r["parent_url"] is not None:
            parent_host = r["parent_url"].split("/")[2]
            # parents are always in-site html pages or css (in-site-gated
            # expansion; embedded css allowed off-site per Engine.cs:176-183)
            assert parent_host != "cdn.test"


def test_reports_shapes(fx, crawl):
    canon = bfs.canonical_report(crawl.page_meta)
    assert {c["verdict"] for c in canon} == {"ok", "mismatch", "missing"}
    desc = bfs.description_report(crawl.page_meta)
    assert {d["verdict"] for d in desc} == {"ok", "too_short", "missing"}
    lengths = [d["length"] for d in desc]
    assert lengths == sorted(lengths, reverse=True)
    seed_hosts = {s["seed_url"].split("/")[2] for s in fx["seeds"]}
    web = {r["url"]: r for r in fx["web"]}
    sm = bfs.sitemap_report(fx["sitemaps"], crawl.results, web, seed_hosts)
    assert {s["verdict"] for s in sm} == {"ok", "not_ok"}
    used = bfs.used_images_report(fx["corpus"], crawl.results)
    verdicts = {u["verdict"] for u in used}
    assert verdicts == {"not_used_in_site", "not_in_project"}
