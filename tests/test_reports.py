"""Report queries vs oracle reports + image-validation gate (SURVEY.md M4)."""

from __future__ import annotations

import math

import pytest

from linkkchecker_net_spark import reports
from linkkchecker_net_spark.engine import tables
from linkkchecker_net_spark.oracle import bfs


@pytest.fixture(scope="module")
def dfs(spark, golden_fixtures):
    fx = golden_fixtures
    return {
        "web": tables.web_df(spark, fx["web"]),
        "corpus": tables.corpus_df(spark, fx["corpus"]),
        "sitemaps": tables.sitemaps_df(spark, fx["sitemaps"]),
    }


def test_canonical_report(golden_spark_crawl, golden_oracle_crawl):
    got = {
        (r["url"], r["verdict"])
        for r in reports.canonical_report(golden_spark_crawl.page_meta()).collect()
    }
    want = {(r["url"], r["verdict"]) for r in bfs.canonical_report(golden_oracle_crawl.page_meta)}
    assert got == want


def test_description_report(golden_spark_crawl, golden_oracle_crawl):
    got = [
        (r["url"], r["length"], r["verdict"])
        for r in reports.description_report(golden_spark_crawl.page_meta()).collect()
    ]
    want = [
        (r["url"], r["length"], r["verdict"])
        for r in bfs.description_report(golden_oracle_crawl.page_meta)
    ]
    assert got == want  # including the O1 sort order


def test_sitemap_report(spark, golden_spark_crawl, golden_oracle_crawl, golden_fixtures, dfs):
    fx = golden_fixtures
    seed_hosts = sorted({s["seed_url"].split("/")[2] for s in fx["seeds"]})
    got = [
        (r["loc"], r["verdict"])
        for r in reports.sitemap_report(
            dfs["sitemaps"], golden_spark_crawl.results(), dfs["web"], seed_hosts
        ).collect()
    ]
    want = [
        (r["loc"], r["verdict"])
        for r in bfs.sitemap_report(
            fx["sitemaps"],
            golden_oracle_crawl.results,
            {r["url"]: r for r in fx["web"]},
            set(seed_hosts),
        )
    ]
    assert got == want


def test_used_images_report(golden_spark_crawl, golden_oracle_crawl, golden_fixtures, dfs):
    got = {
        (r["image_id"], r["verdict"])
        for r in reports.used_images_report(
            dfs["corpus"], golden_spark_crawl.results()
        ).collect()
    }
    want = {
        (r["image_id"], r["verdict"])
        for r in bfs.used_images_report(golden_fixtures["corpus"], golden_oracle_crawl.results)
    }
    assert got == want


def test_image_validation_gate(golden_spark_crawl, dfs):
    """North-rule per-row invariant: every fetched corpus image passes
    PSNR>=40dB + caption equality; lossy rows have finite PSNR (real
    reconstruction error), lossless rows are exact."""
    rows = reports.validate_images(
        golden_spark_crawl.results(), dfs["web"], dfs["corpus"]
    ).collect()
    assert rows, "some corpus images must be fetched by the golden crawl"
    assert all(r["valid"] for r in rows), [r for r in rows if not r["valid"]][:3]
    assert all(r["caption_ok"] for r in rows)
    assert all(r["phash_dist"] <= 4 for r in rows)
    lossy = [r for r in rows if r["fmt"] == "jpeg"]
    lossless = [r for r in rows if r["fmt"] != "jpeg"]
    assert lossy and lossless
    assert all(40.0 <= r["psnr"] and math.isfinite(r["psnr"]) for r in lossy)
    assert all(math.isinf(r["psnr"]) for r in lossless)


def test_failure_count(golden_spark_crawl, golden_oracle_crawl):
    got = reports.failure_count(golden_spark_crawl.results())
    want = sum(1 for r in golden_oracle_crawl.results if r["classification"] != "ok")
    assert got == want


def test_used_images_path_report_branches(spark):
    """UsedImagesChecker branch fidelity (UsedImagesChecker.cs:91-121):
    early exit when every project file is used; case_only_* verdicts when
    the case-insensitive difference is empty but the case-sensitive one
    is not; SitesToScan / prefix / extension filters."""
    from linkkchecker_net_spark.reports import used_images_path_report

    def df_paths(paths):
        return spark.createDataFrame([(p,) for p in paths], "path string")

    def df_results(rows):
        return spark.createDataFrame(
            rows, "url string, host string, content_type string"
        )

    site = df_results(
        [
            ("http://cdn.test/Assets/a.png", "cdn.test", "image/png"),
            ("http://cdn.test/Assets/B.PNG", "cdn.test", "IMAGE/PNG"),  # ct case
            ("http://cdn.test/Other/c.png", "cdn.test", "image/png"),  # prefix
            ("http://evil.test/Assets/d.png", "evil.test", "image/png"),  # host
            ("http://cdn.test/Assets/page.html", "cdn.test", "text/html"),  # mime
        ]
    )

    # 1. every disk file used (case-sensitively) -> report is EMPTY even
    #    though the site has files the project lacks (:91 early exit)
    out = used_images_path_report(
        df_paths(["/a.png"]), site, ["cdn.test"], "Assets"
    )
    assert out.count() == 0

    # 2. case-only mismatch: disk has /b.png, site serves /B.PNG -> the ci
    #    difference is empty on the not-in-project side, cs is not
    out = used_images_path_report(
        df_paths(["/a.png", "/b.png", "/unused.gif", "/readme.txt"]),
        site,
        ["cdn.test"],
        "Assets",
    )
    rows = {(r["verdict"], r["path"]) for r in out.collect()}
    assert ("case_only_not_in_project", "/B.PNG") in rows
    assert ("not_used_in_site", "/unused.gif") in rows
    # ci not-used list is lowercased and excludes the case-matched b
    assert not any(p == "/b.png" for v, p in rows if v == "not_used_in_site")
    # extension filter: .txt never appears
    assert not any("readme" in p for _v, p in rows)
    # host/prefix/mime-filtered site rows never appear
    assert not any("c.png" in p or "d.png" in p or "page" in p for _v, p in rows)


def test_crawl_diff_all_change_classes(spark):
    from linkkchecker_net_spark.reports.reports import crawl_diff

    schema = "url string, status int, classification string"
    old = spark.createDataFrame(
        [
            ("u1", 200, "ok"),        # unchanged
            ("u2", 200, "ok"),        # status change (200 -> 301)
            ("u3", None, "error"),    # status change (NULL -> 404): null-safe
            ("u4", 404, "broken"),    # removed
            ("u5", 301, "redirect"),  # class change, same status
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            ("u1", 200, "ok"),
            ("u2", 301, "redirect"),
            ("u3", 404, "broken"),
            ("u5", 301, "ok"),
            ("u6", 200, "ok"),        # added
        ],
        schema,
    )
    out = {r["url"]: r["change"] for r in crawl_diff(old, new).collect()}
    assert out == {
        "u1": "unchanged",
        "u2": "status_changed",
        "u3": "status_changed",
        "u4": "removed",
        "u5": "class_changed",
        "u6": "added",
    }


def test_mixed_content_families_and_upgrade(spark):
    from linkkchecker_net_spark.reports.security import mixed_content_audit

    pages = spark.createDataFrame(
        [
            (
                "https://a/p1",
                '<img src="http://x/i.jpg"><img src="http://x/i.jpg">'
                '<script src="http://x/s.js"></script>'
                '<img src="https://safe/i.png">'
                '<iframe src="http://a/p2"></iframe>',
            ),
            ("https://a/p2", "<p>clean</p>"),
            ("http://b/p3", '<link href="http://x/c.css">'),
        ],
        "url string, body string",
    )
    rows = {r.url: r for r in mixed_content_audit(pages).collect()}
    r1 = rows["https://a/p1"]
    # duplicate refs both counted; https refs never counted
    assert (r1.passive_http, r1.active_http, r1.mixed) == (2, 2, True)
    # the iframe ref http://a/p2 has https twin page p2 -> upgradable
    assert r1.upgradable == 1
    assert rows["https://a/p2"].mixed is False
    r3 = rows["http://b/p3"]
    # http page: counted but never "mixed"
    assert (r3.active_http, r3.mixed, r3.upgradable) == (1, False, 0)


# ------------------------------------------------------------------ reports/seo
def test_title_audit_precedence_and_collapse(spark):
    from linkkchecker_net_spark.reports.seo import title_audit

    pages = spark.createDataFrame(
        [
            ("u1", "h", "<title>\n  Same   Name </title>"),
            ("u2", "h", "<title>Same Name</title>"),
            # same title, DIFFERENT host: not a duplicate
            ("u3", "g", "<title>Same Name</title>"),
            ("u4", "h", "<body>no title</body>"),
            ("u5", "h", "<title>   </title>"),  # whitespace-only = missing
            ("u6", "h", "<title>First</title><title>Second</title>"),
        ],
        "url string, host string, body string",
    )
    got = {r["url"]: (r["title"], r["verdict"]) for r in title_audit(pages).collect()}
    assert got["u1"] == ("Same Name", "duplicate")
    assert got["u2"] == ("Same Name", "duplicate")
    assert got["u3"] == ("Same Name", "too_short")  # 9 chars, unique on g
    assert got["u4"] == (None, "missing")
    assert got["u5"] == (None, "missing")
    assert got["u6"] == ("First", "too_short")  # first match wins


def test_heading_audit_outline(spark):
    from linkkchecker_net_spark.reports.seo import heading_audit

    pages = spark.createDataFrame(
        [
            ("a", "<h1>x</h1><h2>y</h2><h3>z</h3>"),
            ("b", "<h1>x</h1><h5>y</h5>"),
            ("c", "<h3>x</h3><h1>y</h1>"),  # upward move is not a skip
            ("d", "<p>no headings</p>"),
        ],
        "url string, body string",
    )
    got = {
        r["url"]: (r["n_headings"], r["n_h1"], r["first_level"],
                   r["max_jump"], r["verdict"])
        for r in heading_audit(pages).collect()
    }
    assert got == {
        "a": (3, 1, 1, 1, "ok"),
        "b": (2, 1, 1, 4, "skip"),
        "c": (2, 1, 3, 0, "ok"),
        "d": (0, 0, None, 0, "no_headings"),
    }


def test_alt_audit_decorative_and_decoy(spark):
    from linkkchecker_net_spark.reports.seo import alt_audit

    pages = spark.createDataFrame(
        [
            ("a", '<img src="1" alt="cat"><img src="2" alt=""><img src="3">'),
            ("b", '<image alt="decoy"><p>none</p>'),
        ],
        "url string, body string",
    )
    got = {r["url"]: tuple(r)[1:] for r in alt_audit(pages).collect()}
    # a: 3 imgs, 1 real alt, 1 decorative -> covered 2/3
    assert got["a"] == (3, 1, 1, 666_666, "partial")
    assert got["b"] == (0, 0, 0, None, "no_images")


def test_social_meta_first_wins_and_empty_content(spark):
    from linkkchecker_net_spark.reports.seo import social_meta_audit

    pages = spark.createDataFrame(
        [
            ("a", '<meta property="og:title" content="T1">'
                  '<meta property="og:title" content="T2">'
                  '<meta content="I" property="og:image">'
                  '<meta name="og:description" content="D">'),
            ("b", '<meta property="og:title" content="">'
                  '<meta property="og:title:foo" content="x">'),
            ("c", '<meta name="twitter:card" content="summary_large_image">'),
        ],
        "url string, body string",
    )
    got = {r["url"]: (r["og_title"], r["og_image"], r["og_description"],
                      r["twitter_card"], r["verdict"])
           for r in social_meta_audit(pages).collect()}
    assert got["a"] == ("T1", "I", "D", None, "full")
    assert got["b"] == (None, None, None, None, "none")
    assert got["c"] == (None, None, None, "summary_large_image", "none")


def test_hsts_audit_grammar(spark):
    from linkkchecker_net_spark.reports.security import hsts_audit

    rows = [
        ("a", "Strict-Transport-Security: max-age=31536000; includeSubDomains; preload"),
        ("b", "strict-transport-security: preload ;  MAX-AGE=63072000 ; IncludeSubDomains"),
        ("c", "Strict-Transport-Security: max-age=100; preload"),
        ("d", "Strict-Transport-Security: includeSubDomains; preload"),  # no max-age
        ("e", "X-Other: 1"),
    ]
    pages = spark.createDataFrame(rows, "url string, headers string")
    got = {r["url"]: (r["has_hsts"], r["max_age"], r["include_subdomains"],
                      r["preload"], r["preload_eligible"])
           for r in hsts_audit(pages).collect()}
    assert got["a"] == (True, 31536000, True, True, True)
    assert got["b"] == (True, 63072000, True, True, True)
    assert got["c"] == (True, 100, False, True, False)
    assert got["d"] == (True, None, True, True, False)
    assert got["e"] == (False, None, None, None, False)


def test_canonical_consistency_verdicts(spark):
    from linkkchecker_net_spark.reports.seo import canonical_consistency

    pages = spark.createDataFrame(
        [
            ("a", '<link rel="canonical" href=" http://x/1 ">'
                  '<meta property="og:url" content="http://x/1">'),
            ("b", '<link REL="canonical" href="http://x/1">'
                  '<meta property="og:url" content="http://x/2">'),
            ("c", '<link rel="stylesheet" href="/s.css">'),
            ("d", '<meta name="og:url" content="http://x/3">'),
        ],
        "url string, body string",
    )
    got = {r["url"]: (r["canonical_href"], r["og_url"], r["verdict"])
           for r in canonical_consistency(pages).collect()}
    assert got == {
        "a": ("http://x/1", "http://x/1", "match"),
        "b": ("http://x/1", "http://x/2", "mismatch"),
        "c": (None, None, "both_missing"),
        "d": (None, "http://x/3", "og_only"),
    }


def test_outlink_stats_buckets(spark):
    from linkkchecker_net_spark.reports.seo import outlink_stats

    pages = spark.createDataFrame(
        [
            ("u1", "h.test",
             '<a href="/in"><a href="http://H.TEST/abs">'
             '<a href="http://ext.org/x" rel="ugc NOFOLLOW">'
             '<a href="mailto:a@b"><a name="skip">'),
            ("u2", "h.test", "<p>no links</p>"),
        ],
        "url string, host string, body string",
    )
    got = {r["url"]: (r["n_links"], r["n_internal"], r["n_external"],
                      r["n_nofollow"], r["external_ppm"])
           for r in outlink_stats(pages).collect()}
    assert got == {
        "u1": (4, 2, 1, 1, 333_333),
        "u2": (0, 0, 0, 0, None),
    }


def test_amp_audit_grammar_and_pairing(spark):
    from linkkchecker_net_spark.reports.seo import amp_audit

    pages = [
        # canonical page paired with a real AMP twin
        ("http://s.test/a",
         '<html><head><link rel="amphtml" href="http://s.test/a.amp">'
         "</head>"),
        ("http://s.test/a.amp",
         '<html ⚡ lang="en"><head>'
         '<link rel="canonical" href="http://s.test/a"></head>'),
        # amp-custom / ampx attributes must NOT read as AMP
        ("http://s.test/b",
         '<html amp-custom><head><link rel="amphtml" '
         'href="http://s.test/b.amp"></head>'),
        ("http://s.test/b.amp", "<html ampx><head></head>"),
        # bare word form + orphan (no backlink)
        ("http://s.test/c.amp", "<html amp><head></head>"),
        # amphtml link to a page never fetched
        ("http://s.test/d",
         '<html><head><link rel="amphtml" href="http://s.test/gone">'
         "</head>"),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in amp_audit(df).collect()}
    assert out["http://s.test/a"]["verdict"] == "paired"
    assert out["http://s.test/a.amp"]["verdict"] == "amp_with_canonical"
    assert out["http://s.test/b"]["is_amp"] is False  # amp-custom != amp
    assert out["http://s.test/b.amp"]["is_amp"] is False  # ampx != amp
    assert out["http://s.test/b"]["verdict"] == "amp_not_amp"
    assert out["http://s.test/c.amp"]["verdict"] == "amp_orphan"
    assert out["http://s.test/d"]["verdict"] == "amp_missing"


def test_microdata_stats_grammar(spark):
    from linkkchecker_net_spark.kernels.microdata import microdata_stats

    pages = [
        # decoy attr + one scope whose itemtype holds two tokens
        ("u1",
         '<div itemscopes x="1"></div>'
         '<div itemscope itemtype=" https://schema.org/Recipe extra ">'
         '<i itemprop="name">a</i><i itemprop="name">b</i></div>'),
        ("u2", "<p>no microdata</p>"),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in microdata_stats(df).collect()}
    assert out["u1"]["n_itemscope"] == 1
    assert out["u1"]["first_itemtype"] == "https://schema.org/Recipe"
    assert out["u1"]["n_itemprop"] == 2 and out["u1"]["n_distinct_props"] == 1
    assert out["u1"]["has_schema_org"] is True
    assert out["u2"]["n_itemscope"] == 0
    assert out["u2"]["first_itemtype"] is None


def test_script_mix_confusables(spark):
    from linkkchecker_net_spark.pipeline.text import script_mix

    rows = [
        (0, "plain ascii words"),
        (1, "pаypal login"),          # Cyrillic U+0430 inside a Latin token
        (2, "привет мир"),
        (3, "1234 !!"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_mix(docs).collect()}
    assert out[0]["confusable"] is False and out[0]["dominant_script"] == "latin"
    assert out[1]["mixed_tokens"] == 1 and out[1]["confusable"] is True
    assert out[2]["dominant_script"] == "cyrillic" and out[2]["n_latin"] == 0
    assert out[3]["dominant_script"] == "none"


def test_render_blocking_head_scope(spark):
    from linkkchecker_net_spark.reports.perf import render_blocking_audit

    pages = [
        ("u1",
         '<html><head><script src="/a.js"></script>'
         '<script src="/b.js" defer></script>'
         '<script>inline()</script>'
         '<link rel="stylesheet" href="/s.css">'
         '</head><body><script src="/late.js"></script></body>'),
        ("u2", "<html><head></head><body></body>"),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in render_blocking_audit(df).collect()}
    assert out["u1"]["n_head_scripts"] == 2       # inline + body excluded
    assert out["u1"]["n_blocking_scripts"] == 1   # defer escapes
    assert out["u1"]["n_blocking_styles"] == 1
    assert out["u2"]["render_blocking"] is False


def test_preconnect_audit_sets(spark):
    from linkkchecker_net_spark.reports.perf import preconnect_audit

    pages = [
        ("u1",
         '<link rel="preconnect" href="https://cdn.test/">'
         '<link rel="preconnect" href="https://unused.test">'
         '<script src="https://cdn.test/app.js"></script>'
         '<img src="HTTPS://Img.Test/x.png"><img src="/rel.png">'),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    r = preconnect_audit(df).collect()[0]
    assert r["n_preconnect"] == 2
    assert r["n_third_party_origins"] == 2        # cdn + img (lowercased)
    assert r["n_preconnect_used"] == 1            # cdn matched despite '/'
    assert r["n_preconnect_unused"] == 1
    assert r["n_unconnected_origins"] == 1        # img.test undeclared


def test_tech_fingerprint_orders_and_fallbacks(spark):
    from linkkchecker_net_spark.reports.seo import tech_fingerprint

    pages = [
        ("u1", '<meta name="generator" content="WordPress 6.4.2">'),
        ("u2", '<meta content="Drupal 10.1" name="generator">'),
        ("u3", '<link href="/wp-content/x.css">'),  # fingerprint only
        ("u4", '<meta name="generator" content="Hugo 0.121.0">'),
        ("u5", "<p>nothing</p>"),
        # r4 ADVICE: \b held between '-' and 'n', so data-name="generator"
        # mis-fingerprinted; the anchored grammar must ignore the decoy
        ("u6", '<meta data-name="generator" content="Decoy 9.9">'),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in tech_fingerprint(df).collect()}
    assert out["u1"]["platform"] == "wordpress"
    assert out["u1"]["version"] == "6.4.2"
    assert out["u2"]["platform"] == "drupal"      # reversed attr order
    assert out["u3"]["platform"] == "wordpress" and out["u3"]["generator"] is None
    assert out["u4"]["platform"] == "hugo" and out["u4"]["version"] == "0.121.0"
    assert out["u5"]["platform"] == "unknown"
    assert out["u6"]["platform"] == "unknown" and out["u6"]["generator"] is None


def test_price_extract_cents(spark):
    from linkkchecker_net_spark.reports.seo import price_extract

    pages = [
        ("u1", "now $19.99 was €25 or £3.50, not 100.00 nor $x"),
        ("u2", "free!"),
        ("u3", "sale $1,299.00 from $12,500 (was $1,299,950.75)"),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in price_extract(df).collect()}
    assert out["u1"]["n_prices"] == 3
    assert out["u1"]["min_cents"] == 350 and out["u1"]["max_cents"] == 2500
    assert out["u2"]["n_prices"] == 0 and out["u2"]["min_cents"] is None
    # r4 ADVICE: comma-grouped thousands parse whole, not as '$1' → 100
    assert out["u3"]["n_prices"] == 3
    assert out["u3"]["min_cents"] == 129_900
    assert out["u3"]["max_cents"] == 129_995_075


def test_idn_audit_verdict_ladder(spark):
    """mixed_script dominates punycode dominates plain unicode; the
    Cyrillic-a paypal spoof and a Greek-alpha tail both count as mixed;
    café is single-script non-ascii (unicode, NOT mixed)."""
    from linkkchecker_net_spark.reports.security import idn_audit

    rows = [
        ("example.test",),
        ("xn--e1-abc.sub.test",),
        ("pаypal.test",),      # Cyrillic U+0430 inside Latin label
        ("café.test",),        # single-script Latin + accent
        ("alphα.test",),       # Latin + Greek alpha
        ("xn--x.pаy.test",),   # punycode AND mixed -> mixed wins
    ]
    hosts = spark.createDataFrame(rows, "host string")
    out = {r["host"]: r for r in idn_audit(hosts).collect()}
    assert out["example.test"]["verdict"] == "ascii"
    assert out["example.test"]["n_labels"] == 2
    assert out["xn--e1-abc.sub.test"]["verdict"] == "punycode"
    assert out["xn--e1-abc.sub.test"]["n_puny"] == 1
    assert out["pаypal.test"]["verdict"] == "mixed_script"
    assert out["pаypal.test"]["n_mixed"] == 1
    assert out["café.test"]["verdict"] == "unicode"
    assert out["café.test"]["n_mixed"] == 0
    assert out["alphα.test"]["verdict"] == "mixed_script"
    assert out["xn--x.pаy.test"]["verdict"] == "mixed_script"
    assert out["xn--x.pаy.test"]["n_puny"] == 1


def test_viewport_audit_arms(spark):
    from linkkchecker_net_spark.reports.seo import viewport_audit

    pages = [
        ("u1", '<meta name="viewport" content="width=device-width, initial-scale=1">'),
        ("u2", '<meta name="viewport" content="width=device-width, user-scalable=no">'),
        ("u3", '<meta name="viewport" content="width=980">'),
        ("u4", '<meta content="width=device-width" name="viewport">'),
        ("u5", '<meta name="viewporty" content="width=device-width">'),
        ("u6", '<meta name="viewport" content="width=device-width, maximum-scale=1.0">'),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in viewport_audit(df).collect()}
    assert out["u1"]["verdict"] == "ok" and out["u1"]["device_width"]
    assert out["u2"]["verdict"] == "no_zoom"
    assert out["u3"]["verdict"] == "fixed_width" and out["u3"]["fixed_width"]
    assert out["u4"]["verdict"] == "ok"  # reversed attribute order
    assert out["u5"]["verdict"] == "missing"  # viewporty decoy
    assert out["u6"]["verdict"] == "no_zoom"  # maximum-scale=1 blocks zoom


def test_bidi_audit_trojan_source(spark):
    from linkkchecker_net_spark.reports.security import bidi_audit

    rows = [
        (0, "plain ascii"),
        (1, "a ‮evil‬ b"),       # balanced RLO..PDF
        (2, "x ‮unclosed"),            # opener, no closer
        (3, "iso ⁦in⁩ done"),     # balanced LRI..PDI
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bidi_audit(docs).collect()}
    assert out[0]["verdict"] == "clean" and not out[0]["has_bidi"]
    assert out[1]["verdict"] == "bidi_present"
    assert out[1]["n_openers"] == 1 and out[1]["n_closers"] == 1
    assert out[2]["verdict"] == "unbalanced" and out[2]["unbalanced"]
    assert out[3]["verdict"] == "bidi_present"


def test_host_language_profile_dominant_and_ties(spark):
    from linkkchecker_net_spark.pipeline.reputation import (
        host_language_profile,
    )

    rows = [
        ("h1", "en"), ("h1", "en"), ("h1", "de"),
        ("h2", "de"), ("h2", "fr"),          # tie -> lexicographic de
        ("h3", "zh"),
    ]
    pages = spark.createDataFrame(rows, "host string, lang string")
    out = {r["host"]: r for r in host_language_profile(pages).collect()}
    h1 = out["h1"]
    assert h1["dominant_lang"] == "en" and h1["dominant_ppm"] == 666_666
    assert h1["n_pages"] == 3 and h1["n_langs"] == 2
    assert out["h2"]["dominant_lang"] == "de"  # tie broken by lang asc
    assert out["h3"]["dominant_ppm"] == 1_000_000


def test_consent_banner_vendor_ladder(spark):
    from linkkchecker_net_spark.reports.seo import consent_banner

    pages = [
        ("u1", '<script src="https://cdn.cookielaw.org/a.js"></script>'
               "We use cookies and our Cookie Policy applies."),
        ("u2", "Click to manage consent or accept all cookies."),
        ("u3", "Recipes with cookies and milk."),
        ("u4", '<script src="https://consent.cookiebot.com/u.js"></script>'
               '<script src="https://cdn.cookielaw.org/x.js"></script>'),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in consent_banner(df).collect()}
    u1 = out["u1"]
    assert u1["cmp_vendor"] == "onetrust" and u1["n_consent_phrases"] == 2
    assert out["u2"]["n_consent_phrases"] == 2 and out["u2"]["has_banner"]
    assert out["u2"]["cmp_vendor"] is None
    assert out["u3"]["has_banner"] is False
    assert out["u4"]["cmp_vendor"] == "onetrust"  # ladder order wins


def test_paywall_detect_signals(spark):
    from linkkchecker_net_spark.reports.seo import paywall_detect

    pages = [
        ("u1", "You have 2 remaining free articles this month."),
        ("u2", '<script src="https://experience.piano.io/xbuilder"></script>'),
        ("u3", '{"isAccessibleForFree": "False"}'),
        ("u4", '{"isAccessibleForFree": true}'),
        ("u5", "an ordinary article about subscriptions pricing"),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in paywall_detect(df).collect()}
    assert out["u1"]["n_phrases"] == 1 and out["u1"]["paywalled"]
    assert out["u2"]["vendor_hit"] and out["u2"]["paywalled"]
    assert out["u3"]["declared_paid"] is True
    assert out["u4"]["declared_paid"] is False and not out["u4"]["paywalled"]
    assert out["u5"]["paywalled"] is False


def test_canonical_chains_hops_and_loop(spark):
    from linkkchecker_net_spark.reports.seo import canonical_chains

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"),            # chain a->b->c (c terminal)
         ("p", "q"),                        # single hop
         ("l1", "l2"), ("l2", "l1")],       # loop
        "src string, dst string",
    )
    out = {r["url"]: r for r in canonical_chains(edges).collect()}
    assert out["a"]["final_url"] == "c" and out["a"]["hops"] == 2
    assert out["a"]["chain_problem"] is True
    assert out["b"]["hops"] == 1 and out["b"]["chain_problem"] is False
    assert out["p"]["chain_problem"] is False
    assert out["l1"]["terminal"] == "loop" and out["l1"]["chain_problem"]
    assert out["l1"]["final_url"] is None


def test_hotlink_audit_same_site_vs_offsite(spark):
    """cdn.example.com serving www.example.com is same-site (shared
    eTLD+1); imgur.com is offsite; schemeless/empty refs are dropped;
    the ppm is an integer floor."""
    from linkkchecker_net_spark.reports.seo import hotlink_audit

    rows = [
        ("http://www.example.com/a", "http://cdn.example.com/1.jpg"),
        ("http://www.example.com/a", "http://imgur.com/2.jpg"),
        ("http://www.example.com/b", "http://i.imgur.com/3.jpg"),
        ("http://www.example.com/b", "data:image/png;base64,xx"),
        ("http://other.test/p", "http://other.test/i.png"),
    ]
    df = spark.createDataFrame(rows, "page_url string, img_url string")
    out = {r["page_host"]: r for r in hotlink_audit(df).collect()}
    ex = out["www.example.com"]
    assert ex["n_imgs"] == 3 and ex["n_offsite"] == 2
    assert ex["offsite_ppm"] == 2 * 1_000_000 // 3
    assert ex["n_img_hosts"] == 3
    ot = out["other.test"]
    assert ot["n_offsite"] == 0 and ot["offsite_ppm"] == 0


def test_favicon_clusters_shared_vs_unique(spark):
    """Hosts sharing a digest cluster together; a unique digest is a
    singleton; duplicate (host, digest) rows collapse."""
    from linkkchecker_net_spark.reports.favicon import favicon_clusters

    rows = [
        ("a.test", "d1"), ("b.test", "d1"), ("c.test", "d1"),
        ("d.test", "d2"), ("d.test", "d2"), ("e.test", "d3"),
    ]
    df = spark.createDataFrame(rows, "host string, icon_digest string")
    out = {r["host"]: r for r in favicon_clusters(df).collect()}
    assert len(out) == 5
    assert out["a.test"]["cluster_size"] == 3 and out["a.test"]["is_shared"]
    assert out["d.test"]["cluster_size"] == 1
    assert out["d.test"]["is_shared"] is False
