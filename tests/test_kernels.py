"""Kernel unit tests (SURVEY.md §5.1) — golden cases derived from the
reference's semantics, cited per case."""

from __future__ import annotations

import pytest

from linkkchecker_net_spark.kernels.canonicalize import canonicalize, host_of
from linkkchecker_net_spark.kernels.cssparse import extract_css_urls
from linkkchecker_net_spark.kernels.htmlparse import parse_page
from linkkchecker_net_spark.oracle.bfs import canonical_segments_match, classify

BASE = "http://site-a.test/dir/page.html"


# P1 — UriExtensions.GetDerivedUri (/root/reference/SpiderEngine/UriExtensions.cs:12-24)
@pytest.mark.parametrize(
    "base,href,expected",
    [
        # relative resolution (new Uri(baseUrl, relativeUrl))
        (BASE, "other.html", "http://site-a.test/dir/other.html"),
        (BASE, "/abs/path", "http://site-a.test/abs/path"),
        (BASE, "../up.html", "http://site-a.test/up.html"),
        (BASE, "./same.html", "http://site-a.test/dir/same.html"),
        # absolute when (lowercased) string starts with "http"
        (BASE, "http://other.test/x", "http://other.test/x"),
        (BASE, "HTTPS://Other.TEST/Path", "https://other.test/Path"),
        # fragment stripped from the LAST '#' (UriExtensions.cs:18-22)
        (BASE, "page.html#frag", "http://site-a.test/dir/page.html"),
        (BASE, "page.html#a#b", "http://site-a.test/dir/page.html#a"),
        (BASE, "#top", "http://site-a.test/dir/page.html"),
        # HTML entity decode happens BEFORE fragment strip (UriExtensions.cs:16)
        (BASE, "page&#47;x.html", "http://site-a.test/dir/page/x.html"),
        (BASE, "q?a=1&amp;b=2", "http://site-a.test/dir/q?a=1&b=2"),
        # .NET Uri normalization: scheme/host lowercase, default port strip,
        # empty path → "/", dot-segment resolution
        ("http://site-a.test/", "HTTP://SITE-A.TEST:80", "http://site-a.test/"),
        ("http://site-a.test/", "http://site-a.test:8080/x", "http://site-a.test:8080/x"),
        ("http://site-a.test/", "http://h.test/a/../b", "http://h.test/b"),
        # non-http schemes preserved verbatim for the unsupported branch
        (BASE, "mailto:x@y.test", "mailto:x@y.test"),
        (BASE, "ftp://files.test/pub", "ftp://files.test/pub"),
        # garbage → dropped (unobserved-task-exception analog)
        (BASE, "", None),
        (BASE, None, None),
        (None, "relative/only", None),
        # query preserved, fragment-after-query stripped
        (BASE, "p?x=1#y", "http://site-a.test/dir/p?x=1"),
    ],
)
def test_canonicalize(base, href, expected):
    assert canonicalize(base, href) == expected


def test_canonicalize_http_prefix_quirk():
    # faithful reference quirk: the absolute test is a raw "http" string
    # prefix (UriExtensions.cs:14), so a relative path starting with
    # "http" is treated as absolute and fails to parse → dropped
    assert canonicalize(BASE, "httpdocs/readme.html") is None


def test_host_of():
    assert host_of("http://Site-A.test:8080/x") == "site-a.test"
    assert host_of("mailto:x@y.test") is None
    assert host_of(None) is None


# P8/P9 — Engine.cs:42-49 tag map, 324-326 GET/HEAD split; CanonicalChecker.cs:38-42;
# DescriptionLengthChecker.cs:41-44; Engine.cs:280-289 embedded css
HTML = b"""
<html><head>
<link rel="canonical" href="http://site-a.test/canon"/>
<meta name="description" content="hello world description"/>
<link rel="stylesheet" href="/css/main.css"/>
<link rel="icon" href="/favicon.ico"/>
<style>.a { background-image: url('/img/a.png'); }</style>
</head><body>
<a href="/p1">one</a>
<a href="/p2#frag">two</a>
<script src="/js/app.js"></script>
<img src="/img/b.png" alt="b"/>
<a href="mailto:x@y.test">mail</a>
</body></html>
"""


def test_parse_page_links():
    parsed = parse_page(HTML)
    links = parsed["links"]
    by_tag = {}
    for ln in links:
        by_tag.setdefault(ln["tag"], []).append(ln)
    assert [ln["href"] for ln in by_tag["a"]] == ["/p1", "/p2#frag", "mailto:x@y.test"]
    assert [ln["href"] for ln in by_tag["script"]] == ["/js/app.js"]
    # ALL <link> tags are candidates (canonical, stylesheet, icon)
    assert [ln["href"] for ln in by_tag["link"]] == [
        "http://site-a.test/canon",
        "/css/main.css",
        "/favicon.ico",
    ]
    assert [ln["href"] for ln in by_tag["img"]] == ["/img/b.png"]
    # GET/HEAD split: <a> and <link rel=stylesheet> may contain links
    assert all(ln["may_contain_links"] for ln in by_tag["a"])
    may_by_href = {ln["href"]: ln["may_contain_links"] for ln in by_tag["link"]}
    assert may_by_href == {
        "http://site-a.test/canon": False,
        "/css/main.css": True,
        "/favicon.ico": False,
    }
    assert not by_tag["script"][0]["may_contain_links"]
    assert not by_tag["img"][0]["may_contain_links"]
    # tag iteration order a<script<link<img (Engine.cs:42-49)
    assert [ln["tag_rank"] for ln in by_tag["a"]] == [0, 0, 0]
    assert by_tag["script"][0]["tag_rank"] == 1
    assert by_tag["link"][0]["tag_rank"] == 2
    assert by_tag["img"][0]["tag_rank"] == 3
    # per-tag document position
    assert [ln["doc_pos"] for ln in by_tag["a"]] == [0, 1, 2]


def test_parse_page_meta():
    parsed = parse_page(HTML)
    assert parsed["canonical_href"] == "http://site-a.test/canon"
    assert parsed["meta_description"] == "hello world description"
    assert parsed["embedded_css"] == [".a { background-image: url('/img/a.png'); }"]


def test_parse_page_garbage():
    assert parse_page(None)["links"] == []
    assert parse_page(b"\x00\xff not html <a href=")["canonical_href"] is None


# P10 — CssChecker.cs:17 regex; 38-87
def test_extract_css_urls():
    css = """
    .x { background-image: url('/img/a.png'); }
    .y { background-image: url(/img/b.png); }
    .z { background: url("/img/c.png") no-repeat; }
    @font-face { font-family: F; src: url('/fonts/r.ttf') format('truetype'),
                 url('/fonts/r.woff') format('woff'); }
    """
    assert extract_css_urls(css) == [
        "/img/a.png",
        "/img/b.png",
        "/img/c.png",
        "/fonts/r.ttf",
        "/fonts/r.woff",
    ]
    # intended semantics: single-url @font-face IS extracted (the reference
    # skips it — the >1 quirk at CssChecker.cs:49 — documented divergence)
    assert extract_css_urls("@font-face { src: url('/fonts/solo.ttf'); }") == [
        "/fonts/solo.ttf"
    ]
    assert extract_css_urls(None) == []


# P11 — StatusCodeExtension.cs:7-11, Engine.cs:168-201,263-273
@pytest.mark.parametrize(
    "status,error,unsupported,expected",
    [
        (200, None, False, "ok"),
        (299, None, False, "ok"),
        (199, None, False, "broken"),
        (300, None, False, "broken"),
        (301, None, False, "redirect"),
        (302, None, False, "redirect"),
        (303, None, False, "redirect"),
        (307, None, False, "redirect"),
        (308, None, False, "broken"),
        (404, None, False, "broken"),
        (500, None, False, "broken"),
        (None, "boom", False, "error"),
        (None, None, True, "unsupported"),
        (None, None, False, "broken"),
    ],
)
def test_classify(status, error, unsupported, expected):
    assert classify(status, error, unsupported) == expected


# P7 — CanonicalChecker.cs:46-62 segment compare
@pytest.mark.parametrize(
    "url,href,expected",
    [
        ("http://a.test/p/q", "http://a.test/p/q", True),
        ("http://a.test/p/q", "http://a.test/P/Q", True),  # case-insensitive
        ("http://a.test/p%20x", "http://a.test/p x", True),  # unescaped compare
        ("http://a.test/p/q", "http://OTHER.test/p/q", True),  # authority ignored!
        ("http://a.test/p/q", "http://a.test/p/q/", False),  # "q" vs "q/"
        ("http://a.test/p/q", "http://a.test/p/r", False),
        ("http://a.test/p/", "http://a.test/p", False),  # trailing slash differs
    ],
)
def test_canonical_segments_match(url, href, expected):
    assert canonical_segments_match(url, href) == expected


def test_fast_parser_equivalence():
    """The compiled-regex scanner is byte-equivalent to the stdlib
    html.parser reference implementation over every fixture body plus an
    adversarial battery (comments, CDATA, self-closing, entities,
    unquoted/duplicate/valueless attributes)."""
    from linkkchecker_net_spark.fixtures import webgen
    from linkkchecker_net_spark.kernels.htmlparse import (
        parse_page,
        parse_page_htmlparser,
    )

    fx = webgen.make_fixtures("golden", seed=42)
    for row in fx["web"]:
        body = row.get("body")
        assert parse_page(body) == parse_page_htmlparser(body), row.get("url")
    cases = [
        None, b"", "<html>",
        '<a href="x&amp;y">t</a>', '<a href="q" />', '<a id="z" href="h">',
        "<A HREF='u1'><SCRIPT SRC=\"s1\"></script><img src=i><link rel=\"stylesheet\" href=\"c\">",
        '<script>var a = "<a href=\'fake\'>";</script><a href=real>',
        '<!-- <a href="commented"> --><a href="after">',
        '<style>.x{background:url("b.png")}</style><style>second</style>',
        '<link rel="canonical" href="c1"/><link rel="canonical" href="c2">',
        '<meta name="description" content="d1"><meta name="description" content="d2">',
        '<a href=unquoted/end>', '<script defer/><a href="visible">',
        '<script src=http://x/><a href="hidden"></script><a href="shown">',
        '<a href>', '<a href="">', '<style>unterminated',
        '<a href="A&#65;">', '<img src="i" src="j">', '<a\nhref="nl">',
        '<a href="has space" >', "<a href='mix\"q'>",
        # byte-mode scanner inputs: raw bytes, invalid UTF-8 inside and
        # around values (the scanner slices bytes and decodes per-value;
        # the reference decodes the whole body first — must agree)
        b'<a href="x">t</a>',
        b'<a href="\xff\xfe">bad utf8 value</a>',
        b'\xe2\x82<a href="u">truncated multibyte before tag</a>',
        b'<a href="a\xe2\x82"><img src="\xc3\xa9ok">',
        b'<style>.x{background:url("\xff.png")}</style>',
        b'<meta name="description" content="caf\xc3\xa9">',
        bytearray(b'<a href="from-bytearray">'),
    ]
    for c in cases:
        assert parse_page(c) == parse_page_htmlparser(c), repr(c)


def test_canonicalize_fast_path_equivalence():
    """The canonical-form fast paths in canonicalize() are byte-equivalent
    to the full urllib pipeline across an adversarial (base, href) grid
    plus every href the golden fixture web produces."""
    import html as _html
    from urllib.parse import urljoin

    import importlib

    from linkkchecker_net_spark.fixtures import webgen
    from linkkchecker_net_spark.kernels.canonicalize import canonicalize
    from linkkchecker_net_spark.kernels.htmlparse import parse_page

    # the kernels package re-exports the canonicalize FUNCTION, which
    # shadows the submodule as a package attribute — resolve the module
    _czmod = importlib.import_module(
        "linkkchecker_net_spark.kernels.canonicalize"
    )

    def slow(base_url, href):  # the pre-fast-path implementation, verbatim
        if href is None:
            return None
        href = href.strip()
        if not href:
            return None
        try:
            if href.lower().startswith("http"):
                url = href
            elif base_url:
                url = urljoin(base_url, href)
            else:
                return None
        except ValueError:
            return None
        url = _html.unescape(url)
        idx = url.rfind("#")
        if idx != -1:
            url = url[:idx]
        if not url:
            return None
        return _czmod._normalize(url)

    bases = [
        "http://site-0.test/page/5", "http://site-0.test/",
        "https://h.x:8080/a/b", "http://UPPER.test/p", None,
        "http://site.test/a/b/c?q=1",
    ]
    hrefs = [
        "http://site-1.test/page/7", "HTTP://SITE-1.TEST/Page", "/page/9",
        "/js/app-1.js", "mailto:u@x.test", "page/3", "./x", "../y",
        "/a/./b", "/a/../b", "http://h.test/p#frag", "http://h.test/p#a#b",
        "http://h.test:80/p", "http://h.test:8080/p", "https://h.test/p",
        "http://h.test/p?q=2", "http://h.test/p&amp;x", "//other.test/z",
        "http://h.test", "http://h.test/", "", "   ", None,
        "http://h.test/Upper/Case", "httpfoo", "ftp://f.test/x", "/",
        "/page with space", "http://h.test/a//b", "http://h.test/a/b/",
        "/trailing/", "http://h-1.test/x", "http://h.test/%7Euser",
        "/p%20q", "#frag", "?q=1", "javascript:void(0)",
        "http://h.test/.hidden", "/.well-known/x", "http://h_0.test/x",
        "/a;b", "http://h.test/a\\b",
    ]
    for b in bases:
        for h in hrefs:
            assert canonicalize(b, h) == slow(b, h), (b, h)
    fx = webgen.make_fixtures("golden", seed=42)
    for row in fx["web"]:
        base = row["url"]
        for ln in parse_page(row.get("body"))["links"]:
            assert canonicalize(base, ln["href"]) == slow(base, ln["href"])


# ----------------------------------------------------------- robots parsing


def _robots(spark, txt: str):
    from linkkchecker_net_spark.kernels.robotsparse import parse_robots

    df = spark.createDataFrame([("h.test", txt)], "host string, txt string")
    return parse_robots(df, agent="linkkchecker").collect()[0]


def test_robots_exact_beats_wildcard(spark):
    r = _robots(
        spark,
        "User-agent: *\nDisallow: /a/\nCrawl-delay: 7\n"
        "User-agent: linkkchecker\nDisallow: /b/\n",
    )
    assert r["matched"] == "exact"
    assert r["disallow"] == "/b/"
    # the wildcard group's crawl-delay does NOT leak into the exact group
    assert r["crawl_delay"] is None


def test_robots_merges_groups_at_winning_level(spark):
    r = _robots(
        spark,
        "User-agent: *\nDisallow: /x/\n"
        "User-agent: googlebot\nDisallow: /g/\n"
        "User-agent: *\nDisallow: /y/\nCrawl-delay: 2\n",
    )
    assert r["matched"] == "wildcard"
    assert r["disallow"] == "/x/|/y/"
    assert r["n_rules"] == 2
    assert r["crawl_delay"] == 2.0


def test_robots_orphan_rules_comments_case(spark):
    r = _robots(
        spark,
        "Disallow: /orphan/\n"  # before any group: ignored
        "# header comment\n"
        "USER-AGENT: LinkKChecker  # trailing comment\n"
        "DISALLOW: /p/\n"
        "Crawl-Delay: 1.5\n",
    )
    assert r["matched"] == "exact"
    assert r["disallow"] == "/p/"
    assert r["crawl_delay"] == 1.5


def test_robots_consecutive_agents_share_group(spark):
    r = _robots(
        spark,
        "User-agent: badbot\nUser-agent: linkkchecker\nDisallow: /s/\n",
    )
    assert r["matched"] == "exact" and r["disallow"] == "/s/"


def test_robots_no_match_anchored(spark):
    r = _robots(spark, "User-agent: googlebot\nDisallow: /\n")
    assert r["matched"] == "none"
    assert r["n_rules"] == 0 and r["disallow"] == ""
    assert r["crawl_delay"] is None


def test_robots_empty_corpus(spark):
    from linkkchecker_net_spark.kernels.robotsparse import parse_robots

    df = spark.createDataFrame([], "host string, txt string")
    assert parse_robots(df).count() == 0


def test_robots_table_round_trips_fixture(spark, golden_fixtures):
    """Render the golden fixture's pre-parsed robots rows as robots.txt
    text, parse them back, and require the engine-ready table to match
    field-for-field — the production swap (raw text in, same crawl out)."""
    from linkkchecker_net_spark.kernels.robotsparse import robots_table

    rows = golden_fixtures["robots"]
    txt_rows = []
    for r in rows:
        body = "User-agent: *\n"
        for p in r["disallow"]:
            body += f"Disallow: {p}\n"
        body += f"Crawl-delay: {r['crawl_delay']}\n"
        txt_rows.append((r["host"], body))
    df = spark.createDataFrame(txt_rows, "host string, txt string")
    got = {
        r["host"]: (sorted(r["disallow"]), r["crawl_delay"], r["budget"])
        for r in robots_table(df).collect()
    }
    want = {
        r["host"]: (sorted(r["disallow"]), r["crawl_delay"], None)
        for r in rows
    }
    assert got == want


def test_extract_sitemaps(spark):
    """Sitemap: directives are group-independent, case-insensitive,
    comment-stripped; malformed (multi-token) values never match."""
    from linkkchecker_net_spark.kernels.robotsparse import extract_sitemaps

    body = (
        "Sitemap: http://h/a.xml\n"
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "  sitemap: http://h/b.xml  # inside a foreign group, still counts\n"
        "SiteMap: http://h/c.xml extra junk\n"
        "Sitemap:\n"
    )
    df = spark.createDataFrame([("h", body), ("empty", "User-agent: *\n")],
                               "host string, txt string")
    rows = sorted(
        (r["host"], r["ln"], r["sitemap_url"])
        for r in extract_sitemaps(df).collect()
    )
    assert rows == [("h", 0, "http://h/a.xml"), ("h", 3, "http://h/b.xml")]


def test_normalize_query_expr_sorts_strips_and_passes_through(spark):
    from linkkchecker_net_spark.kernels.canonicalize import normalize_query_expr

    cases = [
        # (input, expected)
        ("http://h.test/p", "http://h.test/p"),  # no query
        ("http://h.test/p?b=2&a=1", "http://h.test/p?a=1&b=2"),  # sort
        (
            "http://h.test/p?utm_source=x&a=1&fbclid=z",
            "http://h.test/p?a=1",
        ),  # strip tracking
        ("http://h.test/p?utm_medium=e", "http://h.test/p"),  # all-tracking
        (
            "http://h.test/p?a=1&a=0",
            "http://h.test/p?a=0&a=1",
        ),  # duplicate keys keep both, bytewise order
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r[0] for r in df.select(normalize_query_expr("url")).collect()
    ]
    assert got == [e for _, e in cases]


def test_normalize_query_expr_is_codegen_only(spark):
    """Scale contract: the kernel is pure built-in expression work — the
    plan is a single Project (no UDF/python eval, no exchange)."""
    from linkkchecker_net_spark.kernels.canonicalize import normalize_query_expr

    df = spark.createDataFrame([("http://h.test/p?b=2&a=1",)], "url string")
    plan = (
        df.select(normalize_query_expr("url").alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Project" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert bad not in plan, plan


def test_linkpolicy_gates(spark):
    """META/header/anchor directive semantics on hand-built pages,
    including the decoy-meta and href-less-anchor traps."""
    from linkkchecker_net_spark.kernels.linkpolicy import (
        anchor_policy_expr,
        meta_robots_expr,
        x_robots_expr,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ('<meta name="robots" content="NOINDEX, nofollow">', None),
            ('<meta name="robots" content="none">', None),
            ('<meta name="keywords" content="nofollow">', "noindex"),
            ("<p>no meta</p>", None),
        ],
        "body string, hdr string",
    )
    rows = df.select(
        meta_robots_expr(F.col("body")).alias("m"),
        x_robots_expr(F.col("hdr")).alias("x"),
    ).collect()
    assert [(r.m.noindex, r.m.nofollow, r.x.noindex) for r in rows] == [
        (True, True, False),
        (True, True, False),
        (False, False, True),  # decoy meta never triggers
        (False, False, False),
    ]

    body = (
        '<a href="/a">x</a><a rel="nofollow" href="/b">y</a>'
        '<a name="top">z</a>'
    )
    anchors = (
        spark.range(1)
        .select(anchor_policy_expr(F.lit(body)).alias("a"))
        .collect()[0]["a"]
    )
    assert [(a.href, a.nofollow) for a in anchors] == [
        ("/a", False), ("/b", True),
    ]


def test_linkpolicy_is_codegen_only(spark):
    """Scale contract: all three gates are pure expressions — one Project,
    no Python eval, no exchange."""
    from linkkchecker_net_spark.kernels.linkpolicy import (
        anchor_policy_expr,
        meta_robots_expr,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("<p>x</p>",)], "body string")
    plan = (
        df.select(
            meta_robots_expr(F.col("body")).alias("m"),
            anchor_policy_expr(F.col("body")).alias("a"),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Project" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert bad not in plan, plan


def test_crop_box_edges():
    """Pure-numpy crop-box semantics: no border, all-black frame, lossy
    near-black noise staying under the cropdetect threshold."""
    import numpy as np

    from linkkchecker_net_spark.pipeline.multimodal import _crop_box

    content = np.zeros((4, 5, 3), dtype=np.uint8)
    content[..., 0] = 200
    assert _crop_box(content, 16.0) == (0, 0, 0, 0)

    framed = np.zeros((8, 9, 3), dtype=np.uint8)
    framed[2:6, 3:8] = content
    framed[0, 0, 1] = 2  # lossy wobble on a border pixel: still border
    assert _crop_box(framed, 16.0) == (2, 2, 3, 1)

    black = np.zeros((6, 6, 3), dtype=np.uint8)
    assert _crop_box(black, 16.0) == (6, 0, 0, 0)


def test_httpmeta_is_codegen_only(spark):
    """Scale contract: charset sniff + cache policy are pure expressions
    — one Project, no Python eval, no exchange."""
    from pyspark.sql import functions as F

    from linkkchecker_net_spark.kernels.httpmeta import (
        cache_policy_expr,
        charset_sniff_expr,
    )

    df = spark.createDataFrame(
        [(b"<html></html>", "text/html", "max-age=60", None, None)],
        "body binary, ct string, cc string, etag string, lm string",
    )
    plan = (
        df.select(
            charset_sniff_expr(F.col("body"), F.col("ct")).alias("c"),
            cache_policy_expr(
                F.col("cc"), F.col("etag"), F.col("lm")
            ).alias("p"),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Project" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert bad not in plan, plan


# ------------------------------------------------------------------- srcset
def _srcset(spark, body):
    from linkkchecker_net_spark.kernels.srcset import srcset_candidates

    pages = spark.createDataFrame(
        [("http://t.test/", body)], "url string, body string"
    )
    return sorted(
        (r.img_idx, r.cand_url, r.kind, r.val_centi, r.chosen)
        for r in srcset_candidates(pages).collect()
    )


def test_srcset_width_descriptors_pick_largest(spark):
    out = _srcset(
        spark,
        '<img src="f.jpg" srcset="a.jpg 480w, b.jpg 1200w, c.jpg 800w">',
    )
    assert out == [
        (0, "a.jpg", "w", 48000, False),
        (0, "b.jpg", "w", 120000, True),
        (0, "c.jpg", "w", 80000, False),
    ]


def test_srcset_density_default_and_trailing_comma(spark):
    # descriptor-less entry defaults to 1x; trailing comma dropped;
    # fractional density held as integer centi; src ignored (srcset wins)
    out = _srcset(
        spark, '<IMG srcset="a.png,b.png 1.5x, " src="z.png">'
    )
    assert out == [
        (0, "a.png", "x", 100, False),
        (0, "b.png", "x", 150, True),
    ]


def test_srcset_bare_src_fallback_and_multiple_imgs(spark):
    out = _srcset(
        spark,
        '<img srcset="a.jpg 2x"><img src="only.gif">'
        "<img >",  # no attributes at all -> no candidates
    )
    assert out == [
        (0, "a.jpg", "x", 200, True),
        (1, "only.gif", "src", None, True),
    ]


def test_srcset_w_beats_x_for_chosen(spark):
    out = _srcset(spark, '<img srcset="d.png 3x, w.png 100w">')
    chosen = [u for _, u, _, _, c in out if c]
    assert chosen == ["w.png"]


# ---------------------------------------------------------------- feedparse
def test_feedparse_rss_and_atom():
    from linkkchecker_net_spark.kernels.feedparse import parse_feed

    rss = (
        '<rss version="2.0"><channel>'
        "<item><title>t0</title><link> http://x/a </link>"
        "<pubDate>Tue, 14 Nov 2023 22:13:20 GMT</pubDate></item>"
        "<item><title>skip me</title></item>"
        "<item><title>bad date</title><link>http://x/b</link>"
        "<pubDate>not a date</pubDate></item>"
        "</channel></rss>"
    )
    out = parse_feed(rss)
    assert out == [
        ("rss", "http://x/a", "alternate", "t0", 1700000000),
        ("rss", "http://x/b", "alternate", "bad date", None),
    ]
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
        "<title>e0</title><updated>2023-11-14T22:13:20Z</updated>"
        '<link href="http://x/0"/>'
        '<link rel="enclosure" href="http://x/i.jpg"/>'
        "</entry></feed>"
    )
    assert parse_feed(atom) == [
        ("atom", "http://x/0", "alternate", "e0", 1700000000),
        ("atom", "http://x/i.jpg", "enclosure", "e0", 1700000000),
    ]


def test_feedparse_error_contract():
    from linkkchecker_net_spark.kernels.feedparse import parse_feed

    assert parse_feed("<rss><channel><item>") is None  # malformed
    assert parse_feed("<html><body/></html>") is None  # unknown root
    assert parse_feed(None) is None
    assert parse_feed("<rss/>") == []  # well-formed, empty


# -------------------------------------------------------- link_header_edges
def test_link_header_multi_rel_and_defaults(spark):
    from linkkchecker_net_spark.kernels.httpmeta import link_header_edges

    df = spark.createDataFrame(
        [(
            "u",
            '<http://a/2>; rel="next", </hero.jpg>; rel=preload; as=image,'
            ' <http://a/c>; rel="canonical prefetch", <http://bare/>',
        )],
        "url string, link_header string",
    )
    rows = sorted(
        (r.pos, r.target, r.rel, r.as_attr)
        for r in link_header_edges(df).collect()
    )
    assert rows == [
        (0, "http://a/2", "next", ""),
        (1, "/hero.jpg", "preload", "image"),
        (2, "http://a/c", "canonical", ""),
        (2, "http://a/c", "prefetch", ""),
        (3, "http://bare/", "", ""),
    ]


def test_link_header_case_and_comma_in_url(spark):
    from linkkchecker_net_spark.kernels.httpmeta import link_header_edges

    df = spark.createDataFrame(
        [("u", '<http://a/x,y>;REL="Prev"')],
        "url string, link_header string",
    )
    rows = [(r.target, r.rel) for r in link_header_edges(df).collect()]
    # comma INSIDE <> must not split the link-value; rel lowercased
    assert rows == [("http://a/x,y", "prev")]


def test_jsonld_object_array_and_malformed(spark):
    from linkkchecker_net_spark.kernels.jsonld import jsonld_items

    body = (
        "<html>"
        "<SCRIPT TYPE='application/ld+json'>"
        '{"@type":"ImageObject","contentUrl":"http://a/1.jpg",'
        '"caption":"c1"}</SCRIPT>'
        '<script type="application/ld+json">'
        '[{"@type":"ImageObject","contentUrl":"u2"},'
        '{"@type":"WebPage","name":"n2"}]</script>'
        '<script type="application/ld+json">{"@type": "brok</script>'
        "</html>"
    )
    df = spark.createDataFrame([("u", body)], "url string, body string")
    rows = sorted(
        (r.block_idx, r.item_idx, r.parse_ok, r.is_array, r.type,
         r.image_url, r.caption)
        for r in jsonld_items(df).collect()
    )
    assert rows == [
        (0, 0, True, False, "ImageObject", "http://a/1.jpg", "c1"),
        (1, 0, True, True, "ImageObject", "u2", None),
        (1, 1, True, True, "WebPage", None, "n2"),
        (2, 0, False, False, None, None, None),
    ]


def test_jsonld_field_ladders(spark):
    from linkkchecker_net_spark.kernels.jsonld import jsonld_items

    body = (
        '<script type="application/ld+json">'
        '{"@type":"NewsArticle","headline":"h","thumbnailUrl":"t.jpg",'
        '"image":"i.png"}</script>'
    )
    df = spark.createDataFrame([("u", body)], "url string, body string")
    r = jsonld_items(df).collect()[0]
    # image beats thumbnailUrl; headline used when caption/name absent
    assert (r.image_url, r.caption) == ("i.png", "h")


def test_parse_sitemapindex_contract():
    """<sitemapindex> expansion: namespaced blocks only, loc-less blocks
    advance no seq, trim, urlset→[], parse error→None (same error
    contract as parse_sitemap)."""
    from linkkchecker_net_spark.kernels.sitemapparse import (
        SITEMAP_NS,
        parse_sitemapindex,
    )

    body = (
        f'<sitemapindex xmlns="{SITEMAP_NS}">'
        "<sitemap><lastmod>2024-01-01</lastmod></sitemap>"  # no loc: skipped
        '<sitemap xmlns=""><loc>http://bogus/x.xml</loc></sitemap>'  # wrong ns
        "<sitemap><loc>\n  http://h/s1.xml  \n</loc>"
        "<lastmod> 2024-02-03 </lastmod></sitemap>"
        "<sitemap><loc>http://h/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert parse_sitemapindex(body) == [
        {"seq": 0, "loc": "http://h/s1.xml", "lastmod": "2024-02-03"},
        {"seq": 1, "loc": "http://h/s2.xml", "lastmod": None},
    ]
    assert parse_sitemapindex(f'<urlset xmlns="{SITEMAP_NS}"/>') == []
    assert parse_sitemapindex("<not-xml") is None
    assert parse_sitemapindex(None) is None


def test_sitemap_index_plan_staleness(spark):
    """held/stale verdicts: ¬held, held-no-lastmod, held-unknown-vintage
    (fetched_lastmod NULL ⇒ stale), held-older (stale), held-current."""
    from linkkchecker_net_spark.kernels.sitemapparse import (
        SITEMAP_NS,
        sitemap_index_plan,
    )

    inner = "".join(
        f"<sitemap><loc>http://h/s{k}.xml</loc>{lm}</sitemap>"
        for k, lm in [
            (0, ""),  # not held
            (1, ""),  # held, no declared lastmod -> never stale
            (2, "<lastmod>2024-02-10</lastmod>"),  # held, vintage unknown
            (3, "<lastmod>2024-02-10</lastmod>"),  # held at 2024-02-01 -> stale
            (4, "<lastmod>2024-02-10</lastmod>"),  # held at 2024-02-10 -> fresh
        ]
    )
    idx = spark.createDataFrame(
        [("http://h/sitemap.xml",
          f'<sitemapindex xmlns="{SITEMAP_NS}">{inner}</sitemapindex>'.encode())],
        "index_url string, body binary",
    )
    fetched = spark.createDataFrame(
        [("http://h/s1.xml", None), ("http://h/s2.xml", None),
         ("http://h/s3.xml", "2024-02-01"), ("http://h/s4.xml", "2024-02-10")],
        "loc string, fetched_lastmod string",
    )
    rows = {
        r["loc"]: (r["seq"], r["held"], r["stale"])
        for r in sitemap_index_plan(idx, fetched).collect()
    }
    assert rows == {
        "http://h/s0.xml": (0, False, False),
        "http://h/s1.xml": (1, True, False),
        "http://h/s2.xml": (2, True, True),
        "http://h/s3.xml": (3, True, True),
        "http://h/s4.xml": (4, True, False),
    }


def test_base_href_resolution_grammar(spark):
    """first-base-with-href wins; href-less base ignored; all four href
    shapes; divergence only where base changes the target."""
    from linkkchecker_net_spark.kernels.basehref import base_href_links

    body = (
        '<base target="_top">'
        '<base href="http://cdn.test/a/"><base href="/decoy/">'
        '<a name="skip">s</a>'
        '<a href="x.png">1</a><a href="/r">2</a>'
        '<a href="http://e.test/z">3</a><a href="//s.test/y">4</a>'
    )
    pages = spark.createDataFrame(
        [("http://h.test/d/p1", body),
         ("http://h.test/d/p2", '<a href="x.png">1</a>')],  # no base
        "url string, body string",
    )
    got = {
        (r["url"], r["href"]): (r["effective_base"], r["resolved"],
                                r["naive_resolved"], r["diverges"])
        for r in base_href_links(pages).collect()
    }
    assert got[("http://h.test/d/p1", "x.png")] == (
        "http://cdn.test/a/", "http://cdn.test/a/x.png",
        "http://h.test/d/x.png", True,
    )
    assert got[("http://h.test/d/p1", "/r")] == (
        "http://cdn.test/a/", "http://cdn.test/r", "http://h.test/r", True,
    )
    assert got[("http://h.test/d/p1", "http://e.test/z")][3] is False
    assert got[("http://h.test/d/p1", "//s.test/y")] == (
        "http://cdn.test/a/", "http://s.test/y", "http://s.test/y", False,
    )
    # no base: effective base = the page itself, nothing diverges
    assert got[("http://h.test/d/p2", "x.png")] == (
        "http://h.test/d/p2", "http://h.test/d/x.png",
        "http://h.test/d/x.png", False,
    )


def test_picture_sources_negotiation(spark):
    from linkkchecker_net_spark.kernels.srcset import picture_sources

    body = (
        '<img src="outside.png">'
        "<picture>"
        '<source type="image/avif" srcset="a.avif">'      # unsupported
        '<source type="image/webp">'                       # no srcset: skip
        '<source type="image/webp" srcset=" w.webp 1x, w2.webp 2x">'
        '<img src="f.png"></picture>'
        '<picture><source media="(min-width:1px)" srcset="m.png">'
        "</picture>"
        "<picture><p>nothing</p></picture>"
    )
    pages = spark.createDataFrame([("u", body)], "url string, body string")
    got = {
        r["pic_idx"]: (r["n_sources"], r["chosen_url"], r["chosen_type"],
                       r["chosen_from"])
        for r in picture_sources(pages).collect()
    }
    assert got == {
        0: (3, "w.webp", "image/webp", "source"),   # leading space trimmed
        1: (1, "m.png", "", "source"),              # typeless acceptable
        2: (0, None, None, "none"),
    }


def test_reciprocal_links_hand_graph(spark):
    from linkkchecker_net_spark.pipeline.graph import reciprocal_links

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "a"), ("a", "b")],
        "src string, dst string",
    )
    got = {r["host"]: (r["n_out"], r["n_reciprocal"], r["reciprocal_ppm"])
           for r in reciprocal_links(edges).collect()}
    # a: out {b, c}; only a->b is returned. self-loop + dup dropped.
    assert got == {"a": (2, 1, 500_000), "b": (1, 1, 1_000_000)}


def test_warc_revisit_groups(spark):
    from linkkchecker_net_spark.reports.warc import warc_revisit

    caps = spark.createDataFrame(
        [("u", 10, "d1", 100), ("u", 20, "d1", 100), ("u", 30, "d2", 50),
         ("u", 40, "d1", 100), ("v", 15, "d1", 70)],
        "url string, ts long, digest8 string, body_len long",
    )
    got = {(r["url"], r["ts"]): (r["record_type"], r["refers_to_ts"],
                                 r["saved_bytes"])
           for r in warc_revisit(caps).collect()}
    assert got == {
        ("u", 10): ("response", None, 0),
        ("u", 20): ("revisit", 10, 100),
        ("u", 30): ("response", None, 0),
        ("u", 40): ("revisit", 10, 100),
        ("v", 15): ("response", None, 0),  # same digest, other URL
    }


def test_robots_match_rfc9309_precedence(spark):
    """wildcards, $ anchor, longest-match, allow-wins tie, empty rule,
    rule-less host, mid-pattern literal $ escaped."""
    from linkkchecker_net_spark.kernels.robotsparse import robots_match

    rules = spark.createDataFrame(
        [
            ("h", "disallow", "/p/"),
            ("h", "allow", "/p/ok/"),
            ("h", "disallow", "/*.pdf$"),
            ("h", "allow", "/x/"),
            ("h", "disallow", "/x/"),   # tie with allow: allow wins
            ("h", "disallow", ""),      # empty: no restriction
            ("h", "disallow", "/a$b"),  # mid-pattern $ is literal
        ],
        "host string, rule_type string, path string",
    )
    urls = spark.createDataFrame(
        [("h", "/p/z"), ("h", "/p/ok/z"), ("h", "/d/f.pdf"),
         ("h", "/d/f.pdfx"), ("h", "/x/q"), ("h", "/a$b/c"),
         ("h", "/free"), ("g", "/p/z")],
        "host string, path string",
    )
    got = {(r["host"], r["path"]): (r["allowed"], r["rule_path"])
           for r in robots_match(urls, rules).collect()}
    assert got == {
        ("h", "/p/z"): (False, "/p/"),
        ("h", "/p/ok/z"): (True, "/p/ok/"),       # longest match wins
        ("h", "/d/f.pdf"): (False, "/*.pdf$"),
        ("h", "/d/f.pdfx"): (True, None),          # $ anchor holds
        ("h", "/x/q"): (True, "/x/"),              # equal length: allow
        ("h", "/a$b/c"): (False, "/a$b"),          # literal mid $
        ("h", "/free"): (True, None),
        ("g", "/p/z"): (True, None),               # rule-less host
    }


def test_crawl_delay_audit_hand_log(spark):
    from linkkchecker_net_spark.pipeline.recrawl import crawl_delay_audit

    fetches = spark.createDataFrame(
        [("a", 0), ("a", 500), ("a", 3000), ("b", 0), ("b", 5000), ("c", 7)],
        "host string, ts_ms long",
    )
    robots = spark.createDataFrame(
        [("a", 1), ("b", 1)], "host string, crawl_delay_sec int"
    )
    got = {r["host"]: (r["n_fetches"], r["min_gap_ms"], r["declared_ms"],
                       r["n_violations"], r["compliant"])
           for r in crawl_delay_audit(fetches, robots).collect()}
    assert got == {
        "a": (3, 500, 1000, 1, False),   # 500ms gap violates 1s
        "b": (2, 5000, 1000, 0, True),
        "c": (1, None, None, 0, True),   # single fetch, undeclared
    }


def test_sitemap_robots_conflict_composition(spark):
    from linkkchecker_net_spark.kernels.robotsparse import (
        sitemap_robots_conflict,
    )

    locs = spark.createDataFrame(
        [("h", "http://h.test/p/x"), ("h", "http://h.test/ok"),
         ("g", "http://g.test/p/x")],
        "host string, loc string",
    )
    rules = spark.createDataFrame(
        [("h", "disallow", "/p/")], "host string, rule_type string, path string"
    )
    got = {r["loc"]: (r["allowed"], r["rule_path"])
           for r in sitemap_robots_conflict(locs, rules).collect()}
    assert got == {
        "http://h.test/p/x": (False, "/p/"),
        "http://h.test/ok": (True, None),
        "http://g.test/p/x": (True, None),
    }


def test_session_params_entropy_flags(spark):
    from linkkchecker_net_spark.pipeline.dust import session_params

    urls = spark.createDataFrame(
        [("h", f"http://h.test/p?sid=u{i}&page={i % 2}&flag") for i in range(6)]
        + [("h", "http://h.test/noquery"),
           ("g", "http://g.test/p?once=1")],
        "host string, url string",
    )
    got = {(r["host"], r["param"]): (r["n_occurrences"], r["n_distinct_values"],
                                     r["session_param"])
           for r in session_params(urls).collect()}
    assert got == {
        ("h", "sid"): (6, 6, True),
        ("h", "page"): (6, 2, False),
        ("g", "once"): (1, 1, False),  # ratio 1.0 but below min_occurrences
    }


def test_breadcrumb_trails_parse(spark):
    from linkkchecker_net_spark.kernels.jsonld import breadcrumb_trails

    body = (
        '<script type="application/ld+json">{"@type":"Product","name":"d"}'
        "</script>"
        '<script type="application/ld+json">'
        '{"@type":"BreadcrumbList","itemListElement":['
        '{"@type":"ListItem","position":1,"name":"Home","item":"http://h/"},'
        '{"@type":"ListItem","position":2,"name":"Sub","item":"http://h/s"}'
        "]}</script>"
        '<script type="application/ld+json">{"broken":</script>'
    )
    pages = spark.createDataFrame(
        [("u", body), ("v", "<p>none</p>")], "url string, body string"
    )
    rows = breadcrumb_trails(pages).collect()
    got = {(r["url"], r["item_idx"]): (r["block_idx"], r["position"],
                                       r["name"], r["item_url"], r["depth"])
           for r in rows}
    assert got == {
        ("u", 0): (1, 1, "Home", "http://h/", 2),
        ("u", 1): (1, 2, "Sub", "http://h/s", 2),
    }


def test_content_length_audit_verdicts(spark):
    from linkkchecker_net_spark.kernels.httpmeta import content_length_audit

    rows = [
        ("a", "Content-Length: 5\r\nX: 1", b"hello"),
        ("b", "content-length: 10", b"hell"),       # truncated, ci name
        ("c", "Content-Length: 2", b"hello"),       # overlong
        ("d", "X-Other: 1", b"hi"),                 # undeclared
        ("e", "Content-Length: 3", None),           # null body = 0 octets
    ]
    df = spark.createDataFrame(rows, "url string, headers string, body binary")
    got = {r["url"]: (r["declared_len"], r["actual_len"], r["verdict"])
           for r in content_length_audit(df).collect()}
    assert got == {
        "a": (5, 5, "match"),
        "b": (10, 4, "truncated"),
        "c": (2, 5, "overlong"),
        "d": (None, 2, "undeclared"),
        "e": (3, 0, "truncated"),
    }


def test_redirect_edge_audit_ladder(spark):
    from linkkchecker_net_spark.kernels.httpmeta import redirect_edge_audit

    rows = [
        ("http://h.test/p", 301, "https://h.test/p"),     # upgrade
        ("http://h.test/p2", 308, "http://h.test/q"),     # permanent
        ("http://h.test/p3", 307, "http://x.test/q"),     # temp cross-host
        ("http://h.test/p4", 302, None),                  # missing location
        ("http://h.test/p5", 200, None),                  # not a redirect
    ]
    df = spark.createDataFrame(rows, "url string, status int, location string")
    got = {r["url"]: (r["verdict"], r["permanent"], r["method_preserving"],
                      r["https_upgrade"], r["cross_host"])
           for r in redirect_edge_audit(df).collect()}
    assert got == {
        "http://h.test/p": ("https_upgrade", True, False, True, False),
        "http://h.test/p2": ("permanent", True, True, False, False),
        "http://h.test/p3": ("temporary", False, True, False, True),
        "http://h.test/p4": ("missing_location", False, False, False, False),
        "http://h.test/p5": ("not_redirect", False, False, False, False),
    }


def test_sitemap_generate_roundtrip(spark):
    """The generated XML must parse back through this repo's own
    sitemap parser — sink and source agree on the spec."""
    from pyspark.sql import functions as F

    from linkkchecker_net_spark.kernels.sitemapparse import (
        sitemap_generate,
    )

    urls = spark.createDataFrame(
        [("h.test", "http://h.test/a?x=1&y=2"),
         ("h.test", "http://h.test/b"),
         ("h.test", "http://h.test/c"),
         ("i.test", "http://i.test/only?t='v'&q=\"w\"")],
        "host string, url string",
    )
    out = sitemap_generate(urls, max_per_file=2).collect()
    by_key = {(r["host"], r["chunk"]): r for r in out}
    assert by_key[("h.test", 0)]["n_urls"] == 2
    assert by_key[("h.test", 1)]["n_urls"] == 1
    assert by_key[("i.test", 0)]["n_urls"] == 1
    xml0 = by_key[("h.test", 0)]["xml"]
    assert "&amp;" in xml0 and "&y=2" not in xml0  # escaped
    # r4 ADVICE: ' and " must emit as &apos;/&quot; (all five entities)
    xml_i = by_key[("i.test", 0)]["xml"]
    assert "&apos;v&apos;" in xml_i and "&quot;w&quot;" in xml_i
    assert "'v'" not in xml_i and '"w"' not in xml_i.split(">", 1)[1]
    # round-trip through the stdlib parser with the sitemap namespace
    import xml.etree.ElementTree as ET

    ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
    locs = [e.text for e in ET.fromstring(xml0).iter(f"{ns}loc")]
    assert locs == ["http://h.test/a?x=1&y=2", "http://h.test/b"]
    locs_i = [e.text for e in ET.fromstring(xml_i).iter(f"{ns}loc")]
    assert locs_i == ["http://i.test/only?t='v'&q=\"w\""]


def test_length_bucket_waste_exact(spark):
    from linkkchecker_net_spark.pipeline.text import length_bucket

    rows = [
        (0, "a b c"),            # 3 tokens -> bucket 4, waste 1
        (1, "a b c d"),          # 4 tokens -> bucket 4, waste 0
        (2, " ".join(["t"] * 100)),  # 100 -> capped at 64, eff 64
        (3, "x"),                # 1 -> bucket 1, waste 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket_hi"]: r for r in length_bucket(docs, 64).collect()}
    assert out[4]["n_docs"] == 2 and out[4]["padded_tokens"] == 1
    assert out[4]["waste_ppm"] == 125_000  # 1 / 8
    assert out[64]["sum_tokens"] == 64 and out[64]["padded_tokens"] == 0
    assert out[1]["n_docs"] == 1


def test_dom_depth_fold(spark):
    from linkkchecker_net_spark.kernels.markup import dom_depth

    pages = [
        ("u1", "<html><div><div>x</div></div></html>"),     # depth 3
        ("u2", "<html><img src=a><br/></html>"),            # voids flat
        ("u3", "<html><div>x</html>"),                      # unclosed div
        ("u4", "plain text no tags"),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in dom_depth(df).collect()}
    assert out["u1"]["max_depth"] == 3 and out["u1"]["unclosed"] is False
    assert out["u2"]["max_depth"] == 1 and out["u2"]["n_tags"] == 4
    assert out["u3"]["unclosed"] is True
    assert out["u4"]["n_tags"] == 0 and out["u4"]["max_depth"] == 0


def test_page_weight_classes(spark):
    from linkkchecker_net_spark.kernels.markup import page_weight

    body = "<!--c--><script>x</script><style>y</style><p>hi</p>"
    df = spark.createDataFrame([("u", body)], "url string, body string")
    r = page_weight(df).collect()[0]
    assert r["comment_bytes"] == 8
    assert r["script_bytes"] == len("<script>x</script>")
    assert r["style_bytes"] == len("<style>y</style>")
    assert r["markup_bytes"] == 7          # <p> + </p>
    assert r["text_bytes"] == 2            # "hi"
    assert r["total_bytes"] == len(body)


def test_page_weight_comment_inside_script_counts_once(spark):
    """r4 ADVICE: the <script><!-- ... //--></script> idiom must count in
    script_bytes ONLY — successive stripping makes the classes partition
    the page, so text_bytes stays exact (and never negative)."""
    from linkkchecker_net_spark.kernels.markup import page_weight

    script = "<script><!-- var x=1; //--></script>"
    body = script + "<p>ok</p>"
    df = spark.createDataFrame([("u", body)], "url string, body string")
    r = page_weight(df).collect()[0]
    assert r["script_bytes"] == len(script)
    assert r["comment_bytes"] == 0          # swallowed by the script strip
    assert r["markup_bytes"] == 7
    assert r["text_bytes"] == 2             # "ok"
    parts = (r["script_bytes"] + r["style_bytes"] + r["comment_bytes"]
             + r["markup_bytes"] + r["text_bytes"])
    assert parts == r["total_bytes"] == len(body)

    # commented-out script: the comment strip takes the whole block
    body2 = "<!--<script>dead()</script>--><p>hi</p>"
    r2 = page_weight(
        spark.createDataFrame([("u", body2)], "url string, body string")
    ).collect()[0]
    assert r2["script_bytes"] == len("<script>dead()</script>")
    assert r2["comment_bytes"] == len("<!----> ") - 1  # the comment shell
    assert r2["text_bytes"] == 2 and r2["text_bytes"] >= 0


def test_robots_generate_round_trips_own_parser(spark):
    """The generated robots.txt must parse back through parse_robots
    into the same (host, rule_type, path) rows it was built from."""
    from pyspark.sql import functions as F

    from linkkchecker_net_spark.kernels.robotsparse import (
        parse_robots,
        robots_generate,
    )

    rules = spark.createDataFrame(
        [("h1", "disallow", "/admin/"), ("h1", "allow", "/admin/pub/"),
         ("h2", "disallow", "/")],
        "host string, rule_type string, path string",
    )
    smaps = spark.createDataFrame(
        [("h1", "http://h1.test/sm.xml")], "host string, loc string"
    )
    gen = robots_generate(rules, smaps)
    txts = gen.select("host", F.col("robots_txt").alias("txt"))
    parsed = {r["host"]: r for r in parse_robots(txts).collect()}
    # the wildcard group matched; the disallow prefixes round-trip
    assert parsed["h1"]["matched"] == "wildcard"
    assert parsed["h1"]["disallow"] == "/admin/"
    assert parsed["h1"]["n_rules"] == 1   # parse_robots counts disallows
    assert parsed["h2"]["disallow"] == "/"
    by_host = {r["host"]: r for r in gen.collect()}
    assert by_host["h1"]["n_sitemaps"] == 1
    assert "Sitemap: http://h1.test/sm.xml" in by_host["h1"]["robots_txt"]


def test_table_extract_shapes(spark):
    from linkkchecker_net_spark.kernels.markup import table_extract

    pages = [
        ("u1",
         "<table><tr><th>h</th><th>i</th></tr>"
         "<tr><td>1</td><td>2.5</td></tr></table>"),
        ("u2", "<table><tr><td>only nav</td></tr></table>"),
        ("u3", "no tables at all"),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in table_extract(df).collect()}
    assert out["u1"]["data_table"] is True
    assert out["u1"]["n_rows"] == 2 and out["u1"]["n_cells"] == 4
    assert out["u1"]["numeric_cell_ppm"] == 500_000  # 2 numeric td of 4
    assert out["u2"]["data_table"] is False
    assert out["u3"]["n_tables"] == 0


def test_robots_delta_verdict_arms(spark):
    """Every verdict arm on a hand-built snapshot pair: h-open gains an
    allow, h-tight gains a disallow AND loses an allow (both moves
    tighten), h-mixed moves both directions, h-same is untouched,
    h-gone only in v1, h-new only in v2."""
    from linkkchecker_net_spark.kernels.robotsparse import robots_delta

    schema = "host string, rule_type string, path string"
    v1 = spark.createDataFrame(
        [
            ("h-open", "disallow", "/a"),
            ("h-tight", "allow", "/pub"), ("h-tight", "disallow", "/x"),
            ("h-mixed", "allow", "/keep"),
            ("h-same", "allow", "/k"),
            ("h-gone", "disallow", "/z"),
        ],
        schema,
    )
    v2 = spark.createDataFrame(
        [
            ("h-open", "disallow", "/a"), ("h-open", "allow", "/a/pub"),
            ("h-tight", "disallow", "/x"), ("h-tight", "disallow", "/y"),
            ("h-mixed", "allow", "/new"),
            ("h-same", "allow", "/k"),
            ("h-new", "disallow", "/w"),
        ],
        schema,
    )
    out = {r["host"]: r for r in robots_delta(v1, v2).collect()}
    assert out["h-open"]["verdict"] == "opened"
    assert out["h-open"]["n_added"] == 1 and out["h-open"]["n_unchanged"] == 1
    assert out["h-tight"]["verdict"] == "tightened"
    assert out["h-tight"]["n_added"] == 1 and out["h-tight"]["n_removed"] == 1
    assert out["h-mixed"]["verdict"] == "mixed"
    assert out["h-same"]["verdict"] == "unchanged"
    assert out["h-gone"]["verdict"] == "gone_host"
    assert out["h-new"]["verdict"] == "new_host"
    assert out["h-new"]["n_added"] == 1 and out["h-new"]["n_removed"] == 0


def test_robots_delta_dedups_rule_rows(spark):
    """Duplicate rule rows within one snapshot must not inflate counts
    (the operator distincts on the full rule key)."""
    from linkkchecker_net_spark.kernels.robotsparse import robots_delta

    schema = "host string, rule_type string, path string"
    v1 = spark.createDataFrame(
        [("h", "disallow", "/a"), ("h", "disallow", "/a")], schema
    )
    v2 = spark.createDataFrame([("h", "disallow", "/a")], schema)
    row = robots_delta(v1, v2).collect()[0]
    assert row["n_unchanged"] == 1 and row["n_removed"] == 0
    assert row["verdict"] == "unchanged"


def test_tld_risk_pools_and_flags(spark):
    """Ports are stripped from the authority, IPv4 literals pool under
    'ipv4', and only list TLDs read risky."""
    from linkkchecker_net_spark.kernels.domains import tld_risk

    urls = spark.createDataFrame(
        [
            ("http://ex.com/x",),
            ("http://Ex.COM:8080/y",),
            ("http://spam.xyz/z",),
            ("http://10.0.0.1/w",),
            ("https://a.b.co.uk/v",),
        ],
        "url string",
    )
    out = {r["tld"]: r for r in tld_risk(urls).collect()}
    assert out["com"]["n_urls"] == 2 and out["com"]["risky"] is False
    assert out["xyz"]["n_urls"] == 1 and out["xyz"]["risky"] is True
    assert out["ipv4"]["n_urls"] == 1 and out["ipv4"]["risky"] is False
    assert out["uk"]["n_urls"] == 1
    assert out["com"]["share_ppm"] == 400_000


def test_compression_audit_grammar(spark):
    """Header grammar details the arithmetic oracle can't see: the
    first token of a multi-coding chain wins, casing/whitespace
    normalize, a Content-Encoding in the middle of the blob still
    matches line-anchored, and missing headers coalesce."""
    from linkkchecker_net_spark.kernels.httpmeta import compression_audit

    rows = [
        ("u1", "HTTP/1.1 200 OK\r\nContent-Type: TEXT/HTML; charset=utf-8\r\n"
               "CONTENT-ENCODING:  GZIP , br\r\n", b"x" * 2000),
        ("u2", "Content-Type: application/json\r\n", b"y" * 2000),
        ("u3", "Content-Type: application/json\r\n", b"s" * 100),
        ("u4", "X-Content-Encoding: gzip\r\n", b"z" * 2000),
        ("u5", None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, headers string, body binary"
    )
    out = {r["url"]: r for r in compression_audit(df, min_bytes=1024).collect()}
    assert out["u1"]["encoding"] == "gzip"
    assert out["u1"]["content_type"] == "text/html"
    assert out["u1"]["compressible"] and not out["u1"]["uncompressed_compressible"]
    assert out["u2"]["encoding"] == "identity"
    assert out["u2"]["uncompressed_compressible"] is True
    assert out["u3"]["uncompressed_compressible"] is False  # under min_bytes
    # X-Content-Encoding is NOT Content-Encoding (line anchor)
    assert out["u4"]["encoding"] == "identity"
    assert out["u4"]["compressible"] is False
    assert out["u5"]["encoding"] == "identity" and out["u5"]["n_bytes"] == 0


def test_sitemap_delta_verdict_arms(spark):
    from linkkchecker_net_spark.kernels.sitemapparse import sitemap_delta

    schema = "host string, loc string"
    v1 = spark.createDataFrame(
        [("g", "u1"), ("s", "u1"), ("s", "u2"), ("ch", "u1"),
         ("same", "u1"), ("gone", "u9")],
        schema,
    )
    v2 = spark.createDataFrame(
        [("g", "u1"), ("g", "u2"), ("s", "u1"), ("ch", "u2"),
         ("same", "u1"), ("new", "u0")],
        schema,
    )
    out = {r["host"]: r for r in sitemap_delta(v1, v2).collect()}
    assert out["g"]["verdict"] == "grew" and out["g"]["n_added"] == 1
    assert out["s"]["verdict"] == "shrank" and out["s"]["n_removed"] == 1
    assert out["ch"]["verdict"] == "churned"
    assert out["same"]["verdict"] == "unchanged"
    assert out["gone"]["verdict"] == "gone_host"
    assert out["new"]["verdict"] == "new_host"


def test_mime_sniff_hex_ladder(spark):
    """The magic ladder the arithmetic oracle can't see: real PNG/JPEG/
    GIF/PDF/gzip prefixes classify from bytes, BOM-free whitespace-led
    markup sniffs html, html under text/* is a match (refinement),
    binary under text/html is a mismatch only when sniffable."""
    from linkkchecker_net_spark.kernels.httpmeta import mime_sniff

    rows = [
        ("u1", "Content-Type: image/jpeg\r\n", b"\xff\xd8\xff\xe0.."),
        ("u2", "Content-Type: application/pdf\r\n", b"%PDF-1.7 ..."),
        ("u3", "Content-Type: application/gzip\r\n", b"\x1f\x8b\x08rest"),
        ("u4", "Content-Type: image/gif\r\n", b"GIF89a......"),
        ("u5", "Content-Type: text/html\r\n", b"\x89PNG\r\n\x1a\nxx"),
        ("u6", "Content-Type: application/xhtml+xml\r\n", b"\n  <!doctype html>"),
        ("u7", None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, headers string, body binary"
    )
    out = {r["url"]: r for r in mime_sniff(df).collect()}
    assert out["u1"]["sniffed"] == "jpeg" and out["u1"]["verdict"] == "match"
    assert out["u2"]["sniffed"] == "pdf" and out["u2"]["verdict"] == "match"
    assert out["u3"]["sniffed"] == "gzip" and out["u3"]["verdict"] == "match"
    assert out["u4"]["sniffed"] == "gif" and out["u4"]["verdict"] == "match"
    assert out["u5"]["sniffed"] == "png" and out["u5"]["verdict"] == "mismatch"
    assert out["u6"]["sniffed"] == "html" and out["u6"]["verdict"] == "match"
    assert out["u7"]["verdict"] == "empty"


def test_render_triage_spa_shapes(spark):
    from linkkchecker_net_spark.kernels.markup import render_triage

    rows = [
        ("spa", '<script src="a"></script><script src="b"></script>'
                '<div id="app">  </div>'),
        ("react", '<div data-reactroot></div><script>boot()</script>'
                  '<script>x()</script>'),
        ("article", "<p>" + "word " * 100 + "</p>"),
        ("short-noscript", "<noscript>js please</noscript><p>tiny</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, body string")
    out = {r["url"]: r for r in render_triage(df).collect()}
    assert out["spa"]["spa_root"] and out["spa"]["needs_render"]
    assert out["react"]["spa_root"] and out["react"]["needs_render"]
    art = out["article"]
    assert not art["spa_root"] and not art["needs_render"]
    assert art["text_bytes"] == len(("word " * 100).strip())
    sn = out["short-noscript"]
    assert sn["has_noscript"] and not sn["needs_render"]  # 0 scripts


def test_alt_svc_grammar_arms(spark):
    """h3 (incl. draft ids) and h2/h2c advertisement flags, first-ma
    extraction, the clear retraction, and a decoy protocol id (xh3)
    that must NOT count as h3."""
    from linkkchecker_net_spark.kernels.httpmeta import alt_svc_audit

    rows = [
        ("a", 'h3=":443"; ma=86400, h2=":443"'),
        ("b", 'h2c=":8080"; ma=60'),
        ("c", "clear"),
        ("d", 'h3-29=":443"'),
        ("e", None),
        ("f", 'xh3=":443"'),
        ("g", ' h3=":443"'),
    ]
    df = spark.createDataFrame(rows, "url string, alt_svc string")
    out = {r["url"]: r for r in alt_svc_audit(df).collect()}
    assert out["a"]["advertises_h3"] and out["a"]["advertises_h2"]
    assert out["a"]["max_age"] == 86400
    assert out["b"]["advertises_h2"] and not out["b"]["advertises_h3"]
    assert out["b"]["max_age"] == 60
    assert out["c"]["cleared"] and not out["c"]["has_alt_svc"]
    assert out["d"]["advertises_h3"] and out["d"]["max_age"] is None
    assert not out["e"]["has_alt_svc"] and not out["e"]["cleared"]
    assert out["f"]["has_alt_svc"] and not out["f"]["advertises_h3"]
    assert out["g"]["advertises_h3"]
