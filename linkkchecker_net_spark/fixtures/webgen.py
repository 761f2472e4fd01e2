"""Deterministic synthetic-web + corpus fixture generator (FIXTURES.md).

Everything is seeded (seed=42 default), pure Python/numpy — no network, no
external data.  The ``web`` table is what the fetch stage serves (the Spark
stand-in for the live HTTP the reference hits at
/root/reference/SpiderEngine/Engine.cs:242-252).  HTML bodies exercise every
extraction path of the reference: all four tag/attr pairs (Engine.cs:42-49),
relative/absolute/entity/fragment hrefs (UriExtensions.cs:12-24),
mailto:/ftp: unsupported schemes (Engine.cs:41,263-273), off-site links
(fetched but not expanded, Engine.cs:171,180), <style> blocks
(Engine.cs:280-289), canonical links (CanonicalChecker.cs:38-76), meta
descriptions of length 0/<160/>=160 (DescriptionLengthChecker.cs:41-47),
and CSS with background-image + @font-face with 1 and 2+ url() terms
(CssChecker.cs:49 quirk pin).

Status codes cover every classification branch:
200 ok | 301/302/303/307 redirect | 404/500 broken | 0 = network error
(classification 'error') | absent-from-web = dead link → 404.
"""

from __future__ import annotations

import random

import numpy as np

from linkkchecker_net_spark import imaging

HOSTS = ["site-a.test", "site-b.test", "cdn.test"]
PROFILES = {
    "unit": dict(n_pages=24, n_images=8, n_css=3, n_hosts=1),
    "golden": dict(n_pages=200, n_images=32, n_css=8, n_hosts=2),
    "bench": dict(n_pages=20000, n_images=256, n_css=64, n_hosts=8),
}


def make_corpus(
    n_images: int, seed: int = 42, size_range=(16, 48)
) -> tuple[list[dict], list[np.ndarray]]:
    """The mandated input table: (image_id, bytes, w, h, fmt, caption, phash).

    Also returns the pristine original pixel arrays: the synthetic web
    serves a losslessly-encoded copy of the ORIGINAL pixels while the
    corpus stores the fmt-specific (possibly lossy) encoding — so the
    PSNR>=40dB validation gate measures a real, nonzero reconstruction
    error for fmt='jpeg'.
    """
    rows, origs = [], []
    fmts = ["png", "jpeg", "gif"]
    for i in range(n_images):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        w = int(rng.integers(size_range[0], size_range[1]))
        h = int(rng.integers(size_range[0], size_range[1]))
        arr = imaging.make_image(rng, w, h)
        fmt = fmts[i % 3]
        data = imaging.encode_image(arr, fmt)
        rows.append(
            {
                "image_id": f"img_{i:06d}",
                "bytes": bytearray(data),
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"caption of img_{i:06d}",
                "phash": imaging.phash64(imaging.decode_image(bytes(data), fmt)),
            }
        )
        origs.append(arr)
    return rows, origs


def _page_url(host: str, i: int) -> str:
    # a few pages live in a subdirectory to exercise relative resolution
    if i % 9 == 4:
        return f"http://{host}/dir/sub/page-{i}.html"
    return f"http://{host}/page/{i}"


def _css_url(host: str, k: int) -> str:
    return f"http://{host}/css/style-{k}.css"


def _img_url(image_id: str) -> str:
    return f"http://cdn.test/img/{image_id}.bin"


def _font_url(host: str, k: int) -> str:
    return f"http://{host}/fonts/font-{k}.ttf"


def make_fixtures(profile: str = "golden", seed: int = 42) -> dict:
    """Build all fixture tables as plain row dicts.

    Returns dict with keys: corpus, web, seeds, robots, sitemaps.
    """
    cfg = PROFILES[profile]
    rnd = random.Random(seed)
    n_pages = cfg["n_pages"]
    n_hosts = cfg["n_hosts"]
    hosts = [f"site-{chr(ord('a') + i)}.test" for i in range(n_hosts)]
    corpus, corpus_origs = make_corpus(cfg["n_images"], seed=seed)
    # pages only reference the first half of the corpus → the second half
    # feeds the used-images "not_used_in_site" report branch
    image_ids = [c["image_id"] for c in corpus][: max(1, len(corpus) // 2)]

    # --- host assignment: host[0] is deliberately hot (~60% of pages) -----
    def host_of_page(i: int) -> str:
        if n_hosts == 1:
            return hosts[0]
        r = (i * 2654435761) % 100
        if r < 60:
            return hosts[0]
        return hosts[1 + (i % (n_hosts - 1))]

    page_host = [host_of_page(i) for i in range(n_pages)]
    page_urls = [_page_url(page_host[i], i) for i in range(n_pages)]

    # --- page statuses -----------------------------------------------------
    def status_of(i: int) -> int:
        if i == 0:
            return 200
        m = i % 29
        if m == 7:
            return 404
        if m == 11:
            return 301
        if m == 13:
            return 302
        if m == 17:
            return 500
        if m == 19:
            return 0  # network error stand-in
        if m == 23:
            return 307
        return 200

    web: list[dict] = []
    css_hosts = hosts[: max(1, n_hosts - 1)]
    css_urls = [
        _css_url(css_hosts[k % len(css_hosts)], k) for k in range(cfg["n_css"])
    ]

    for i in range(n_pages):
        url, host, st = page_urls[i], page_host[i], status_of(i)
        body = None
        if st == 200:
            body = _make_html(
                i, url, host, n_pages, page_urls, css_urls, image_ids, rnd
            ).encode()
        redirect_to = page_urls[(i + 1) % n_pages] if st in (301, 302, 303, 307) else None
        web.append(
            dict(
                url=url,
                host=host,
                status=st,
                redirect_to=redirect_to,
                content_type="text/html" if st == 200 else None,
                body=body,
                image_id=None,
            )
        )

    for k, curl in enumerate(css_urls):
        host = curl.split("/")[2]
        web.append(
            dict(
                url=curl,
                host=host,
                status=200,
                redirect_to=None,
                content_type="text/css",
                body=_make_css(k, host, image_ids).encode(),
                image_id=None,
            )
        )
        if k % 2 == 0:  # font targets: half exist, half are dead links
            web.append(
                dict(
                    url=_font_url(host, k),
                    host=host,
                    status=200,
                    redirect_to=None,
                    content_type="font/ttf",
                    body=b"\x00\x01\x00\x00ttf-stub",
                    image_id=None,
                )
            )

    # scheme-divergent authority (Engine.cs:76): an HTTPS page on an
    # in-site host, linked from page 0 — fetched (supported scheme, 2xx)
    # but NOT expanded, because https://host is a different authority than
    # the http://host seed; its link target must never be crawled, and it
    # gets no page_meta row (IsBaseOf fails on scheme too)
    web.append(
        dict(
            url=f"https://{hosts[0]}/secure/index.html",
            host=hosts[0],
            status=200,
            redirect_to=None,
            content_type="text/html",
            body=b'<html><body><a href="/secure/never-crawled">n</a></body></html>',
            image_id=None,
        )
    )

    corpus_by_id = {c["image_id"]: c for c in corpus}
    orig_by_id = {c["image_id"]: a for c, a in zip(corpus, corpus_origs)}
    for image_id in image_ids:
        c = corpus_by_id[image_id]
        web.append(
            dict(
                url=_img_url(image_id),
                host="cdn.test",
                status=200,
                redirect_to=None,
                content_type={"png": "image/png", "jpeg": "image/jpeg", "gif": "image/gif"}[
                    c["fmt"]
                ],
                # the web serves a pristine lossless copy of the ORIGINAL
                # pixels; corpus holds the fmt-specific (lossy for jpeg)
                # encoding → PSNR gate measures real reconstruction error
                body=bytearray(imaging.encode_png(orig_by_id[image_id])),
                image_id=image_id,
                caption=c["caption"],
            )
        )
    # "ghost" images: served by the site but NOT in the corpus — feeds the
    # used-images "not_in_project" branch (UsedImagesChecker.cs:97-98)
    for g in range(2):
        rng = np.random.default_rng(seed * 7_000_003 + g)
        arr = imaging.make_image(rng, 20, 20)
        web.append(
            dict(
                url=_img_url(f"ghost_{g}"),
                host="cdn.test",
                status=200,
                redirect_to=None,
                content_type="image/png",
                body=bytearray(imaging.encode_png(arr)),
                image_id=f"ghost_{g}",
                caption=f"ghost caption {g}",
            )
        )

    for row in web:
        row.setdefault("caption", None)
        row["url_hash"] = None  # filled Spark-side with xxhash64

    seeds = [dict(seed_url=page_urls[0], priority=0)]
    if n_hosts > 1:
        seeds.append(dict(seed_url=page_urls[1] if page_host[1] != page_host[0] else page_urls[2], priority=1))

    robots = [
        dict(
            host=h,
            disallow=["/private/"] + (["/dir/sub/blocked"] if h == hosts[0] else []),
            crawl_delay=0.0,
            budget=10_000_000,
        )
        for h in hosts + ["cdn.test"]
    ]

    sitemaps = []
    for h in hosts:
        pages_on_h = [u for u, ph in zip(page_urls, page_host) if ph == h]
        locs = pages_on_h[:3] + [f"http://{h}/only-in-sitemap/{j}" for j in range(2)]
        sitemaps.append(dict(host=h, loc=locs))

    return dict(corpus=corpus, web=web, seeds=seeds, robots=robots, sitemaps=sitemaps)


def _make_html(i, url, host, n_pages, page_urls, css_urls, image_ids, rnd) -> str:
    """Deterministic page HTML exercising every reference extraction path."""
    parts = [f"<html><head><title>page {i}</title>"]

    # canonical link: present+matching (i%4==0), mismatching (i%4==1), absent
    if i % 4 == 0:
        parts.append(f'<link rel="canonical" href="{url}"/>')
    elif i % 4 == 1:
        parts.append(f'<link rel="canonical" href="http://{host}/canonical-other/{i}"/>')

    # meta description: absent / empty / short / long(>=160)
    m = i % 5
    if m == 1:
        parts.append('<meta name="description" content=""/>')
    elif m == 2:
        parts.append(f'<meta name="description" content="short desc {i}"/>')
    elif m in (3, 4):
        parts.append(
            f'<meta name="description" content="long description for page {i} '
            + "x" * 170
            + '"/>'
        )

    # stylesheet link (GET-class <link>, Engine.cs:324-326)
    if css_urls and i % 3 == 0:
        parts.append(f'<link rel="stylesheet" href="{css_urls[i % len(css_urls)]}"/>')
    # non-stylesheet link (HEAD-class)
    if i % 12 == 5:
        parts.append(f'<link rel="icon" href="/favicon-{i % 4}.ico"/>')

    # embedded <style> with background-image (Engine.cs:280-289)
    if image_ids and i % 6 == 2:
        parts.append(
            "<style>.hero { background-image: url('%s'); }</style>"
            % _img_url(image_ids[i % len(image_ids)])
        )
    parts.append("</head><body>")

    # chain link guarantees broad reachability of the synthetic web
    parts.append(f'<a href="{page_urls[(i + 1) % n_pages]}">next</a>')
    # cross-scheme same-host link (expansion-gate coverage, Engine.cs:76)
    if i == 0:
        parts.append(f'<a href="https://{host}/secure/index.html">secure</a>')
    # anchor links: deterministic pseudo-random DAG, mixed href forms
    n_links = 2 + (i * 7) % 4
    for k in range(n_links):
        j = (i * 31 + k * 17 + 7) % n_pages
        target, t_host = page_urls[j], page_urls[j].split("/")[2]
        form = (i + k) % 6
        if form == 0:  # absolute
            href = target
        elif form == 1:  # host-relative absolute path
            href = target[len(f"http://{t_host}") :] if t_host == host else target
        elif form == 2:  # with fragment (stripped by P1)
            href = f"{target}#section-{k}"
        elif form == 3:  # HTML entity in href
            href = target.replace("/page/", "/page&#47;") if "/page/" in target else target
        elif form == 4:  # relative ../ form (same-host only)
            href = ("../" + "/".join(target.split("/")[3:])) if t_host == host else target
        else:
            href = target
        parts.append(f'<a href="{href}">link {k}</a>')

    # dead link (absent from web → 404 broken)
    if i % 8 == 3:
        parts.append(f'<a href="http://{host}/missing/{i}">dead</a>')
    # unsupported schemes (Engine.cs:41)
    if i % 10 == 6:
        parts.append(f'<a href="mailto:someone-{i}@example.test">mail</a>')
    if i % 20 == 14:
        parts.append(f'<a href="ftp://files.test/pub/{i}">ftp</a>')
    # robots-disallowed target
    if i % 15 == 9:
        parts.append(f'<a href="http://{host}/private/area-{i}">private</a>')

    # images (HEAD-class, img→src)
    if image_ids and i % 2 == 0:
        parts.append(f'<img src="{_img_url(image_ids[i % len(image_ids)])}" alt="im"/>')
    # ghost image: served by the site, absent from the corpus
    if i % 25 == 21:
        parts.append(f'<img src="{_img_url(f"ghost_{i % 2}")}" alt="ghost"/>')
    # script (HEAD-class, script→src)
    if i % 7 == 1:
        parts.append(f'<script src="/js/app-{i % 5}.js"></script>')

    parts.append("</body></html>")
    return "".join(parts)


def _make_css(k, host, image_ids) -> str:
    """CSS with background-image + @font-face (1 and 2+ url() terms)."""
    lines = [
        ".banner-%d { background-image: url('%s'); }"
        % (k, _img_url(image_ids[k % len(image_ids)]) if image_ids else "/img/none.bin")
    ]
    if k % 2 == 0:
        # two url() terms — the case the reference's >1 quirk does check
        lines.append(
            "@font-face { font-family: F%d; src: url('%s') format('truetype'), "
            "url('/fonts/missing-%d.woff') format('woff'); }" % (k, _font_url(host, k), k)
        )
    else:
        # single url() term — the reference quirk would skip this; we check it
        lines.append(
            "@font-face { font-family: G%d; src: url('/fonts/missing-single-%d.ttf'); }"
            % (k, k)
        )
    return "\n".join(lines)
