"""Independent single-threaded BFS crawl oracle (SURVEY.md §5.3).

This is the auditable, sequential statement of the crawl contract — the
deterministic idealization of the reference engine's racy task-tree crawl
(/root/reference/SpiderEngine/Engine.cs:313-346) plus the north-rule
additions (politeness budgets, robots gating).  The Spark engine must
reproduce its final seen set, crawl ordering, results, and reports exactly.

Epoch contract (both implementations follow this to the letter):

  1. POLITENESS: within each host, order frontier rows by
     (priority, crawl_depth, discovery_rank); the first `budget(host)` rows
     form this epoch's batch, the rest carry over unchanged (W1/A4/O3).
  2. CLAIM: batch URLs enter the seen set before fetching — the Spark
     analog of ScanResults.TryGetScanResult's insert-once claim
     (/root/reference/SpiderInterface/ScanResults.cs:16-45).
  3. FETCH: look the URL up in the `web` table; absent → 404 (dead link);
     status 0 → network error (classification 'error').  content_type is
     recorded only for 2xx (the reference sets ScanResult.ContentType only
     in the 2xx branch, Engine.cs:172-174).
  4. RESULTS: one row per fetched URL, classified ok / redirect / broken /
     error (P11).  Redirects are classified, never followed
     (Engine.cs:194-200).
  5. EXPAND (candidate generation), for 2xx rows only:
       * text/html ∧ may_contain_links: parse page once (P8/P9).
         - anchor/script/link/img candidates only when the page passes the
           EXPANSION gate ∧ expand_links.  EXPANSION gate = the page's
           scheme+authority equals a seed's: Engine.cs:76 trims BaseUri to
           GetLeftPart(Authority), so Engine.cs:171's IsBaseOf is an
           authority-equality test, generalized here to the SET of seed
           authorities (multi-seed = union of per-seed reference runs);
         - the distinct META gate (canonical/description emission, step 5b
           below and CanonicalChecker.cs:34-36) uses the UN-trimmed seed
           URL's IsBaseOf: segment-truncated path-prefix match
           (base_prefix_of) against ANY seed's base prefix;
         - embedded <style> css url() targets are extracted regardless of
           in-site (Engine.cs:176-183: ProcessEmbededCss is outside the
           isStillInSite gate), tag='css', HEAD-class, never expanded.
       * text/css: url() targets (P10), tag='css', HEAD-class, never
         expanded (CssChecker.cs Process(pageContainsLink=false,
         processChildrenLinks=false)).
  6. ORDER: all candidates of the epoch sort by
     (parent_rank, tag_rank, doc_pos) — the W2 deterministic BFS tie-break:
     depth-major (epochs), then parent discovery order, then the
     reference's tag iteration order a<script<link<img (Engine.cs:42-49)
     with css=4, then document position.
  7. DEDUP+GATE, sequentially in that order (keep-first = W3):
       * skip if already seen, in the carry, or added earlier this epoch;
       * non-http(s) scheme → results row 'unsupported'
         (Engine.cs:263-273), consumes a discovery_rank, enters seen;
       * robots-disallowed path prefix → results row 'robots_blocked'
         (north-rule F10), consumes a rank, enters seen;
       * else → new frontier entry at depth parent+1, inheriting the
         parent's priority and seed, with discovery_rank = next counter.
  8. next frontier = carry + new entries; epoch += 1; stop when empty.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit

from linkkchecker_net_spark.kernels.canonicalize import (
    authority_of,
    base_prefix_of,
    canonical_segments_match,
    canonicalize,
    host_of,
)
from linkkchecker_net_spark.kernels.classify import REDIRECT_CODES
from linkkchecker_net_spark.kernels.cssparse import extract_css_urls
from linkkchecker_net_spark.kernels.htmlparse import parse_page

CSS_TAG_RANK = 4


def _rule_match(path: str, pattern: str) -> bool:
    """One RFC 9309 Disallow rule: plain patterns are prefixes; '*'
    matches any octet run; a trailing '$' anchors at path end.  The
    Spark twin is kernels/robotsparse.rule_match_expr (pinned equal by
    the wildcard-robots golden crawl)."""
    import re

    if "*" in pattern or pattern.endswith("$"):
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rex = "^" + ".*".join(re.escape(seg) for seg in body.split("*"))
        if anchored:
            rex += "$"
        return re.match(rex, path) is not None
    return path.startswith(pattern)


def classify(status, error, unsupported):
    if unsupported:
        return "unsupported"
    if error is not None:
        return "error"
    if status is not None and 200 <= status < 300:
        return "ok"
    if status in REDIRECT_CODES:
        return "redirect"
    return "broken"


@dataclass
class FrontierEntry:
    url: str
    host: str
    priority: int
    crawl_depth: int
    parent_url: str | None
    seed_url: str
    seed_host: str
    may_contain_links: bool
    expand_links: bool
    discovery_rank: int


@dataclass
class OracleCrawl:
    web: dict  # url -> web row dict
    robots: dict  # host -> robots row dict
    default_budget: int | None = None  # None = unbounded (engine sentinel parity)
    results: list = field(default_factory=list)
    page_meta: list = field(default_factory=list)
    seen: dict = field(default_factory=dict)  # url -> first_depth
    frontier: list = field(default_factory=list)
    seed_authorities: set = field(default_factory=set)
    seed_prefixes: set = field(default_factory=set)
    next_rank: int = 0
    epoch: int = 0

    def robots_disallowed(self, url: str, host: str) -> bool:
        rob = self.robots.get(host)
        if not rob or not rob.get("disallow"):
            return False
        path = urlsplit(url).path or "/"
        return any(_rule_match(path, p) for p in rob["disallow"])

    def budget(self, host: str) -> int:
        rob = self.robots.get(host)
        if rob and rob.get("budget") is not None:
            return rob["budget"]
        return 2**62 if self.default_budget is None else self.default_budget

    def init_seeds(self, seeds: list[dict]) -> None:
        for s in seeds:
            raw = (s["seed_url"] or "").strip()
            # EngineConfig.cs:58-70 — default the scheme to http:// when
            # the seed doesn't start with "http"
            if raw and not raw.lower().startswith("http"):
                raw = "http://" + raw
            url = canonicalize(None, raw)
            if url is None or url in self.seen:
                continue
            host = host_of(url) or ""
            auth = authority_of(url)
            if auth is not None:
                self.seed_authorities.add(auth)
            pref = base_prefix_of(url)
            if pref is not None:
                self.seed_prefixes.add(pref)
            self.seen[url] = 0
            self.frontier.append(
                FrontierEntry(
                    url=url,
                    host=host,
                    priority=s.get("priority", 0),
                    crawl_depth=0,
                    parent_url=None,
                    seed_url=url,
                    seed_host=host,
                    may_contain_links=True,
                    expand_links=True,
                    discovery_rank=self.next_rank,
                )
            )
            self.next_rank += 1

    # NOTE: seeds are claimed at init (they are the epoch-0 batch by
    # construction; budgets larger than the seed list make this identical
    # to claim-at-batch).  Discovered URLs are claimed in run_epoch.

    def run_epoch(self) -> bool:
        if not self.frontier:
            return False
        # 1. politeness: per-host rank, take top-budget
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in self.frontier:
            by_host.setdefault(e.host, []).append(e)
        batch: list[FrontierEntry] = []
        carry: list[FrontierEntry] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (e.priority, e.crawl_depth, e.discovery_rank))
            b = self.budget(host)
            batch.extend(entries[:b])
            carry.extend(entries[b:])
        batch.sort(key=lambda e: e.discovery_rank)

        # 2. claim
        for e in batch:
            if e.url not in self.seen:
                self.seen[e.url] = e.crawl_depth

        candidates = []  # (parent_rank, tag_rank, doc_pos, entry, href, may, expand)
        for e in batch:
            row = self.web.get(e.url)
            status, error, ct, image_id = None, None, None, None
            if row is None:
                status = 404
            elif row["status"] == 0:
                error = "connection error"
            else:
                status = row["status"]
                if 200 <= status < 300:
                    ct = row["content_type"]
                    image_id = row.get("image_id")
            cls = classify(status, error, False)
            self.results.append(
                dict(
                    url=e.url,
                    host=e.host,
                    status=status,
                    error=error,
                    unsupported_scheme=False,
                    content_type=ct,
                    classification=cls,
                    parent_url=e.parent_url,
                    seed_url=e.seed_url,
                    crawl_depth=e.crawl_depth,
                    discovery_rank=e.discovery_rank,
                    epoch=self.epoch,
                    image_id=image_id,
                )
            )
            if cls != "ok":
                continue
            # EXPANSION gate: scheme+authority equality with a seed
            # (Engine.cs:76 BaseUri = GetLeftPart(Authority) + :171);
            # META gate: the full seed URL's IsBaseOf
            # (CanonicalChecker.cs:34 steps[0].Uri — path-prefix)
            in_site = authority_of(e.url) in self.seed_authorities
            if ct == "text/html" and e.may_contain_links:
                parsed = parse_page(row["body"])
                if e.url.startswith(tuple(sorted(self.seed_prefixes))):
                    self.page_meta.append(
                        dict(
                            url=e.url,
                            canonical_href=parsed["canonical_href"],
                            meta_description=parsed["meta_description"],
                            crawl_depth=e.crawl_depth,
                            epoch=self.epoch,
                        )
                    )
                if in_site and e.expand_links:
                    for ln in parsed["links"]:
                        candidates.append(
                            (
                                e.discovery_rank,
                                ln["tag_rank"],
                                ln["doc_pos"],
                                e,
                                ln["href"],
                                ln["may_contain_links"],
                                True,
                            )
                        )
                # embedded css is scanned regardless of in-site
                pos = 0
                for block in parsed["embedded_css"]:
                    for href in extract_css_urls(block):
                        candidates.append(
                            (e.discovery_rank, CSS_TAG_RANK, pos, e, href, False, False)
                        )
                        pos += 1
            elif ct == "text/css":
                for pos, href in enumerate(extract_css_urls(row["body"])):
                    candidates.append(
                        (e.discovery_rank, CSS_TAG_RANK, pos, e, href, False, False)
                    )

        # 6. deterministic order; 7. sequential dedup + gates
        candidates.sort(key=lambda c: (c[0], c[1], c[2]))
        carry_urls = {e.url for e in carry}
        new_entries: list[FrontierEntry] = []
        added = set()
        for parent_rank, tag_rank, doc_pos, parent, href, may, expand in candidates:
            url = canonicalize(parent.url, href)
            if url is None:
                continue
            if url in self.seen or url in carry_urls or url in added:
                continue
            depth = parent.crawl_depth + 1
            scheme = url.split(":", 1)[0].lower()
            if scheme not in ("http", "https"):
                self.seen[url] = depth
                added.add(url)
                self.results.append(
                    dict(
                        url=url,
                        host=None,
                        status=None,
                        error=None,
                        unsupported_scheme=True,
                        content_type=None,
                        classification="unsupported",
                        parent_url=parent.url,
                        seed_url=parent.seed_url,
                        crawl_depth=depth,
                        discovery_rank=self.next_rank,
                        epoch=self.epoch,
                        image_id=None,
                    )
                )
                self.next_rank += 1
                continue
            host = host_of(url) or ""
            if self.robots_disallowed(url, host):
                self.seen[url] = depth
                added.add(url)
                self.results.append(
                    dict(
                        url=url,
                        host=host,
                        status=None,
                        error=None,
                        unsupported_scheme=False,
                        content_type=None,
                        classification="robots_blocked",
                        parent_url=parent.url,
                        seed_url=parent.seed_url,
                        crawl_depth=depth,
                        discovery_rank=self.next_rank,
                        epoch=self.epoch,
                        image_id=None,
                    )
                )
                self.next_rank += 1
                continue
            added.add(url)
            new_entries.append(
                FrontierEntry(
                    url=url,
                    host=host,
                    priority=parent.priority,
                    crawl_depth=depth,
                    parent_url=parent.url,
                    seed_url=parent.seed_url,
                    seed_host=parent.seed_host,
                    may_contain_links=may,
                    expand_links=expand,
                    discovery_rank=self.next_rank,
                )
            )
            self.next_rank += 1

        self.frontier = carry + new_entries
        self.epoch += 1
        return True

    def run(self, seeds: list[dict], max_epochs: int = 1000) -> None:
        self.init_seeds(seeds)
        while self.frontier and self.epoch < max_epochs:
            self.run_epoch()


def crawl_oracle(
    web_rows: list[dict],
    seeds: list[dict],
    robots_rows: list[dict] | None = None,
    default_budget: int | None = None,
    max_epochs: int = 1000,
) -> OracleCrawl:
    web = {r["url"]: r for r in web_rows}
    robots = {r["host"]: r for r in (robots_rows or [])}
    oc = OracleCrawl(web=web, robots=robots, default_budget=default_budget)
    oc.run(seeds, max_epochs=max_epochs)
    return oc


# ---------------------------------------------------------------------------
# report oracles (SURVEY.md §3.3)
# ---------------------------------------------------------------------------


def canonical_report(page_meta: list[dict]) -> list[dict]:
    out = []
    for pm in page_meta:
        href = pm["canonical_href"]
        if href is None:
            verdict = "missing"
        elif canonical_segments_match(pm["url"], href):
            verdict = "ok"
        else:
            verdict = "mismatch"
        out.append(dict(url=pm["url"], verdict=verdict))
    return out


def description_report(page_meta: list[dict]) -> list[dict]:
    """DescriptionLengthChecker.cs:41-69: length >= 160 ok, 0/absent
    missing, else too_short; sorted desc by length."""
    out = []
    for pm in page_meta:
        desc = pm["meta_description"]
        length = len(desc) if desc is not None else 0
        verdict = "ok" if length >= 160 else ("missing" if length == 0 else "too_short")
        out.append(dict(url=pm["url"], length=length, verdict=verdict))
    out.sort(key=lambda r: (-r["length"], r["url"]))
    return out


def sitemap_report(
    sitemaps: list[dict], results: list[dict], web: dict, seed_hosts: set[str]
) -> list[dict]:
    """SiteMapChecker.cs:40-58: for each sitemap loc of a crawled site —
    already crawled → ok iff 2xx; else probe (HEAD) and classify."""
    by_url = {r["url"]: r for r in results}
    out = []
    for sm in sitemaps:
        if sm["host"] not in seed_hosts:
            continue
        for loc in sm["loc"] or []:
            url = canonicalize(None, loc)
            if url is None:
                continue
            r = by_url.get(url)
            if r is not None:
                ok = r["status"] is not None and 200 <= r["status"] < 300
            else:
                row = web.get(url)
                ok = row is not None and row["status"] is not None and 200 <= row["status"] < 300
            out.append(dict(loc=url, verdict="ok" if ok else "not_ok"))
    out.sort(key=lambda r: r["loc"])
    return out


def used_images_report(corpus: list[dict], results: list[dict]) -> list[dict]:
    """UsedImagesChecker.cs:70-125 analog: corpus ids vs image ids actually
    fetched from the site (image MIME rows), both directions (J3/J4)."""
    image_mimes = {"image/jpeg", "image/jpg", "image/png", "image/gif", "image/tiff"}
    corpus_ids = {c["image_id"] for c in corpus}
    site_ids = {
        r["image_id"]
        for r in results
        if r["content_type"] in image_mimes and r["image_id"] is not None
    }
    out = [
        dict(image_id=i, verdict="not_used_in_site") for i in sorted(corpus_ids - site_ids)
    ] + [dict(image_id=i, verdict="not_in_project") for i in sorted(site_ids - corpus_ids)]
    return out
