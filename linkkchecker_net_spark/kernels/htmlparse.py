"""P8 + P9 — one-pass HTML page parse.

One parse per page, many outputs (SURVEY.md §2.2 P8/P9):

  * link candidates from the reference's tag→attribute map
    {a→href, script→src, link→href, img→src}
    (/root/reference/SpiderEngine/Engine.cs:42-49), walked per tag in
    document order (Engine.cs:307-320).  ``may_contain_links`` is true for
    ``<a>`` and ``<link rel="stylesheet">`` (Engine.cs:324-326) — the
    GET-vs-HEAD split.
  * ``tag_rank`` encodes the reference's tag iteration order
    a < script < link < img — the W2 deterministic-BFS tie-break.
  * single-node queries: ``<link rel="canonical" href>``
    (/root/reference/SpiderEngine/CanonicalChecker.cs:38-42),
    ``<meta name="description" content>``
    (/root/reference/SpiderEngine/DescriptionLengthChecker.cs:41-44),
    and ``<style>`` inner text blocks (Engine.cs:280-289).

stdlib ``html.parser`` (no lxml in this sandbox); invoked only inside
Arrow-batched pandas UDFs so the JVM↔Python boundary stays vectorized.
"""

from __future__ import annotations

import re
from html import unescape as _unescape
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F

from linkkchecker_net_spark import schemas

TAG_ATTR = {"a": "href", "script": "src", "link": "href", "img": "src"}
TAG_RANK = {"a": 0, "script": 1, "link": 2, "img": 3}


class _PageParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str, bool, int, int]] = []
        self._per_tag_pos = {t: 0 for t in TAG_ATTR}
        self.canonical_href: str | None = None
        self.meta_description: str | None = None
        self.embedded_css: list[str] = []
        self._in_style = False
        self._style_buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        amap = dict(attrs)
        if tag == "style":
            self._in_style = True
            self._style_buf = []
            return
        if tag in TAG_ATTR:
            href = amap.get(TAG_ATTR[tag])
            if href is not None:
                may = tag == "a" or (
                    tag == "link" and amap.get("rel", "") == "stylesheet"
                )
                pos = self._per_tag_pos[tag]
                self._per_tag_pos[tag] = pos + 1
                self.links.append((tag, href, may, TAG_RANK[tag], pos))
        if tag == "link" and amap.get("rel") == "canonical":
            if self.canonical_href is None and amap.get("href") is not None:
                self.canonical_href = amap["href"]
        if tag == "meta" and amap.get("name") == "description":
            if self.meta_description is None:
                self.meta_description = amap.get("content")

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag.lower() == "style" and self._in_style:
            self._in_style = False
            self.embedded_css.append("".join(self._style_buf))

    def handle_data(self, data):
        if self._in_style:
            self._style_buf.append(data)


def parse_page_htmlparser(body: bytes | str | None) -> dict:
    """Reference implementation over stdlib html.parser — byte-exact spec
    for the fast scanner below (kept for the equivalence test; the
    char-level state machine runs at ~10 MB/s, which made parsing 55% of
    all epoch CPU at bench scale)."""
    empty = {
        "links": [],
        "canonical_href": None,
        "meta_description": None,
        "embedded_css": [],
    }
    if body is None:
        return empty
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", errors="replace")
    p = _PageParser()
    try:
        p.feed(body)
        p.close()
    except Exception:
        return empty
    return {
        "links": [
            {
                "tag": t,
                "href": h,
                "may_contain_links": m,
                "tag_rank": r,
                "doc_pos": pos,
            }
            for (t, h, m, r, pos) in p.links
        ],
        "canonical_href": p.canonical_href,
        "meta_description": p.meta_description,
        "embedded_css": p.embedded_css,
    }


# one compiled scan for the six tags the pipeline reads; quoted attribute
# values are consumed wholesale so '>' inside quotes never ends the tag.
# BYTE patterns: the hot path scans the raw parquet binary — the ~30 KB
# body is never decoded to a Python str (the decode alone wrote a full
# second copy of every page through the cache hierarchy, the dominant
# per-URL memory traffic at saturated-crawl scale); only the extracted
# slices (hrefs, meta values, style blocks — a few hundred bytes/page)
# are decoded.  Byte-mode re.IGNORECASE is ASCII-only, which matches
# html.parser's own ASCII tagfind semantics.
_TAG_RE = re.compile(
    rb"<(a|script|link|img|meta|style)(?=[\s/>])"
    rb"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",
    re.IGNORECASE | re.DOTALL,
)
_ATTR_RE = re.compile(
    rb"([^\s/>=]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)
_STYLE_END = re.compile(rb"</style", re.IGNORECASE)
_SCRIPT_END = re.compile(rb"</script", re.IGNORECASE)
# literal finds as compiled patterns so the scanner runs on ANY bytes-like
# buffer (memoryview slices of an Arrow data buffer have no .find)
_COMMENT_OPEN = re.compile(rb"<!--")
_COMMENT_END = re.compile(rb"-->")
_GT = re.compile(rb">")


# fast path: the overwhelmingly common single-double-quoted-attribute tag
# body (' href="..."'), no entities — one match, no finditer loop
_SIMPLE_ATTR_RE = re.compile(rb"\s+([a-zA-Z-]+)=\"([^\"&]*)\"\s*(/?)\s*")

# byte-keyed views of the tag maps (keys stay bytes — never decoded; the
# emitted tag name is the interned str)
_TAG_ATTR_B = {b"a": b"href", b"script": b"src", b"link": b"href", b"img": b"src"}
_TAG_NAME_B = {b"a": "a", b"script": "script", b"link": "link", b"img": "img"}
_TAG_RANK_B = {b"a": 0, b"script": 1, b"link": 2, b"img": 3}


def _attrs_of(raw: bytes) -> tuple[dict, bool]:
    """(attrs, self_closing) from a raw tag body.  Keys are BYTES
    (lowercased, never decoded); values are decoded str (or None for a
    valueless attribute — html.parser semantics).  self_closing iff a
    trailing '/' remains AFTER attribute consumption — html.parser's rule:
    '<script defer/>' is a startendtag (no CDATA), '<script src=http://x/>'
    is not (the '/' is part of the unquoted value)."""
    m = _SIMPLE_ATTR_RE.fullmatch(raw)
    if m is not None:
        return (
            {m.group(1).lower(): m.group(2).decode("utf-8", "replace")},
            m.group(3) == b"/",
        )
    out = {}
    last_end = 0
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        v = m.group(2)
        if v is None:
            v = m.group(3)
        if v is None:
            v = m.group(4)
        # an attribute written without '=' carries value None (html.parser
        # semantics); entity references in values are always unescaped
        if v is not None:
            v = v.decode("utf-8", "replace")
            if "&" in v:
                v = _unescape(v)
        out[name] = v  # duplicate attr: last wins (dict(attrs) semantics)
        last_end = m.end()
    return out, raw[last_end:].strip().endswith(b"/")


def scan_page(
    body: bytes | str | None,
) -> tuple[list[tuple], str | None, str | None, list[str]]:
    """One compiled-regex scan of a raw HTML byte buffer →
    ``(links, canonical_href, meta_description, embedded_css)`` where each
    link is a ``(tag, href, may_contain_links, tag_rank, doc_pos)`` tuple.

    This is the allocation-lean core the fused epoch kernel calls directly
    (tuples, not per-link dicts — the dict build was measurable at ~150
    links/page × 10^5 pages/epoch); :func:`parse_page` wraps it into the
    PARSED_PAGE dict shape.  Semantics are pinned to
    :func:`parse_page_htmlparser` — comments masked, <script>/<style>
    bodies are CDATA (tags inside them are never link candidates; charrefs
    stay raw), style inner text captured as embedded_css, attribute values
    unescaped, first-canonical/first-description win — asserted over every
    fixture corpus by test_kernels.py::test_fast_parser_equivalence."""
    if body is None:
        return [], None, None, []
    if isinstance(body, str):
        # str callers (tests, oracle) funnel through the same byte scanner;
        # the boundary bytes (quotes, '<', '>') are ASCII, so slicing can
        # never split a multi-byte sequence differently than a full decode
        body = body.encode("utf-8", "replace")
    # bytes / bytearray / memoryview all scan as-is: re accepts any
    # bytes-like buffer, so an Arrow data-buffer memoryview parses with
    # ZERO copies of the page payload (the mapInArrow epoch path)

    links: list = []
    per_tag = [0, 0, 0, 0]  # indexed by tag_rank
    canonical = None
    desc = None
    css: list[str] = []
    pos, n = 0, len(body)
    search = _TAG_RE.search
    while True:
        m = search(body, pos)
        if m is None:
            break
        # comment masking: a '<!--' opening before this match swallows
        # everything to the matching '-->'
        c = _COMMENT_OPEN.search(body, pos, m.start())
        if c is not None:
            e = _COMMENT_END.search(body, c.end())
            pos = n if e is None else e.end()
            continue
        tag = m.group(1).lower()
        attrs, selfclose = _attrs_of(m.group(2))
        pos = m.end()
        akey = _TAG_ATTR_B.get(tag)
        if akey is not None:
            href = attrs.get(akey)
            if href is not None:
                may = tag == b"a" or (
                    tag == b"link" and attrs.get(b"rel", "") == "stylesheet"
                )
                r = _TAG_RANK_B[tag]
                links.append((_TAG_NAME_B[tag], href, may, r, per_tag[r]))
                per_tag[r] += 1
        if tag == b"link" and attrs.get(b"rel") == "canonical":
            if canonical is None and attrs.get(b"href") is not None:
                canonical = attrs[b"href"]
        elif tag == b"meta" and attrs.get(b"name") == "description":
            if desc is None:
                desc = attrs.get(b"content")
        elif tag == b"style":
            # CDATA: raw inner text (charrefs NOT converted inside
            # style/script — html.parser skips conversion in cdata mode);
            # an unterminated style block is never emitted (the reference
            # parser only appends on the end tag)
            e = _STYLE_END.search(body, pos)
            if e is None:
                break
            css.append(bytes(body[pos : e.start()]).decode("utf-8", "replace"))
            gt = _GT.search(body, e.end())
            pos = n if gt is None else gt.end()
        elif tag == b"script" and not selfclose:
            # CDATA: nothing inside a script body is a tag
            e = _SCRIPT_END.search(body, pos)
            if e is None:
                break
            gt = _GT.search(body, e.end())
            pos = n if gt is None else gt.end()
    return links, canonical, desc, css


def parse_page(body: bytes | str | None) -> dict:
    """Parse one HTML document → PARSED_PAGE dict (links + P9 extractions).

    Dict-shaped wrapper over :func:`scan_page` (the byte-mode compiled
    scanner — ~40x the stdlib char-level state machine; parsing was 55% of
    all epoch CPU before it).  Kept for the PARSED_PAGE UDF and the pytest
    BFS oracle; the fused epoch kernel consumes scan_page tuples directly."""
    links, canonical, desc, css = scan_page(body)
    return {
        "links": [
            {
                "tag": t,
                "href": h,
                "may_contain_links": m,
                "tag_rank": r,
                "doc_pos": p,
            }
            for (t, h, m, r, p) in links
        ],
        "canonical_href": canonical,
        "meta_description": desc,
        "embedded_css": css,
    }


@F.pandas_udf(schemas.PARSED_PAGE)
def parse_page_udf(body: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized page parse: binary Series → PARSED_PAGE struct."""
    parsed = [parse_page(b) for b in body]
    return pd.DataFrame(parsed)
