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
# values are consumed wholesale so '>' inside quotes never ends the tag
_TAG_RE = re.compile(
    r"<(a|script|link|img|meta|style)(?=[\s/>])"
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",
    re.IGNORECASE | re.DOTALL,
)
_ATTR_RE = re.compile(
    r"([^\s/>=]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)
_STYLE_END = re.compile(r"</style", re.IGNORECASE)
_SCRIPT_END = re.compile(r"</script", re.IGNORECASE)


# fast path: the overwhelmingly common single-double-quoted-attribute tag
# body (' href="..."'), no entities — one match, no finditer loop
_SIMPLE_ATTR_RE = re.compile(r"\s+([a-zA-Z-]+)=\"([^\"&]*)\"\s*(/?)\s*$")


def _attrs_of(raw: str) -> tuple[dict, bool]:
    """(attrs, self_closing).  self_closing iff a trailing '/' remains
    AFTER attribute consumption — html.parser's rule: '<script defer/>' is
    a startendtag (no CDATA), '<script src=http://x/>' is not (the '/' is
    part of the unquoted value)."""
    m = _SIMPLE_ATTR_RE.fullmatch(raw)
    if m is not None:
        return {m.group(1).lower(): m.group(2)}, m.group(3) == "/"
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
        if v is not None and "&" in v:
            v = _unescape(v)
        out[name] = v  # duplicate attr: last wins (dict(attrs) semantics)
        last_end = m.end()
    return out, raw[last_end:].strip().endswith("/")


def parse_page(body: bytes | str | None) -> dict:
    """Parse one HTML document → PARSED_PAGE dict (links + P9 extractions).

    Fast path: a compiled-regex scanner that touches each byte once at
    C speed instead of the stdlib char-level state machine (~40x on the
    bench pages; parsing was 55% of all epoch CPU).  Semantics are pinned
    to :func:`parse_page_htmlparser` — comments masked, <script>/<style>
    bodies are CDATA (tags inside them are never link candidates; charrefs
    stay raw), style inner text is captured as embedded_css, attribute
    values unescaped, first-canonical/first-description win — and the
    equivalence is asserted over every fixture corpus by
    test_kernels.py::test_fast_parser_equivalence."""
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

    links: list = []
    per_tag = {t: 0 for t in TAG_ATTR}
    canonical = None
    desc = None
    css: list[str] = []
    pos, n = 0, len(body)
    while True:
        m = _TAG_RE.search(body, pos)
        if m is None:
            break
        # comment masking: a '<!--' opening before this match swallows
        # everything to the matching '-->'
        c = body.find("<!--", pos, m.start())
        if c != -1:
            e = body.find("-->", c + 4)
            pos = n if e == -1 else e + 3
            continue
        tag = m.group(1).lower()
        raw = m.group(2)
        attrs, selfclose = _attrs_of(raw)
        pos = m.end()
        if tag in TAG_ATTR:
            href = attrs.get(TAG_ATTR[tag])
            if href is not None:
                may = tag == "a" or (
                    tag == "link" and attrs.get("rel", "") == "stylesheet"
                )
                p = per_tag[tag]
                per_tag[tag] = p + 1
                links.append(
                    {
                        "tag": tag,
                        "href": href,
                        "may_contain_links": may,
                        "tag_rank": TAG_RANK[tag],
                        "doc_pos": p,
                    }
                )
        if tag == "link" and attrs.get("rel") == "canonical":
            if canonical is None and attrs.get("href") is not None:
                canonical = attrs["href"]
        elif tag == "meta" and attrs.get("name") == "description":
            if desc is None:
                desc = attrs.get("content")
        elif tag == "style":
            # CDATA: raw inner text (charrefs NOT converted inside
            # style/script — html.parser skips conversion in cdata mode);
            # an unterminated style block is never emitted (the reference
            # parser only appends on the end tag)
            e = _STYLE_END.search(body, pos)
            if e is None:
                break
            css.append(body[pos : e.start()])
            gt = body.find(">", e.end())
            pos = n if gt == -1 else gt + 1
        elif tag == "script" and not selfclose:
            # CDATA: nothing inside a script body is a tag
            e = _SCRIPT_END.search(body, pos)
            if e is None:
                break
            gt = body.find(">", e.end())
            pos = n if gt == -1 else gt + 1
    return {
        "links": links,
        "canonical_href": canonical,
        "meta_description": desc,
        "embedded_css": css,
    }


@F.pandas_udf(schemas.PARSED_PAGE)
def parse_page_udf(body: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized page parse: binary Series → PARSED_PAGE struct."""
    parsed = [parse_page(b) for b in body]
    return pd.DataFrame(parsed)
