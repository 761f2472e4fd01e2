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


def parse_page(body: bytes | str | None) -> dict:
    """Parse one HTML document → PARSED_PAGE dict (links + P9 extractions)."""
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


@F.pandas_udf(schemas.PARSED_PAGE)
def parse_page_udf(body: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized page parse: binary Series → PARSED_PAGE struct."""
    parsed = [parse_page(b) for b in body]
    return pd.DataFrame(parsed)
