"""Anchor-text extraction — the training-corpus signal the crawl graph
carries beyond hrefs.

The reference extracts only the href attribute (tag→attribute map,
/root/reference/SpiderEngine/Engine.cs:42-49); the text BETWEEN
``<a …>`` and ``</a>`` is what retrieval / LLM pipelines aggregate per
target URL (anchor corpora).  This kernel is deliberately SEPARATE from
the crawl hot path (kernels/htmlparse.py + the byte-mode scanner): it is
invoked only by the anchor-corpus pipeline operator, so the
reference-pinned parser equivalence and the bench parse path are
untouched.

stdlib ``html.parser`` with ``convert_charrefs=True`` — entities arrive
decoded; inner markup (``<a href=x>foo <b>bar</b></a>``) contributes its
text.  A new ``<a>`` implicitly closes an open one (browsers forbid
nested anchors); an anchor left open at EOF is still emitted.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS = re.compile(r"\s+")


class _AnchorParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            text = _WS.sub(" ", "".join(self._buf)).strip()
            self.anchors.append((self._href, text))
        self._href = None
        self._buf = []

    def handle_starttag(self, tag, attrs):
        if tag.lower() == "a":
            self._flush()
            href = dict(attrs).get("href")
            if href is not None:
                self._href = href

    def handle_endtag(self, tag):
        if tag.lower() == "a":
            self._flush()

    def handle_data(self, data):
        if self._href is not None:
            self._buf.append(data)

    def close(self):  # EOF: emit a dangling open anchor
        super().close()
        self._flush()


def extract_anchor_texts(body) -> list[tuple[str, str]]:
    """(href, whitespace-collapsed text) per ``<a href>`` in doc order."""
    if body is None:
        return []
    if isinstance(body, (bytes, bytearray, memoryview)):
        body = bytes(body).decode("utf-8", errors="replace")
    p = _AnchorParser()
    try:
        p.feed(body)
        p.close()
    except Exception:
        pass  # truncated/hostile markup: keep what was parsed
    return p.anchors


_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
)


@F.pandas_udf(_SCHEMA)
def anchor_texts_udf(body: pd.Series) -> pd.Series:
    return body.map(extract_anchor_texts)
