"""S5 — sitemap.xml parse kernel.

Mirrors the reference's sitemap load
(/root/reference/SpiderEngine/SiteMapChecker.cs:26-28):

    XElement.Load(sitemapUri)
    root.Descendants(XName.Get("loc",
        "http://www.sitemaps.org/schemas/sitemap/0.9"))
        .Select(elt => elt.Value.Trim())

i.e. every ``<loc>`` element at ANY depth (``Descendants``) that is in the
sitemaps.org 0.9 namespace — elements named ``loc`` in another (or no)
namespace are ignored — with the text value whitespace-trimmed.  A document
that fails to parse yields no URLs (the reference catches the exception,
logs, and leaves the page list empty).

Exposed as an Arrow-vectorized pandas UDF over fetched ``sitemap.xml``
bodies (binary), so sitemap ingestion is one columnar pass over however
many sites a crawl covers — no per-row Python crosses the JVM boundary.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_LOC_TAG = f"{{{SITEMAP_NS}}}loc"


def parse_sitemap(body: bytes | str | None) -> list[str] | None:
    """All namespaced <loc> values (trimmed), or None on a parse error."""
    if body is None:
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None  # SiteMapChecker.cs:30-33 — error logged, no urls
    return [(el.text or "").strip() for el in root.iter(_LOC_TAG)]


@F.pandas_udf(T.ArrayType(T.StringType()))
def sitemap_locs_udf(body: pd.Series) -> pd.Series:
    return pd.Series([parse_sitemap(b) for b in body], dtype="object")
