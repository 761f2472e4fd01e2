"""HTML microdata (WHATWG) harvest: itemscope / itemtype / itemprop.

The third structured-data syntax next to JSON-LD (kernels/jsonld.py) and
the meta/OpenGraph family (reports/seo.py) — product/recipe/review markup
on the long-tail web is still predominantly microdata, so a crawl that
feeds an image+caption training corpus wants the per-page inventory:
how many item scopes, which schema.org types, which property names.

Reference analog: none (the C# engine extracts links only); part of the
from-scratch 100 TB-pipeline surface.

All extraction is whole-stage-codegen regexp over the raw body — the
same open-tag grammar the other kernels use (attribute order free,
double-quoted values, bare boolean attributes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# any open tag carrying the bare itemscope attribute
_ITEMSCOPE_TAG = r"(?i)<[a-z][^>]*\sitemscope(\s|>|=)"
_ITEMTYPE_ATTR = r'(?i)(?:^|[\s"])itemtype="([^"]*)"'
_ITEMPROP_ATTR = r'(?i)(?:^|[\s"])itemprop="([^"]*)"'


def microdata_stats(pages: DataFrame, max_props: int = 32) -> DataFrame:
    """pages: (url, body) → per-page microdata inventory:
    (url, n_itemscope, n_itemtype, first_itemtype, n_itemprop,
    n_distinct_props, has_schema_org).

    ``first_itemtype`` is the FIRST itemtype attribute's FIRST
    whitespace-separated token (itemtype is a space-separated URL list
    per spec); ``has_schema_org`` fires when any itemtype token is
    under schema.org (http or https).  ``n_distinct_props`` counts
    distinct itemprop names over the first `max_props` occurrences —
    the bounded fan-out cap every attribute harvest in this repo
    applies so a pathological page cannot blow up the row.

    Scale: map-only codegen — three regexp_extract_all + array ops per
    row, zero shuffles.
    """
    body = F.col("body")
    scopes = F.regexp_count(body, F.lit(_ITEMSCOPE_TAG))
    itypes = F.regexp_extract_all(body, F.lit(_ITEMTYPE_ATTR), 1)
    first_itemtype = F.when(
        F.size(itypes) > 0,
        F.nullif(
            F.element_at(
                F.filter(
                    F.split(F.trim(F.element_at(itypes, 1)), r"\s+"),
                    lambda t: t != "",
                ),
                1,
            ),
            F.lit(""),
        ),
    )
    iprops = F.slice(
        F.regexp_extract_all(body, F.lit(_ITEMPROP_ATTR), 1),
        1,
        int(max_props),
    )
    has_schema = F.exists(
        itypes,
        lambda t: t.rlike(r"(?i)^\s*https?://schema\.org/"),
    )
    return pages.select(
        "url",
        scopes.alias("n_itemscope"),
        F.size(itypes).alias("n_itemtype"),
        first_itemtype.alias("first_itemtype"),
        F.size(iprops).alias("n_itemprop"),
        F.size(F.array_distinct(iprops)).alias("n_distinct_props"),
        F.coalesce(has_schema, F.lit(False)).alias("has_schema_org"),
    )
