"""JSON-LD (schema.org) structured-data extraction — the third caption
source after ``<img alt>`` and OpenGraph (kernels/captions.py).

The reference never looks inside ``<script>`` bodies (its parser masks
them as CDATA precisely so their content cannot leak tags —
`SpiderEngine/HtmlParser.cs` skips script text wholesale).  A web-scale
image+caption harvest cannot afford that: publishers increasingly ship
the *authoritative* image metadata as JSON-LD ``ImageObject`` /
``Product`` blocks (``contentUrl`` + ``caption``/``name``), and Google
Images treats those fields as the canonical caption.  This kernel is
the additive harvest layer: one row per JSON-LD item with its declared
``@type``, best image URL and best caption text.

Shapes handled (all observed in the wild):
  * a bare top-level object  — one item;
  * a top-level ARRAY of objects — bounded fan-out, items
    ``$[0..max_array_items)`` (real-world blocks carry 1-3 items;
    the bound keeps the explode fan-out static for the optimizer);
  * malformed JSON (truncated/unbalanced) — one ``parse_ok=false``
    row with NULL fields, so corrupt blocks are auditable instead of
    silently dropped.

Field precedence: ``image_url = contentUrl ?? image ?? thumbnailUrl``
and ``caption = caption ?? name ?? headline`` — the schema.org
property ladder LAION-style harvesters use.

Scale: everything is JVM-side — ``regexp_extract_all`` for the script
blocks, ``get_json_object`` for the fields (Jackson inside codegen),
``posexplode`` with a statically bounded fan-out.  Map-only, ZERO
shuffles, no Python in the loop; the harvest rides the same scan as
link extraction at crawl time and the plan stays flat at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lazy body match so adjacent blocks never merge; (?is) = case-fold the
# tag/attr names and let the JSON span newlines
SCRIPT_LD_PAT = (
    r"""(?is)<script[^>]*type\s*=\s*["']application/ld\+json["']"""
    r"""[^>]*>(.*?)</script>"""
)


def jsonld_items(pages: DataFrame, max_array_items: int = 4) -> DataFrame:
    """Explode every JSON-LD item on every page.

    pages: (url string, body string) →
    (url, block_idx, item_idx, parse_ok, is_array, type, image_url,
    caption) — one row per item, plus one NULL-field row per malformed
    block.
    """
    blocks = pages.select(
        "url",
        F.posexplode(
            F.regexp_extract_all("body", F.lit(SCRIPT_LD_PAT), 1)
        ).alias("block_idx", "b"),
    )
    # get_json_object('$') is NULL iff the block is not valid JSON —
    # the same predicate DuckDB spells json_valid()
    parse_ok = F.get_json_object("b", "$").isNotNull()
    is_array = F.startswith(F.ltrim(F.col("b")), F.lit("["))
    arr_items = F.filter(
        F.array(
            *[
                F.get_json_object("b", f"$[{k}]")
                for k in range(max_array_items)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    items = (
        F.when(~parse_ok, F.array(F.lit(None).cast("string")))
        .when(is_array, arr_items)
        .otherwise(F.array(F.col("b")))
    )
    d = blocks.select(
        "url",
        "block_idx",
        parse_ok.alias("parse_ok"),
        is_array.alias("is_array"),
        F.posexplode(items).alias("item_idx", "item"),
    )
    return d.select(
        "url",
        "block_idx",
        "item_idx",
        "parse_ok",
        "is_array",
        F.get_json_object("item", "$['@type']").alias("type"),
        F.coalesce(
            F.get_json_object("item", "$.contentUrl"),
            F.get_json_object("item", "$.image"),
            F.get_json_object("item", "$.thumbnailUrl"),
        ).alias("image_url"),
        F.coalesce(
            F.get_json_object("item", "$.caption"),
            F.get_json_object("item", "$.name"),
            F.get_json_object("item", "$.headline"),
        ).alias("caption"),
    )


def breadcrumb_trails(pages: DataFrame, max_items: int = 6) -> DataFrame:
    """JSON-LD BreadcrumbList extraction: the site's own declaration of
    a page's position in its hierarchy — crawl schedulers use the trail
    depth as a priority signal (shallow = hub) and SEO audits check it
    against the URL path.  One row per breadcrumb item:
    (url, block_idx, item_idx, position, name, item_url, depth) where
    depth = the block's item count (bounded by ``max_items``, the same
    static fan-out bound jsonld_items uses) and position is the
    DECLARED ListItem position (audits compare it to item_idx+1).

    Same plan shape as jsonld_items: regexp block harvest +
    get_json_object field paths (Jackson inside codegen) + one bounded
    posexplode — map-only, zero shuffles, no Python.  Blocks that are
    not valid JSON or whose @type ≠ BreadcrumbList contribute nothing
    (jsonld_items is the malformed-block auditor).
    """
    blocks = pages.select(
        "url",
        F.posexplode(
            F.regexp_extract_all("body", F.lit(SCRIPT_LD_PAT), 1)
        ).alias("block_idx", "b"),
    ).filter(F.get_json_object("b", "$['@type']") == "BreadcrumbList")
    items = F.filter(
        F.array(
            *[
                F.struct(
                    F.get_json_object(
                        "b", f"$.itemListElement[{k}].position"
                    )
                    .cast("int")
                    .alias("position"),
                    F.get_json_object(
                        "b", f"$.itemListElement[{k}].name"
                    ).alias("name"),
                    F.get_json_object(
                        "b", f"$.itemListElement[{k}].item"
                    ).alias("item_url"),
                )
                for k in range(int(max_items))
            ]
        ),
        lambda s: s["name"].isNotNull(),
    )
    rows = blocks.select(
        "url",
        "block_idx",
        F.size(items).alias("depth"),
        F.posexplode(items).alias("item_idx", "it"),
    )
    return rows.select(
        "url",
        "block_idx",
        "item_idx",
        F.col("it.position").alias("position"),
        F.col("it.name").alias("name"),
        F.col("it.item_url").alias("item_url"),
        "depth",
    )
