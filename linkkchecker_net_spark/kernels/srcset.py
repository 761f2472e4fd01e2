"""Responsive-image srcset parsing — the image-candidate grammar the
reference's link walk skips.

The reference extracts <a>/<link rel=stylesheet>/<img src> only
(`SpiderEngine/Engine.cs:324-326`, `UsedImagesChecker.cs`); modern pages
serve MOST image bytes through `srcset` candidate lists
(`<img srcset="a.jpg 480w, b.jpg 800w" src="f.jpg">`, HTML spec
"image candidate string": comma-separated `URL [descriptor]`, descriptor
`Nw` width or `Nx` density).  A crawler that validates images (the
whole point of the reference) is blind to every hi-DPI variant unless it
parses this grammar, and an image-corpus pipeline (north rule: image +
caption table) harvests candidate URLs from exactly here.

Everything is whole-stage-codegen: one regexp_extract_all for the <img>
tags, per-tag attribute regexps, comma split + explode, whitespace split
per candidate.  Densities are held as INTEGER centi-units (1.5x -> 150)
so downstream ranking never crosses a float boundary.  The `chosen`
winner per <img> follows the spec's practical precedence: width
descriptors beat density descriptors beat the bare src fallback; within
a kind the largest value wins (ties broken by URL for determinism).

Scale: map-only until the final per-(page, img) window, which is
partitioned by page URL — millions of tiny groups, no skew beyond a
page carrying millions of <img> tags (structurally capped upstream by
max body size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

IMG_TAG_PAT = r"(?i)<img\b[^>]*>"
_SRCSET_PAT = r'(?i)srcset="([^"]*)"'
_SRC_PAT = r'(?i)src="([^"]*)"'


def srcset_candidates(
    pages: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """(url, img_idx, cand_url, kind, val_centi, chosen) per image
    candidate.

    kind: 'w' (width descriptor, val_centi = 100*N), 'x' (density,
    val_centi = round(100*density)), 'src' (bare fallback — emitted only
    when the tag has no non-empty srcset; val_centi NULL).  Malformed
    candidates (empty between commas, trailing comma) are dropped;
    descriptor-less srcset entries default to 1x per the spec.
    """
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(body_col), F.lit(IMG_TAG_PAT), 0)
        ).alias("img_idx", "tag"),
    ).select(
        "url",
        "img_idx",
        F.regexp_extract("tag", _SRCSET_PAT, 1).alias("ss"),
        F.regexp_extract("tag", _SRC_PAT, 1).alias("src"),
    )
    cands = (
        tags.filter(F.col("ss") != "")
        .select(
            "url",
            "img_idx",
            F.explode(F.split("ss", ",")).alias("cand"),
        )
        .select("url", "img_idx", F.trim("cand").alias("cand"))
        .filter(F.col("cand") != "")
        .select(
            "url",
            "img_idx",
            F.split("cand", r"\s+").alias("parts"),
        )
        .select(
            "url",
            "img_idx",
            F.element_at("parts", 1).alias("cand_url"),
            F.when(F.size("parts") > 1, F.element_at("parts", 2))
            .otherwise(F.lit("1x"))
            .alias("desc"),
        )
        .select(
            "url",
            "img_idx",
            "cand_url",
            F.when(F.col("desc").endswith("w"), F.lit("w"))
            .otherwise(F.lit("x"))
            .alias("kind"),
            F.when(
                F.col("desc").endswith("w"),
                F.expr("substring(desc, 1, length(desc)-1)").cast("long")
                * 100,
            )
            .otherwise(
                F.round(
                    F.expr("substring(desc, 1, length(desc)-1)").cast(
                        "double"
                    )
                    * 100
                ).cast("long")
            )
            .alias("val_centi"),
        )
    )
    fallback = (
        tags.filter((F.col("ss") == "") & (F.col("src") != ""))
        .select(
            "url",
            "img_idx",
            F.col("src").alias("cand_url"),
            F.lit("src").alias("kind"),
            F.lit(None).cast("long").alias("val_centi"),
        )
    )
    allc = cands.unionByName(fallback)
    kind_rank = (
        F.when(F.col("kind") == "w", F.lit(0))
        .when(F.col("kind") == "x", F.lit(1))
        .otherwise(F.lit(2))
    )
    w = Window.partitionBy("url", "img_idx").orderBy(
        kind_rank.asc(),
        F.col("val_centi").desc_nulls_last(),
        F.col("cand_url"),
    )
    return allc.withColumn(
        "chosen", F.row_number().over(w) == 1
    )


# ---------------------------------------------------------------------------
# <picture> element: type-negotiated source selection.  <picture> wraps
# ordered <source type= srcset=> alternatives around an <img> fallback
# (HTML spec 4.8.1-4.8.2): the user agent takes the FIRST source whose
# type it supports (a type-less source is unconditionally acceptable —
# media queries are a client-display concern a crawler ignores) and
# falls back to the <img> src when no source qualifies.  A crawler that
# only reads <img src> fetches the fallback JPEG while browsers fetch
# the WebP/AVIF variant — this operator surfaces exactly which URL a
# negotiating client would take.
# ---------------------------------------------------------------------------

_PICTURE_PAT = r"(?is)<picture\b.*?</picture>"
_SOURCE_TAG_PAT = r"(?i)<source\b[^>]*>"
_TYPE_PAT = r'(?i)(?:^|[\s"])type="([^"]*)"'

# formats the crawling client advertises (avif deliberately absent so
# the fallback ladder is exercised)
SUPPORTED_PICTURE_TYPES = ("image/webp", "image/jpeg", "image/png")


def picture_sources(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → one row per <picture>: (url, pic_idx,
    n_sources, chosen_url, chosen_type, chosen_from).

    ``chosen_url`` = the first URL of the winning <source>'s srcset
    candidate list (the 1x/first candidate — full candidate ranking is
    :func:`srcset_candidates`' job), or the <img> fallback src, or NULL
    with chosen_from='none' when neither exists.  A <source> qualifies
    when its type is empty/absent or ∈ SUPPORTED_PICTURE_TYPES and it
    carries a non-empty srcset.

    Map-only codegen: picture-block harvest → posexplode → per-block
    array filters; nothing shuffles.
    """
    pics = F.regexp_extract_all("body", F.lit(_PICTURE_PAT), 0)
    rows = pages.select(
        "url", F.posexplode(pics).alias("pic_idx", "block")
    )
    srcs = F.regexp_extract_all("block", F.lit(_SOURCE_TAG_PAT), 0)
    ok_srcs = F.filter(
        srcs,
        lambda t: F.lower(F.regexp_extract(t, _TYPE_PAT, 1)).isin(
            "", *SUPPORTED_PICTURE_TYPES
        )
        & (F.regexp_extract(t, _SRCSET_PAT, 1) != ""),
    )
    chosen_tag = F.when(F.size(ok_srcs) > 0, F.element_at(ok_srcs, 1))
    first_candidate = F.trim(
        F.split(F.regexp_extract(chosen_tag, _SRCSET_PAT, 1), ",")[0]
    )
    source_url = F.split(first_candidate, r"\s+")[0]
    img_src = F.nullif(
        F.regexp_extract("block", r'(?i)<img\b[^>]*(?:^|[\s"])src="([^"]*)"', 1),
        F.lit(""),
    )
    chosen_url = F.coalesce(source_url, img_src)
    chosen_from = (
        F.when(source_url.isNotNull(), "source")
        .when(img_src.isNotNull(), "img")
        .otherwise("none")
    )
    chosen_type = F.when(
        source_url.isNotNull(),
        F.lower(F.regexp_extract(chosen_tag, _TYPE_PAT, 1)),
    )
    return rows.select(
        "url",
        "pic_idx",
        F.size(srcs).alias("n_sources"),
        chosen_url.alias("chosen_url"),
        chosen_type.alias("chosen_type"),
        chosen_from.alias("chosen_from"),
    )
