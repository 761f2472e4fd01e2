"""Image+caption pair harvesting — the extraction step that FEEDS the
north-rule table.

The reference walks <img src> purely to validate the link
(`SpiderEngine/Engine.cs:324-326`, `UsedImagesChecker.cs` collects the
src set and diffs it against disk); it throws the caption away.  But
the whole point of a web-scale image crawl (north rule: a table of
image + caption pairs) is the PAIR: every large image-text corpus is
harvested from exactly two places on the page —

  * the ``alt=`` attribute of the ``<img>`` tag itself (the LAION
    recipe: img src + alt text, then filter by caption quality), and
  * OpenGraph metadata (``og:image`` content paired with the page's
    ``og:title``) — the socially-curated caption publishers write by
    hand.

This kernel emits one row per harvested pair plus the standard caption
quality gate (non-trivial length, ≥2 words) so the downstream corpus
builder can keep ``caption_ok`` rows only.  Distinguishes alt="" (the
decorative-image convention — an explicit empty caption) from a missing
alt attribute (NULL caption): the two mean different things to a
curation funnel (explicitly decorative vs unlabeled).

Everything is whole-stage codegen: regexp_extract_all over the body for
the tag inventories, per-tag attribute regexps, a 5-entity HTML decode
as a replace chain.  Map-only, zero shuffles — the plan is flat at any
corpus size, and the harvest runs inside the same scan as link
extraction at crawl time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IMG_TAG_PAT = r"(?i)<img\b[^>]*>"
_SRC_PAT = r'(?i)(?:^|[\s"])src="([^"]*)"'
_ALT_PAT = r'(?i)(?:^|[\s"])alt="([^"]*)"'
_HAS_ALT_PAT = r'(?i)(?:^|[\s"])alt="'
OG_IMAGE_TAG_PAT = r'(?i)<meta\b[^>]*property="og:image"[^>]*>'
_OG_TITLE_PAT = r'(?i)<meta\b[^>]*property="og:title"[^>]*content="([^"]*)"'
_CONTENT_PAT = r'(?i)(?:^|[\s"])content="([^"]*)"'

# caption quality gate (LAION-style): non-trivial length, >= 2 words
CAP_MIN_LEN = 5
CAP_MAX_LEN = 200
CAP_MIN_WORDS = 2

# the 5 standard HTML entities, ampersand LAST so decoded '&'s from
# &amp; never re-trigger the earlier rules
_ENTITIES = [
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]


def decode_entities(col: Column) -> Column:
    """Standard 5-entity HTML decode as a codegen replace chain."""
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def caption_pairs(
    pages: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """(url, source, idx, img_url, caption, cap_len, cap_words,
    caption_ok) per harvested image+caption pair.

    source ∈ {'alt', 'og'}.  idx is the tag's position within its own
    inventory (all <img> tags for 'alt', all og:image metas for 'og'),
    so (url, source, idx) is a stable pair key.  caption is
    entity-decoded; NULL when the <img> has no alt attribute or the
    page has no og:title.  caption_ok = len in [CAP_MIN_LEN,
    CAP_MAX_LEN] and >= CAP_MIN_WORDS whitespace words (always a
    non-NULL boolean — NULL captions gate false).
    """
    url = F.col(url_col).alias("url")
    body = F.col(body_col)

    img_tags = pages.select(
        url,
        F.posexplode(
            F.regexp_extract_all(body, F.lit(IMG_TAG_PAT), 0)
        ).alias("idx", "tag"),
    )
    alt_rows = (
        img_tags.select(
            "url",
            F.lit("alt").alias("source"),
            "idx",
            F.regexp_extract("tag", _SRC_PAT, 1).alias("img_url"),
            F.when(
                F.col("tag").rlike(_HAS_ALT_PAT),
                F.regexp_extract("tag", _ALT_PAT, 1),
            ).alias("raw_cap"),
        )
        .filter(F.col("img_url") != "")
    )

    og_rows = (
        pages.select(
            url,
            F.get(
                F.regexp_extract_all(body, F.lit(_OG_TITLE_PAT), 1), 0
            ).alias("raw_cap"),
            F.posexplode(
                F.regexp_extract_all(body, F.lit(OG_IMAGE_TAG_PAT), 0)
            ).alias("idx", "tag"),
        )
        .select(
            "url",
            F.lit("og").alias("source"),
            "idx",
            F.regexp_extract("tag", _CONTENT_PAT, 1).alias("img_url"),
            "raw_cap",
        )
        .filter(F.col("img_url") != "")
    )

    cap = decode_entities(F.col("raw_cap"))
    cap_len = F.length(cap)
    cap_words = (
        F.when(cap.isNull(), F.lit(None).cast("int"))
        .when(F.trim(cap) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(cap), r"\s+")))
    )
    return alt_rows.unionByName(og_rows).select(
        "url",
        "source",
        "idx",
        "img_url",
        cap.alias("caption"),
        cap_len.alias("cap_len"),
        cap_words.alias("cap_words"),
        F.coalesce(
            cap.isNotNull()
            & (cap_len >= CAP_MIN_LEN)
            & (cap_len <= CAP_MAX_LEN)
            & (cap_words >= CAP_MIN_WORDS),
            F.lit(False),
        ).alias("caption_ok"),
    )


# LAION-style caption-quality gate thresholds / grammars.  The
# placeholder grammar catches filename-ish and stock-template captions
# ("IMG_1234.jpg", "photo 7", "untitled") — RE2-safe (no lookaround) so
# the DuckDB oracle replays it verbatim.
CAPQ_MIN_LEN = 5
CAPQ_MAX_LEN = 200
CAPQ_DIGIT_PPM_MAX = 300_000
CAPQ_STOPWORDS = ("a", "the", "of", "and", "with", "in", "on", "is")
_CAPQ_PLACEHOLDER_PAT = (
    r"(?i)^(?:image|img|photo|picture|untitled|screenshot|dsc|logo|"
    r"icon|banner|thumbnail)[-_ ]?[0-9]*"
    r"(?:\.(?:jpe?g|png|gif|webp))?$"
)
_CAPQ_URL_PAT = r"(?i)(?:https?://|www\.)"


def caption_quality(corpus: DataFrame, cap_col: str = "caption") -> DataFrame:
    """LAION-style caption keep/drop gate over the north-rule
    image+caption table — the per-row sibling of the corpus-level
    :func:`~linkkchecker_net_spark.pipeline.multimodal.caption_dup`
    boilerplate check.  Contrastive training wants captions that are
    actual descriptions: not filename placeholders, not URL/SEO spam,
    not number soup, long enough to carry signal, and (for an
    English-target corpus) showing at least one English function word
    — the cheap language proxy, same spirit as the stopword `lang_id`.

    Signals per caption: length, word count, digit share (floor-ppm of
    characters), URL-ish substring, whole-caption placeholder match,
    stopword hit.  ``reason`` is a first-match ladder — too_short /
    too_long / placeholder / url / digits / no_stopword / ok — and
    ``keep`` is reason == 'ok', so downstream funnels get both the
    verdict and WHY (the funnel-stage accounting `curation_funnel`
    wants).

    Output: (caption, cap_len, n_words, digit_ppm, has_url,
    placeholder, stopword_hit, reason, keep).

    Scale: map-only codegen (regexp counts + split), zero shuffles;
    composes with `image_quality_gate` (pixel side) and `caption_dup`
    (corpus side) into the full LAION filter.
    """
    cap = F.col(cap_col)
    cap_len = F.length(cap)
    n_words = F.when(F.trim(cap) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(cap), r"\s+"))
    )
    n_digits = F.length(F.regexp_replace(cap, r"[^0-9]", ""))
    digit_ppm = F.floor(
        n_digits * 1_000_000 / F.greatest(cap_len, F.lit(1))
    )
    has_url = cap.rlike(_CAPQ_URL_PAT)
    placeholder = cap.rlike(_CAPQ_PLACEHOLDER_PAT)
    toks = F.filter(
        F.split(F.lower(cap), r"[^a-z]+"), lambda t: t != ""
    )
    stopword_hit = F.arrays_overlap(
        toks, F.array(*[F.lit(w) for w in CAPQ_STOPWORDS])
    )
    reason = (
        F.when(cap_len < CAPQ_MIN_LEN, F.lit("too_short"))
        .when(cap_len > CAPQ_MAX_LEN, F.lit("too_long"))
        .when(placeholder, F.lit("placeholder"))
        .when(has_url, F.lit("url"))
        .when(digit_ppm > CAPQ_DIGIT_PPM_MAX, F.lit("digits"))
        .when(~stopword_hit, F.lit("no_stopword"))
        .otherwise(F.lit("ok"))
    )
    return corpus.select(
        cap.alias("caption"),
        cap_len.cast("int").alias("cap_len"),
        n_words.cast("int").alias("n_words"),
        digit_ppm.cast("long").alias("digit_ppm"),
        has_url.alias("has_url"),
        placeholder.alias("placeholder"),
        stopword_hit.alias("stopword_hit"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )
