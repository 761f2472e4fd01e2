"""URL-structure bitext mining + URL/content language consistency.

ParaCrawl-style corpus building starts from exactly this observation
(Banon et al. 2020 §3: "URL matching" is the first alignment heuristic):
multilingual sites encode the language as a path segment
(example.com/en/about vs /fr/about), so grouping URLs by (host,
language-stripped path) surfaces translation-pair candidates WITHOUT
fetching anything — a pure metadata pass over the frontier.  The same
grammar powers the C4-style consistency gate: a /de/ URL whose body
scores English is mislabelled navigation chrome or a broken template,
and both corpus builders and crawl schedulers want it flagged.

The reference crawls one site and never looks at language
(`Engine.cs` has no locale notion); at web scale the language axis IS
a partitioning dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import LANG_MARKERS, _count_token

# primary-subtag path markers worth trusting (the ParaCrawl set's head);
# extending is a data change
URL_LANG_CODES = (
    "en", "de", "fr", "es", "it", "pt", "nl", "ru", "ja", "zh",
)


def _parts(url: Column):
    host = F.lower(F.regexp_extract(url, r"^[a-z]+://([^/:]+)", 1))
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(url, r"^[a-z]+://[^/]+(/[^?#]*)", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )
    seg1 = F.regexp_extract(path, r"^/([a-z]{2})(?:/|$)", 1)
    lang = F.when(seg1.isin(*URL_LANG_CODES), seg1).otherwise(
        F.lit(None).cast("string")
    )
    rest = F.when(
        lang.isNotNull(),
        F.coalesce(F.nullif(F.substring(path, 4, 1 << 20), F.lit("")),
                   F.lit("/")),
    ).otherwise(path)
    return host, lang, rest


def bitext_candidates(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Translation-pair candidate groups by (host, language-stripped
    path): one row per group that carries at least one language-tagged
    URL — (host, path_key, n_variants, n_langs, langs, is_bitext),
    langs a sorted comma-joined set, is_bitext = ≥2 distinct langs.
    Downstream alignment (document/segment matching) consumes only the
    is_bitext groups, which is why this pass must run frontier-wide
    and cheap.

    Scale: map-only grammar + ONE (host, path_key)-keyed partial agg
    (collect_set is bounded by |URL_LANG_CODES|, so the agg state is
    tiny and hot sites pose no skew beyond their own path count).
    """
    url = F.col(url_col)
    host, lang, rest = _parts(url)
    tagged = urls.select(
        host.alias("host"), lang.alias("lang"), rest.alias("path_key")
    ).filter(F.col("lang").isNotNull())
    agg = tagged.groupBy("host", "path_key").agg(
        F.count("*").alias("n_variants"),
        F.array_sort(F.collect_set("lang")).alias("_langs"),
    )
    return agg.select(
        "host",
        "path_key",
        F.col("n_variants").cast("long").alias("n_variants"),
        F.size("_langs").cast("int").alias("n_langs"),
        F.concat_ws(",", "_langs").alias("langs"),
        (F.size("_langs") >= 2).alias("is_bitext"),
    )


def url_lang_mismatch(pages: DataFrame) -> DataFrame:
    """URL-declared vs content-scored language (the C4-style
    consistency gate): per page — (url, url_lang, pred_lang,
    mismatch).  pred_lang is the stopword lang-id (`text.lang_id`
    scoring verbatim: marker counts, greatest, first-lang tie-break);
    mismatch fires only when the URL declares a language AND the text
    scores a DIFFERENT non-'und' language.  A URL code outside the
    marker set (e.g. /ru/) flags whenever the text confidently scores
    one of the marker languages — mislabelled chrome either way.

    Scale: map-only codegen (regexp + replace-count markers), zero
    shuffles; composes with `content_language` (header/attr side) and
    `bitext_candidates` (pair side).
    """
    _, lang, _ = _parts(F.col("url"))
    scores = {
        lg: sum([_count_token(F.col("text"), t) for t in toks], F.lit(0))
        for lg, toks in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lg in reversed(list(LANG_MARKERS)):
        pred = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(
            pred
        )
    mismatch = F.coalesce(
        lang.isNotNull() & (pred != "und") & (pred != lang), F.lit(False)
    )
    return pages.select(
        "url",
        lang.alias("url_lang"),
        pred.alias("pred_lang"),
        mismatch.alias("mismatch"),
    )
