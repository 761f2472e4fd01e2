"""Markup-structure metrics: DOM nesting depth, page-weight breakdown.

Quality/complexity signals over the raw HTML that don't need a DOM tree:
a single codegen fold over the tag stream gives nesting depth (deep DOM =
div-soup templates, a render-performance and boilerplate signal), and
byte-class accounting splits the page weight into script/style/comment/
markup/text (the storage-planning and text-density numbers a crawl
reports per host).

Reference analog: none (the C# engine parses links only); part of the
from-scratch 100 TB-pipeline surface.  Everything is whole-stage-codegen
regexp + higher-order array folds — no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TAG_PAT = r"(?i)</?[a-z][a-z0-9]*[^>]*>"
# HTML void elements never close; a trailing '/>' marks self-closing
_VOID_RE = (
    r"(?i)^<(area|base|br|col|embed|hr|img|input|link|meta|param|"
    r"source|track|wbr)\b"
)
_SCRIPT_BLOCK = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_BLOCK = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_BLOCK = r"(?s)<!--.*?-->"


def dom_depth(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → (url, n_tags, max_depth, unclosed).

    Nesting depth via ONE codegen fold over the tag stream: open tags
    push (+1), close tags pop (-1), void elements and self-closing
    tags are flat (0).  ``max_depth`` is the deepest point reached;
    ``unclosed`` fires when the walk doesn't return to depth 0
    (truncated/malformed markup — the fetch-truncation smell
    content_length audits from the header side).

    Scale: map-only — regexp_extract_all + one aggregate() fold with a
    two-field struct accumulator, zero shuffles, O(tags) per row.
    """
    tags = F.regexp_extract_all("body", F.lit(_TAG_PAT), 0)
    delta = F.transform(
        tags,
        lambda t: F.when(t.startswith("</"), F.lit(-1))
        .when(t.rlike(_VOID_RE) | t.endswith("/>"), F.lit(0))
        .otherwise(F.lit(1)),
    )
    acc0 = F.struct(
        F.lit(0).alias("cur"), F.lit(0).alias("mx")
    )
    folded = F.aggregate(
        delta,
        acc0,
        lambda acc, d: F.struct(
            (acc["cur"] + d).alias("cur"),
            F.greatest(acc["mx"], acc["cur"] + d).alias("mx"),
        ),
    )
    return pages.select(
        "url",
        F.size(tags).alias("n_tags"),
        folded["mx"].alias("max_depth"),
        (folded["cur"] != 0).alias("unclosed"),
    )


def page_weight(pages: DataFrame) -> DataFrame:
    """pages: (url, body) → byte-class breakdown:
    (url, total_bytes, script_bytes, style_bytes, comment_bytes,
    markup_bytes, text_bytes, text_ppm).

    ``script/style/comment_bytes`` are the lengths removed by
    *successive* stripping (script first, then style, then comments on
    what remains), so the classes PARTITION the page: an HTML comment
    inside a ``<script>`` block (the classic ``<script><!-- ... //-->
    </script>`` idiom) or a commented-out script counts exactly once
    (r4 ADVICE — the old independent-harvest version double-subtracted
    overlaps and could drive ``text_bytes`` negative).  ``markup_bytes``
    is the remaining tag octets; ``text_bytes`` what's left (clamped at
    0 as a belt-and-braces guard) — the numerator of the text-density
    number (`text_ppm`, floor) a host-level rollup uses to spot
    template-heavy sites before wasting fetch budget on them.

    Lengths are Spark `length()` = UTF-16-agnostic character counts on
    both engines (the synthetic corpus is ASCII; for production byte
    accounting swap in octet_length).

    Scale: map-only codegen — a chain of three strips + one tag
    harvest folded to a length sum; zero shuffles.
    """
    total = F.length("body")
    no_script = F.regexp_replace("body", _SCRIPT_BLOCK, "")
    no_ss = F.regexp_replace(no_script, _STYLE_BLOCK, "")
    stripped = F.regexp_replace(no_ss, _COMMENT_BLOCK, "")
    script_b = total - F.length(no_script)
    style_b = F.length(no_script) - F.length(no_ss)
    comment_b = F.length(no_ss) - F.length(stripped)
    markup_b = F.aggregate(
        F.transform(
            F.regexp_extract_all(stripped, F.lit(_TAG_PAT), 0), F.length
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    text_b = F.greatest(
        F.lit(0), total - script_b - style_b - comment_b - markup_b
    )
    return pages.select(
        "url",
        total.alias("total_bytes"),
        script_b.alias("script_bytes"),
        style_b.alias("style_bytes"),
        comment_b.alias("comment_bytes"),
        markup_b.alias("markup_bytes"),
        text_b.alias("text_bytes"),
        F.when(
            total > 0, F.floor(text_b * 1_000_000 / total)
        ).alias("text_ppm"),
    )


_TABLE_BLOCK = r"(?is)<table\b[^>]*>.*?</table>"
_TR_TAG = r"(?i)<tr\b"
_CELL_TAG = r"(?i)<t[dh]\b[^>]*>"
_NUM_CELL = r"(?is)<td\b[^>]*>\s*[+-]?[0-9][0-9,.]*\s*<"


def table_extract(pages: DataFrame) -> DataFrame:
    """WDC/WebTables-style relational-table mining signal: per page,
    the number of <table> blocks, total rows and cells, the share of
    data cells whose content is purely numeric (floor ppm), and the
    ``data_table`` verdict — at least one table with ≥2 rows AND an
    average of ≥2 cells per row (layout tables and nav grids fail the
    shape test; price/spec/statistics tables pass and are the rows a
    table-corpus extraction keeps).

    Output: (url, n_tables, n_rows, n_cells, numeric_cell_ppm,
    data_table).

    Scale: map-only codegen — one block harvest + per-block counts
    folded with aggregate(), zero shuffles.
    """
    blocks = F.regexp_extract_all("body", F.lit(_TABLE_BLOCK), 0)
    n_tables = F.size(blocks)

    def fold_count(pat):
        return F.aggregate(
            F.transform(
                blocks, lambda b: F.regexp_count(b, F.lit(pat))
            ),
            F.lit(0),
            lambda a, x: a + x,
        )

    n_rows = fold_count(_TR_TAG)
    n_cells = fold_count(_CELL_TAG)
    n_numeric = fold_count(_NUM_CELL)
    ppm = F.when(
        n_cells > 0, F.floor(n_numeric * 1_000_000 / n_cells)
    )
    has_shape = F.exists(
        blocks,
        lambda b: (F.regexp_count(b, F.lit(_TR_TAG)) >= 2)
        & (
            F.regexp_count(b, F.lit(_CELL_TAG))
            >= 2 * F.regexp_count(b, F.lit(_TR_TAG))
        ),
    )
    return pages.select(
        "url",
        n_tables.alias("n_tables"),
        n_rows.alias("n_rows"),
        n_cells.alias("n_cells"),
        ppm.alias("numeric_cell_ppm"),
        F.coalesce(has_shape, F.lit(False)).alias("data_table"),
    )


def render_triage(pages: DataFrame) -> DataFrame:
    """Does this page need a JS render to yield content? — the routing
    decision in front of every render farm: headless browsing costs
    100-1000× a plain fetch, so a crawler (and a corpus builder
    deciding whether the HTML text is REAL) must triage.  Signals are
    the classic SPA shell fingerprint: almost no visible text, heavy
    script presence, an empty framework mount node (#root/#app/
    ng-app/data-reactroot), and a <noscript> apology.

    pages: (url, body) → (url, text_bytes, n_scripts, spa_root,
    has_noscript, needs_render) — needs_render = spa_root ∧
    text_bytes < 200, OR text_bytes < 50 ∧ n_scripts ≥ 2 (shell with
    nothing to read).

    text_bytes strips tags/scripts/styles with the page_weight
    successive-stripping discipline (classes partition the page).

    Scale: map-only codegen grammars, zero shuffles; composes with
    `budget_alloc` (render budget is a budget) and `main_content`.
    """
    body = F.coalesce(F.col("body"), F.lit(""))
    no_script = F.regexp_replace(
        body, r"(?is)<script\b[^>]*>.*?</script>", " "
    )
    no_style = F.regexp_replace(
        no_script, r"(?is)<style\b[^>]*>.*?</style>", " "
    )
    text_only = F.trim(F.regexp_replace(no_style, r"(?s)<[^>]*>", " "))
    text_bytes = F.length(F.regexp_replace(text_only, r"\s+", " "))
    n_scripts = F.size(
        F.regexp_extract_all(body, F.lit(r"(?i)<script\b"), F.lit(0))
    )
    spa_root = body.rlike(
        r'(?i)<(?:div|main)\b[^>]*\bid="(?:root|app)"[^>]*>\s*</(?:div|main)>'
    ) | body.rlike(r"(?i)\bdata-reactroot\b|\bng-app\b")
    has_noscript = body.rlike(r"(?i)<noscript\b")
    needs = (spa_root & (text_bytes < 200)) | (
        (text_bytes < 50) & (n_scripts >= 2)
    )
    return pages.select(
        "url",
        text_bytes.cast("long").alias("text_bytes"),
        n_scripts.cast("int").alias("n_scripts"),
        spa_root.alias("spa_root"),
        has_noscript.alias("has_noscript"),
        needs.alias("needs_render"),
    )
