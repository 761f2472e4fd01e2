"""P11 — HTTP status classification as a native Catalyst CASE expression.

Reference semantics:
  * 2xx → ok        (/root/reference/SpiderInterface/StatusCodeExtension.cs:7-11)
  * 301/302/303/307 → redirect (asserted, never followed —
    /root/reference/SpiderEngine/Engine.cs:194-200)
  * other status → broken
  * fetch exception → error (Engine.cs:204-208)
  * non-http(s) scheme → unsupported (Engine.cs:263-273)

Pure ``F.when`` — stays inside whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REDIRECT_CODES = (301, 302, 303, 307)


def classification_expr(
    status: Column, error: Column, unsupported_scheme: Column
) -> Column:
    return (
        F.when(unsupported_scheme, F.lit("unsupported"))
        .when(error.isNotNull(), F.lit("error"))
        .when((status >= 200) & (status < 300), F.lit("ok"))
        .when(status.isin(*REDIRECT_CODES), F.lit("redirect"))
        .otherwise(F.lit("broken"))
    )


# ---------------------------------------------------------------------------
# Soft-404 detection (pure expression — the status code lies, the body
# doesn't).  No reference analog: the C# engine trusts the status line
# (`StatusCodeExtension.cs`), so a misconfigured server that 200s its
# error page poisons the link report AND the crawl frontier (error pages
# interlink, so they keep feeding the candidate stream).  At 10^10-URL
# scale soft 404s are a measurable fetch-waste share; the gate is a
# zero-shuffle map over pages the parse stage already decoded.
# ---------------------------------------------------------------------------

# lowercase body phrases that mark an error page served with status 200;
# deliberately conservative — precision over recall, a false "soft 404"
# silently drops a live page from the report
SOFT404_PHRASES = (
    "page not found",
    "404 not found",
    "does not exist",
    "no longer available",
)

# an error page is short; bodies past this length never match (guards the
# regex cost AND false positives on pages that merely DISCUSS 404s)
SOFT404_MAX_CHARS = 2048


def soft404_expr(status: Column, body: Column) -> Column:
    """True iff ``status`` is 2xx but ``body`` reads like an error page.

    Pure codegen: one lower() + one rlike over a length-gated prefix.
    Compose with `classification_expr` downstream as
    ``F.when(soft404, "broken").otherwise(classification)``.
    """
    pat = "|".join(SOFT404_PHRASES)
    head = F.lower(F.substring(body, 1, SOFT404_MAX_CHARS))
    return (
        (status >= 200)
        & (status < 300)
        & (F.length(body) <= SOFT404_MAX_CHARS)
        & head.rlike(pat)
    )
