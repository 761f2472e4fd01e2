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
