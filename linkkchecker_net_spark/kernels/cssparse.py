"""P10 — CSS URL extraction.

The reference extracts ``url(...)`` targets from stylesheets with the regex
``url\\('?([^']+)'?\\)`` (/root/reference/SpiderEngine/CssChecker.cs:17),
applied to ``background-image`` declarations (CssChecker.cs:67-87) and
``@font-face src`` values (CssChecker.cs:38-65).

Known reference quirk (reproduced in tests as documentation, not behavior):
fonts are only checked when a ``src`` holds >1 ``url()`` match
(CssChecker.cs:49).  We implement the *intended* semantics — every url()
target is extracted exactly once per occurrence.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the reference's exact pattern, extended to also allow double quotes
# (ExCSS normalizes quotes before the regex runs; raw CSS may use either)
_URL_RE = re.compile(r"""url\(\s*['"]?([^'")]+)['"]?\s*\)""")


def extract_css_urls(css: str | bytes | memoryview | None) -> list[str]:
    if css is None:
        return []
    if isinstance(css, (bytes, bytearray, memoryview)):
        # memoryview: zero-copy Arrow buffer slice from the fused kernel
        css = bytes(css).decode("utf-8", errors="replace")
    return [m.strip() for m in _URL_RE.findall(css) if m.strip()]


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_css_urls_udf(css: pd.Series) -> pd.Series:
    return pd.Series([extract_css_urls(c) for c in css])
