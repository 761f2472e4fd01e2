"""S2/S3 paced fetch — per-host grouped fetch with crawl-delay politeness.

The default fetch stage (epoch.fetch_and_classify) is a join against the
synthetic web snapshot; in production the fetch is live HTTP, and the
politeness contract has a second half beyond the per-epoch budget (W1/A4):
a minimum interval between requests to the same host (robots crawl_delay,
FIXTURES.md §4).  That pacing MUST happen inside a per-host execution
group — this module is that stage: `applyInPandas` grouped by host, one
group = one host's batch, paced serially inside the group while distinct
hosts proceed in parallel across executors.

In the sandbox the "request" is a lookup into the already-joined web row
(the body is in hand); in production the same group function issues the
async HTTP batch between the pacing sleeps — the plan shape, grouping, and
politeness semantics are identical.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def paced_fetch(
    batch_with_web: DataFrame,
    crawl_delay_by_host: dict[str, float],
    default_delay: float = 0.0,
) -> DataFrame:
    """Pace a pre-joined batch per host; adds `fetch_ts` (monotonic seconds
    within the group) so pacing is observable/testable."""
    # fresh StructType — StructType.add() MUTATES, which would corrupt the
    # input DataFrame's cached schema and break column resolution
    out_schema = T.StructType(
        list(batch_with_web.schema.fields)
        + [T.StructField("fetch_ts", T.DoubleType())]
    )

    # no annotations on purpose: applyInPandas infers the eval type from
    # hints and warns on the (key, pdf) two-arg form
    def pace(key, pdf):
        host = key[0]
        delay = crawl_delay_by_host.get(host, default_delay) or 0.0
        stamps = []
        t0 = time.monotonic()
        for i in range(len(pdf)):
            if delay > 0 and i > 0:
                time.sleep(delay)
            # production: the HTTP GET/HEAD for row i happens HERE
            stamps.append(time.monotonic() - t0)
        pdf = pdf.copy()
        pdf["fetch_ts"] = stamps
        return pdf

    return batch_with_web.groupBy("host").applyInPandas(pace, out_schema)


def fetch_with_pacing(batch: DataFrame, web: DataFrame, robots_rows: list[dict]) -> DataFrame:
    """Join + pace: the full politeness-paced fetch stage."""
    delays = {
        r["host"]: float(r.get("crawl_delay") or 0.0) for r in robots_rows
    }
    w = web.select(
        F.col("url"),
        F.col("status").alias("w_status"),
        F.col("content_type").alias("w_ct"),
    )
    joined = batch.join(w, "url", "left")
    return paced_fetch(joined, delays)
