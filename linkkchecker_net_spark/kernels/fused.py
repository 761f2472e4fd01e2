"""Fused per-page extraction kernel: ONE Arrow pass per epoch.

The candidate pipeline (P8 parse → explode → P10 css extract → P1
canonicalize → F1 scheme gate → P2 host) spans ~6 chained
ArrowEvalPython/Generate stages when expressed as separate UDFs; each
stage boundary costs a JVM↔Python round trip per task, which dominates
epoch latency at low data volumes and wastes executor time at high ones.

This kernel is the reference's own shape — `Engine.Process` does one parse
per document and emits every output in that single pass
(/root/reference/SpiderEngine/Engine.cs:149-210) — expressed as a single
`mapInPandas` over fetched ok-rows.  Output rows are discriminated by
`kind`:

  kind='cand': a link candidate (already canonicalized + scheme/host
               resolved) — feeds W3 dedup → J1 anti-join → W2 rank;
  kind='meta': one row per parsed in-site page (canonical href, meta
               description, embedded css) — feeds the page_meta table.

Everything downstream (dedup windows, anti-joins, ranking, routing)
remains native Catalyst.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from linkkchecker_net_spark.kernels.canonicalize import canonicalize, host_of
from linkkchecker_net_spark.kernels.cssparse import extract_css_urls
from linkkchecker_net_spark.kernels.htmlparse import parse_page

CSS_TAG_RANK = 4

FUSED_SCHEMA = (
    "kind string, parent_url string, parent_rank long, parent_depth int, "
    "priority int, seed_url string, url string, host string, supported boolean, "
    "may_contain_links boolean, expand_links boolean, tag_rank int, doc_pos int, "
    "canonical_href string, meta_description string, embedded_css array<string>"
)

_CAND_NULLS = dict(canonical_href=None, meta_description=None, embedded_css=None)


def _cand_row(row, url: str, may: bool, expand: bool, tag_rank: int, doc_pos: int):
    scheme = url.split(":", 1)[0].lower()
    supported = scheme in ("http", "https")
    return dict(
        kind="cand",
        parent_url=row.url,
        parent_rank=row.discovery_rank,
        parent_depth=row.crawl_depth,
        priority=row.priority,
        seed_url=row.seed_url,
        url=url,
        host=(host_of(url) or "") if supported else None,
        supported=supported,
        may_contain_links=may,
        expand_links=expand,
        tag_rank=tag_rank,
        doc_pos=doc_pos,
        **_CAND_NULLS,
    )


def extract_batches(seed_hosts: set[str]):
    """Returns the mapInPandas function closed over the in-site host set.

    Input rows: url, discovery_rank, crawl_depth, priority, seed_url, host,
    may_contain_links, expand_links, content_type, body.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                ct = row.content_type
                if ct == "text/html" and row.may_contain_links:
                    parsed = parse_page(row.body)
                    in_site = row.host in seed_hosts
                    if in_site:
                        out.append(
                            dict(
                                kind="meta",
                                parent_url=row.url,
                                parent_rank=row.discovery_rank,
                                parent_depth=row.crawl_depth,
                                priority=row.priority,
                                seed_url=row.seed_url,
                                url=row.url,
                                host=row.host,
                                supported=True,
                                may_contain_links=True,
                                expand_links=bool(row.expand_links),
                                tag_rank=-1,
                                doc_pos=-1,
                                canonical_href=parsed["canonical_href"],
                                meta_description=parsed["meta_description"],
                                embedded_css=parsed["embedded_css"],
                            )
                        )
                    if in_site and row.expand_links:
                        for ln in parsed["links"]:
                            url = canonicalize(row.url, ln["href"])
                            if url is None:
                                continue
                            out.append(
                                _cand_row(
                                    row,
                                    url,
                                    ln["may_contain_links"],
                                    True,
                                    ln["tag_rank"],
                                    ln["doc_pos"],
                                )
                            )
                    # embedded css scanned regardless of in-site
                    # (Engine.cs:176-183)
                    pos = 0
                    for block in parsed["embedded_css"]:
                        for href in extract_css_urls(block):
                            url = canonicalize(row.url, href)
                            if url is not None:
                                out.append(
                                    _cand_row(row, url, False, False, CSS_TAG_RANK, pos)
                                )
                            pos += 1
                elif ct == "text/css":
                    for pos, href in enumerate(extract_css_urls(row.body)):
                        url = canonicalize(row.url, href)
                        if url is not None:
                            out.append(
                                _cand_row(row, url, False, False, CSS_TAG_RANK, pos)
                            )
            yield pd.DataFrame(
                out,
                columns=[
                    "kind", "parent_url", "parent_rank", "parent_depth",
                    "priority", "seed_url", "url", "host", "supported",
                    "may_contain_links", "expand_links", "tag_rank", "doc_pos",
                    "canonical_href", "meta_description", "embedded_css",
                ],
            )

    return fn
