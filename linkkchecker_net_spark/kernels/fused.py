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

from linkkchecker_net_spark.kernels.canonicalize import (
    authority_of,
    canonicalize,
)
from linkkchecker_net_spark.kernels.cssparse import extract_css_urls
from linkkchecker_net_spark.kernels.htmlparse import parse_page

CSS_TAG_RANK = 4

FUSED_SCHEMA = (
    "kind string, parent_rank long, parent_depth int, "
    "url string, supported boolean, "
    "may_contain_links boolean, expand_links boolean, tag_rank int, doc_pos int, "
    "canonical_href string, meta_description string, embedded_css array<string>"
)

_COLS = [
    "kind", "parent_rank", "parent_depth", "url", "supported",
    "may_contain_links", "expand_links", "tag_rank", "doc_pos",
    "canonical_href", "meta_description", "embedded_css",
]


def extract_batches(seed_authorities: set[str], seed_prefixes: tuple[str, ...]):
    """Returns the mapInPandas function closed over the seed gates.

    Input rows: url, discovery_rank, crawl_depth, priority, seed_url, host,
    may_contain_links, expand_links, content_type, body.

    Two distinct in-site gates, faithful to the reference:
      * EXPANSION (follow the page's links) — the page's scheme+authority
        must match a seed's: Engine.cs:76 trims BaseUri to
        GetLeftPart(Authority), so Engine.cs:171's IsBaseOf is an
        authority-equality test (multi-seed generalized to a set);
      * META emission (canonical/description checkers) — the seed URL's
        IsBaseOf (CanonicalChecker.cs:34 uses steps[0].Uri, the un-trimmed
        seed): path-prefix after segment truncation.  Multi-seed
        generalization = ANY seed (the union of per-seed reference runs —
        and independent of which seed's BFS happens to reach a page
        first), realized as the DISTINCT seed base prefixes (a tiny set
        even for huge formulaic seed lists) so the gate is one
        str.startswith(tuple).

    Candidate rows are SKINNY on purpose: a candidate carries only its url,
    its order key (parent_rank, tag_rank, doc_pos) and its per-link flags.
    Everything inherited from the parent (parent_url, seed_url, priority,
    crawl depth) is recovered AFTER the W3 dedup + J1 anti-join by a
    broadcast join against the (politeness-bounded) batch on parent_rank —
    candidates outnumber pages ~100:1, so repeating the parent strings on
    every candidate row would multiply the Arrow return path, the extracted
    cache, and the dedup shuffle by ~3x.  Emission is columnar
    (dict-of-lists), not row dicts — pd.DataFrame(list_of_dicts) re-walks
    every dict per column.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in _COLS}
            o_kind = out["kind"]
            o_prank = out["parent_rank"]
            o_pdepth = out["parent_depth"]
            o_url = out["url"]
            o_sup = out["supported"]
            o_may = out["may_contain_links"]
            o_exp = out["expand_links"]
            o_tag = out["tag_rank"]
            o_pos = out["doc_pos"]
            o_canon = out["canonical_href"]
            o_desc = out["meta_description"]
            o_css = out["embedded_css"]

            def cand(prank, pdepth, url, may, expand, tag_rank, doc_pos):
                supported = url.split(":", 1)[0].lower() in ("http", "https")
                o_kind.append("cand")
                o_prank.append(prank)
                o_pdepth.append(pdepth)
                o_url.append(url)
                o_sup.append(supported)
                o_may.append(may)
                o_exp.append(expand)
                o_tag.append(tag_rank)
                o_pos.append(doc_pos)
                o_canon.append(None)
                o_desc.append(None)
                o_css.append(None)

            for row in pdf.itertuples(index=False):
                ct = row.content_type
                if ct == "text/html" and row.may_contain_links:
                    parsed = parse_page(row.body)
                    in_site = authority_of(row.url) in seed_authorities
                    if seed_prefixes and row.url.startswith(seed_prefixes):
                        o_kind.append("meta")
                        o_prank.append(row.discovery_rank)
                        o_pdepth.append(row.crawl_depth)
                        o_url.append(row.url)
                        o_sup.append(True)
                        o_may.append(True)
                        o_exp.append(bool(row.expand_links))
                        o_tag.append(-1)
                        o_pos.append(-1)
                        o_canon.append(parsed["canonical_href"])
                        o_desc.append(parsed["meta_description"])
                        o_css.append(parsed["embedded_css"])
                    if in_site and row.expand_links:
                        prank, pdepth = row.discovery_rank, row.crawl_depth
                        for ln in parsed["links"]:
                            url = canonicalize(row.url, ln["href"])
                            if url is not None:
                                cand(
                                    prank, pdepth, url,
                                    ln["may_contain_links"], True,
                                    ln["tag_rank"], ln["doc_pos"],
                                )
                    # embedded css scanned regardless of in-site
                    # (Engine.cs:176-183)
                    pos = 0
                    for block in parsed["embedded_css"]:
                        for href in extract_css_urls(block):
                            url = canonicalize(row.url, href)
                            if url is not None:
                                cand(
                                    row.discovery_rank, row.crawl_depth, url,
                                    False, False, CSS_TAG_RANK, pos,
                                )
                            pos += 1
                elif ct == "text/css":
                    for pos, href in enumerate(extract_css_urls(row.body)):
                        url = canonicalize(row.url, href)
                        if url is not None:
                            cand(
                                row.discovery_rank, row.crawl_depth, url,
                                False, False, CSS_TAG_RANK, pos,
                            )
            # pandas 2.x infers float64 for empty list-built columns, which
            # Arrow cannot convert to list<string>/bool — an empty input
            # batch (partitioning-dependent, hence intermittent) must yield
            # nothing instead of an empty mistyped frame
            if o_kind:
                yield pd.DataFrame(out, columns=_COLS)

    return fn
