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

import numpy as np
import pyarrow as pa

from linkkchecker_net_spark.kernels.canonicalize import (
    authority_of,
    canonicalize,
)
from linkkchecker_net_spark.kernels.cssparse import extract_css_urls
from linkkchecker_net_spark.kernels.htmlparse import scan_page

CSS_TAG_RANK = 4

# F1 scheme gate over CANONICALIZED urls: canonicalize() rebuilds every
# http(s) URL with a lowercased scheme (and only http(s) URLs start with
# these prefixes), so the per-candidate check is one tuple-startswith —
# equivalence with the split(":")[0].lower() form is pinned by the golden
# crawl tests (gated `unsupported` rows are part of the oracle contract)
_HTTP_SCHEMES = ("http://", "https://")

FUSED_SCHEMA = (
    "kind string, parent_rank long, parent_depth int, "
    "url string, supported boolean, "
    "may_contain_links boolean, expand_links boolean, tag_rank int, doc_pos int, "
    "canonical_href string, meta_description string, embedded_css array<string>"
)

_ARROW_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("parent_rank", pa.int64()),
        ("parent_depth", pa.int32()),
        ("url", pa.string()),
        ("supported", pa.bool_()),
        ("may_contain_links", pa.bool_()),
        ("expand_links", pa.bool_()),
        ("tag_rank", pa.int32()),
        ("doc_pos", pa.int32()),
        ("canonical_href", pa.string()),
        ("meta_description", pa.string()),
        ("embedded_css", pa.list_(pa.string())),
    ]
)

_COLS = [f.name for f in _ARROW_SCHEMA]


def _binary_views(arr: pa.Array) -> list:
    """Zero-copy memoryview per row of a (Large)Binary Arrow array: slices
    of the shared data buffer, never materialized as Python bytes.  The
    page payloads are the epoch's dominant byte volume — the pandas path
    copied every body into a bytes object before the scanner ever saw it,
    a full extra pass of every page through the cache hierarchy."""
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    validity, offsets_buf, data_buf = arr.buffers()
    n = len(arr)
    off = np.frombuffer(offsets_buf, dtype=odt, count=n + arr.offset + 1)
    mv = memoryview(data_buf) if data_buf is not None else memoryview(b"")
    base = arr.offset
    if validity is None:
        return [mv[off[base + i] : off[base + i + 1]] for i in range(n)]
    vb = np.frombuffer(validity, dtype=np.uint8)
    out = []
    for i in range(n):
        j = base + i
        if vb[j >> 3] & (1 << (j & 7)):
            out.append(mv[off[j] : off[j + 1]])
        else:
            out.append(None)
    return out


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

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            col = {name: rb.column(i) for i, name in enumerate(names)}
            in_url = col["url"].to_pylist()
            in_ct = col["content_type"].to_pylist()
            in_may = col["may_contain_links"].to_pylist()
            in_exp = col["expand_links"].to_pylist()
            in_rank = col["discovery_rank"].to_pylist()
            in_depth = col["crawl_depth"].to_pylist()
            in_body = _binary_views(col["body"])
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

            # per-candidate work is the epoch's hottest loop (~150 links ×
            # 10^5 pages): the per-link columns (url/supported/may/tag/pos)
            # append inline, and every column CONSTANT across a page's
            # candidate block (kind, parent_rank, parent_depth, expand,
            # meta nulls) extends once per page — 7 of 12 per-item appends
            # plus a closure call per link deleted
            def flush_cands(k, prank, pdepth):
                o_kind.extend(["cand"] * k)
                o_prank.extend([prank] * k)
                o_pdepth.extend([pdepth] * k)
                o_canon.extend([None] * k)
                o_desc.extend([None] * k)
                o_css.extend([None] * k)

            for i in range(rb.num_rows):
                ct = in_ct[i]
                if ct == "text/html" and in_may[i]:
                    base = in_url[i]
                    links, canonical, desc, css_blocks = scan_page(in_body[i])
                    in_site = authority_of(base) in seed_authorities
                    if seed_prefixes and base.startswith(seed_prefixes):
                        o_kind.append("meta")
                        o_prank.append(in_rank[i])
                        o_pdepth.append(in_depth[i])
                        o_url.append(base)
                        o_sup.append(True)
                        o_may.append(True)
                        o_exp.append(bool(in_exp[i]))
                        o_tag.append(-1)
                        o_pos.append(-1)
                        o_canon.append(canonical)
                        o_desc.append(desc)
                        o_css.append(css_blocks)
                    n0 = len(o_url)
                    if in_site and in_exp[i]:
                        for (_tag, href, may, tag_rank, doc_pos) in links:
                            url = canonicalize(base, href)
                            if url is not None:
                                o_url.append(url)
                                o_sup.append(url.startswith(_HTTP_SCHEMES))
                                o_may.append(may)
                                o_exp.append(True)
                                o_tag.append(tag_rank)
                                o_pos.append(doc_pos)
                    # embedded css scanned regardless of in-site
                    # (Engine.cs:176-183)
                    pos = 0
                    for block in css_blocks:
                        for href in extract_css_urls(block):
                            url = canonicalize(base, href)
                            if url is not None:
                                o_url.append(url)
                                o_sup.append(url.startswith(_HTTP_SCHEMES))
                                o_may.append(False)
                                o_exp.append(False)
                                o_tag.append(CSS_TAG_RANK)
                                o_pos.append(pos)
                            pos += 1
                    k = len(o_url) - n0
                    if k:
                        flush_cands(k, in_rank[i], in_depth[i])
                elif ct == "text/css":
                    n0 = len(o_url)
                    for pos, href in enumerate(extract_css_urls(in_body[i])):
                        url = canonicalize(in_url[i], href)
                        if url is not None:
                            o_url.append(url)
                            o_sup.append(url.startswith(_HTTP_SCHEMES))
                            o_may.append(False)
                            o_exp.append(False)
                            o_tag.append(CSS_TAG_RANK)
                            o_pos.append(pos)
                    k = len(o_url) - n0
                    if k:
                        flush_cands(k, in_rank[i], in_depth[i])
            # an empty input batch (partitioning-dependent, hence
            # intermittent) yields nothing; emission is typed explicitly by
            # _ARROW_SCHEMA — no pandas dtype inference anywhere
            if o_kind:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out[f.name], type=f.type)
                        for f in _ARROW_SCHEMA
                    ],
                    schema=_ARROW_SCHEMA,
                )

    return fn
