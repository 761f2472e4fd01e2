"""Semantic contracts for pipeline.ranking (BM25, TF-IDF) and
pipeline.cluster.semantic_dedup — hand-computed tiny cases; the
full-corpus DuckDB hash parity lives in test_entry_contract.py."""

from __future__ import annotations

import math

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_hand_computed(spark):
    from linkkchecker_net_spark.pipeline.ranking import bm25

    docs = _docs(
        spark,
        [
            (1, "spark spark join"),       # dl=3, tf(spark)=2, tf(join)=1
            (2, "sort merge"),             # dl=2, no probe terms
            (3, "join"),                   # dl=1, tf(join)=1
        ],
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25(docs, ("spark", "join")).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] == 0.0  # anchored on the full doc set
    n, avgdl, k1, b = 3.0, 2.0, 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def term(tf, dl, df):
        return idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[1] == pytest.approx(
        round(term(2, 3, 1) + term(1, 3, 2), 6), abs=1e-6
    )
    assert out[3] == pytest.approx(round(term(1, 1, 2), 6), abs=1e-6)


def test_tfidf_topk_order_and_ties(spark):
    from linkkchecker_net_spark.pipeline.ranking import tfidf_topk

    docs = _docs(
        spark,
        [
            (1, "rare rare common"),
            (2, "common other"),
            (3, "common zz aa"),  # zz/aa unique to doc 3, equal score -> token asc
        ],
    )
    rows = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["tfidf"]))
    top1 = sorted(by_doc[1])[0]
    assert top1[1] == "rare"  # tf=2 x ln(3/1) beats common's tf=1 x ln(3/3)=0
    assert top1[2] == pytest.approx(round(2 * math.log(3.0), 6), abs=1e-6)
    d3 = [t for _, t, _ in sorted(by_doc[3])]
    assert d3 == ["aa", "zz"]  # equal-score tie -> token ascending
    assert all(len(v) <= 2 for v in by_doc.values())


def test_semantic_dedup_drops_higher_id_twin(spark):
    from linkkchecker_net_spark.pipeline.cluster import semantic_dedup

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [2.0, 0.0, 0.0]),   # cosine 1.0 with vec 0 -> dropped
            (3, [0.0, 0.0, 1.0]),
            (4, [0.0, 0.98, 0.1]),  # cos ~0.995 with vec 1 -> dropped
        ],
        "vec_id long, embedding array<float>",
    )
    # k=2: Lloyd init = the 2 smallest ids -> clusters {0,2,3} and {1,4};
    # with k=3, [2.0,0,0] would seed its OWN centroid and survive by
    # cluster blocking (the SemDeDup recall trade, tested below)
    out = {r["vec_id"]: r for r in semantic_dedup(emb, k=2, iters=2, threshold=0.9).collect()}
    assert len(out) == 5
    assert not out[2]["keep"]
    assert not out[4]["keep"]
    assert out[0]["keep"] and out[1]["keep"] and out[3]["keep"]
    # dropped rows still carry their cluster assignment
    assert out[2]["cluster"] == out[0]["cluster"]


def test_semantic_dedup_respects_cluster_blocking(spark):
    """Twins assigned to DIFFERENT clusters are not compared — the
    SemDeDup contract (recall is traded for the bounded pair search)."""
    from linkkchecker_net_spark.pipeline.cluster import (
        assign_clusters,
        lloyd_centroids,
        semantic_dedup,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [-1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    cents = lloyd_centroids(emb, k=2, iters=2)
    asg = {r["vec_id"]: r["cluster"] for r in assign_clusters(emb, cents).collect()}
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup(emb, k=2, iters=2, threshold=0.99).collect()}
    for v in (2, 3):
        twin = v - 2
        if asg[v] == asg[twin]:
            assert not out[v]
        else:
            assert out[v]


def test_semantic_dedup_empty_corpus(spark):
    from linkkchecker_net_spark.pipeline.cluster import semantic_dedup

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_dedup(emb, k=4).count() == 0


def test_unigram_ppl_hand_computed(spark):
    import math

    from linkkchecker_net_spark.pipeline.ranking import unigram_ppl

    docs = _docs(spark, [(1, "a a b"), (2, "a b"), (3, "")])
    # lm: a -> 3/5, b -> 2/5
    la, lb = math.log(3 / 5), math.log(2 / 5)
    exp1 = math.exp(-(2 * la + lb) / 3)  # ~1.908
    exp2 = math.exp(-(la + lb) / 2)      # ~2.041
    out = {r["doc_id"]: r for r in unigram_ppl(docs, threshold=2.0).collect()}
    assert out[1]["ppl"] == pytest.approx(round(exp1, 6), abs=1e-6)
    assert out[2]["ppl"] == pytest.approx(round(exp2, 6), abs=1e-6)
    assert out[1]["keep"] and not out[2]["keep"]
    # token-less docs are anchored, not dropped: NULL ppl, keep=false
    assert out[3]["ppl"] is None and not out[3]["keep"]


def test_bigram_ppl_hand_computed(spark):
    from linkkchecker_net_spark.pipeline.ranking import bigram_ppl

    docs = _docs(
        spark,
        [
            (1, "a b a b"),   # bigrams: (a,b) x2, (b,a) x1
            (2, "a b"),       # bigram: (a,b)
            (3, "solo"),      # < 2 tokens -> ppl NULL, keep False
            (4, ""),          # token-less
        ],
    )
    out = {r["doc_id"]: r for r in bigram_ppl(docs, alpha=1.0, threshold=5.0).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[3]["ppl"] is None and out[3]["keep"] is False
    assert out[4]["ppl"] is None and out[4]["keep"] is False
    # corpus: cnt(a,b)=3, cnt(b,a)=1; ctx(a)=3, ctx(b)=1; V=|{a,b,solo}|=3
    v = 3.0
    lab = math.log((3 + 1) / (3 + v))   # P(b|a)
    lba = math.log((1 + 1) / (1 + v))   # P(a|b)
    p1 = math.exp(-(2 * lab + lba) / 3)
    p2 = math.exp(-lab)
    assert out[1]["ppl"] == pytest.approx(round(p1, 6), abs=1e-6)
    assert out[2]["ppl"] == pytest.approx(round(p2, 6), abs=1e-6)
    assert out[2]["keep"] == (round(p2, 9) <= 5.0)


def test_pmi_collocations_hand_values(spark):
    """'new york' appears twice as a pair with unigrams 2/2 over a
    6-token, 3-bigram stream: pmi = ln((2/3)/((2/6)^2)) = ln(6);
    the stream total counts the hapax (stock, jump) pair even though
    min_count prunes it from the report."""
    import math

    from linkkchecker_net_spark.pipeline.ranking import pmi_collocations

    docs = spark.createDataFrame(
        [(0, "new york"), (1, "new york"), (2, "stock jump")],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, k=10, min_count=2).collect()
    assert len(out) == 1  # (stock, jump) is a hapax pair -> filtered
    r = out[0]
    assert (r["w1"], r["w2"]) == ("new", "york")
    assert r["c_bigram"] == 2 and r["c_w1"] == 2 and r["c_w2"] == 2
    assert r["pmi"] == round(math.log((2 / 3) / ((2 / 6) * (2 / 6))), 6)


def test_oov_rate_hand_values(spark):
    """k=2 vocab = {aa (4x), bb (3x)}; doc 2's 'zz yy' is fully OOV;
    the empty doc anchors with NULL stats and high_oov false."""
    from linkkchecker_net_spark.pipeline.ranking import oov_rate

    docs = spark.createDataFrame(
        [
            (0, "aa aa bb zz"),
            (1, "aa aa bb bb"),
            (2, "zz yy"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in oov_rate(docs, k=2).collect()}
    assert out[0]["n_tokens"] == 4 and out[0]["n_oov"] == 1
    assert out[0]["oov_ppm"] == 250_000 and out[0]["high_oov"] is True
    assert out[1]["n_oov"] == 0 and out[1]["high_oov"] is False
    assert out[2]["oov_ppm"] == 1_000_000 and out[2]["high_oov"]
    assert out[3]["n_tokens"] is None and out[3]["high_oov"] is False
