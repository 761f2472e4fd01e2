"""Unit tests for pipeline/curation.py — properties the DuckDB oracle
comparison (test_entry_contract) doesn't pin: path equivalence across the
broadcast/shuffle switch, quota semantics, partition-function totality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkkchecker_net_spark.pipeline.curation import (
    decontaminate,
    shard_assign,
    stratified_sample,
    vocab_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0/1 share a verbatim 3-gram with eval doc 100
        (0, "alpha beta gamma delta common phrase here tail zero", "en"),
        (1, "unrelated words common phrase here and more filler text", "en"),
        (2, "completely disjoint vocabulary nothing shared at all okay", "de"),
        (3, "der die und ist das kurze deutsche zeile hier", "de"),
        (100, "eval doc with common phrase here inside it", "en"),
        (101, "another eval document nothing overlapping with training rows", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_exact_overlaps(spark, docs):
    evalset = docs.filter(F.col("doc_id") >= 100)
    train = docs.filter(F.col("doc_id") < 100)
    out = {r["doc_id"]: r["n_hits"] for r in decontaminate(train, evalset, k=3).collect()}
    # docs 0 and 1 contain "common phrase here" (plus flanking 3-grams of
    # doc 0's "delta common phrase"/"phrase here tail"? — only shingles
    # present in BOTH sides count, so exactly the eval doc's shingles)
    assert set(out) == {0, 1}
    # doc 1 shares "common phrase here" AND "phrase here and"? eval text is
    # "... common phrase here inside ..." -> shingles include
    # "common phrase here", "phrase here inside" — doc 1 has
    # "common phrase here" only; doc 0 likewise
    assert out[0] == 1 and out[1] == 1


def test_decontaminate_broadcast_and_shuffle_paths_agree(spark, docs):
    evalset = docs.filter(F.col("doc_id") >= 100)
    train = docs.filter(F.col("doc_id") < 100)
    bc = decontaminate(train, evalset, k=3, eval_shingle_count=10).collect()
    sh = decontaminate(
        train, evalset, k=3, eval_shingle_count=10**9
    ).collect()  # over threshold -> no broadcast hint
    assert sorted(map(tuple, bc)) == sorted(map(tuple, sh))


def test_stratified_sample_quota_and_determinism(spark, docs):
    out1 = stratified_sample(docs, per_group=2, group_col="lang").collect()
    out2 = stratified_sample(docs, per_group=2, group_col="lang").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_lang = {}
    for r in out1:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert all(len(v) <= 2 for v in by_lang.values())
    # groups smaller than the quota are kept whole
    assert len(by_lang["fr"]) == 1 and len(by_lang["de"]) == 2


def test_shard_assign_partitions_everything_exactly_once(spark, docs):
    man = shard_assign(docs, n_shards=4).collect()
    assert sum(r["n_docs"] for r in man) == docs.count()
    assert all(0 <= r["shard_id"] < 4 for r in man)
    # deterministic: same manifest on re-run
    again = shard_assign(docs, n_shards=4).collect()
    assert sorted(map(tuple, man)) == sorted(map(tuple, again))


def test_vocab_topk_order_and_bound(spark, docs):
    out = vocab_topk(docs, k=5).collect()
    assert len(out) == 5
    cnts = [r["cnt"] for r in out]
    assert cnts == sorted(cnts, reverse=True)
    # exact counts: "common"/"phrase"/"here" appear 3x each across docs
    top = {r["token"]: r["cnt"] for r in out}
    assert top.get("phrase") == 3 and top.get("here") == 3


def test_bpe_pairs_hand_computed(spark):
    from linkkchecker_net_spark.pipeline.curation import bpe_pairs

    docs = spark.createDataFrame(
        [(1, "ab ab b"), (2, "ab")], "doc_id long, text string"
    )
    # vocab: ab freq 3, b freq 1
    # "ab": (a,b), (b,</w>) each x3 ; "b": (b,</w>) x1
    rows = {(r["w1"], r["w2"]): r["cnt"] for r in bpe_pairs(docs, k=10).collect()}
    assert rows == {("a", "b"): 3, ("b", "</w>"): 4}


def test_bpe_pairs_topk_order(spark):
    from linkkchecker_net_spark.pipeline.curation import bpe_pairs

    docs = spark.createDataFrame(
        [(1, "xy xz")], "doc_id long, text string"
    )
    out = bpe_pairs(docs, k=2).collect()
    # counts: (x,y)=1,(y,</w>)=1,(x,z)=1,(z,</w>)=1 -> tie-break (w1,w2) asc
    assert [(r["w1"], r["w2"]) for r in out] == [("x", "y"), ("x", "z")]


def test_dsir_weights_prefers_target_like_docs(spark):
    from linkkchecker_net_spark.pipeline.curation import dsir_weights

    rows = [
        # target slice (lang=en) speaks "alpha beta"
        (1, "alpha beta alpha beta", "en"),
        (2, "alpha beta", "en"),
        # raw-only slice speaks "gamma delta"
        (3, "gamma delta gamma delta", "de"),
        # mixed doc in the raw pool
        (4, "alpha gamma", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in dsir_weights(docs, n_buckets=64).collect()}
    assert set(out) == {1, 2, 3, 4}
    # per-token log-ratio is higher for target-vocabulary docs
    assert out[1]["logw"] / out[1]["n_tok"] > out[3]["logw"] / out[3]["n_tok"]
    assert out[3]["logw"] < 0  # gamma/delta never appear in the target
    assert out[4]["n_tok"] == 2


def test_dsir_weights_anchors_tokenless_docs(spark):
    from linkkchecker_net_spark.pipeline.curation import dsir_weights

    docs = spark.createDataFrame(
        [(1, "alpha", "en"), (2, "", "en")], "doc_id long, text string, lang string"
    )
    out = {r["doc_id"]: r for r in dsir_weights(docs, n_buckets=16).collect()}
    assert out[2]["logw"] == 0.0 and out[2]["n_tok"] == 0


def test_dup_span_fraction_hand_computed(spark):
    from linkkchecker_net_spark.pipeline.dedup import dup_span_fraction

    rows = [
        # docs 1 and 2 share the 3-gram "a b c"; doc 3 is disjoint;
        # doc 4 is shorter than k and must be anchored with zeros
        (1, "a b c d"),
        (2, "a b c e"),
        (3, "x y z w"),
        (4, "p q"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_fraction(docs, k=3, threshold=0.5).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_grams"] == 2 and out[1]["n_shared"] == 1
    assert out[1]["dup_fraction"] == 0.5 and out[1]["dup_flag"]
    assert out[3]["n_shared"] == 0 and not out[3]["dup_flag"]
    assert out[4]["n_grams"] == 0 and out[4]["dup_fraction"] == 0.0


def test_dup_span_fraction_empty_corpus(spark):
    from linkkchecker_net_spark.pipeline.dedup import dup_span_fraction

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert dup_span_fraction(docs).count() == 0


def test_domain_cap_quota_and_priority(spark):
    from linkkchecker_net_spark.pipeline.curation import domain_cap

    rows = [
        (1, "s1", 100), (2, "s1", 300), (3, "s1", 200), (4, "s1", 300),
        (5, "s2", 50),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = domain_cap(docs, cap=2, group_col="source").collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["rnk"], r["doc_id"]))
    # quota enforced; priority = n_chars desc, doc_id tie-break (2 before 4)
    assert sorted(by_src["s1"]) == [(1, 2), (2, 4)]
    assert sorted(by_src["s2"]) == [(1, 5)]


def test_domain_cap_empty_corpus(spark):
    from linkkchecker_net_spark.pipeline.curation import domain_cap

    docs = spark.createDataFrame([], "doc_id long, source string, n_chars long")
    assert domain_cap(docs).count() == 0


# ----------------------------------------------------------------- cdc_dedup
def test_cdc_chunks_match_reference_fold(spark):
    """Chunk stream equals a per-doc python reference of the same
    boundary rule (md5(token) first hex in 0-3), trailing chunk kept."""
    import hashlib

    from linkkchecker_net_spark.pipeline.dedup import cdc_chunks

    texts = [
        (0, "key agg row scan slow fast table value"),
        (1, "zz"),
        (2, "key"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_pos, r.chunk))
    for d, t in texts:
        out, cur = [], ""
        for tok in t.split(" "):
            cur = tok if cur == "" else cur + " " + tok
            if hashlib.md5(tok.encode()).hexdigest()[0] in "0123":
                out.append(cur)
                cur = ""
        if cur:
            out.append(cur)
        assert [c for _, c in sorted(got[d])] == out, d


def test_cdc_dedup_shift_robust(spark):
    """The CDC property fixed-size chunking lacks: inserting a token
    mid-document leaves chunks outside the edited region identical, so
    the shared boilerplate still dedups."""
    from linkkchecker_net_spark.pipeline.dedup import cdc_chunks, cdc_dedup

    base = "key agg row scan slow fast table value part hash merge batch"
    # insert one token after 'scan' — everything before/after re-chunks
    # identically because boundaries are content-local
    edited = base.replace("scan slow", "scan INSERTED slow")
    docs = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    ch = {(r.doc_id, r.chunk) for r in cdc_chunks(docs).collect()}
    c0 = {c for d, c in ch if d == 0}
    c1 = {c for d, c in ch if d == 1}
    shared = c0 & c1
    assert len(shared) >= len(c0) - 2  # only the edited chunk diverges
    out = {r.doc_id: r for r in cdc_dedup(docs).collect()}
    assert out[0].n_dup_chunks >= out[0].n_chunks - 2
    assert out[0].dup_ppm > 500_000 and out[1].dup_ppm > 500_000


def test_cdc_dedup_unique_corpus_zero(spark):
    """No cross-doc sharing -> every doc reports 0 dup chunks."""
    from linkkchecker_net_spark.pipeline.dedup import cdc_dedup

    docs = spark.createDataFrame(
        [(i, f"tok{i}a tok{i}b tok{i}c") for i in range(4)],
        "doc_id long, text string",
    )
    for r in cdc_dedup(docs).collect():
        assert r.n_dup_chunks == 0 and r.dup_ppm == 0 and r.n_chunks >= 1


# ---------------------------------------------------------------- domain_mix
def test_domain_mix_hand_computed(spark):
    from linkkchecker_net_spark.pipeline.curation import domain_mix

    rows = [(0, "a", 100), (1, "a", 100), (2, "b", 700), (3, "c", 100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        r["source"]: (
            r["n_docs"], r["n_chars"], r["actual_ppm"], r["target_ppm"],
            r["weight_ppm"], r["planned_chars"],
        )
        for r in domain_mix(docs, budget_chars=900, max_repeat_ppm=1_500_000).collect()
    }
    # totals: 1000 chars, 3 sources -> target 333333 ppm each
    assert got == {
        # 200/1000 = 200000 ppm; weight = 333333e6/200000 = 1666665 -> capped
        "a": (2, 200, 200_000, 333_333, 1_500_000, 299),
        # 700/1000 = 700000 ppm; weight = 333333e6/700000 = 476190
        "b": (1, 700, 700_000, 333_333, 476_190, 299),
        "c": (1, 100, 100_000, 333_333, 1_500_000, 299),
    }


def test_domain_mix_explicit_targets_and_empty(spark):
    from linkkchecker_net_spark.pipeline.curation import domain_mix

    rows = [(0, "a", 500), (1, "b", 500)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        r["source"]: (r["target_ppm"], r["weight_ppm"])
        for r in domain_mix(
            docs, targets_ppm={"a": 900_000, "b": 0}
        ).collect()
    }
    # a: 900000e6/500000 = 1800000; b excluded (target 0 -> weight 0)
    assert got == {"a": (900_000, 1_800_000), "b": (0, 0)}
    empty = spark.createDataFrame([], "doc_id long, source string, n_chars long")
    assert domain_mix(empty).count() == 0


# -------------------------------------------------- semantic_decontaminate
def test_semantic_decontaminate_hand_computed(spark):
    from linkkchecker_net_spark.pipeline.curation import semantic_decontaminate

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    dirty = spark.createDataFrame(
        [(100, [2.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["max_cos"], r["contaminated"])
        for r in semantic_decontaminate(corpus, dirty, threshold=0.7).collect()
    }
    assert got == {
        1: (1.0, True),          # parallel
        2: (0.0, False),         # orthogonal
        3: (0.707107, True),     # 45 degrees = 1/sqrt(2)
    }


def test_semantic_decontaminate_broadcast_paths_agree(spark):
    from linkkchecker_net_spark.pipeline.curation import semantic_decontaminate

    corpus = spark.createDataFrame(
        [(i, [float(i % 3 + 1), float(i % 5)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    dirty = spark.createDataFrame(
        [(100 + j, [1.0, float(j)]) for j in range(3)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(map(tuple, semantic_decontaminate(corpus, dirty).collect()))
    b = sorted(
        map(tuple, semantic_decontaminate(corpus, dirty, broadcast_dirty=False).collect())
    )
    assert a == b and len(a) == 20


# --------------------------------------------------------- content_language
def test_content_language_precedence_and_normalization(spark):
    from linkkchecker_net_spark.pipeline.text import content_language_audit

    en = "the a of and is the a of and is"
    pages = spark.createDataFrame(
        [
            # attr wins over header; region subtag stripped; mixed case
            (0, "Content-Language: fr\r\nX: 1", '<html lang="EN-us"><div lang="zz">', en),
            # header only, first token of the list wins
            (1, "content-language:  de , en\r\nX: 1", "<html>", en),
            # nothing declared
            (2, "X-Other: 1", "<html>", en),
            # declared but undetectable text
            (3, "Content-Language: en", "<html>", "zzz qqq xxx"),
            # non-root lang attr must NOT count as declaration
            (4, "X: 1", '<body><div lang="fr">x</div></body>', en),
        ],
        "doc_id long, headers string, body string, text string",
    )
    got = {
        r["doc_id"]: (r["attr_lang"], r["header_lang"], r["declared"],
                      r["pred_lang"], r["verdict"])
        for r in content_language_audit(pages).collect()
    }
    assert got == {
        0: ("en", "fr", "en", "en", "match"),
        1: (None, "de", "de", "en", "mismatch"),
        2: (None, None, None, "en", "undeclared"),
        3: (None, "en", "en", "und", "undetected"),
        4: (None, None, None, "en", "undeclared"),
    }


def test_dataset_card_shares_sum_and_means(spark):
    from linkkchecker_net_spark.pipeline.curation import dataset_card

    rows = [(0, "a b c", "en", "s1", 5), (1, "x y", "en", "s1", 3),
            (2, "zz", "de", "s2", 2)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {(r["source"], r["lang"]): (r["n_docs"], r["n_chars"], r["n_tokens"],
                                      r["share_ppm"], r["mean_chars"])
           for r in dataset_card(docs).collect()}
    assert got == {
        ("s1", "en"): (2, 8, 5, 800_000, 4),
        ("s2", "de"): (1, 2, 1, 200_000, 2),
    }


def test_length_quantiles_nearest_rank(spark):
    from linkkchecker_net_spark.pipeline.curation import length_quantiles

    rows = [(i, "en", c) for i, c in enumerate([10, 20, 30, 40, 50])]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    r = length_quantiles(docs).collect()[0]
    # n=5: p50 at rank ceil(2.5)=3 -> 30; p90 at rank ceil(4.5)=5 -> 50
    assert (r["n_docs"], r["p50_chars"], r["p90_chars"]) == (5, 30, 50)


def test_containment_asymmetry(spark):
    from linkkchecker_net_spark.pipeline.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"),       # big doc
         (2, "a b c d e"),                  # fully contained prefix
         (3, "x y z w v u t s r q")],       # disjoint
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["containment_ppm"]
           for r in containment_pairs(docs, threshold=0.7, k=3).collect()}
    # doc2's 3 shingles all inside doc1 -> 1.0; reverse is 3/8 < 0.7
    assert got == {(2, 1): 1_000_000}


def test_editdist_verify_hand_pairs(spark):
    from linkkchecker_net_spark.pipeline.dedup import editdist_verify

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghiX"), (3, "zzzzzzzzzz")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    got = {(r["doc_a"], r["doc_b"]): (r["dist"], r["rel_ppm"], r["dup"])
           for r in editdist_verify(docs, pairs).collect()}
    assert got == {
        (1, 2): (1, 100_000, True),
        (1, 3): (10, 1_000_000, False),
    }


def test_unicode_hygiene_strip_and_count(spark):
    from linkkchecker_net_spark.pipeline.text import unicode_hygiene

    docs = spark.createDataFrame(
        [(1, "to\u00adken\u200b\u0007 end"), (2, "clean text")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_invisible"], r["n_control"], r["clean_text"],
                         r["changed"])
           for r in unicode_hygiene(docs).collect()}
    assert got == {
        1: (2, 1, "token end", True),
        2: (0, 0, "clean text", False),
    }


def test_main_content_tie_and_density(spark):
    from linkkchecker_net_spark.pipeline.text import main_content

    pages = spark.createDataFrame(
        [("a", "<p>short</p><p class='x'>" + "y" * 80 + "</p>"),
         ("b", "<p>" + "q" * 40 + "</p><p>" + "r" * 40 + "</p>"),
         ("c", "<div>none</div>")],
        "url string, body string",
    )
    got = {r["url"]: (r["n_blocks"], r["main_chars"], r["main_text"][:2]
                      if r["main_text"] else None, r["verdict"])
           for r in main_content(pages).collect()}
    assert got == {
        "a": (2, 80, "yy", "ok"),
        "b": (2, 40, "qq", "thin"),   # tie -> earliest block
        "c": (0, 0, None, "no_content"),
    }


def test_dataset_split_and_balance_determinism(spark):
    from linkkchecker_net_spark.pipeline.curation import (
        dataset_split,
        split_balance,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(200)],
        "doc_id long, lang string",
    )
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    # repartitioning must not move any doc between splits
    b = {r["doc_id"]: r["split"]
         for r in dataset_split(docs.repartition(7)).collect()}
    assert a == b
    bal = split_balance(docs)
    rows = bal.collect()
    # shares within each split sum to ~1e6 (floor rounding)
    from collections import defaultdict
    per = defaultdict(int)
    for r in rows:
        per[r["split"]] += r["share_ppm"]
    assert all(999_990 <= v <= 1_000_000 for v in per.values()), per


def test_allcaps_spam_filters(spark):
    from linkkchecker_net_spark.pipeline.text import allcaps_spam

    docs = spark.createDataFrame(
        [(1, "BUY NOW CHEAP PILLS HERE tail"),
         (2, "the NASA report and I went home 123"),
         (3, "HI")],  # below min_tokens
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_alpha_tokens"], r["n_caps"], r["shouting"])
           for r in allcaps_spam(docs).collect()}
    assert got == {
        1: (6, 5, True),
        2: (6, 1, False),   # 'I' and '123' excluded from alpha
        3: (1, 1, False),
    }


def test_ring_rebalance_moves_about_one_in_n(spark):
    """Consistent hashing's whole point: resizing 4 -> 5 shards moves
    FAR less than the ~80% a mod-N reshard would."""
    from linkkchecker_net_spark.pipeline.curation import ring_rebalance

    docs = spark.range(400).select(F.col("id").alias("doc_id"))
    cells = ring_rebalance(docs, n_old=4, n_new=5, vnodes=8).collect()
    total = sum(c["n_docs"] for c in cells)
    moved = sum(c["n_docs"] for c in cells if c["moved"])
    assert total == 400
    # every doc that moved must move TO the new shard (4) — a doc can
    # never change owner between two old shards when vnodes only get added
    assert all(c["new_shard"] == 4 for c in cells if c["moved"])
    assert 0 < moved < total * 0.5  # far below mod-N's ~80%


def test_freshness_audit_verdicts(spark):
    from linkkchecker_net_spark.pipeline.recrawl import freshness_audit

    rows = [
        # max-age 100, age 50 at now=1000, date=920 -> current 130 -> stale
        ("a", 920, None, 100, 50),
        # heuristic: date-lm = 2000 -> lifetime 200; current 80 -> fresh
        ("b", 920, -1080, None, None),
        # nothing -> no_estimate
        ("c", 920, None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, date_epoch long, last_modified_epoch long, "
        "max_age long, age long",
    )
    out = {r["url"]: r for r in freshness_audit(df, now_epoch=1000).collect()}
    assert out["a"]["verdict"] == "stale" and out["a"]["current_age"] == 130
    assert out["b"]["verdict"] == "fresh" and out["b"]["lifetime"] == 200
    assert out["b"]["heuristic_used"] is True
    assert out["c"]["verdict"] == "no_estimate"


def test_burst_detect_range_window_gaps(spark):
    """Empty buckets must count as gaps (RANGE, not ROWS): a burst right
    after a quiet gap sees only the buckets actually within range."""
    import datetime as dt

    from linkkchecker_net_spark.pipeline.recrawl import burst_detect

    def t(hour, n):
        base = dt.datetime(2024, 1, 1)
        return [(base + dt.timedelta(hours=hour, seconds=s), "err")
                for s in range(n)]

    rows = t(0, 2) + t(1, 2) + t(2, 2) + t(3, 18) + t(7, 18)
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r["bucket"] % 100: r for r in burst_detect(
        df, bucket_sec=3600, trailing=3, factor=3, min_count=5).collect()}
    h0 = min(out)
    # hour 3: prev_sum 6 over 3 full buckets, 18 >= 3*6 -> burst
    assert out[h0 + 3]["burst"] is True
    assert out[h0 + 3]["prev_sum"] == 6 and out[h0 + 3]["n_prev"] == 3
    # hour 7: hours 4-6 are EMPTY -> n_prev 0 -> no full window -> no burst
    assert out[h0 + 7]["n_prev"] == 0
    assert out[h0 + 7]["burst"] is False


def test_source_overlap_counts_distinct_digests(spark):
    from linkkchecker_net_spark.pipeline.curation import source_overlap

    rows = [
        (0, "same text", "a"), (1, "same text", "b"),  # shared a-b
        (2, "same text", "a"),   # duplicate within a: still ONE digest
        (3, "other", "a"), (4, "other", "c"),          # shared a-c
        (5, "only b", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r["n_shared_digests"]
           for r in source_overlap(docs).collect()}
    assert out == {("a", "b"): 1, ("a", "c"): 1}


def test_open_redirect_grammar(spark):
    from linkkchecker_net_spark.reports.security import open_redirect_audit

    pages = [
        ("u1", '<a href="/out?url=https://evil.test/x">z</a>'
               '<a href="/fine?ref=home">d</a>'),
        ("u2", '<a href="/r?next=HTTP%3A%2F%2Fe.test">w</a>'),
        ("u3", '<a href="https://ok.test/page">direct absolute is fine</a>'),
    ]
    df = spark.createDataFrame(pages, "url string, body string")
    out = {r["url"]: r for r in open_redirect_audit(df).collect()}
    assert out["u1"]["open_redirect_suspect"] is True
    assert out["u1"]["first_offender"] == "/out?url=https://evil.test/x"
    assert out["u1"]["n_links"] == 2 and out["u1"]["n_embedded_url_links"] == 1
    assert out["u2"]["open_redirect_suspect"] is True  # encoded, uppercase
    assert out["u3"]["open_redirect_suspect"] is False


def test_partition_advisor_exact_cliffs(spark):
    from linkkchecker_net_spark.pipeline.curation import partition_advisor

    rows = [
        # 1 byte -> raw 1 -> clamped up to min 32
        ("tiny", 10, 1),
        # exactly 10 partitions of 128MiB -> clamped to 32
        ("mid", 1000, 10 * 128 * 1024 * 1024),
        # huge: raw beyond max -> clamped to 20000; skew flag fires
        ("huge", 10**13, 10**15),
        # broadcastable boundary: exactly at the threshold
        ("bcast", 100, 10 * 1024 * 1024),
    ]
    stats = spark.createDataFrame(
        rows, "table_name string, n_rows long, est_bytes long"
    )
    out = {r["table_name"]: r for r in partition_advisor(stats).collect()}
    assert out["tiny"]["rec_partitions"] == 32
    assert out["mid"]["rec_partitions"] == 32
    assert out["huge"]["rec_partitions"] == 20000
    assert out["huge"]["rows_per_partition"] == 10**13 // 20000
    assert out["huge"]["skew_risk"] is True
    assert out["bcast"]["broadcastable"] is True
    assert out["huge"]["broadcastable"] is False


def test_epoch_shuffle_determinism_and_epoch_variation(spark):
    from linkkchecker_net_spark.pipeline.curation import epoch_shuffle

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    a = {(r["doc_id"]): (r["shard_id"], r["pos"])
         for r in epoch_shuffle(docs, epoch=1, n_shards=4).collect()}
    b = {(r["doc_id"]): (r["shard_id"], r["pos"])
         for r in epoch_shuffle(docs, epoch=1, n_shards=4)
         .repartition(13).collect()}
    assert a == b  # partitioning-independent
    c = {(r["doc_id"]): (r["shard_id"], r["pos"])
         for r in epoch_shuffle(docs, epoch=2, n_shards=4).collect()}
    # same shards (epoch doesn't move docs between shards)...
    assert all(a[d][0] == c[d][0] for d in a)
    # ...but a different within-shard order
    assert any(a[d][1] != c[d][1] for d in a)
    # positions are a 0-based dense permutation within each shard
    by_shard = {}
    for d, (s, p) in a.items():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))


def test_temporal_split_leakage(spark):
    import datetime as dt

    from linkkchecker_net_spark.pipeline.curation import temporal_split

    base = dt.datetime(2024, 1, 1)
    cutoff = int((base + dt.timedelta(days=1)).timestamp()) * 1_000_000

    rows = [
        (1, base),                                # train only
        (2, base + dt.timedelta(days=2)),         # test only
        (3, base), (3, base + dt.timedelta(days=2)),  # leaky
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = temporal_split(ev, cutoff_us=cutoff).collect()[0]
    assert (r["n_train"], r["n_test"], r["n_users"]) == (2, 2, 3)
    assert r["n_leaky_users"] == 1 and r["leaky_ppm"] == 333_333


def test_url_blocklist_gate_and_funnel_composition(spark):
    """r4 verdict item 4: the C4/RefinedWeb first-stage URL filter.
    Domain verdicts outrank substring rules; the keep column composes
    with curation_funnel as the upstream gate (a doc dropped by either
    gate is dropped by the composition, reason attributes to the FIRST
    failing stage — blocklist runs before content ever loads)."""
    from linkkchecker_net_spark.pipeline.blocklist import url_blocklist
    from linkkchecker_net_spark.pipeline.curation import curation_funnel

    pages = spark.createDataFrame(
        [
            ("d0", "http://a.bad.example.com/x", "a.bad.example.com"),
            ("d1", "http://ok.test/casino/slots", "ok.test"),
            ("d2", "http://ok.test/page?sessionid=9", "ok.test"),
            ("d3", "http://fine.test/article", "fine.test"),
            ("d4", "http://sub.bad.example.com/casino", "sub.bad.example.com"),
        ],
        "doc_id string, url string, host string",
    )
    bl = spark.createDataFrame([("example.com",)], "domain string")
    out = {
        r["url"]: r
        for r in url_blocklist(
            pages, bl, ["casino", "sessionid="]
        ).collect()
    }
    # both subdomains fall with the registrable domain
    assert out["http://a.bad.example.com/x"]["reason"] == "blocked_domain"
    assert out["http://sub.bad.example.com/casino"]["reason"] == "blocked_domain"
    # ...and domain wins over the also-matching substring rule
    assert out["http://sub.bad.example.com/casino"]["matched_rule"] == "casino"
    assert out["http://ok.test/casino/slots"]["reason"] == "blocked_url"
    assert out["http://ok.test/page?sessionid=9"]["matched_rule"] == "sessionid="
    assert out["http://fine.test/article"]["keep"] is True

    # funnel composition: blocklist keep gates which docs reach the
    # content funnel; d3 is the only URL-clean doc
    docs = spark.createDataFrame(
        [("d3", "the quick brown fox jumps over the lazy dog and then "
                "the fox naps while the dog watches the quiet yard "
                "with one open eye")],
        "doc_id string, text string",
    )
    gate = url_blocklist(pages, bl, ["casino", "sessionid="]).join(
        pages.select("doc_id", "url"), "url"
    )
    survivors = gate.filter("keep").select("doc_id").join(docs, "doc_id")
    funnel = curation_funnel(survivors).collect()
    assert [r["doc_id"] for r in funnel] == ["d3"]


def _py_bpe(word_freqs, n_merges):
    """Plain-Python Sennrich reference: greedy left-to-right
    non-overlapping merges, ties (cnt desc, w1 asc, w2 asc)."""
    vocab = {}
    for w, f in word_freqs.items():
        k = tuple(list(w) + ["</w>"])
        vocab[k] = vocab.get(k, 0) + f
    merges = []
    for r in range(1, n_merges + 1):
        pc = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        (w1, w2), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, w1, w2, cnt))
        nxt = {}
        for syms, f in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == w1 and x == w2:
                    out[-1] = w1 + w2
                else:
                    out.append(x)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        vocab = nxt
    return merges


def test_bpe_merges_matches_python_reference(spark):
    """r4 verdict item 5: the FULL merge loop (not just iteration 1)
    equals a plain-Python Sennrich implementation on an irregular
    corpus, including the overlapping-run case ('aaaa' must merge to
    [aa, aa], never [aaa, a]) and tie-breaking."""
    from linkkchecker_net_spark.pipeline.curation import bpe_merges

    freqs = {"low": 3, "lower": 2, "newest": 4, "widest": 1, "aaaa": 2}
    rows = []
    did = 0
    for w, f in freqs.items():
        for _ in range(f):
            rows.append((did, w))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["merge_rank"], r["w1"], r["w2"], r["cnt"])
        for r in bpe_merges(docs, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    want = _py_bpe(freqs, 8)
    assert got == want, f"\ngot:  {got}\nwant: {want}"
    # the overlap rule actually fired: (a,a) was merged at some round,
    # and a later round merged (aa,aa), not (aaa,a)
    pairs = {(w1, w2) for _, w1, w2, _ in got}
    assert ("a", "a") in pairs and ("aaa", "a") not in pairs


def _py_substring_spans(texts, L):
    """Reference ExactSubstr span finder: stride-1 L-grams, global
    dup filter, per-doc maximal run merge."""
    from collections import Counter

    grams = Counter()
    pos = {}
    for did, t in texts.items():
        ps = []
        for i in range(len(t) - L + 1):
            g = t[i:i + L]
            grams[g] += 1
            ps.append((i + 1, g))
        pos[did] = ps
    out = set()
    for did, ps in pos.items():
        dup = [p for p, g in ps if grams[g] > 1]
        run = []
        for p in dup:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.add((did, run[0], run[-1] - run[0] + L, len(run)))
                run = [p]
        if run:
            out.add((did, run[0], run[-1] - run[0] + L, len(run)))
    return out


def test_substring_dedup_spans_matches_reference_and_hash_path(spark):
    """r4 verdict stretch item 8 (Lee 2022 ExactSubstr): maximal
    any-length duplicated spans — cross-doc shared segment, within-doc
    self-repeat, clean doc absent; the xxhash64 shuffle-key path is
    span-identical to the exact-gram path."""
    from linkkchecker_net_spark.pipeline.dedup import substring_dedup_spans

    texts = {
        0: "PREFIXUNIQ1 SHAREDSEGMENT0123456789 TAILUNIQ1",
        1: "xxSHAREDSEGMENT0123456789yy&DIFFERENT-REST!",
        2: "zzzzzzzzzzzzzzzz",          # 16 z's: one self-dup span
        3: "perfectly clean unique doc",  # no spans
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    want = _py_substring_spans(texts, 8)
    got = {
        (r["doc_id"], r["span_start"], r["span_len"], r["n_grams"])
        for r in substring_dedup_spans(docs, min_len=8).collect()
    }
    assert got == want, f"\ngot:  {sorted(got)}\nwant: {sorted(want)}"
    assert not any(d == 3 for d, *_ in got)          # clean doc absent
    assert (2, 1, 16, 9) in got                      # the z-run span
    got_hashed = {
        (r["doc_id"], r["span_start"], r["span_len"], r["n_grams"])
        for r in substring_dedup_spans(
            docs, min_len=8, hash_key=True
        ).collect()
    }
    assert got_hashed == got


def test_bpe_train_then_encode_roundtrip(spark):
    """Train on a corpus with bpe_merges, apply with bpe_encode_stats:
    symbol counts must equal the python-reference encoder's, and more
    merges can only shrink (or hold) n_symbols."""
    from linkkchecker_net_spark.pipeline.curation import (
        bpe_encode_stats,
        bpe_merges,
    )

    freqs = {"banana": 3, "bandana": 2, "ban": 4}
    rows, did = [], 0
    for w, f in freqs.items():
        for _ in range(f):
            rows.append((did, w + " " + w))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    learned = [
        (r["w1"], r["w2"])
        for r in bpe_merges(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    assert len(learned) == 4

    def enc_len(word, merges):
        syms = list(word) + ["</w>"]
        for w1, w2 in merges:
            out = []
            for x in syms:
                if out and out[-1] == w1 and x == w2:
                    out[-1] = w1 + w2
                else:
                    out.append(x)
            syms = out
        return len(syms)

    out = {
        r["doc_id"]: r
        for r in bpe_encode_stats(docs, learned).collect()
    }
    did = 0
    for w, f in freqs.items():
        want = 2 * enc_len(w, learned)
        for _ in range(f):
            r = out[did]
            assert r["n_symbols"] == want and r["n_words"] == 2
            assert r["n_chars"] == 2 * len(w)
            did += 1
    # monotone: 4 merges never produce more symbols than 2
    out2 = {
        r["doc_id"]: r["n_symbols"]
        for r in bpe_encode_stats(docs, learned[:2]).collect()
    }
    assert all(out[d]["n_symbols"] <= out2[d] for d in out)


def test_url_score_signals_hand_values(spark):
    """RefinedWeb-style soft scorer: each signal hand-checked, www not
    counted as a subdomain, clean URL scores 0."""
    from linkkchecker_net_spark.pipeline.blocklist import url_score

    pages = spark.createDataFrame(
        [
            ("http://ex.test/a", "ex.test"),
            ("http://www.ex.test/free-casino-bet", "www.ex.test"),
            ("http://a.b.c.ex.test/p", "a.b.c.ex.test"),
            ("http://ex.test/1234567890123456", "ex.test"),
            ("http://ex.test/" + "y" * 140, "ex.test"),
        ],
        "url string, host string",
    )
    out = {r["url"]: r for r in url_score(pages).collect()}
    assert out["http://ex.test/a"]["score_centi"] == 0
    r = out["http://www.ex.test/free-casino-bet"]
    assert r["n_badwords"] == 2 and r["n_subdomains"] == 0
    assert r["score_centi"] == 200
    assert out["http://a.b.c.ex.test/p"]["n_subdomains"] == 3
    assert out["http://a.b.c.ex.test/p"]["score_centi"] == 75
    r = out["http://ex.test/1234567890123456"]
    assert r["digit_ppm"] >= 200_000 and r["score_centi"] == 50
    assert out["http://ex.test/" + "y" * 140]["score_centi"] == 50


def test_shard_skew_audit_shares_and_invariants(spark, docs):
    from linkkchecker_net_spark.pipeline.curation import shard_skew_audit

    out = shard_skew_audit(docs, n_shards=4, tolerance_ppm=200_000).collect()
    total_chars = sum(
        len(r["text"]) for r in docs.select("text").collect()
    )
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert sum(r["n_chars"] for r in out) == total_chars
    for r in out:
        # floor-ppm share recomputed by hand
        assert r["chars_share_ppm"] == r["n_chars"] * 1_000_000 // total_chars
        assert r["char_dev_ppm"] == r["chars_share_ppm"] - 250_000
        assert r["balanced"] == (abs(r["char_dev_ppm"]) <= 200_000)
    # floor-ppm shares can sum at most to 1e6
    assert sum(r["chars_share_ppm"] for r in out) <= 1_000_000


def test_shard_skew_audit_flags_imbalance(spark, docs):
    """With a tolerance of 0 ppm on an uneven md5 spread, at least one
    shard must read unbalanced (both verdict arms fire)."""
    from linkkchecker_net_spark.pipeline.curation import shard_skew_audit

    out = shard_skew_audit(docs, n_shards=4, tolerance_ppm=0).collect()
    assert any(not r["balanced"] for r in out)


def test_bpe_fertility_hand_values(spark):
    """'low' collapses to one symbol under the full merge chain
    (fertility 100); 'zq' falls back to chars+</w> (fertility 300);
    only the uncovered language reads fragmenting at the 250 bar."""
    from linkkchecker_net_spark.pipeline.curation import bpe_fertility

    rows = [
        (0, "low low low", "cov"),
        (1, "low low", "cov"),
        (2, "zq zq", "unc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    merges = [("l", "o"), ("lo", "w"), ("low", "</w>")]
    out = {r["lang"]: r for r in bpe_fertility(docs, merges, threshold_centi=250).collect()}
    cov, unc = out["cov"], out["unc"]
    assert cov["n_docs"] == 2 and cov["n_words"] == 5
    assert cov["n_symbols"] == 5 and cov["fertility_centi"] == 100
    assert cov["compression_centi"] == 300 and not cov["fragmenting"]
    assert unc["n_words"] == 2 and unc["n_symbols"] == 6
    assert unc["fertility_centi"] == 300 and unc["fragmenting"]
    assert unc["compression_centi"] == 66  # floor(4*100/6)


def test_cluster_keep_longest_wins(spark):
    """Cluster {1,2,3}: doc 2 is longest -> kept; singleton 9 keeps
    itself; equal-length tie inside cluster {5,6} goes to doc 5."""
    from linkkchecker_net_spark.pipeline.dedup import cluster_keep

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (9, 5), (5, 7), (6, 7)],
        "doc_id long, n_chars long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9), (5, 5), (6, 5)],
        "doc_id long, cluster_id long",
    )
    out = {r["doc_id"]: r["keep"] for r in cluster_keep(docs, clusters).collect()}
    assert out == {1: False, 2: True, 3: False, 9: True, 5: True, 6: False}


def test_packing_efficiency_tail_spill(spark):
    """One shard-less corpus check via n_shards=1: 3 docs of 10/10/25
    tokens at seq_len=16 — doc3 starts in chunk 1 (offset 20) and
    spills into chunk 2, which has no starter: n_chunks=2, capacity
    32, tokens 45, signed waste -13, fill > 1e6."""
    from linkkchecker_net_spark.pipeline.curation import packing_efficiency

    docs = spark.createDataFrame(
        [(0, "w " * 9 + "w"), (1, "w " * 9 + "w"), (2, "w " * 24 + "w")],
        "doc_id long, text string",
    )
    out = packing_efficiency(docs, seq_len=16, n_shards=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_chunks"] == 2 and r["n_tokens"] == 45
    assert r["capacity"] == 32 and r["waste_tokens"] == -13
    assert r["fill_ppm"] == 1_406_250


def test_heaps_law_hand_fit(spark):
    """Half corpus: 4 tokens / 2 distinct; full: 8 tokens / 4 distinct
    -> beta = log(2)/log(2) = 1, K = 4/8 = 0.5; a single-doc corpus
    (half == full sizes impossible) yields NULL fit."""
    from linkkchecker_net_spark.pipeline.curation import heaps_law

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "c d c d")], "doc_id long, text string"
    )
    r = heaps_law(docs).collect()[0]
    assert (r["n_tokens_half"], r["vocab_half"]) == (4, 2)
    assert (r["n_tokens_full"], r["vocab_full"]) == (8, 4)
    assert r["beta"] == 1.0 and r["k_coef"] == 0.5
    solo = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    r2 = heaps_law(solo).collect()[0]
    assert r2["beta"] is None and r2["k_coef"] is None
