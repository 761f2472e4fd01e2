"""Unit tests for repetition_stats / pii_stats (pipeline/text.py),
pack_sequences (pipeline/curation.py), and kmeans (pipeline/cluster.py) —
exact-value properties the DuckDB oracle comparison doesn't pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkkchecker_net_spark.pipeline.cluster import kmeans
from linkkchecker_net_spark.pipeline.curation import pack_sequences
from linkkchecker_net_spark.pipeline.text import pii_stats, repetition_stats


def test_repetition_stats_exact(spark):
    rows = [
        # "x y" 2-gram appears 3x in 6 tokens -> top frac 3*2/6 = 1.0;
        # 5-grams: (x y x y x), (y x y x y) -> both distinct -> dup 0.0
        (0, "x y x y x y"),
        # all-distinct tokens -> top 2-gram cnt 1
        (1, "a b c d e f g h"),
        # 10 identical tokens: top 2-gram cnt 9, frac 1.8;
        # 6 identical 5-grams -> dup = 1 - 1/6
        (2, "z z z z z z z z z z"),
        (3, "only three tokens"),  # no 5-grams -> dup 0.0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["top_2gram_cnt"] == 3 and out[0]["top_2gram_frac"] == 1.0
    assert out[0]["dup_5gram_frac"] == 0.0
    assert out[1]["top_2gram_cnt"] == 1
    assert out[1]["repetition_pass"] is False  # 2/8 = 0.25 > 0.2
    assert out[2]["top_2gram_cnt"] == 9
    assert out[2]["dup_5gram_frac"] == round(1 - 1 / 6, 6)
    assert out[2]["repetition_pass"] is False
    # doc 3: no 5-grams -> dup 0.0, but top frac 2/3 > 0.2 still gates it
    assert out[3]["dup_5gram_frac"] == 0.0 and out[3]["repetition_pass"] is False


def test_shingles_short_docs_dont_crash(spark):
    """Regression: docs shorter than k tokens must yield zero shingles, not
    a slice(start=0) crash (Spark's sequence(1, 0) descends)."""
    from linkkchecker_net_spark.pipeline.dedup import shingles

    docs = spark.createDataFrame(
        [(0, "one"), (1, "one two"), (2, "one two three"), (3, "")],
        "doc_id long, text string",
    )
    out = shingles(docs, k=3).collect()
    assert {r["doc_id"] for r in out} == {2}
    assert out[0]["shingle"] == "one two three"


def test_pii_stats_counts(spark):
    rows = [
        (0, "reach me at john.doe@mail.example.org or jane@x.co today"),
        (1, "call 415-555-0142 or 646-555-0199 anytime"),
        (2, "no sensitive content in this row"),
        (3, "mixed bob@corp.io and 212-555-0000 here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (out[0]["n_emails"], out[0]["n_phones"]) == (2, 0)
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (0, 2)
    assert (out[2]["n_emails"], out[2]["n_phones"]) == (0, 0)
    assert out[2]["has_pii"] is False
    assert (out[3]["n_emails"], out[3]["n_phones"]) == (1, 1)
    assert out[3]["has_pii"] is True


def test_pack_sequences_partitions_and_boundaries(spark):
    # single shard (n_shards=1) makes the packing arithmetic transparent:
    # 10 docs x 100 tokens, seq_len 256 -> doc i starts at token 100*i,
    # chunk_id = floor(100*i/256)
    rows = [(i, " ".join(f"t{j}" for j in range(100))) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    man = pack_sequences(docs, seq_len=256, n_shards=1).collect()
    assert all(r["shard_id"] == 0 for r in man)
    assert sum(r["n_docs"] for r in man) == 10  # every doc exactly once
    assert sum(r["n_tokens"] for r in man) == 1000
    got = {r["chunk_id"]: r["n_docs"] for r in man}
    want = {}
    for i in range(10):
        want[100 * i // 256] = want.get(100 * i // 256, 0) + 1
    assert got == want
    # multi-shard: still a partition of the docs
    man16 = pack_sequences(docs, seq_len=256, n_shards=4).collect()
    assert sum(r["n_docs"] for r in man16) == 10
    assert sum(r["n_tokens"] for r in man16) == 1000


def test_winnow_fingerprints_guarantee_and_density(spark):
    """Winnowing contract: two docs sharing a run of >= k+window-1 tokens
    share at least one fingerprint; fingerprints per doc <= gram count;
    short docs (< window grams) still fingerprint; <k-token docs don't."""
    from linkkchecker_net_spark.pipeline.text import winnow_fingerprints

    shared = "the quick brown fox jumps over"  # 6 tokens = k+window-1
    rows = [
        (0, f"alpha beta {shared} gamma delta"),
        (1, f"omega {shared} psi chi phi"),
        (2, "completely different words everywhere in this document"),
        (3, "tiny doc here four"),  # 2 grams < window -> min(all)
        (4, "up two"),  # < k tokens -> no grams -> no fingerprints
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(docs, k=3, window=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]  # the shared 6-token run guarantees overlap
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])
    assert len(fps[3]) == 1
    assert 4 not in fps
    # density: doc 2 has 6 grams, 3 full windows -> at most 3 fingerprints
    assert 1 <= len(fps[2]) <= 3


def test_kmeans_separates_blobs_and_is_deterministic(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    blob_a = rng.normal(0.0, 0.05, size=(20, 4)) + np.array([1, 0, 0, 0])
    blob_b = rng.normal(0.0, 0.05, size=(20, 4)) + np.array([0, 0, 0, 1])
    rows = [
        (i, [float(x) for x in v])
        for i, v in enumerate(list(blob_a) + list(blob_b))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out1 = {r["vec_id"]: r["cluster"] for r in kmeans(emb, k=2, iters=3).collect()}
    out2 = {r["vec_id"]: r["cluster"] for r in kmeans(emb, k=2, iters=3).collect()}
    assert out1 == out2  # deterministic
    a_clusters = {out1[i] for i in range(20)}
    b_clusters = {out1[i] for i in range(20, 40)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters  # blobs perfectly separated


def test_gopher_quality_rules_exact(spark):
    from linkkchecker_net_spark.pipeline.text import gopher_quality

    fifty = " ".join(["the of and that word%d" % i for i in range(10)])
    rows = [
        # 50 words, mean len in range, 4 stop words -> all rules pass
        (0, fifty),
        # word-count fail (4 words) but stop words present
        (1, "the of and that"),
        # symbol fail: 50 words + 6 hashes (6*10 > 50)
        (2, fifty + " # # # # # #"),
        # bullet fail: 1 text line + 10 bullet lines = 10/11 >= 90%
        (3, fifty + "".join("\n- b%d" % i for i in range(10))),
        # ellipsis fail: 2 of 3 lines end with ...
        (4, fifty + "\nwait...\nmore..."),
        # mean-length fail: 50 long words (>10 chars each)
        (5, " ".join(["the of and that"] + ["verylongword%04d" % i
                                            for i in range(46)])),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert out[0]["gopher_pass"] is True
    assert out[0]["n_words"] == 50 and out[0]["stop_hits"] == 4
    assert out[1]["words_pass"] is False and out[1]["stop_pass"] is True
    assert out[2]["symbol_pass"] is False and out[2]["symbol_cnt"] == 6
    assert out[3]["bullet_pass"] is False and out[3]["bullet_lines"] == 10
    assert out[4]["ellipsis_pass"] is False and out[4]["ellipsis_lines"] == 2
    assert out[5]["mean_len_pass"] is False


def test_lexical_diversity_exact(spark):
    from linkkchecker_net_spark.pipeline.text import lexical_diversity

    rows = [
        (0, "a a b"),            # 3 tokens, 2 types, 1 hapax (b)
        (1, "X x y"),            # lowercased: 3 tokens, 2 types, 1 hapax
        (2, "u v w"),            # all hapax
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lexical_diversity(docs).collect()}
    assert (out[0]["n_tokens"], out[0]["n_types"], out[0]["n_hapax"]) == (3, 2, 1)
    assert out[0]["ttr_ppm"] == 666666 and out[0]["hapax_ppm"] == 333333
    assert (out[1]["n_types"], out[1]["n_hapax"]) == (2, 1)
    assert out[2]["ttr_ppm"] == 1000000


def test_char_composition_exact(spark):
    from linkkchecker_net_spark.pipeline.text import char_composition

    rows = [
        (0, "ab 12"),              # 5 chars: 2 letters, 2 digits, 1 space
        (1, "x" + "7" * 10),       # digit run fires
        (2, "letters only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in char_composition(docs, digit_ppm_max=300_000).collect()}
    assert out[0]["letter_ppm"] == 400000 and out[0]["digit_ppm"] == 400000
    assert out[0]["numeric_heavy"] is True
    assert out[1]["digit_run"] is True
    assert out[2]["digit_run"] is False and out[2]["n_digits"] == 0


def test_length_outliers_exact(spark):
    from linkkchecker_net_spark.pipeline.curation import length_outliers

    # lang 'en': lengths 10,10,10,10,1000 -> med 10 (rank ceil(5/2)=3),
    # devs 0,0,0,0,990 -> mad 0 -> clamped to 1 -> z(1000) = 990e6
    rows = [(i, "en", 10) for i in range(4)] + [(4, "en", 1000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = {r["doc_id"]: r for r in length_outliers(docs).collect()}
    assert out[0]["med_chars"] == 10 and out[0]["mad_chars"] == 0
    assert out[0]["robust_z_ppm"] == 0 and out[0]["outlier"] is False
    assert out[4]["robust_z_ppm"] == 990_000_000 and out[4]["outlier"] is True


def test_cluster_size_stats_exact(spark):
    from linkkchecker_net_spark.pipeline.dedup import cluster_size_stats

    # clusters: {0,1,2} -> size 3; {5,6} -> size 2; {9} -> size 1
    rows = [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5), (9, 9)]
    cl = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = {r["cluster_size"]: r for r in cluster_size_stats(cl).collect()}
    assert out[3]["n_clusters"] == 1 and out[3]["n_dropped"] == 2
    assert out[2]["n_docs"] == 2 and out[2]["n_dropped"] == 1
    assert out[1]["n_clusters"] == 1 and out[1]["n_dropped"] == 0


def test_ppl_buckets_tertiles(spark):
    from linkkchecker_net_spark.pipeline.ranking import ppl_buckets

    # 6 docs, one lang: 2 docs per tertile by construction — rare tokens
    # raise ppl.  Exact values don't matter; the bucket ORDER does: the
    # two lowest-ppl docs are head, next two middle, last two tail.
    rows = [
        (0, "a a a a", "en"), (1, "a a a a", "en"),
        (2, "a a b b", "en"), (3, "a a b b", "en"),
        (4, "c d e f", "en"), (5, "g h i j", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in ppl_buckets(docs).collect()}
    assert out[0]["bucket"] == "head" and out[1]["bucket"] == "head"
    assert out[2]["bucket"] == "middle" and out[3]["bucket"] == "middle"
    assert out[4]["bucket"] == "tail" and out[5]["bucket"] == "tail"


def test_shingle_novelty_bounds(spark):
    from linkkchecker_net_spark.pipeline.dedup import shingle_novelty

    ref = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (0, "a b c d e"),       # fully known -> novelty 0
            (1, "x y z w v"),       # fully novel -> novelty 1e6
            (2, "a b c x y z"),     # 4 shingles: abc bcx cxy xyz -> 1 known
            (3, "a b"),             # too short: no shingles
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in shingle_novelty(corpus, ref).collect()}
    assert out[0]["novelty_ppm"] == 0
    assert out[1]["novelty_ppm"] == 1_000_000
    assert out[2]["n_shingles"] == 4 and out[2]["n_known"] == 1
    assert out[2]["novelty_ppm"] == 750_000
    assert out[3]["n_shingles"] == 0 and out[3]["novelty_ppm"] is None


def test_lang_script_check_verdicts(spark):
    from linkkchecker_net_spark.pipeline.text import lang_script_check

    rows = [
        (0, "hello world", "en"),
        (1, "hello world", "ru"),       # latin text, ru declared
        (2, "привет мир", "ru"),
        (3, "hello", "tlh"),            # unmapped lang
        (4, "1234 5678", "en"),         # no script
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["verdict"] for r in lang_script_check(docs).collect()}
    assert out == {0: "consistent", 1: "inconsistent", 2: "consistent",
                   3: "unknown_lang", 4: "no_script"}


def test_hashed_linear_classify_hand_values(spark):
    """r4 verdict item 6: the fastText-style serving path — hand-check
    scores on a 1-token doc (unigram only, no bigram), a 2-token doc
    (2 unigrams + 1 bigram), and the deterministic tie-break (margin 0
    ⇒ pred = first class)."""
    import hashlib

    from linkkchecker_net_spark.pipeline.model import (
        hash_bucket,
        hashed_linear_classify,
        synth_linear_weights,
    )

    B = 64

    def bkt(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    def w(ci, b):
        return (b * (2 * ci + 3) + ci) % 17 - 8

    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "alpha beta")],
        "doc_id long, text string",
    )
    weights = synth_linear_weights(spark, B, ("keep", "drop"))
    out = {
        r["doc_id"]: r
        for r in hashed_linear_classify(
            docs, weights, n_buckets=B, classes=("keep", "drop")
        ).collect()
    }
    b_a = bkt("alpha")
    assert out[0]["n_feats"] == 1
    assert out[0]["score_keep"] == w(0, b_a)
    assert out[0]["score_drop"] == w(1, b_a)
    gs = [bkt("alpha"), bkt("beta"), bkt("alpha beta")]
    assert out[1]["n_feats"] == 3
    assert out[1]["score_keep"] == sum(w(0, b) for b in gs)
    assert out[1]["score_drop"] == sum(w(1, b) for b in gs)
    for r in out.values():
        best = max(r["score_keep"], r["score_drop"])
        want_pred = "keep" if r["score_keep"] == best else "drop"
        assert r["pred"] == want_pred and r["keep"] == (want_pred == "keep")
        assert r["margin"] == abs(r["score_keep"] - r["score_drop"])


def test_caption_quality_reason_ladder(spark):
    from linkkchecker_net_spark.kernels.captions import caption_quality

    rows = [
        ("hi",),
        ("y" * 201,),
        ("IMG_1234.jpg",),
        ("Photo 7",),
        ("buy now at www.shop.test",),
        ("see https://ex.test/page for info",),
        ("code 1234567890",),
        ("paisaje bonito lugar",),
        ("a scenic view of the mountains",),
    ]
    corpus = spark.createDataFrame(rows, "caption string")
    out = {r["caption"]: r for r in caption_quality(corpus).collect()}
    assert out["hi"]["reason"] == "too_short"
    assert out["y" * 201]["reason"] == "too_long"
    assert out["IMG_1234.jpg"]["reason"] == "placeholder"
    assert out["Photo 7"]["reason"] == "placeholder"
    assert out["buy now at www.shop.test"]["reason"] == "url"
    assert out["see https://ex.test/page for info"]["reason"] == "url"
    r = out["code 1234567890"]
    assert r["reason"] == "digits" and r["digit_ppm"] == 666_666
    assert out["paisaje bonito lugar"]["reason"] == "no_stopword"
    good = out["a scenic view of the mountains"]
    assert good["reason"] == "ok" and good["keep"] and good["n_words"] == 6
    assert sum(1 for r in out.values() if r["keep"]) == 1


def test_caption_quality_placeholder_needs_whole_match(spark):
    """A real sentence mentioning 'photo' must NOT gate as placeholder;
    the grammar anchors on the whole caption."""
    from linkkchecker_net_spark.kernels.captions import caption_quality

    corpus = spark.createDataFrame(
        [("a photo of the old harbor at dawn",)], "caption string"
    )
    r = caption_quality(corpus).collect()[0]
    assert r["placeholder"] is False and r["reason"] == "ok"


def test_domain_dup_rate_pools_subdomains(spark):
    """www./cdn. hosts pool into one eTLD+1 row; the farm verdict fires
    only where duplicate share crosses the bar."""
    from linkkchecker_net_spark.pipeline.dedup import domain_dup_rate

    rows = [
        ("http://www.farm.test/a", "same"),
        ("http://farm.test/b", "same"),
        ("http://cdn.farm.test/c", "same"),
        ("http://farm.test/d", "other"),
        ("http://uniq.test/a", "x1"),
        ("http://www.uniq.test/b", "x2"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    out = {r["domain"]: r for r in domain_dup_rate(pages).collect()}
    assert set(out) == {"farm.test", "uniq.test"}
    farm = out["farm.test"]
    assert farm["n_docs"] == 4 and farm["n_unique"] == 2
    assert farm["dup_ppm"] == 500_000 and farm["farm"] is True
    uniq = out["uniq.test"]
    assert uniq["n_docs"] == 2 and uniq["dup_ppm"] == 0 and not uniq["farm"]


def test_zipf_spectrum_hand_buckets(spark):
    """a×4 → bucket 2 (hi 4), b×2 → bucket 1 (hi 2), c×1 → hapax
    bucket 0; shares recomputed by hand over 3 tokens / 7 occurrences."""
    from linkkchecker_net_spark.pipeline.text import zipf_spectrum

    docs = spark.createDataFrame(
        [(0, "a a a a b"), (1, "b c"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["bucket"]: r for r in zipf_spectrum(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["freq_hi"] == 1 and out[0]["n_tokens"] == 1
    assert out[1]["freq_hi"] == 2 and out[1]["n_occ"] == 2
    assert out[2]["freq_hi"] == 4 and out[2]["n_occ"] == 4
    assert out[0]["token_share_ppm"] == 333_333
    assert out[2]["occ_share_ppm"] == 571_428  # floor(4e6/7)


def test_char_coverage_rank_and_cover(spark):
    """'aaab bc' stream: a×3, space×1... hand corpus 'aaabbc':
    a=3,b=2,c=1 → ranks 1..3, cum 3/5/6; at cover_ppm=800000 the
    prefix before c already holds 833333 ppm so c is NOT covered."""
    from linkkchecker_net_spark.pipeline.text import char_coverage

    docs = spark.createDataFrame(
        [(0, "aaab"), (1, "bc")], "doc_id long, text string"
    )
    out = {r["ch"]: r for r in char_coverage(docs, cover_ppm=800_000).collect()}
    assert out["a"]["rank"] == 1 and out["a"]["cnt"] == 3
    assert out["b"]["rank"] == 2 and out["c"]["rank"] == 3
    assert out["a"]["share_ppm"] == 500_000
    assert out["b"]["cum_ppm"] == 833_333 and out["c"]["cum_ppm"] == 1_000_000
    assert out["a"]["covered"] and out["b"]["covered"]
    # prefix before c = 5/6 = 833333 ppm >= 800000 -> c not needed
    assert out["c"]["covered"] is False


def test_readability_hand_grades(spark):
    """'The cat sat. It ran.' — 5 words, 2 sentences, 5 one-syllable
    words: FK = 0.39*2.5 + 11.8*1 - 15.59 = -2.815 → easy; the empty
    doc gets NULL metrics and verdict 'empty'."""
    from linkkchecker_net_spark.pipeline.text import readability

    docs = spark.createDataFrame(
        [
            (0, "The cat sat. It ran."),
            (1, ""),
            (2, "Incomprehensibility necessitates extraordinarily "
                "multisyllabic verbalization constructions"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability(docs).collect()}
    r0 = out[0]
    assert r0["n_words"] == 5 and r0["n_sentences"] == 2
    assert r0["n_syllables"] == 5
    assert r0["fk_grade"] == round(0.39 * (5 / 2) + 11.8 * 1 - 15.59, 6)
    assert r0["verdict"] == "easy"
    assert out[1]["n_words"] is None and out[1]["verdict"] == "empty"
    assert out[2]["verdict"] == "difficult"


def test_bitext_candidates_grouping(spark):
    """/en and /fr variants of one path group as a bitext pair; a bare
    /en root normalizes to path_key '/'; /tv is not a language code;
    query strings don't leak into the path key."""
    from linkkchecker_net_spark.pipeline.bitext import bitext_candidates

    urls = spark.createDataFrame(
        [
            ("http://a.test/en/about",),
            ("http://a.test/fr/about",),
            ("http://a.test/en/about?utm=1",),
            ("http://a.test/tv/about",),     # not a lang code
            ("http://b.test/en",),           # bare lang root
            ("http://b.test/de/",),
        ],
        "url string",
    )
    out = {(r["host"], r["path_key"]): r
           for r in bitext_candidates(urls).collect()}
    pair = out[("a.test", "/about")]
    assert pair["n_variants"] == 3 and pair["n_langs"] == 2
    assert pair["langs"] == "en,fr" and pair["is_bitext"]
    root = out[("b.test", "/")]
    assert root["langs"] == "de,en" and root["is_bitext"]
    assert ("a.test", "/tv/about") not in out  # untagged rows excluded


def test_url_lang_mismatch_arms(spark):
    from linkkchecker_net_spark.pipeline.bitext import url_lang_mismatch

    pages = spark.createDataFrame(
        [
            ("http://a.test/en/x", "der die und ist das"),   # en URL, de text
            ("http://a.test/de/x", "der die und ist das"),   # consistent
            ("http://a.test/en/y", "qqq zzz"),               # und -> no flag
            ("http://a.test/plain", "the a of and is"),      # no URL lang
            ("http://a.test/ru/z", "the a of and is"),       # ru URL, en text
        ],
        "url string, text string",
    )
    out = {r["url"]: r for r in url_lang_mismatch(pages).collect()}
    r = out["http://a.test/en/x"]
    assert r["url_lang"] == "en" and r["pred_lang"] == "de" and r["mismatch"]
    assert out["http://a.test/de/x"]["mismatch"] is False
    assert out["http://a.test/en/y"]["pred_lang"] == "und"
    assert out["http://a.test/en/y"]["mismatch"] is False
    assert out["http://a.test/plain"]["url_lang"] is None
    assert out["http://a.test/plain"]["mismatch"] is False
    assert out["http://a.test/ru/z"]["mismatch"] is True


def test_mojibake_fix_digraphs(spark):
    """cp1252 double-encoding repairs: Latin digraphs, the apostrophe
    trigraph, the WHATWG 0x9D fallback quote, and the nbsp mangle; a
    clean doc stays untouched with n_fixed 0."""
    from linkkchecker_net_spark.pipeline.text import mojibake_fix

    rows = [
        (0, "Caf\u00c3\u00a9 cr\u00c3\u00a8me"),
        (1, "it\u00e2\u20ac\u2122s \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d"),
        (2, "plain text"),
        (3, "a\u00c2\u00a0b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in mojibake_fix(docs).collect()}
    assert out[0]["fixed_text"] == "Caf\u00e9 cr\u00e8me"
    assert out[0]["n_fixed"] == 2 and out[0]["had_mojibake"]
    assert out[1]["fixed_text"] == "it\u2019s \u201cquoted\u201d"
    assert out[1]["n_fixed"] == 3
    assert out[2]["n_fixed"] == 0 and not out[2]["had_mojibake"]
    assert out[3]["fixed_text"] == "a\u00a0b" and out[3]["n_fixed"] == 1


def test_lsh_advisor_picks_scurve_midpoint(spark):
    """12-hash signature at threshold 0.5: r=2/b=6 has midpoint
    (1/6)^(1/2)=0.408 — the closest of all splits; catch probabilities
    replay 1-(1-t^r)^b exactly."""
    from linkkchecker_net_spark.pipeline.dedup import lsh_advisor

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    r = lsh_advisor(docs, num_hashes=12, threshold=0.5).collect()[0]
    assert r["n_docs"] == 2
    assert (r["bands"], r["rows_per_band"]) == (6, 2)
    assert r["t_star"] == round((1 / 6) ** 0.5, 6)
    assert r["p_at_threshold"] == round(1 - (1 - 0.5**2) ** 6, 6)
    assert r["p_above"] > r["p_at_threshold"] > r["p_below"]


def test_minhash_recall_report_catches_identical_pair(spark):
    """Two identical docs share every band bucket (recall 1); the
    disjoint third doc never becomes a candidate, so precision is 1 and
    the candidate count is exactly the true pair."""
    from linkkchecker_net_spark.pipeline.dedup import minhash_recall_report

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    r = minhash_recall_report(
        docs, threshold=0.8, num_hashes=8, bands=4
    ).collect()[0]
    assert r["n_docs"] == 3
    assert r["n_true_pairs"] == 1
    assert r["n_caught"] == 1
    assert r["n_candidate_pairs"] == 1
    assert r["recall"] == 1.0 and r["precision"] == 1.0
    assert (r["bands"], r["rows_per_band"]) == (4, 2)


def test_incremental_dedup_verdict_arms(spark):
    """Corpus hit beats batch keep-first; within-batch copies keep the
    smallest doc_id; unseen digests are new."""
    from pyspark.sql import functions as F

    from linkkchecker_net_spark.pipeline.dedup import incremental_dedup

    new = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "bb"), (4, "cc")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame([("aa",)], "t string").select(
        F.md5("t").alias("digest")
    )
    out = {
        r["doc_id"]: r["verdict"]
        for r in incremental_dedup(new, corpus).collect()
    }
    assert out == {1: "dup_corpus", 2: "new", 3: "dup_batch", 4: "new"}
