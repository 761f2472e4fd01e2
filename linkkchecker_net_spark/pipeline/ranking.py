"""Lexical relevance scoring over the documents table: TF-IDF and BM25.

The retrieval/curation primitives a training-data pipeline runs right
after dedup — "which documents match this probe query" (BM25, the
data-ablation / contamination-probe scorer) and "what are each document's
most characteristic terms" (per-doc TF-IDF top-k, the topic-tagging /
cluster-labeling primitive).  Reference analog: none — the C# engine has
no analytics tier; part of the from-scratch 100 TB-pipeline surface.

Tokenization matches the rest of the pipeline (curation.vocab_topk,
text.token_count): whitespace split, empty tokens dropped.

Determinism contract (hash-checkable vs an independent engine): scores
are double-precision sums of a handful of per-term products, rounded to
`round_dp` on output; orderings tie-break on (round(score, 9), token).

Scale:
  * the token stream never reaches a shuffle un-aggregated: tf is a
    (doc_id, token)-keyed groupBy that partial-aggregates map-side, and
    for BM25 the stream is pre-filtered to the |query| probe terms INSIDE
    the scan projection (a ~10^2-term IN filter in codegen);
  * df / idf live on the VOCAB (≤ millions of rows at 100 TB, vs 10^13
    tokens) — the BM25 per-term table is |query|-rows and broadcasts;
    the TF-IDF df table joins on token, hot terms already collapsed by
    partial aggregation;
  * corpus scalars (N, avgdl) are a 1-row aggregate cross-joined in —
    a broadcast of one row, not a collect-and-reliteralize (keeps the
    whole plan lazily composable);
  * per-doc top-k is a doc_id-partitioned window — 10^10 tiny partitions,
    no global sort, no single-partition stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, token) stream — whitespace split, empties dropped."""
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")


def bm25(
    docs: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed probe-term set.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (the standard "plus one"
    form — never negative, matches Lucene's BM25Similarity);
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).

    Output is anchored on the FULL doc set (docs matching no term score
    0.0) so a downstream join can never silently drop rows — the
    repetition_stats lesson (r3 advice).  Columns: (doc_id, bm25).
    """
    toks = _tokens(docs)
    # dl = non-empty whitespace token count (same definition the tf stream
    # uses, so tf ≤ dl always holds)
    dls = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).cast("double").alias("dl"),
    )
    stats = dls.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )  # 1 row — broadcast side of the cross joins below
    tf = (
        toks.filter(F.col("token").isin(list(terms)))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_t = tf.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )  # ≤ |terms| rows
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    per_term = (
        tf.join(F.broadcast(idf), "token")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    scores = per_term.groupBy("doc_id").agg(F.sum("s").alias("score"))
    return (
        docs.select("doc_id")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce(F.col("score"), F.lit(0.0)), round_dp).alias(
                "bm25"
            ),
        )
    )


def unigram_ppl(
    docs: DataFrame, threshold: float = 31.5, round_dp: int = 6
) -> DataFrame:
    """CCNet-style LM-perplexity quality scoring (Wenzek et al. 2020),
    with the LM = the corpus's own unigram distribution — the
    deterministic, engine-independent stand-in for the 5-gram KenLM the
    paper trains on Wikipedia (the swap point: replace the `lm` table
    with precomputed external-LM logprobs broadcast/joined the same way).

    ppl(d) = exp(-mean_t ln(cnt(t)/total)); `keep` = ppl ≤ threshold
    (high perplexity under the in-domain LM ≈ far from the corpus
    distribution ≈ noise/boilerplate in CCNet's tail bucket).

    Output anchored on the FULL doc set: token-less docs carry ppl NULL /
    keep false.  Scale: the LM is the partial-aggregated vocab (never the
    token stream); per-doc scoring is one token-keyed join (hot tokens
    already collapsed map-side) + one doc-keyed aggregation.  At 100 TB
    the LM table joins on token exactly like tfidf's df side.
    """
    toks = _tokens(docs)
    lm = toks.groupBy("token").agg(F.count("*").cast("double").alias("cnt"))
    total = lm.agg(F.sum("cnt").alias("total"))  # 1 row — broadcast
    logp = lm.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("cnt") / F.col("total")).alias("logp")
    )
    ppl = (
        toks.join(logp, "token")
        .groupBy("doc_id")
        .agg(F.exp(-F.avg("logp")).alias("p"))
    )
    return (
        docs.select("doc_id")
        .join(ppl, "doc_id", "left")
        .select(
            "doc_id",
            F.round("p", round_dp).alias("ppl"),
            F.coalesce(
                F.round(F.col("p"), 9) <= threshold, F.lit(False)
            ).alias("keep"),
        )
    )


def tfidf_topk(docs: DataFrame, k: int = 3, round_dp: int = 6) -> DataFrame:
    """Per-document top-k terms by TF-IDF (tf · ln(N/df), df ≥ 1 always so
    the log is finite; ties broken by token asc on the 9-dp-rounded score).

    Columns: (doc_id, token, tfidf, rank).  The window partitions by
    doc_id — no global sort; the df side is the partial-aggregated vocab.
    """
    toks = _tokens(docs)
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf")
    )
    df_t = toks.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df_t, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "token",
            F.round("score", round_dp).alias("tfidf"),
            "rank",
        )
    )


def bigram_ppl(
    docs: DataFrame,
    alpha: float = 1.0,
    threshold: float = 200.0,
    round_dp: int = 6,
) -> DataFrame:
    """Bigram-LM perplexity gate — the n-gram upgrade of `unigram_ppl`
    toward CCNet's 5-gram KenLM (Wenzek et al. 2020), still trained on
    the corpus itself so the score is deterministic and
    engine-independent.

    P(w | v) = (cnt(v,w) + alpha) / (ctx(v) + alpha * V)   (add-alpha),
    where cnt(v,w) is the corpus bigram count, ctx(v) = sum_w cnt(v,w)
    (v's count as a left context) and V = |unigram vocab|;
    ppl(d) = exp(-mean over d's bigram positions of ln P(w_i | w_{i-1})).
    Docs with < 2 tokens have no bigram — ppl NULL, keep false (output
    anchored on the FULL doc set, the repetition_stats lesson).

    Scale: the bigram stream partial-aggregates map-side to the BIGRAM
    VOCAB (the only shuffled key set — |V|^2-bounded but Zipf-collapsed
    in practice, same regime as tfidf's df side); the context table is a
    second partial aggregation OF THE VOCAB, not the stream; V is a 1-row
    aggregate broadcast in.  Per-doc scoring = one (w1,w2)-keyed join +
    one doc-keyed aggregation.  The in-doc pair builder is pure codegen
    (transform over an index sequence — gated on size >= 2, the
    descending-F.sequence bug this repo was bitten by twice).
    """
    arr = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    bigrams = (
        docs.select("doc_id", arr.alias("a"))
        .select(
            "doc_id",
            F.when(
                F.size("a") >= 2,
                F.expr(
                    "transform(sequence(0, size(a) - 2), "
                    "i -> struct(a[i] AS w1, a[i+1] AS w2))"
                ),
            )
            .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            .alias("bg"),
        )
        .select("doc_id", F.explode("bg").alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    cnt = bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("cnt")
    )
    ctx = cnt.groupBy("w1").agg(F.sum("cnt").alias("ctx"))
    vocab = (
        _tokens(docs)
        .agg(F.countDistinct("token").cast("double").alias("v"))
    )  # 1 row — broadcast
    logp = (
        cnt.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("cnt") + F.lit(alpha))
                / (F.col("ctx") + F.lit(alpha) * F.col("v"))
            ).alias("logp"),
        )
    )
    ppl = (
        bigrams.join(logp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.exp(-F.avg("logp")).alias("p"))
    )
    return (
        docs.select("doc_id")
        .join(ppl, "doc_id", "left")
        .select(
            "doc_id",
            F.round("p", round_dp).alias("ppl"),
            F.coalesce(
                F.round(F.col("p"), 9) <= threshold, F.lit(False)
            ).alias("keep"),
        )
    )


def ppl_buckets(docs: DataFrame, round_dp: int = 6) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §4.3): per language, split the corpus into perplexity tertiles under
    the LM — `head` (lowest-ppl third, closest to the in-domain
    distribution), `middle`, `tail` (the bucket CCNet drops or
    down-samples).  LM = the same corpus-unigram stand-in as
    :func:`unigram_ppl` (swap point: external KenLM logprobs).

    Cutoffs are the EXACT nearest-rank tertiles of the `round_dp`-rounded
    ppl (rank ceil(n/3) and ceil(2n/3) per lang, ties broken by doc_id,
    cutoff applied by VALUE so engine-side rank jitter between equal
    values cannot move a bucket).  Token-less docs carry ppl/bucket NULL.

    Output: (doc_id, lang, ppl, bucket).

    Scale: scoring is the unigram_ppl plan (vocab-sized LM join); the
    cutoff pass windows over lang — a handful of hot groups, so at
    10^10 docs swap the exact rank for approx_percentile per lang (the
    exact form IS the correctness baseline the approximation is judged
    against).
    """
    scored = (
        docs.select("doc_id", "lang")
        .join(unigram_ppl(docs, round_dp=round_dp).select("doc_id", "ppl"),
              "doc_id", "left")
    )
    nn = scored.filter(F.col("ppl").isNotNull())
    w = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    n = Window.partitionBy("lang")
    ranked = nn.select(
        "lang", "ppl",
        F.row_number().over(w).alias("_rk"),
        F.count("*").over(n).alias("_n"),
    )
    cuts = ranked.groupBy("lang").agg(
        F.max(
            F.when(F.col("_rk") == F.ceil(F.col("_n") / 3.0), F.col("ppl"))
        ).alias("_c1"),
        F.max(
            F.when(
                F.col("_rk") == F.ceil(2.0 * F.col("_n") / 3.0), F.col("ppl")
            )
        ).alias("_c2"),
    )
    return (
        scored.join(F.broadcast(cuts), "lang", "left")
        .select(
            "doc_id",
            "lang",
            "ppl",
            F.when(F.col("ppl").isNull(), F.lit(None).cast("string"))
            .when(F.col("ppl") <= F.col("_c1"), F.lit("head"))
            .when(F.col("ppl") <= F.col("_c2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    classic phrase-mining primitive (Church & Hanks 1990; the
    word2vec-phrases preprocessing step): PMI(v,w) =
    ln( (c_vw / N_b) / ((c_v / N_u) · (c_w / N_u)) ), with c_vw the
    corpus bigram count, c_v/c_w unigram counts, N_b/N_u the stream
    totals.  min_count kills the hapax-pair PMI explosion (a
    once-seen pair of once-seen words maxes the score — textbook
    failure mode), exactly the published heuristic.

    Output top-k by (pmi desc, w1, w2): (w1, w2, c_bigram, c_w1,
    c_w2, pmi) with pmi rounded to round_dp (forced double, the
    pagerank determinism discipline).

    Scale: bigram + unigram streams partial-aggregate to their vocabs
    (hot pairs collapse map-side); scoring is two word-keyed
    vocab-vocab joins (skew-free — the hot word is ONE row on the
    build side) + 1-row broadcast totals; the top-k is
    orderBy().limit(k) = TakeOrderedAndProject (the vocab_topk
    lesson — never a global single-partition window).
    """
    arr = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    toks = docs.select(arr.alias("a"))
    uni = (
        toks.select(F.explode("a").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_uni"))
    )
    bigrams_all = (
        toks.select(
            F.when(
                F.size("a") >= 2,
                F.expr(
                    "transform(sequence(0, size(a) - 2), "
                    "i -> struct(a[i] AS w1, a[i+1] AS w2))"
                ),
            )
            .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            .alias("bg")
        )
        .select(F.explode("bg").alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bigram"))
    )
    # the stream total is taken BEFORE min_count prunes the reported
    # pairs — probabilities must not depend on the reporting threshold
    n_uni = uni.agg(F.sum("c_uni").cast("double").alias("_nu"))
    n_bi = bigrams_all.agg(F.sum("c_bigram").cast("double").alias("_nb"))
    bigrams = bigrams_all.filter(F.col("c_bigram") >= int(min_count))
    scored = (
        bigrams.join(
            uni.select(F.col("w").alias("w1"), F.col("c_uni").alias("c_w1")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c_uni").alias("c_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    pmi = F.round(
        F.log(
            (F.col("c_bigram").cast("double") / F.col("_nb"))
            / (
                (F.col("c_w1").cast("double") / F.col("_nu"))
                * (F.col("c_w2").cast("double") / F.col("_nu"))
            )
        ),
        round_dp,
    )
    return (
        scored.select(
            "w1",
            "w2",
            F.col("c_bigram").cast("long").alias("c_bigram"),
            F.col("c_w1").cast("long").alias("c_w1"),
            F.col("c_w2").cast("long").alias("c_w2"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(int(k))
    )


def oov_rate(
    docs: DataFrame, k: int = 1000, high_oov_ppm: int = 200_000
) -> DataFrame:
    """Out-of-vocabulary rate against the corpus' own top-k vocabulary
    — the KenLM-prep / tokenizer-fit gate: a doc whose tokens mostly
    miss the reference vocab is either another language, OCR noise, or
    id-soup, and LM-based filters (unigram_ppl upstream) mis-score it
    rather than flag it.  The vocab here is self-referential (top-k by
    count, token tie-break); swapping in an external reference vocab
    is a data change.

    Output per doc (full-doc anchor, the repetition_stats lesson):
    (doc_id, n_tokens, n_oov, oov_ppm, high_oov); empty docs keep NULL
    stats and high_oov=false.

    Scale: the vocab is a TakeOrderedAndProject top-k of the
    partial-agg'd token counts (never a global window) and broadcasts
    into the word stream; per-doc rollup is one doc-keyed partial agg.
    """
    words = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w"))
        .limit(int(k))
        .select("w", F.lit(True).alias("_in_vocab"))
    )
    tagged = words.join(F.broadcast(vocab), "w", "left")
    per_doc = tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(
            F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
        ).alias("n_oov"),
    )
    anchored = docs.select("doc_id").join(per_doc, "doc_id", "left")
    ppm = F.floor(F.col("n_oov") * 1_000_000 / F.col("n_tokens"))
    return anchored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_oov").cast("long").alias("n_oov"),
        ppm.cast("long").alias("oov_ppm"),
        F.coalesce(ppm > F.lit(int(high_oov_ppm)), F.lit(False)).alias(
            "high_oov"
        ),
    )
