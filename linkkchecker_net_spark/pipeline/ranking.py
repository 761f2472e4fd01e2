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
