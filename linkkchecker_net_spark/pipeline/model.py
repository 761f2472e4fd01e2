"""Model-based document scoring — a fastText-style hashed linear
classifier (Joulin et al. 2016) as a PURE-Spark dot product, r4 verdict
item 6: the stopword `lang_id` and ratio-based `quality_score`
(pipeline/text.py) are honest heuristics; production corpus builders
(CCNet, RefinedWeb §3.2, Llama/GPT data papers) gate on a trained linear
model over hashed n-gram features.  This is that serving path with the
weights as DATA — swapping in real fastText weights is a table load, not
a code change.

Serving shape (the part that must scale, and the part this implements):

    tokens ∪ word-bigrams → hash to B buckets (md5-based, the repo's
    dsir_weights idiom) → per-(doc, bucket) counts (partial-agg) →
    BROADCAST-join the (bucket, class, weight) table → per-(doc, class)
    weighted sums → argmax class.

Weights are INTEGER-quantized (fastText ships quantized models; integer
sums are exactly replayable on the DuckDB oracle — no float-order
hazards).  No UDF anywhere: hashing, n-grams, and the dot product are
all codegen expressions + one broadcast hash join.

Scale: the only shuffles are the two skinny partial aggregations keyed
by (doc_id, bucket) then (doc_id, class); the weight table is ≤ B×|C|
rows (a 2M-bucket 2-class model is ~30 MB — broadcastable; bigger
models degrade to a shuffled join on bucket, still skew-free since
bucket counts are capped by the hash).  Hot tokens collapse map-side
before the join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket(col, n_buckets: int):
    """The repo's deterministic string→bucket hash (same idiom as
    dsir_weights / split_divergence): first 8 md5 hex digits as a
    BIGINT, mod n_buckets.  Oracle twin:
    ``(('0x' || substr(md5(x), 1, 8))::BIGINT) % n``."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
    )


def synth_linear_weights(
    spark, n_buckets: int, classes: Sequence[str] = ("keep", "drop")
) -> DataFrame:
    """Deterministic integer weight table for tests/benchmarks: class c
    (0-indexed) gets w(b) = ((b·(2c+3) + c) % 17) − 8 ∈ [−8, 8].  A
    trained model replaces this frame; the serving plan is identical."""
    base = spark.range(int(n_buckets)).select(
        F.col("id").cast("long").alias("bucket")
    )
    out = None
    for ci, cls in enumerate(classes):
        w = (
            F.pmod(
                F.col("bucket") * F.lit(2 * ci + 3) + F.lit(ci), F.lit(17)
            )
            - F.lit(8)
        ).cast("long")
        part = base.select(
            "bucket", F.lit(cls).alias("cls"), w.alias("w")
        )
        out = part if out is None else out.unionByName(part)
    return out


def hashed_linear_classify(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 4096,
    classes: Sequence[str] = ("keep", "drop"),
    use_bigrams: bool = True,
) -> DataFrame:
    """docs: (doc_id, text); weights: (bucket, cls, w — integer) →
    (doc_id, n_feats, <score_{cls} per class>, pred, margin, keep).

    ``pred`` = argmax class by score, ties broken by class-list ORDER
    (earlier wins — deterministic on both engines); ``margin`` = best
    minus second-best score; ``keep`` = pred == classes[0] (the first
    class is the positive/keep label by convention).
    """
    from ._parallel import spread_scan

    # one md5 per token+bigram (interpreted in the explode) — spread a
    # narrow scan so feature hashing is not single-task (guide §2.5;
    # no-op at production scan widths)
    docs = spread_scan(docs)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n = F.size(toks)
    grams = toks
    if use_bigrams:
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        grams = F.concat(toks, bigrams)
    feats = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .select(
            "doc_id", hash_bucket(F.col("g"), n_buckets).alias("bucket")
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "cls")
        .agg(
            F.sum(F.col("c") * F.col("w")).alias("s"),
            F.sum("c").alias("nf"),
        )
    )
    # few classes: pivot to one row per doc (fixed column set)
    agg = scored.groupBy("doc_id").agg(
        F.max("nf").alias("n_feats"),
        *[
            F.coalesce(
                F.max(F.when(F.col("cls") == c, F.col("s"))), F.lit(0)
            ).alias(f"score_{c}")
            for c in classes
        ],
    )
    score_cols = [F.col(f"score_{c}") for c in classes]
    pred = F.lit(classes[-1])
    best = F.greatest(*score_cols) if len(classes) > 1 else score_cols[0]
    for c in reversed(classes[:-1]):
        pred = F.when(F.col(f"score_{c}") == best, F.lit(c)).otherwise(
            pred
        )
    if len(classes) > 1:
        # margin = best − second-best, tie-safe (sorted desc, diff of
        # the top two — NOT max-of-others-excluding-value, which is
        # wrong when two classes tie for best)
        srt = F.sort_array(F.array(*score_cols), asc=False)
        margin = F.element_at(srt, 1) - F.element_at(srt, 2)
    else:
        margin = F.lit(0).cast("long")
    return agg.select(
        "doc_id",
        "n_feats",
        *[f"score_{c}" for c in classes],
        pred.alias("pred"),
        margin.cast("long").alias("margin"),
        (pred == F.lit(classes[0])).alias("keep"),
    )
