"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — the exact baseline: query set × corpus
    cross join with JVM-side zip_with/aggregate dot products, window
    top-k.  Right answer at any SF where |queries|·N is tractable.
  * random-hyperplane LSH buckets — the scale path: each vector hashes to
    a b-bit signature (sign of dot with b seeded random hyperplanes);
    candidates share a bucket in ≥1 of `tables` independent hash tables,
    so the join is bucket-keyed, never all-pairs.  Exactness is traded for
    the candidate-set size; the verify step re-scores candidates exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(c):
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_bruteforce(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id long, q_embedding array<float>).  Ties and float
    noise are settled deterministically by (round(cos,9) desc, vec_id).
    """
    q = queries.select(
        "query_id", F.col("q_embedding").alias("qe"), _norm(F.col("q_embedding")).alias("qn")
    )
    c = emb.select("vec_id", F.col("embedding").alias("ce"), _norm(F.col("embedding")).alias("cn"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")))
        .withColumn("cos_r", F.round("cosine", 9))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, bits: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed * 1000 + table)
    return rng.standard_normal((bits, dim))


def lsh_bucket_ann(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 12,
    tables: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via random-hyperplane LSH over `tables` hash tables.

    Bucket signatures are computed in a vectorized pandas UDF (one matrix
    multiply per Arrow batch); the candidate join is bucket-keyed; the
    final re-score is exact.  Recall < 1 by construction — this is the
    10^10-row path where brute force is impossible.
    """
    planes = [_hyperplanes(dim, bits, t, seed) for t in range(tables)]

    def make_sig_udf(col_name: str):
        @F.pandas_udf("array<long>")
        def sig(v: pd.Series) -> pd.Series:
            mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
            out = []
            sigs_per_table = []
            for t in range(tables):
                proj = mat @ planes[t].T > 0  # (batch, bits)
                vals = (proj.astype(np.uint64) << np.arange(bits, dtype=np.uint64)).sum(
                    axis=1
                )
                sigs_per_table.append(vals.astype(np.int64) + (t << 32))
            stacked = np.stack(sigs_per_table, axis=1)
            out = [row.tolist() for row in stacked]
            return pd.Series(out)

        return sig(F.col(col_name))

    c_sig = emb.select("vec_id", "embedding", make_sig_udf("embedding").alias("sigs"))
    q_sig = queries.select(
        "query_id", "q_embedding", make_sig_udf("q_embedding").alias("sigs")
    )
    c_buckets = c_sig.select(
        "vec_id", "embedding", F.explode("sigs").alias("bucket")
    )
    q_buckets = q_sig.select(
        "query_id", "q_embedding", F.explode("sigs").alias("bucket")
    )
    cand = (
        q_buckets.join(c_buckets, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_embedding", "vec_id", "embedding")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn(
        "cosine",
        _dot(F.col("q_embedding"), F.col("embedding"))
        / (_norm(F.col("q_embedding")) * _norm(F.col("embedding"))),
    ).withColumn("cos_r", F.round("cosine", 9))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
