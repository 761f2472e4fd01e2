"""Probabilistic sketches for 100 TB-scale profiling, with deterministic
engine-independent hashing so a SQL oracle can replay them bit-exactly.

Two classics, each in its mergeable two-level shape (the property that
matters at scale — partial sketches combine associatively, so Spark's
map-side partial aggregation does most of the work before any shuffle):

  * HyperLogLog distinct-count (Flajolet et al. 2007): per-key register
    table via groupBy(group, register).max(rho) — a MAP-SIDE-COMBINING
    aggregation whose output is <= m rows per group no matter how many
    input rows — then the harmonic-mean estimate per group.  The sum
    over registers is computed on exact integers (sum of 2^(33-rho),
    i.e. the float sum scaled by 2^33) so it is ADDITION-ORDER-FREE:
    float summation order varies across partitions/engines, integer
    summation cannot.  The standard small-range linear-counting
    correction is applied (E <= 2.5m and empty registers present).
  * Count-Min frequency sketch (Cormode & Muthukrishnan 2005): a d x w
    counter matrix via groupBy(row, bucket).count() — again partial
    aggregation collapses the token stream map-side; the matrix is d*w
    rows total (metadata-sized) regardless of input size, so probing it
    is a broadcast join.  Point estimates are min over the d rows and
    OVER-estimate by construction (the test suite pins est >= exact).

Hashing: the repo's engine-independent device (dsir_weights,
shard_assign) — leading hex digits of md5 parsed as integers, identical
in pyspark and DuckDB.  No reference analog (linkkchecker.net's C#
engine has no sketching); part of the SURVEY §2.10 pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_RHO_CAP = 33  # 32-bit hash slice => rho in [1, 33]


def _md5_slice(col, start: int, width: int = 8):
    """First/second 8 hex digits of md5 as a nonnegative long (32 bits) —
    the cross-engine hash primitive."""
    return F.conv(F.substring(F.md5(col), start, width), 16, 10).cast("long")


def hll_registers(
    df: DataFrame, group_col: str, key_col: str, p: int = 10
) -> DataFrame:
    """HLL register table: (group, reg, rho) with rho = max over keys.

    reg = h1 mod m (h1 = first 32 hash bits), rho = leading-zero count
    of the second 32 hash bits plus one (via minimal-binary length:
    rho = 33 - len(bin(w)), w=0 -> 33).  The max-aggregation is the
    sketch MERGE — associative + commutative, so partial aggregation
    combines map-side and register tables from disjoint epochs/shards
    union+re-max into one (how a 100 TB scan keeps per-host distinct
    counts without ever shuffling raw keys: <= m rows per group cross
    the exchange).
    """
    m = 1 << p
    h1 = _md5_slice(F.col(key_col).cast("string"), 1)
    w = _md5_slice(F.col(key_col).cast("string"), 9)
    rho = F.when(w == 0, F.lit(HLL_RHO_CAP)).otherwise(
        F.lit(HLL_RHO_CAP) - F.length(F.bin(w))
    )
    return (
        df.select(F.col(group_col).alias("grp"), (h1 % m).alias("reg"), rho.alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 10, round_dp: int = 4) -> DataFrame:
    """Per-group HLL estimate from a register table.

    The register sum is kept exact: sum_star = sum(2^(33-rho)) over
    present registers plus 2^33 per never-hit register — integers, so
    the result is independent of Spark's partition-dependent addition
    order and of the oracle engine's.  E = alpha*m^2 / (sum_star/2^33);
    linear counting when E <= 2.5m and empty registers exist.  Estimates
    are rounded (ln() differs by ~1 ulp across libm builds).
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard large-m approximation
    scale = float(1 << HLL_RHO_CAP)
    agg = registers.groupBy("grp").agg(
        # exact integer term 2^(33-rho): the whole register sum stays in
        # BIGINT, so it is independent of partition addition order
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - rho)")).alias(
            "s_present"
        ),
        F.count("*").alias("n_present"),
    )
    s_star = F.col("s_present") + (F.lit(m) - F.col("n_present")) * F.lit(int(1 << HLL_RHO_CAP))
    raw = F.lit(alpha * m * m * scale) / s_star.cast("double")
    zeros = (F.lit(m) - F.col("n_present")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select("grp", F.round(est, round_dp).alias("hll_est"))


def hll_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    p: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """(group, n_exact, hll_est, rel_err): the sketch estimate next to the
    exact distinct count (the exact side is the verification baseline —
    at 100 TB you keep only the register table).  rel_err rounded to 6."""
    regs = hll_registers(df, group_col, key_col, p)
    est = hll_estimate(regs, p, round_dp)
    exact = (
        df.select(F.col(group_col).alias("grp"), F.col(key_col).alias("k"))
        .groupBy("grp")
        .agg(F.countDistinct("k").alias("n_exact"))
    )
    return (
        exact.join(est, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            "hll_est",
            F.round(
                F.abs(F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
        )
    )


def cms_sketch(
    tokens: DataFrame, token_col: str = "token", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min counter matrix (row, bucket, cnt) over a token stream.

    bucket_i(t) = md5("i:" || t) mod width — d independent hash rows via
    the salt prefix.  The groupBy partial-aggregates map-side, so the
    shuffle carries <= d*width rows per partition regardless of stream
    size; matrices from shards merge by cell-wise addition (same groupBy
    again) — the mergeability that makes CMS a single-pass 100 TB
    frequency profile.
    """
    rows = tokens.select(
        F.posexplode(
            F.array(
                *[
                    _md5_slice(
                        F.concat(F.lit(f"{i}:"), F.col(token_col)), 1
                    ) % width
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket")
    )
    return rows.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_point_estimates(
    tokens: DataFrame,
    probe: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(token, cms_est) for each probe token: min over the d rows of the
    probed cells.  The sketch is metadata-sized (d*width), so the probe
    is a broadcast join against it — no shuffle touches the stream."""
    sk = cms_sketch(tokens, token_col, depth, width)
    probes = probe.select(
        F.col(token_col).alias("p_token"),
        F.posexplode(
            F.array(
                *[
                    _md5_slice(F.concat(F.lit(f"{i}:"), F.col(token_col)), 1) % width
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sk), ["row", "bucket"], "left")
        .groupBy("p_token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
        .select(F.col("p_token").alias(token_col), "cms_est")
    )


def hll_retention(
    df: DataFrame,
    arm_col: str = "arm",
    key_col: str = "user_id",
    p: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Sketch-only overlap/retention between two populations — the
    inclusion-exclusion composition |A∩B| ≈ E(A) + E(B) − E(A∪B) over
    three HLL estimates, the standard trick for intersections HLLs
    can't represent directly (theta sketches exist precisely because
    this error compounds — the estimate is labeled, not hidden).  At
    100 TB this answers "how many users/hosts appeared in BOTH crawl
    epochs" from three register tables (≤ 3m rows total) without ever
    shuffling raw keys.

    ``df``: rows with ``arm_col`` ∈ {'a','b'} and a key column.  One
    output row: (est_a, est_b, est_union, est_intersection,
    retention_ppm) — retention = intersection/E(A), floored to ppm;
    the intersection clamps at 0 (inclusion-exclusion of noisy
    estimates can go slightly negative).

    Scale: ONE pass — each row explodes to (its arm, 'u') tags, the
    register max-agg absorbs both map-side; everything after the
    exchange is ≤ 3m register rows.
    """
    tagged = df.select(
        F.explode(
            F.array(F.col(arm_col).cast("string"), F.lit("u"))
        ).alias("g"),
        F.col(key_col).alias("k"),
    )
    est = hll_estimate(hll_registers(tagged, "g", "k", p), p, round_dp)
    one = (
        est.groupBy()
        .pivot("grp", ["a", "b", "u"])
        .agg(F.first("hll_est"))
        .select(
            F.coalesce(F.col("a"), F.lit(0.0)).alias("est_a"),
            F.coalesce(F.col("b"), F.lit(0.0)).alias("est_b"),
            F.coalesce(F.col("u"), F.lit(0.0)).alias("est_union"),
        )
    )
    inter = F.round(
        F.greatest(
            F.lit(0.0),
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        ),
        round_dp,
    )
    return one.select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.when(
            F.col("est_a") > 0,
            F.floor(inter * 1_000_000 / F.col("est_a")).cast("long"),
        ).alias("retention_ppm"),
    )
