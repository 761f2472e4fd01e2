"""Corpus-curation operators for large-scale training-data pipelines:
test-set decontamination, stratified quota sampling, deterministic shard
assignment, vocabulary top-k.

These are the steps between "deduped crawl" and "training shards" that the
dedup/similarity modules don't cover.  Reference analog: none — the C#
engine (/root/reference/SpiderEngine/Engine.cs) stops at link checking;
these are the from-scratch additions the 100 TB-pipeline brief demands.

Every operator is pure JVM-side DataFrame ops (split/explode/md5/conv
built-ins, whole-stage codegen) with an exact ANSI-SQL twin for the DuckDB
oracle — no Python in any hot path.

Scale notes per operator live on the function docstrings; the common
theme: shuffle keys are always content-derived (shingle, lang, token,
hash-bucket), never a driver-side collect, and skew has a named mitigation
(broadcast for small dims, two-phase windows for hot groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkkchecker_net_spark.pipeline.dedup import shingles


def decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    k: int = 3,
    broadcast_eval_threshold: int = 10_000_000,
    eval_shingle_count: int | None = None,
) -> DataFrame:
    """Test-set decontamination: flag training documents that share any
    word k-gram with an evaluation/benchmark document.

    The canonical pretraining hygiene step (n-gram overlap decontamination,
    as in GPT-3/PaLM data cards): a train doc containing a verbatim
    benchmark shingle leaks the benchmark into the training set.

    Plan: eval docs -> distinct k-shingles (the "dirty" set, typically
    tiny relative to the corpus — benchmarks are MBs, corpora are TBs) ->
    semi-ish join against train shingles keyed on the shingle -> per-doc
    hit count.  Returns ONLY contaminated docs (doc_id, n_hits) — at 100 TB
    the clean >99% of the corpus never leaves its map task.

    Scale: the dirty shingle set broadcasts while it fits
    (`broadcast_eval_threshold` keys, ~1 GB at 100 B/shingle); past that
    the join shuffles on the shingle key, where hot shingles (stop-phrase
    k-grams) are the skew risk — mitigated by AQE skew-join plus the usual
    stop-shingle filter upstream.  Pass `eval_shingle_count` when the
    caller already knows the dirty-set size; otherwise the broadcast
    decision falls to AQE's runtime stats (we mark broadcast only on the
    explicit hint path to keep the plan deterministic for tests).
    """
    dirty = shingles(evalset, k).select("shingle").distinct()
    if (
        eval_shingle_count is not None
        and eval_shingle_count <= broadcast_eval_threshold
    ):
        dirty = F.broadcast(dirty)
    tr = shingles(train, k)  # already distinct per (doc_id, shingle)
    return (
        tr.join(dirty, on="shingle", how="inner")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def stratified_sample(
    docs: DataFrame, per_group: int, group_col: str = "lang"
) -> DataFrame:
    """Deterministic stratified quota sample: up to `per_group` docs per
    group, chosen by md5 order of the doc id (a seedless, engine-agnostic
    uniform order — every engine picks the same rows).

    The standard corpus-balancing step (cap each language/source at a
    quota so head languages don't drown the tail).

    Scale: one window partitioned by the group key.  Group count is small
    (languages/sources), so each group IS a hot key by construction —
    but the window's per-partition state is O(1) (a running row_number),
    so a 10^9-row group streams through one task's disk-backed sort.
    When that single-task sort is the bottleneck, the two-phase trick in
    engine/epoch.split_politeness applies verbatim: rank within
    (group, salt) first, keep per_group per salted cell, then rank the
    pruned (<= salt*per_group per group) set exactly.
    """
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy(group_col).orderBy(key, "doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_group)
        .select("doc_id", group_col)
    )


def shard_assign(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """Deterministic training-shard assignment + per-shard manifest.

    shard_id = (first 8 md5 hex digits of the doc id) mod n_shards — a
    content-addressed assignment both engines compute bit-identically
    (unsigned 32-bit value, so no sign-extension disagreement), stable
    under corpus growth (a doc's shard never depends on other rows).

    Returns the shard manifest (shard_id, n_docs, n_chars, min/max doc_id)
    — the thing a training job actually reads to plan its input.  The
    full assignment is the intermediate `withColumn`; writing it out
    partitioned by shard_id is one `.write.partitionBy` away.

    Scale: one map-side hash + one groupBy on a key with exactly
    `n_shards` distinct values — partial aggregation collapses each map
    task to n_shards rows before the exchange.
    """
    hex8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    shard = F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(n_shards))
    return (
        docs.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def weighted_sample(
    docs: DataFrame, k: int = 100, weight_col: str | None = None
) -> DataFrame:
    """Weighted sampling without replacement, A-Res (Efraimidis &
    Spirakis 2006): key_i = -ln(u_i)/w_i, keep the k smallest keys —
    inclusion probability proportional to weight, one pass, no rejection.
    The corpus-curation move for quality-weighted subset selection
    ("sample 10M docs, long/high-quality docs proportionally likelier").

    u_i is a DETERMINISTIC uniform (first 8 md5 hex digits of the doc id,
    mapped into (0,1)) instead of an RNG draw — same sample on every run
    and on every engine (the DuckDB oracle recomputes it exactly); keys
    are rounded to 9 dp with a doc_id tie-break so libm-vs-Math.log ulp
    differences cannot reorder the cut.

    Scale: the keying is map-only; the global smallest-k is one TopK —
    Spark plans row_number over a 0-partition window as a single-task
    sort ONLY of the per-partition top-k survivors when k is small
    (the same shape as vocab_topk; for huge k switch to
    repartitionByRange(key).limit).  Default weight: n_chars.
    """
    w = F.col(weight_col) if weight_col else F.length("text").cast("double")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + 1) / F.lit(float(2**32 + 1))  # strictly inside (0, 1)
    key = F.round(-F.log(u) / w, 9)
    return (
        # w=0 rows (empty docs) have zero inclusion probability in A-Res —
        # and -ln(u)/0 is engine-dependent (Spark Infinity vs DuckDB's
        # settings-dependent NULL/inf): exclude them BEFORE keying, in both
        # this plan and the oracle SQL (ADVICE r3).
        # orderBy().limit(k), NOT a 0-partition row_number window: Spark
        # plans this as TakeOrderedAndProject — each partition keeps only
        # its local top-k and the driver merges k x partitions rows.  The
        # window form relied on a WindowGroupLimit rewrite that this build
        # does NOT infer for empty partition specs (verified by
        # test_plan_contracts.py) — it was a full single-partition sort of
        # the corpus.  Same rows: (key, doc_id) is a total order.
        docs.filter(w > 0)
        .select("doc_id", key.alias("_k"), w.cast("long").alias("weight"))
        .orderBy("_k", "doc_id")
        .limit(k)
        .select("doc_id", "weight")
    )


def pack_sequences(
    docs: DataFrame, seq_len: int = 2048, n_shards: int = 16
) -> DataFrame:
    """Sequence-packing manifest: concatenate each shard's token stream
    (docs in doc_id order) and cut it into fixed-`seq_len` training
    chunks; a doc belongs to the chunk its FIRST token lands in.  The
    step between "curated docs" and "what the trainer mmaps" — the
    manifest says which docs feed which chunk of which shard.

    Packing is per-shard BY DESIGN (real pipelines pack within output
    shards, never across the whole corpus): the running-token-offset
    window partitions by the content-hash shard key, so a 10^10-doc
    corpus is n_shards independent streaming cumsums, not one global
    single-partition scan.  Within a shard the window is a streaming
    frame (rows unbounded preceding) over the shard's doc_id sort —
    disk-backed, O(1) state.

    Returns (shard_id, chunk_id, n_docs, n_tokens, min_doc_id,
    max_doc_id) ordered by the manifest key.
    """
    hex8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    shard = F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(n_shards))
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        docs.select("doc_id", shard.alias("shard_id"), n_tokens.alias("n_tok"))
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .withColumn(
            "chunk_id",
            F.floor((F.col("cum_tok") - F.col("n_tok")) / F.lit(seq_len)),
        )
    )
    return assigned.groupBy("shard_id", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def vocab_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-k whitespace tokens by frequency
    (count desc, token asc tie-break) — the tokenizer-training /
    corpus-inspection primitive.

    Scale: explode -> groupBy(token) partial-aggregates map-side (each
    map task emits its local vocab, not its token stream), then the
    top-k is orderBy().limit(k) = TakeOrderedAndProject — every partition
    keeps only its local top-k of the VOCAB and the driver merges
    k x partitions rows (the 0-partition row_number window it replaces
    was a full single-partition sort of the global vocab; this build does
    not infer WindowGroupLimit for empty partition specs — pinned by
    test_plan_contracts.py).  For a full vocabulary dump use
    repartitionByRange(count) instead.  Hot tokens ("the") are exactly
    what partial aggregation exists for: they collapse to one row per map
    task before the shuffle.
    """
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)


def bpe_pairs(docs: DataFrame, k: int = 50) -> DataFrame:
    """First-iteration BPE merge candidates (Sennrich et al. 2016): the
    top-k adjacent character pairs across the corpus, each word closed
    with an end-of-word marker '</w>' — i.e. exactly the table the first
    BPE training step maximizes over.  Output (w1, w2, cnt), ordered
    cnt desc / (w1, w2) asc.

    Scale: the token STREAM is aggregated to the word VOCAB first
    (groupBy(token) partial-aggregates map-side — hot words collapse
    before any per-character work), so pair extraction runs once per
    DISTINCT word weighted by its frequency, not once per occurrence:
    10^13 tokens -> 10^7 vocab rows -> ~10^8 (pair, word) rows -> a
    (w1, w2)-keyed partial aggregation whose key space is ~|alphabet|^2.
    The final top-k is orderBy().limit(k) = TakeOrderedAndProject (the
    vocab_topk pattern — no single-partition window).  The in-word pair
    builder is pure codegen; sequence(1, length(w)) never descends
    because vocab words are non-empty by construction.
    """
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    pairs = (
        vocab.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w)), i -> struct("
                    "substring(w, i, 1) AS w1, "
                    "if(i = length(w), '</w>', substring(w, i + 1, 1)) AS w2))"
                )
            ).alias("p"),
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"), "freq")
        .groupBy("w1", "w2")
        .agg(F.sum("freq").alias("cnt"))
    )
    return pairs.orderBy(F.col("cnt").desc(), F.col("w1"), F.col("w2")).limit(k)


def bpe_merges(docs: DataFrame, n_merges: int = 6) -> DataFrame:
    """FULL multi-iteration BPE training loop (Sennrich et al. 2016
    §3.2) — r4 verdict item 5: :func:`bpe_pairs` stops at iteration 1;
    this runs the whole merge loop and emits the learned merge table
    (merge_rank, w1, w2, cnt), the artifact a tokenizer trainer ships.
    Ties break (cnt desc, w1 asc, w2 asc) — deterministic on both
    engines.

    Merges apply LEFT-TO-RIGHT NON-OVERLAPPING within each word ("aaaa"
    + merge (a,a) → [aa, aa]), via a codegen array fold: append each
    symbol, or replace the accumulator's tail when (tail, current) is
    the chosen pair — a just-merged tail (w1‖w2) can never re-merge
    with a following w2 because w2 is non-empty.

    Scale (the lloyd_centroids shape, pipeline/cluster.py): the token
    stream collapses ONCE to the word vocab (partial-agg; 10^13 tokens
    → 10^7 vocab rows) and the loop never touches the corpus again.
    Each round costs one (w1, w2)-keyed pair-count shuffle over the
    vocab (key space ≈ |alphabet|² growing slowly with merges) plus a
    1-ROW argmax collect (TakeOrderedAndProject — metadata-sized, the
    one driver round-trip per merge that makes the loop iterative);
    the re-segmented vocab is persisted per round and the previous
    round unpersisted, so lineage stays O(1) deep.  Production trains
    30k merges the same way — the per-round cost is vocab-sized, not
    corpus-sized.
    """
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit("</w>"))
            ).alias("syms"),
            "freq",
        )
        .persist()
    )
    vocab.count()  # materialize before the loop (kmeans pattern)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, int(n_merges) + 1):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "struct(element_at(syms, i) AS w1, "
                        "element_at(syms, i + 1) AS w2))"
                    )
                ).alias("p"),
            )
            .groupBy("p.w1", "p.w2")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word fully merged to one symbol
        w1, w2, cnt = best[0]["w1"], best[0]["w2"], int(best[0]["cnt"])
        merges.append((r, w1, w2, cnt))
        joined = w1 + w2
        new_syms = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(w1))
                & (x == F.lit(w2)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(joined)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        nxt = vocab.select(new_syms.alias("syms"), "freq").persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank int, w1 string, w2 string, cnt bigint"
    )


def bpe_encode_stats(
    docs: DataFrame, merges: "list[tuple[str, str]]"
) -> DataFrame:
    """Apply a learned BPE merge table (the :func:`bpe_merges` output,
    or any trained tokenizer's ordered merge list) and report per-doc
    tokenization stats: (doc_id, n_words, n_chars, n_symbols,
    symbols_per_100_words) — the serving half of the BPE story, and
    the number (tokens per doc) every packing/budget operator upstream
    (`pack_sequences`, `length_quantiles`) actually wants from a real
    tokenizer instead of the whitespace proxy.

    Merges apply IN TRAINED ORDER, each with the same left-to-right
    non-overlapping fold as training (see :func:`bpe_merges`) — order
    is what makes BPE deterministic.

    Scale: the corpus collapses to the DISTINCT-word vocab first, each
    vocab word is encoded ONCE (the merge folds chain into one codegen
    expression — fine for the tens-of-merges tests; a production 30k-
    merge tokenizer swaps this stage for an Arrow mapInPandas with a
    compiled encoder, same surrounding plan), then the word stream
    joins the encoded vocab on the word (shuffle keyed by word — hot
    words are one vocab row, skew-free) and partial-aggregates per
    doc.  Two shuffles total, corpus never re-scanned per merge.
    """
    words = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    vocab = words.select("w").distinct()
    def _merge_fold(prev, w1, w2):
        joined = w1 + w2

        def step(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(w1))
                & (x == F.lit(w2)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(joined)),
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return F.aggregate(prev, F.array().cast("array<string>"), step)

    syms = F.concat(F.split(F.col("w"), ""), F.array(F.lit("</w>")))
    for w1, w2 in merges:
        syms = _merge_fold(syms, w1, w2)
    enc = vocab.select(
        "w",
        F.length("w").alias("_chars"),
        (F.size(syms)).alias("_n_syms"),
    )
    return (
        words.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("_chars").alias("n_chars"),
            F.sum("_n_syms").alias("n_symbols"),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_symbols").cast("long").alias("n_symbols"),
            F.floor(
                F.col("n_symbols") * 100 / F.col("n_words")
            ).alias("symbols_per_100_words"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    lang_col: str = "lang",
    target_lang: str = "en",
    round_dp: int = 6,
) -> DataFrame:
    """DSIR data-selection importance weights (Xie et al. 2023): score
    every document by how target-like its hashed-unigram feature
    distribution is, log w(d) = sum over d's tokens of
    ln p_target(b(t)) - ln p_raw(b(t)), where b(t) is an
    engine-independent hash bucket (first 8 md5 hex digits mod
    n_buckets — the shard_assign/weighted_sample determinism trick) and
    both bucket distributions are add-alpha smoothed:
    p(b) = (cnt(b) + alpha) / (total + alpha * n_buckets).
    The target here is the corpus's own `lang == target_lang` slice (the
    in-sandbox stand-in for the paper's Wikipedia/Books target; the swap
    point is the `tgt` DataFrame).  Output (doc_id, logw, n_tok) anchored
    on the FULL doc set — token-less docs carry logw 0.0.

    Scale: both feature distributions partial-aggregate the token stream
    to <= n_buckets rows (a few thousand — the per-bucket log-ratio table
    BROADCASTS back onto the stream, so scoring is map-side + one
    doc-keyed aggregation; no shuffle carries raw tokens beyond the
    bucket aggregations).  At 100 TB raw vs a GB-scale curated target the
    two aggregations read different inputs but produce the same
    n_buckets-row shape.
    """
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    toks = docs.select(
        "doc_id",
        F.col(lang_col),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    feats = toks.select("doc_id", F.col(lang_col), bucket.alias("b"))

    def _logp(side: DataFrame, name: str) -> DataFrame:
        cnt = side.groupBy("b").agg(F.count("*").cast("double").alias("c"))
        tot = cnt.agg(F.sum("c").alias("t"))  # 1 row — broadcast
        return cnt.crossJoin(F.broadcast(tot)).select(
            "b",
            F.log(
                (F.col("c") + F.lit(alpha))
                / (F.col("t") + F.lit(alpha) * F.lit(float(n_buckets)))
            ).alias(name),
        )

    raw = _logp(feats, "lp_raw")
    tgt = _logp(feats.filter(F.col(lang_col) == target_lang), "lp_tgt")
    # smoothing covers unseen buckets: a bucket absent from the target
    # still needs ln(alpha / (t_tgt + alpha*B)) — join raw (the superset
    # of observed buckets) left with tgt and fill via the broadcast total
    tgt_tot = (
        feats.filter(F.col(lang_col) == target_lang)
        .agg(F.count("*").cast("double").alias("tt"))
    )
    ratio = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "b",
            (
                F.coalesce(
                    F.col("lp_tgt"),
                    F.log(
                        F.lit(alpha)
                        / (F.col("tt") + F.lit(alpha) * F.lit(float(n_buckets)))
                    ),
                )
                - F.col("lp_raw")
            ).alias("llr"),
        )
    )
    scored = (
        feats.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.sum("llr").alias("logw"), F.count("*").alias("n_tok"))
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce(F.col("logw"), F.lit(0.0)), round_dp).alias(
                "logw"
            ),
            F.coalesce(F.col("n_tok"), F.lit(0)).cast("bigint").alias("n_tok"),
        )
    )


def curation_funnel(docs: DataFrame, lang: str = "en") -> DataFrame:
    """End-to-end curation decision per document: the composition a real
    pretraining pipeline runs (RefinedWeb/Gopher shape) — language gate →
    quality gate → repetition gate → PII gate → exact-dedup canonical
    selection — emitting one keep/reason verdict per doc.  `reason` is the
    FIRST failing gate in that fixed order (NULL when the doc survives),
    so funnel loss is attributable per stage with one groupBy(reason).

    Scale shape: the language, quality and PII gates are recomputed
    INLINE as one map-only codegen pass (joining the standalone
    lang_id/quality_score/pii_stats outputs would cost three avoidable
    doc_id shuffles for map-only expressions); the only shuffles are the
    exact-dup window (keyed on md5(text) — content-derived, no hot key
    beyond a duplicate cluster's own size), the repetition gate's gram
    aggregation, and their doc_id join.  Gate semantics are bit-identical
    to the standalone operators (same helper expressions from
    pipeline/text.py), which the standalone oracles already pin.

    Returns (doc_id, lang_ok, quality_ok, repetition_ok, pii_ok,
    canonical, keep, reason).
    """
    from linkkchecker_net_spark.pipeline.text import (
        LANG_MARKERS,
        PII_EMAIL_RE,
        PII_PHONE_RE,
        _count_token,
        repetition_stats,
    )

    scores = {
        lg: sum([_count_token(F.col("text"), t) for t in toks], F.lit(0))
        for lg, toks in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lg in reversed(list(LANG_MARKERS)):
        pred = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(pred)
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    stop_hits = scores[lang]
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    quality_ok = (n_tokens >= 20) & (stop_hits > 0) & (distinct_ratio > 0.2)
    pii_ok = (F.regexp_count(F.col("text"), F.lit(PII_EMAIL_RE)) == 0) & (
        F.regexp_count(F.col("text"), F.lit(PII_PHONE_RE)) == 0
    )
    canonical = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy(F.md5(F.col("text")))
    )
    gates = docs.select(
        "doc_id",
        (pred == F.lit(lang)).alias("lang_ok"),
        quality_ok.alias("quality_ok"),
        pii_ok.alias("pii_ok"),
        canonical.alias("canonical"),
    )
    rep = repetition_stats(docs).select(
        "doc_id", F.col("repetition_pass").alias("repetition_ok")
    )
    reason = (
        F.when(~F.col("lang_ok"), F.lit("lang"))
        .when(~F.col("quality_ok"), F.lit("quality"))
        .when(~F.col("repetition_ok"), F.lit("repetition"))
        .when(~F.col("pii_ok"), F.lit("pii"))
        .when(~F.col("canonical"), F.lit("duplicate"))
    )
    return gates.join(rep, "doc_id").select(
        "doc_id",
        "lang_ok",
        "quality_ok",
        "repetition_ok",
        "pii_ok",
        "canonical",
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


def domain_cap(
    docs: DataFrame, cap: int = 10, group_col: str = "source"
) -> DataFrame:
    """Per-domain document quota: keep at most ``cap`` docs per
    ``group_col``, priority = longest text first (the cheap quality proxy
    production URL-curation uses), doc_id as the deterministic tie-break.

    The C4/RefinedWeb-style "domain cap" that stops a single boilerplate
    mill from dominating the corpus.  Plan: one window per group with
    ``row_number() <= cap`` — Spark 4 pushes the filter down as a partial
    WindowGroupLimit below the exchange (the same operator the
    weighted_sample/vocab_topk plan-contract tests pin), so each input
    partition forwards at most ``cap`` rows per domain into the shuffle:
    a hot domain with 10^8 pages moves cap x n_partitions rows, not 10^8.
    For adversarial single-domain skew beyond that, the engine's two-phase
    salted top-K (engine/epoch.py J7) is the drop-in replacement.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= cap)
        .select("doc_id", group_col, "n_chars", "rnk")
    )


def domain_mix(
    docs: DataFrame,
    budget_chars: int = 1_000_000,
    max_repeat_ppm: int = 4_000_000,
    group_col: str = "source",
    targets_ppm: dict[str, int] | None = None,
) -> DataFrame:
    """Static training-mixture planner per domain/source (the Pile /
    LLaMA data-card step): given the corpus' ACTUAL per-source volume,
    compute each source's sampling weight toward a target mixture and
    the character budget it gets in the final blend.

    Per source: ``n_docs``, ``n_chars``, ``actual_ppm`` (its share of the
    corpus in parts-per-million), ``target_ppm`` (uniform over the
    observed sources unless an explicit ``targets_ppm`` map is given —
    sources absent from the map get 0 and are excluded from training),
    ``weight_ppm`` = target/actual repeat factor in ppm, capped at
    ``max_repeat_ppm`` (the LLaMA-style "no source is upsampled more
    than Nx" bound — under-represented sources hit the cap instead of
    being repeated into memorization), and ``planned_chars`` =
    floor(budget x target/1e6).

    All arithmetic is integer (floor-divided ppm), so the DuckDB oracle
    replays it bit-exactly — no float mixture weights to drift.

    Scale: one partial-aggregated groupBy on ``group_col`` (map-side
    combine reduces each partition to one row per source), then a
    broadcast join against the 1-row totals dimension — the corpus is
    touched once and nothing data-sized shuffles.  Hot sources are
    irrelevant here (the agg output is |sources| rows); the *application*
    of weight_ppm (repeat/sample each doc) is a map-only filter on
    ``xxhash64(doc_id) % 1e6 < weight_ppm`` downstream.
    """
    per = docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    tot = per.agg(
        F.sum("n_chars").alias("tot_chars"),
        F.count("*").alias("n_sources"),
    )
    j = per.crossJoin(F.broadcast(tot))
    if targets_ppm is None:
        target = (F.lit(1_000_000).cast("long") / F.col("n_sources")).cast(
            "long"
        )
    else:
        target = F.coalesce(
            *[
                F.when(F.col(group_col) == s, F.lit(int(p)).cast("long"))
                for s, p in sorted(targets_ppm.items())
            ],
            F.lit(0).cast("long"),
        )
    actual = (F.col("n_chars") * 1_000_000 / F.col("tot_chars")).cast("long")
    weight = F.least(
        (target * 1_000_000 / F.greatest(actual, F.lit(1))).cast("long"),
        F.lit(int(max_repeat_ppm)).cast("long"),
    )
    return j.select(
        group_col,
        "n_docs",
        "n_chars",
        actual.alias("actual_ppm"),
        target.alias("target_ppm"),
        weight.alias("weight_ppm"),
        (F.lit(int(budget_chars)).cast("long") * target / 1_000_000)
        .cast("long")
        .alias("planned_chars"),
    )


def semantic_decontaminate(
    emb: DataFrame,
    dirty: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_dirty: bool = True,
) -> DataFrame:
    """Embedding-space test-set decontamination: flag corpus vectors whose
    cosine similarity to ANY benchmark/eval vector reaches ``threshold``
    — the semantic sibling of :func:`decontaminate` (verbatim n-grams
    miss paraphrased benchmark leakage; embedding proximity catches it).

    Output: one row per corpus vector — (id, max_cos rounded to 6 dp,
    contaminated) — so downstream filtering is a boolean column, and the
    audit trail (how close was the nearest benchmark item?) rides along.

    Plan: the dirty side is benchmarks — MBs against a TB corpus — so it
    broadcasts (like decontaminate's shingle set) and the corpus never
    shuffles anything wider than (id, partial-max): the cosine pass is
    map-side, the groupBy max partial-aggregates per partition.  Past
    broadcast size (``broadcast_dirty=False``) the same LSH bucketing as
    pipeline.similarity.ann_lsh is the scale path, trading exactness for
    recall — this exact variant is the correctness baseline.

    Determinism: cosine folded in array order via F.aggregate (sequential
    fold, same order the SQL oracle's per-dim join sums), threshold
    compared on the unrounded double with the 6-dp report rounding the
    embed_neardup/ann operators use.
    """
    nrm = F.sqrt(
        F.aggregate(
            F.transform(
                F.col(vec_col), lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    corpus = emb.select(
        F.col(id_col), F.col(vec_col).alias("_ve"), nrm.alias("_ne")
    )
    d = dirty.select(F.col(vec_col).alias("_vd"), nrm.alias("_nd"))
    if broadcast_dirty:
        d = F.broadcast(d)
    dot = F.aggregate(
        F.zip_with(
            F.col("_ve"),
            F.col("_vd"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        corpus.crossJoin(d)
        .select(
            F.col(id_col),
            (dot / (F.col("_ne") * F.col("_nd"))).alias("_cos"),
        )
        .groupBy(id_col)
        .agg(F.max("_cos").alias("_mc"))
        .select(
            id_col,
            F.round(F.col("_mc"), 6).alias("max_cos"),
            (F.col("_mc") >= F.lit(float(threshold))).alias("contaminated"),
        )
    )


def dataset_card(docs: DataFrame) -> DataFrame:
    """Datasheet-for-datasets rollup (Gebru et al. 2021 §3.2's
    composition table): per (source, lang) — n_docs, n_chars, n_tokens
    (whitespace tokens, matching pipeline.text.token_count), integer-ppm
    share of corpus characters, and mean doc length — the composition
    block every training-data release publishes.

    All integer arithmetic (floor-divided ppm / means) so the oracle
    replays it exactly.  Scale: ONE partial-aggregated groupBy over the
    corpus (map-side combine → |sources×langs| skinny rows) + a
    broadcast 1-row totals dim; the corpus is scanned once, projecting
    only (source, lang, n_chars, text-token count) — at 100 TB the
    token count rides the same scan, no second pass.
    """
    per = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_chars").alias("tot_chars"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_chars",
            "n_tokens",
            (F.col("n_chars") * 1_000_000 / F.col("tot_chars"))
            .cast("long")
            .alias("share_ppm"),
            (F.col("n_chars") / F.col("n_docs")).cast("long").alias(
                "mean_chars"
            ),
        )
    )


def length_quantiles(
    docs: DataFrame, group_col: str = "lang"
) -> DataFrame:
    """Exact per-group length percentiles: (group, n_docs, p50_chars,
    p90_chars) with p_q = the n_chars value at rank ceil(q·n) of the
    group's ascending length order — the EXACT nearest-rank quantile
    (deterministic; no interpolation, so no float divergence).

    The length-distribution block of the dataset card: sequence-packing
    and truncation budgets are set from these tails, not from means.

    Scale: one window rank per group + a conditional-aggregation
    groupBy.  The rank window shuffles (group)-keyed rows once; a hot
    group (one lang dominating 10^10 docs) is the usual two-phase /
    salted-quantile upgrade — or swap in approx_percentile when exact
    ranks stop being worth a sort (this operator IS the exact
    correctness baseline).
    """
    w = Window.partitionBy(group_col).orderBy("n_chars", "doc_id")
    n = Window.partitionBy(group_col)
    ranked = docs.select(
        group_col,
        "n_chars",
        "doc_id",
        F.row_number().over(w).alias("_rk"),
        F.count("*").over(n).alias("_n"),
    )
    r50 = F.ceil(F.col("_n") * 0.5).cast("long")
    r90 = F.ceil(F.col("_n") * 0.9).cast("long")
    return (
        ranked.groupBy(group_col)
        .agg(
            F.max("_n").alias("n_docs"),
            F.max(F.when(F.col("_rk") == r50, F.col("n_chars"))).alias(
                "p50_chars"
            ),
            F.max(F.when(F.col("_rk") == r90, F.col("n_chars"))).alias(
                "p90_chars"
            ),
        )
    )


def dataset_split(
    docs: DataFrame,
    val_ppm: int = 10_000,
    test_ppm: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment — the release step after
    curation: split membership must be a PURE FUNCTION of content
    identity (never row order or partitioning), so re-running the
    pipeline, adding a shard, or re-partitioning can never leak a val
    doc into train.  bucket = (first 8 md5 hex digits of the doc id)
    mod 1e6 — the same engine-portable content hash shard_assign uses
    (unsigned 32-bit, no sign games); bucket < val_ppm → val,
    < val+test → test, else train.

    Output per doc: (doc_id, lang, bucket, split) — lang rides along
    because split-balance reports stratify on it (the companion
    aggregate is one groupBy away and dataset_card covers the rest).

    Scale: map-only codegen, zero shuffles — the assignment rides any
    existing scan, and because the hash is content-keyed the same doc
    lands in the same split on every machine, every run, every SF.  In
    production the key is the doc's content fingerprint (text.
    fingerprint), so exact dups can never straddle a split either.
    """
    hex8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    bucket = F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(1_000_000))
    split = (
        F.when(bucket < val_ppm, "val")
        .when(bucket < val_ppm + test_ppm, "test")
        .otherwise("train")
    )
    return docs.select(
        "doc_id", "lang", bucket.alias("bucket"), split.alias("split")
    )


def split_balance(
    docs: DataFrame, val_ppm: int = 10_000, test_ppm: int = 10_000
) -> DataFrame:
    """QA over :func:`dataset_split`: per (split, lang) — doc count and
    the lang's share WITHIN its split in ppm, against the lang's share
    of the whole corpus — the balance check that catches a content-hash
    split accidentally correlating with language (it cannot here by
    construction, but the report is what PROVES it per release).

    Output: (split, lang, n_docs, share_ppm, corpus_ppm, skew_ppm =
    share − corpus, all floor-divided integers).

    Scale: dataset_split is map-only; this adds two skinny partial
    aggregations (split×lang, lang) and one broadcast join — nothing
    data-sized moves.
    """
    assigned = dataset_split(docs, val_ppm=val_ppm, test_ppm=test_ppm)
    per = assigned.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs")
    )
    split_tot = per.groupBy("split").agg(F.sum("n_docs").alias("split_n"))
    lang_tot = per.groupBy("lang").agg(F.sum("n_docs").alias("lang_n"))
    corpus_n = per.agg(F.sum("n_docs").alias("corpus_n"))
    j = (
        per.join(F.broadcast(split_tot), "split")
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(corpus_n))
    )
    share = (F.col("n_docs") * 1_000_000 / F.col("split_n")).cast("long")
    corpus = (F.col("lang_n") * 1_000_000 / F.col("corpus_n")).cast("long")
    return j.select(
        "split",
        "lang",
        "n_docs",
        share.alias("share_ppm"),
        corpus.alias("corpus_ppm"),
        (share - corpus).alias("skew_ppm"),
    )


def length_outliers(
    docs: DataFrame,
    group_col: str = "lang",
    z_ppm_threshold: int = 3_500_000,
) -> DataFrame:
    """Robust per-group length-outlier flagging: median + MAD (median
    absolute deviation) of n_chars per group, both EXACT nearest-rank
    medians (rank ceil(n/2), interpolation-free), then
    robust_z_ppm = floor(|x - med| · 10^6 / max(mad, 1)) — the
    outlier verdict fires at z_ppm_threshold (3.5 "robust sigmas";
    the 1.4826 normal-consistency factor is deliberately folded into
    the threshold so the arithmetic stays integer-exact).

    The MAD gate is the standard truncation-audit step before
    sequence packing: mean/stddev break on the heavy-tailed length
    distributions web corpora actually have; median/MAD don't.

    Output: (doc_id, <group>, n_chars, med_chars, mad_chars,
    robust_z_ppm, outlier).

    Scale: two group-keyed rank windows (median, then MAD) — same
    shape and same hot-group caveat as :func:`length_quantiles`; at
    10^10 rows swap exact ranks for approx_percentile per group.
    """
    w = Window.partitionBy(group_col).orderBy("n_chars", "doc_id")
    n = Window.partitionBy(group_col)
    ranked = docs.select(
        group_col, "doc_id", "n_chars",
        F.row_number().over(w).alias("_rk"),
        F.count("*").over(n).alias("_n"),
    )
    med = (
        ranked.filter(
            F.col("_rk") == F.ceil(F.col("_n") / 2.0).cast("long")
        )
        .select(group_col, F.col("n_chars").alias("med_chars"))
    )
    dev = (
        docs.select(group_col, "doc_id", "n_chars")
        .join(F.broadcast(med), group_col)
        .withColumn("_dev", F.abs(F.col("n_chars") - F.col("med_chars")))
    )
    w2 = Window.partitionBy(group_col).orderBy("_dev", "doc_id")
    mad = (
        dev.select(
            group_col, "_dev",
            F.row_number().over(w2).alias("_rk"),
            F.count("*").over(n).alias("_n"),
        )
        .filter(F.col("_rk") == F.ceil(F.col("_n") / 2.0).cast("long"))
        .select(group_col, F.col("_dev").alias("mad_chars"))
    )
    z = F.floor(
        F.col("_dev") * 1_000_000 / F.greatest(F.col("mad_chars"), F.lit(1))
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .select(
            "doc_id",
            group_col,
            "n_chars",
            "med_chars",
            "mad_chars",
            z.alias("robust_z_ppm"),
            (z >= F.lit(int(z_ppm_threshold))).alias("outlier"),
        )
    )


def ring_rebalance(
    docs: DataFrame,
    n_old: int = 4,
    n_new: int = 5,
    vnodes: int = 8,
) -> DataFrame:
    """Consistent-hash ring rebalancing plan (Karger et al. 1997 — the
    sibling of mod-N :func:`shard_assign`, which moves nearly EVERY key
    when n changes): docs and shard virtual nodes hash onto a 2^32
    ring (first 8 md5 hex digits — the repo's engine-agnostic uniform),
    each doc belongs to the clockwise-nearest vnode, and the plan
    reports, for the n_old → n_new resize, how many docs each
    (old_shard, new_shard) cell holds — the off-diagonal mass is
    exactly the data that must move (≈ 1/n_new of the corpus, vs
    ≈ 1-1/n_new for mod-N).

    Output: (old_shard, new_shard, n_docs, moved).

    Scale: the vnode table is (n_new · vnodes) rows — broadcast both
    ways; per-doc owner selection is a broadcast join + min_by ring
    distance (map-side, no doc-stream shuffle); the rollup groupBy has
    n_old·n_new keys.
    """
    M = 1 << 32
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    spark = docs.sparkSession
    vn = spark.range(int(n_new)).select(
        F.col("id").cast("int").alias("shard"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(vnodes) - 1))
        ).alias("v"),
    )
    vpos = vn.select(
        "shard",
        "v",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("s"), F.col("shard").cast("string"),
                        F.lit("#"), F.col("v").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("pos"),
    )

    def owner(n_shards: int, alias: str):
        cand = docs.select("doc_id", h.alias("_h")).join(
            F.broadcast(vpos.filter(F.col("shard") < n_shards)), how="cross"
        )
        dist = F.pmod(F.col("pos") - F.col("_h"), F.lit(M))
        return (
            cand.groupBy("doc_id")
            .agg(
                F.min_by(
                    F.struct("shard", "pos"),
                    F.struct(dist, F.col("pos"), F.col("shard")),
                ).alias("_o")
            )
            .select("doc_id", F.col("_o.shard").alias(alias))
        )

    old = owner(n_old, "old_shard")
    new = owner(n_new, "new_shard")
    return (
        old.join(new, "doc_id")
        .groupBy("old_shard", "new_shard")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "old_shard",
            "new_shard",
            "n_docs",
            (F.col("old_shard") != F.col("new_shard")).alias("moved"),
        )
    )


def source_overlap(docs: DataFrame) -> DataFrame:
    """Cross-source duplicate-mass matrix — the dataset-lineage audit
    run before mixing sources (Common Crawl vs curated dumps overlap
    heavily; double-counted mass silently re-weights the mixture
    domain_mix planned): for every unordered source pair, how many
    distinct content digests appear in BOTH.

    Input: (doc_id, text, source).  Output: (source_a, source_b,
    n_shared_digests) with source_a < source_b.

    Scale: distinct (source, digest) first (partial-agg, collapses
    per-source duplicates), then a digest-keyed self-join — an
    inverted-index join exactly like jaccard_pairs' shingle join,
    never a source × source cross; hot digests (boilerplate shared by
    every source) are bounded by n_sources²/2 pairs per digest.
    """
    sd = (
        docs.select("source", F.md5(F.col("text")).alias("digest"))
        .distinct()
    )
    a = sd.select(F.col("source").alias("source_a"), "digest")
    b = sd.select(F.col("source").alias("source_b"), "digest")
    return (
        a.join(b, "digest")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared_digests"))
    )


def split_divergence(
    docs: DataFrame,
    val_ppm: int = 10_000,
    test_ppm: int = 10_000,
    round_dp: int = 6,
) -> DataFrame:
    """Distribution-shift QA between dataset splits — the token-level
    sibling of :func:`split_balance`: KL(train ‖ split) over add-1-
    smoothed unigram distributions on the JOINT vocabulary, for
    split ∈ {val, test}.  A random content-hash split should sit near
    zero; a topically skewed one lights up — the pre-training sanity
    check that the held-out perplexity will mean anything.

    Split assignment replays :func:`dataset_split`'s md5 ppm buckets,
    so the QA is a pure function of content identity.  Output:
    (split, n_tokens, kl_vs_train) with the KL rounded to `round_dp`
    (the same float-determinism contract as unigram_ppl: vocabulary-
    sized sums, rounded on output).

    Scale: token stream collapses to (split, token) counts map-side
    (vocab-sized shuffle); the KL is a join + aggregate over the
    VOCAB × 3 table.
    """
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(1_000_000),
    )
    split = (
        F.when(bucket < val_ppm, F.lit("val"))
        .when(bucket < val_ppm + test_ppm, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    toks = docs.select(
        split.alias("split"),
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("token"),
    )
    cnt = toks.groupBy("split", "token").agg(F.count("*").alias("c"))
    vocab = cnt.select("token").distinct()
    # Joint vocab size stays IN the plan as a 1-row broadcast aggregate
    # (r4 ADVICE: the old vocab.count() ran a full token-scan job at
    # operator-construction time — every other operator composes lazily).
    vn = vocab.agg(F.count("*").alias("vsize"))

    def dist(split_name: str, prefix: str):
        tot = cnt.filter(F.col("split") == split_name).agg(
            F.sum("c").alias(f"{prefix}_tot")
        )
        return (
            vocab.join(
                cnt.filter(F.col("split") == split_name).select(
                    "token", F.col("c").alias(f"{prefix}_c")
                ),
                "token",
                "left",
            )
            .crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(vn))
            .select(
                "token",
                (
                    (F.coalesce(F.col(f"{prefix}_c"), F.lit(0)) + 1)
                    / (F.col(f"{prefix}_tot") + F.col("vsize"))
                ).alias(f"{prefix}_p"),
                F.col(f"{prefix}_tot"),
            )
        )

    p = dist("train", "p")
    out = []
    for s in ("val", "test"):
        qd = dist(s, "q")
        kl = (
            p.join(qd, "token")
            .agg(
                F.round(
                    F.sum(
                        F.col("p_p") * F.log(F.col("p_p") / F.col("q_p"))
                    ),
                    round_dp,
                ).alias("kl_vs_train"),
                F.max("q_tot").alias("n_tokens"),
            )
            .select(F.lit(s).alias("split"), "n_tokens", "kl_vs_train")
        )
        out.append(kl)
    return out[0].unionByName(out[1])


def partition_advisor(
    stats: DataFrame,
    target_partition_bytes: int = 128 * 1024 * 1024,
    min_partitions: int = 32,
    max_partitions: int = 20_000,
    broadcast_bytes: int = 10 * 1024 * 1024,
    skew_rows_per_partition: int = 50_000_000,
) -> DataFrame:
    """Partitioning advisor — the 100 TB tuning arithmetic this repo's
    scale notes apply, as an operator over table stats: for each table
    (name, n_rows, est_bytes) recommend the shuffle-partition count
    (ceil(bytes / target) clamped to [min, max] — the
    spark.sql.shuffle.partitions / files.maxPartitionBytes knob pair),
    whether the table fits a broadcast join (est_bytes <= the
    autoBroadcastJoinThreshold-shaped budget), rows per partition at
    the recommendation, and a skew-risk flag when even the clamped
    partition count leaves partitions beyond the row budget.

    All ceil/clamp arithmetic is exact (ceil-div computed as
    (x - pmod(x, d)) / d on a numerator that is a multiple of d — no
    lossy rounding anywhere), so the plan is bit-identical on any
    engine.

    Output: (table_name, n_rows, est_bytes, rec_partitions,
    rows_per_partition, broadcastable, skew_risk).

    Scale: input is one row per TABLE — metadata-sized by definition.
    """
    b = F.col("est_bytes")
    # ceil-div via x - pmod(x, d) (exact integer arithmetic end to end;
    # pmod/minus never leave the long domain, unlike `/` which would
    # round-trip through double)
    tpb = F.lit(int(target_partition_bytes)).cast("long")
    x1 = b + tpb - 1
    raw = (x1 - F.pmod(x1, tpb)) / tpb  # exact: numerator is a multiple
    raw = raw.cast("long")
    rec = F.greatest(
        F.least(raw, F.lit(int(max_partitions)).cast("long")),
        F.lit(int(min_partitions)).cast("long"),
    )
    x2 = F.col("n_rows") + rec - 1
    rpp = ((x2 - F.pmod(x2, rec)) / rec).cast("long")
    return stats.select(
        "table_name",
        "n_rows",
        "est_bytes",
        rec.cast("long").alias("rec_partitions"),
        rpp.cast("long").alias("rows_per_partition"),
        (b <= F.lit(int(broadcast_bytes))).alias("broadcastable"),
        (rpp > F.lit(int(skew_rows_per_partition))).alias("skew_risk"),
    )


def epoch_shuffle(docs: DataFrame, epoch: int, n_shards: int = 16) -> DataFrame:
    """Deterministic per-epoch training shuffle — the dataloader-side
    twin of :func:`shard_assign`: within each shard, order the docs by
    md5(doc_id ':' epoch), so every epoch visits a different but fully
    reproducible permutation (same corpus + epoch ⇒ same order on any
    engine, any partitioning — the property that makes a 1000-node
    training job resumable mid-epoch).

    Output: (doc_id, shard_id, epoch, pos) with pos = 0-based rank
    inside the shard's epoch order.

    Scale: the shard key is the usual md5 mod; the rank is a window
    per shard — n_shards parallel sorts of corpus/n_shards rows each
    (pick n_shards ≥ cluster cores so no sort exceeds one task's
    budget; the two-phase salted rank applies beyond that).
    """
    hex8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    shard = F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(int(n_shards)))
    key = F.md5(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"),
            F.lit(int(epoch)).cast("string"),
        )
    )
    w = Window.partitionBy("shard_id").orderBy("_k", "doc_id")
    return (
        docs.select("doc_id", shard.alias("shard_id"), key.alias("_k"))
        .withColumn("pos", F.row_number().over(w) - 1)
        .select(
            "doc_id",
            "shard_id",
            F.lit(int(epoch)).alias("epoch"),
            F.col("pos").cast("long").alias("pos"),
        )
    )


def temporal_split(
    events: DataFrame, cutoff_us: int
) -> DataFrame:
    """Temporal train/test split QA — the time-series sibling of
    :func:`dataset_split`: events strictly before `cutoff_us` (epoch
    micros) are train, the rest test, and the audit surfaces ENTITY
    LEAKAGE — users with activity on both sides of the cutoff, the
    population for which a naive per-event split leaks test-period
    behavior into training features.

    Output: ONE row — (n_train, n_test, n_users, n_leaky_users,
    leaky_ppm).

    Scale: one user-keyed aggregate (min/max ts partial-aggregate
    map-side) + a single-row rollup of the user table.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = (
        events.select(F.col("user_id"), us.alias("_us"))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("_us") < cutoff_us).cast("long")).alias("_tr"),
            F.sum((F.col("_us") >= cutoff_us).cast("long")).alias("_te"),
        )
    )
    return per_user.agg(
        F.sum("_tr").alias("n_train"),
        F.sum("_te").alias("n_test"),
        F.count("*").alias("n_users"),
        F.sum(((F.col("_tr") > 0) & (F.col("_te") > 0)).cast("long")).alias(
            "n_leaky_users"
        ),
    ).select(
        "n_train",
        "n_test",
        "n_users",
        "n_leaky_users",
        F.floor(
            F.col("n_leaky_users") * 1_000_000 / F.col("n_users")
        ).alias("leaky_ppm"),
    )


def shard_skew_audit(
    docs: DataFrame, n_shards: int = 16, tolerance_ppm: int = 200_000
) -> DataFrame:
    """Shard-balance QA over :func:`shard_assign`'s manifest — the
    check a training job runs BEFORE reading shards: per shard, its
    doc/char share in floor-ppm, the signed deviation from the uniform
    expectation (1e6 / n_shards), and a ``balanced`` verdict
    (|char-share deviation| ≤ tolerance_ppm — chars, not docs, because
    stragglers are byte-bound).  An imbalanced shard at 100 TB is a
    straggler epoch; the fix (re-shard with a different n or key salt)
    is cheap ONLY if noticed before training starts.

    Output: (shard_id, n_docs, n_chars, docs_share_ppm,
    chars_share_ppm, char_dev_ppm, balanced).

    Scale: shard_assign's n_shards-row manifest cross-joined with a
    1-row broadcast total — everything after the manifest is
    metadata-sized.
    """
    per = shard_assign(docs, n_shards).select(
        "shard_id", "n_docs", "n_chars"
    )
    tot = per.agg(
        F.sum("n_docs").alias("_td"), F.sum("n_chars").alias("_tc")
    )
    expect = 1_000_000 // int(n_shards)
    docs_ppm = F.floor(F.col("n_docs") * 1_000_000 / F.col("_td"))
    chars_ppm = F.floor(F.col("n_chars") * 1_000_000 / F.col("_tc"))
    dev = chars_ppm - F.lit(expect)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard_id",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_chars").cast("long").alias("n_chars"),
            docs_ppm.cast("long").alias("docs_share_ppm"),
            chars_ppm.cast("long").alias("chars_share_ppm"),
            dev.cast("long").alias("char_dev_ppm"),
            (F.abs(dev) <= F.lit(int(tolerance_ppm))).alias("balanced"),
        )
    )


def bpe_fertility(
    docs: DataFrame,
    merges: "list[tuple[str, str]]",
    lang_col: str = "lang",
    threshold_centi: int = 250,
) -> DataFrame:
    """Tokenizer-fit audit: per-language BPE fertility over a trained
    merge table — the metric that exposes tokenizer bias (a tokenizer
    trained on English fragments under-represented languages into
    character soup, inflating their effective sequence length and
    training cost; fertility = symbols per word is the standard
    measure).  Composes :func:`bpe_encode_stats` (per-doc symbol
    counts, vocab encoded once) with a language-keyed rollup.

    Output one row per language: (lang, n_docs, n_words, n_chars,
    n_symbols, fertility_centi = floor(100·Σsymbols/Σwords),
    compression_centi = floor(100·Σchars/Σsymbols), fragmenting =
    fertility_centi ≥ threshold_centi).

    Scale: bpe_encode_stats' two shuffles plus one doc_id-keyed join
    back to the lang column and a |langs|-row partial agg — nothing
    new touches the corpus text twice.
    """
    per_doc = bpe_encode_stats(docs, merges)
    joined = per_doc.join(
        docs.select("doc_id", F.col(lang_col).alias("lang")), "doc_id"
    )
    agg = joined.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_symbols").alias("n_symbols"),
    )
    fertility = F.floor(F.col("n_symbols") * 100 / F.col("n_words"))
    compression = F.floor(F.col("n_chars") * 100 / F.col("n_symbols"))
    return agg.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_symbols").cast("long").alias("n_symbols"),
        fertility.cast("long").alias("fertility_centi"),
        compression.cast("long").alias("compression_centi"),
        (fertility >= F.lit(int(threshold_centi))).alias("fragmenting"),
    )


def packing_efficiency(
    docs: DataFrame, seq_len: int = 2048, n_shards: int = 16
) -> DataFrame:
    """Fill-rate QA over the :func:`pack_sequences` manifest — the
    check that answers "how much of every training batch is real
    data": chunks are cut at fixed seq_len boundaries of each shard's
    concatenated token stream, so chunks are full except at the tail
    (n_chunks counts chunks with a STARTING doc — the manifest's own
    rule — so a final doc's spill past the last started chunk can push
    fill over 1e6 ppm; the signed waste column carries it).  A low
    fill rate means seq_len is mis-sized
    for the doc-length distribution (compose with `length_quantiles`);
    imbalance across shards is `shard_skew`'s department.

    Output per shard: (shard_id, n_chunks, n_tokens, capacity,
    fill_ppm, waste_tokens).

    Scale: the manifest is already chunk-sized; this adds one
    shard-keyed partial agg over it.
    """
    manifest = pack_sequences(docs, seq_len=seq_len, n_shards=n_shards)
    agg = manifest.groupBy("shard_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    capacity = F.col("n_chunks") * F.lit(int(seq_len))
    return agg.select(
        "shard_id",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        capacity.cast("long").alias("capacity"),
        F.floor(F.col("n_tokens") * 1_000_000 / capacity)
        .cast("long")
        .alias("fill_ppm"),
        (capacity - F.col("n_tokens")).cast("long").alias("waste_tokens"),
    )


def heaps_law(docs: DataFrame, round_dp: int = 6) -> DataFrame:
    """Heaps-law vocabulary-growth estimate — V(N) = K * N^beta — fit
    from two nested corpus prefixes (the doc_id%2==0 half vs the whole
    corpus; prefix-by-id rather than token order, so the estimate is a
    pure function of the table).  The exponent is the capacity-planning
    number for every vocabulary-shaped structure downstream: tokenizer
    training RAM, vocab_topk shuffle width, CMS sketch sizing — and a
    beta far off the 0.4-0.6 natural-language band is itself a corpus
    smell (OCR noise pushes it toward 1, boilerplate mills toward 0;
    the zipf_spectrum hapax view and this exponent move together).

    One row: (n_tokens_half, vocab_half, n_tokens_full, vocab_full,
    beta, k_coef) with beta = log(V2/V1)/log(N2/N1) and K = V2/N2^beta
    (round-6).  Degenerate corpora (either prefix empty or equal
    sizes) yield NULL beta/K.

    Scale: two passes of split-explode over the text column — exact
    token counts are one partial-agg count, exact vocab sizes one
    count(DISTINCT token) each (Spark expands to a two-phase
    aggregate, still key-partitioned); everything downstream is 1-row
    arithmetic.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    half = toks.filter(F.col("doc_id") % 2 == 0)

    def stats(t, suffix):
        return t.agg(
            F.count("*").cast("long").alias(f"n_tokens_{suffix}"),
            F.countDistinct("tok").cast("long").alias(f"vocab_{suffix}"),
        )

    j = stats(half, "half").crossJoin(stats(toks, "full"))
    n1, v1 = F.col("n_tokens_half"), F.col("vocab_half")
    n2, v2 = F.col("n_tokens_full"), F.col("vocab_full")
    ok = (n1 > 0) & (n2 > n1) & (v1 > 0)
    beta = F.when(
        ok,
        F.round(
            F.log(v2.cast("double") / v1)
            / F.log(n2.cast("double") / n1),
            round_dp,
        ),
    )
    k_coef = F.when(
        ok,
        F.round(
            v2
            / F.pow(
                n2.cast("double"),
                F.log(v2.cast("double") / v1)
                / F.log(n2.cast("double") / n1),
            ),
            round_dp,
        ),
    )
    return j.select(
        "n_tokens_half", "vocab_half", "n_tokens_full", "vocab_full",
        beta.alias("beta"), k_coef.alias("k_coef"),
    )
