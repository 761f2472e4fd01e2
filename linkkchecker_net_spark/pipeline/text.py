"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  All JVM-side (split/regexp/md5 built-ins) —
whole-stage-codegen'd, no Python in the hot path; each has an exact ANSI-SQL
twin for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language stopword marker lists — a deliberately simple, fully
# SQL-expressible n-gram/stopword heuristic (deterministic function of the
# text, independently computable by the oracle)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "de", "es", "los"],
}


def _count_token(text_col, token: str):
    # occurrences of a whole token in a single-space-joined text
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-count language ID with deterministic tie-break (first
    language in LANG_MARKERS order wins ties; 'und' = no markers hit)."""
    scores = {
        lang: sum([_count_token(F.col("text"), t) for t in toks], F.lit(0))
        for lang, toks in LANG_MARKERS.items()
    }
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs override later
        pred = F.when((scores[lang] == best_score) & (best_score > 0), F.lit(lang)).otherwise(pred)
    out = docs.select("doc_id", pred.alias("pred_lang"))
    return out


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (4-chars-per-token heuristic
    over non-space chars) — both integer-exact."""
    toks = F.size(F.split(F.col("text"), " "))
    non_space = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return docs.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.ceil(non_space / 4).cast("long").alias("n_bpe_est"),
        F.length("text").alias("n_chars"),
    )


def quality_score(docs: DataFrame, stop_lang: str = "en") -> DataFrame:
    """Quality-signal columns: length, mean word length, stopword count,
    distinct-token ratio — the usual pretraining quality features, exact
    integers/rationals (rounded for cross-engine comparison)."""
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    stop_hits = sum(
        [_count_token(F.col("text"), t) for t in LANG_MARKERS[stop_lang]], F.lit(0)
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    mean_word_len = (n_chars - (n_tokens - 1)) / n_tokens
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stop_hits.alias("stopword_hits"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        (
            (n_tokens >= 20) & (stop_hits > 0) & (distinct_ratio > 0.2)
        ).alias("quality_pass"),
    )


def fingerprint(docs: DataFrame, prefix_tokens: int = 8) -> DataFrame:
    """Document fingerprints: full-text md5 + normalized-prefix md5 (the
    rolling/winnowing stand-in both engines can compute bit-identically)."""
    prefix = F.array_join(F.slice(F.split(F.col("text"), " "), 1, prefix_tokens), " ")
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.md5(prefix).alias("prefix_md5"),
    )
