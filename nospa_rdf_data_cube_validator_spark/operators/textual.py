"""Text-analysis operators over document tables: language id, quality
scoring, token counting, fingerprinting. All built-in-function expressions
(regexp/split/aggregate) — no Python in the data plane, and every formula is
deliberately SQL-expressible so DuckDB oracles can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import spread

# marker stopwords per language for the n-gram-free heuristic language id
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "que", "por", "una"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# BPE-ish subword segmentation: word pieces of up to 4 chars, digits split,
# punctuation its own token — a deterministic proxy for tokenizer counting.
BPE_ISH_PATTERN = r"[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\s]"


def _marker_count(text_col: str, words: list[str]) -> F.Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.col(text_col), F.lit(pat))


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang, score): argmax of per-language marker-word counts;
    'und' when nothing matches. Deterministic tie-break: lexicographic lang."""
    docs = spread(docs)  # parallelism floor for the regex scan (guide §2.5)
    scores = [
        F.struct(_marker_count(text_col, ws).alias("score"), F.lit(lang).alias("lang"))
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col).alias("id"),
        F.when(best["score"] > 0, best["lang"]).otherwise("und").alias("pred_lang"),
        best["score"].alias("score"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, punct_u6, stopword_u6, quality_u6):
    length/punctuation/stopword heuristics. Ratios and the composite score
    are integer micro-units (value * 1e6, floor) — exact integer arithmetic,
    so the numbers are bit-identical across engines and parallelism levels
    (no float rounding in the contract)."""
    docs = spread(docs)  # parallelism floor for the regex scan (guide §2.5)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars"),
        F.size(F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')")).alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).alias("n_punct"),
        _marker_count(text_col, STOPWORDS_EN).alias("n_stop"),
    )
    punct_u6 = (F.col("n_punct") * 1000000 / F.greatest("n_chars", F.lit(1))).cast("bigint")
    stop_u6 = (F.col("n_stop") * 1000000 / F.greatest("n_tokens", F.lit(1))).cast("bigint")
    base = base.withColumn("punct_u6", punct_u6).withColumn("stopword_u6", stop_u6)
    quality_u6 = (
        (F.least(F.col("n_tokens") * 10000, F.lit(1000000)) / 2).cast("bigint")
        + (F.least(F.col("stopword_u6") * 5, F.lit(1000000)) * 3 / 10).cast("bigint")
        + ((F.lit(1000000) - F.least(F.col("punct_u6") * 10, F.lit(1000000))) / 5).cast("bigint")
    )
    return base.select(
        "id", "n_chars", "n_tokens", "punct_u6", "stopword_u6", quality_u6.alias("quality_u6")
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, ws_tokens, bpe_ish_tokens): whitespace tokens and a BPE-ish
    subword count (regexp segmentation)."""
    docs = spread(docs)  # parallelism floor for the regex scan (guide §2.5)
    ws = F.size(F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')"))
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    return docs.select(
        F.col(id_col).alias("id"), ws.alias("ws_tokens"), bpe.alias("bpe_ish_tokens")
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp): 64-bit rolling-hash document fingerprint — polynomial hash
    over normalized word tokens (order-sensitive, whitespace-insensitive),
    computed with a higher-order aggregate. Not SQL-oracle'd (DuckDB lacks
    matching 64-bit overflow arithmetic); tested by invariants instead."""
    docs = spread(docs)  # parallelism floor for the regex scan (guide §2.5)
    tokens = F.expr(f"filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t != '')")
    # chained xxhash64(acc, token) instead of polynomial acc*31+h: same
    # order-sensitivity, no ANSI-mode bigint overflow.
    fp = F.expr(
        "aggregate(tokens, cast(1469598103934665603 as bigint),"
        " (acc, t) -> xxhash64(acc, t))"
    )
    return (
        docs.select(F.col(id_col).alias("id"), tokens.alias("tokens"))
        .select("id", fp.alias("fp"))
    )


def winnow_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """(id, min_fp, n_shingles): cross-engine-reproducible min-hash document
    fingerprint — the lexicographically smallest md5 of the distinct char
    k-shingles (winnowing's selection step with window = whole doc), plus
    the distinct-shingle count. Complements ``fingerprint`` (the xxhash64
    rolling hash, faster but not reproducible outside the JVM): md5 is
    standardized, so this variant is the one to use when fingerprints must
    match across engines/languages. All JVM-side expressions."""
    docs = spread(docs)  # parallelism floor for the regex scan (guide §2.5)
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substr({text_col}, i, {k})))"
    )
    return (
        docs.select(F.col(id_col).alias("id"), grams.alias("grams"))
        .select(
            "id",
            F.expr("array_min(transform(grams, g -> md5(g)))").alias("min_fp"),
            F.size("grams").alias("n_shingles"),
        )
    )
