"""Text-analysis operators for a training-data pipeline over the
``documents`` table — language-ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expression chains (JVM,
codegen'd), each with a DuckDB-portable SQL twin in __spark_entry__.

Scale: every function is a narrow per-row projection — no shuffle,
full predicate/column pushdown into the parquet/Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007

# tiny deterministic stopword lists per language (heuristic lang-id)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "les"),
    "es": ("el", "los", "las"),
    "de": ("der", "die", "und"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (training-pipeline convention)."""
    return F.filter(F.split(F.trim(text), "\\s+"), lambda t: F.length(t) > 0)


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


# GPT-2-style pre-tokenizer, reduced to the subset Java regex and
# DuckDB's RE2 execute identically (leftmost-first alternation):
# contractions, optional-space letter runs, digit runs, symbol runs.
# This is the "BPE-ish" token count a training pipeline uses to budget
# sequence lengths before real BPE runs.
BPE_SPLIT_REGEX = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"


def bpe_ish_tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_REGEX), F.lit(0))


def bpe_ish_token_count_col(text: Column) -> Column:
    return F.size(bpe_ish_tokens_col(text))


def char_poly_hash_col(text: Column) -> Column:
    """Deterministic rolling fingerprint: fold codepoints with
    h = (h*31 + code) mod 1e9+7 — portable to DuckDB list_reduce.
    Empty-string split artifacts are filtered on both sides."""
    chars = F.filter(F.split(text, ""), lambda c: F.length(c) > 0)
    return F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + c) % MOD,
    )


def md5_hash56_col(s: Column) -> Column:
    """56-bit integer hash from md5 hex — identical in DuckDB via
    ('0x' || substr(md5(x),1,14))::bigint."""
    return F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("bigint")


def md5_hash28_col(s: Column) -> Column:
    """28-bit hash (7 hex chars) — small enough that a 32-bit
    permutation multiplier keeps (a*h + b) inside int64 in BOTH
    engines (Spark wraps silently on overflow; DuckDB errors — so
    overflow-free arithmetic is a portability requirement)."""
    return F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint")


def punct_ratio_col(text: Column) -> Column:
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, "[.,;:!?'\"()\\[\\]-]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def alpha_ratio_col(text: Column) -> Column:
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    return F.when(n > 0, alpha.cast("double") / n).otherwise(F.lit(0.0))


def stopword_hits_col(text: Column, words: tuple[str, ...]) -> Column:
    """Count of marker-word occurrences (word-boundary padded)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    out = F.lit(0)
    for w in words:
        # occurrences via length difference
        out = out + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(f" {w} "), F.lit(""))))
            / (len(w) + 2)
        ).cast("int")
    return out


def lang_id_col(text: Column) -> Column:
    """n-gram/stopword heuristic language ID. 'zh' if CJK chars
    dominate; else argmax of per-language marker hits ('en' tiebreak
    order en>fr>es>de, deterministic)."""
    cjk = F.length(F.regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    hits = {lang: stopword_hits_col(text, ws) for lang, ws in LANG_MARKERS.items()}
    best = (
        F.when(
            (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]),
            F.lit("en"),
        )
        .when((hits["fr"] >= hits["es"]) & (hits["fr"] >= hits["de"]), F.lit("fr"))
        .when(hits["es"] >= hits["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return F.when(cjk * 2 > F.length(text), F.lit("zh")).otherwise(best)


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs, low
    punctuation, alphabetic content."""
    toks = token_count_col(text).cast("double")
    len_score = F.least(toks / 50.0, F.lit(1.0))
    return F.round(
        0.5 * len_score + 0.3 * alpha_ratio_col(text) + 0.2 * (1.0 - F.least(punct_ratio_col(text) * 5.0, F.lit(1.0))),
        4,
    )


def document_stats(docs: DataFrame) -> DataFrame:
    """One projection computing the full per-document feature row."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count_col(t).alias("n_tokens"),
        F.round(punct_ratio_col(t), 4).alias("punct_ratio"),
        F.round(alpha_ratio_col(t), 4).alias("alpha_ratio"),
        quality_score_col(t).alias("quality"),
        lang_id_col(t).alias("lang_pred"),
        char_poly_hash_col(t).alias("fingerprint"),
    )
