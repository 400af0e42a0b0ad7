"""Text-analysis operators for training-data pipelines: language ID
(stopword-marker heuristic), quality scoring, token counting, and
document fingerprinting — all native Spark expressions (JVM-side,
whole-stage codegen; no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny high-frequency marker vocabularies per language — the classic
#: stopword-voting heuristic (a stand-in for character-n-gram profiles;
#: the mechanism, scoring, and tie-breaking are what the operator
#: exercises)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "por", "con"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "ich"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh": ("de5", "shi4", "bu4", "le5", "wo3", "you3", "zai4", "ta1", "men5", "hao3"),
}

STOPWORDS = LANG_MARKERS["en"]


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (native split)."""
    return F.size(F.split(F.col(text_col), " "))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """A BPE-ish proxy: splits on word boundaries AND digit/punct
    transitions — counts sub-word units the way byte-pair vocabularies
    roughly do (regex segmentation, native)."""
    return F.size(F.split(
        F.regexp_replace(F.col(text_col),
                         r"(\d+|[^\sA-Za-z0-9]+)", r" $1 "),
        r"\s+"))


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite score in [0, 1] (weights arbitrary but fixed)."""
    tokens = F.split(F.col(text_col), " ")
    n_tokens = F.size(tokens)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.!?,;:]", ""))
    stop_hits = F.size(F.array_intersect(
        F.transform(tokens, lambda t: F.lower(t)),
        F.array(*[F.lit(s) for s in STOPWORDS])))
    avg_tok_len = (n_chars - (n_tokens - 1)) / n_tokens
    df = (df
          .withColumn("n_tokens", n_tokens)
          .withColumn("punct_ratio", (F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
                                  + F.lit(0.0)))
          .withColumn("stopword_hits", stop_hits)
          .withColumn("avg_token_len", (F.round(avg_tok_len, 6) + F.lit(0.0))))
    score = (
        F.least(F.col("n_tokens") / 64.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_hits") / 5.0, F.lit(1.0)) * 0.3
        + F.when((F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 8),
                 0.3).otherwise(0.0)
    )
    return df.withColumn("quality_score", (F.round(score, 6) + F.lit(0.0)))


def lang_id_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language guess by marker-vocabulary voting: distinct-token hits
    per language, argmax with deterministic (score desc, lang asc)
    tie-break; 'und' when no marker hits."""
    toks = F.array_distinct(F.transform(F.split(F.col(text_col), " "),
                                        lambda t: F.lower(t)))
    scored = F.array(*[
        F.struct(
            F.size(F.array_intersect(
                toks, F.array(*[F.lit(m) for m in markers]))).alias("score"),
            F.lit(lang).alias("lang"))
        for lang, markers in sorted(LANG_MARKERS.items())
    ])
    # argmax with deterministic ties: ascending sort on (-score, lang),
    # first element = highest score, lexicographically smallest lang
    best = F.element_at(F.sort_array(F.transform(
        scored, lambda s: F.struct((-s["score"]).alias("neg"),
                                   s["lang"].alias("lang")))), 1)
    df = df.withColumn("__best", best)
    return (df
            .withColumn("lang_guess",
                        F.when(F.col("__best.neg") < 0, F.col("__best.lang"))
                        .otherwise(F.lit("und")))
            .withColumn("lang_score", -F.col("__best.neg"))
            .drop("__best"))


#: Karp–Rabin parameters (fixed, engine-portable: token values come from
#: md5 prefixes so Spark and any oracle engine agree bit-for-bit)
_KR_BASE = 1_000_003
_KR_MOD = 2_147_483_647  # 2^31 - 1; acc*B + x < 2^52 fits in a long


def rolling_hash_columns(df: DataFrame, k: int = 5,
                         text_col: str = "text") -> DataFrame:
    """Document fingerprint via a Karp–Rabin POLYNOMIAL ROLLING HASH:
    each k-token window hashes to ``fold(acc*B + tok) mod M`` where the
    per-token value is the first 8 hex chars of its md5 (engine-portable
    integers); the doc fingerprint is the minimum window hash — a
    content signature robust to reordering of distant parts. All native
    (split/transform/aggregate), no Python."""
    tokens = F.split(F.col(text_col), " ")
    tok_h = F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    win = F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(tok_h, i, k), F.lit(0).cast("long"),
            lambda acc, x: (acc * _KR_BASE + x) % _KR_MOD))
    return df.withColumn("rolling_fingerprint", F.array_min(win))


def fingerprint_columns(df: DataFrame, shingle_k: int = 5,
                        text_col: str = "text") -> DataFrame:
    """Document fingerprint: the minimum md5 over k-token shingles (a
    deterministic min-hash-style content signature robust to
    reordering of distant parts), plus a full-text md5."""
    tokens = F.split(F.col(text_col), " ")
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - (shingle_k - 1), F.lit(1)))
    shingles = F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice(tokens, i, shingle_k), " ")))
    return (df
            .withColumn("fingerprint", F.array_min(shingles))
            .withColumn("content_hash", F.md5(F.col(text_col))))
