"""Text-analysis operators for training-data pipelines: language ID
(stopword-marker heuristic), quality scoring, token counting, and
document fingerprinting — all native Spark expressions (JVM-side,
whole-stage codegen; no Python UDFs).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality filters (Rae et al. 2021, App. A)
# ---------------------------------------------------------------------------

#: published Gopher filter thresholds (Rae et al. 2021, "Scaling
#: Language Models: Methods, Analysis & Insights from Training Gopher",
#: Table A1): documents FAIL when a metric exceeds its bound.
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_frac": 0.8,
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_top_2gram_char_frac": 0.20,
    "max_top_3gram_char_frac": 0.18,
    "max_top_4gram_char_frac": 0.16,
    "max_dup_5gram_char_frac": 0.15,
}


def _word_ngrams(words_col, n: int):
    size = F.size(words_col)
    idx = F.sequence(F.lit(1), size - (n - 1))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(words_col, i, n), " "))
    return F.when(size >= n, grams).otherwise(
        F.array().cast("array<string>"))


def gopher_repetition_columns(docs: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              line_sep: str = "\n") -> DataFrame:
    """Per-document repetition + quality signals from the Gopher data
    pipeline, each defined exactly so the DuckDB twin can reproduce it:

    - ``dup_line_frac`` = (lines - distinct lines) / lines and
      ``dup_line_char_frac`` = chars in occurrences beyond the first /
      total line chars (``line_sep`` is a literal separator; pass
      ``". "`` for sentence-level on single-line corpora);
    - ``top_{2,3,4}gram_char_frac`` = count*len of the most frequent
      word n-gram (ties: the longest) / document chars;
    - ``dup_5gram_char_frac`` = sum of count*len over word 5-grams
      occurring more than once / total 5-gram chars;
    - ``symbol_word_ratio`` = ('#' count + '...' count) / words;
    - ``alpha_word_frac`` = words containing an ASCII letter / words;
    - ``mean_word_len``, ``n_words``;
    - ``gopher_pass`` = every GOPHER_THRESHOLDS bound satisfied.

    All native expressions: explode -> partial-aggregable groupBy per
    signal, re-joined on the doc id (each sub-aggregate is one row per
    document, so the final joins are doc-keyed equi-joins). No Python.
    """
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    words = F.split(F.col(text_col), " ")
    n_chars = F.length(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        words.alias("__words"),
        F.size(words).alias("n_words"),
        F.split(F.col(text_col), _re.escape(line_sep)).alias("__lines"),
        (n_chars - F.length(F.regexp_replace(F.col(text_col), "#", "")))
        .alias("__hashes"),
        ((n_chars - F.length(F.regexp_replace(F.col(text_col),
                                              r"\.\.\.", ""))) / 3)
        .alias("__ellipses"),
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        .alias("__alpha_words"))

    lx = base.select(id_col, F.explode("__lines").alias("line"))
    lg = lx.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("c"))
    la = lg.groupBy(id_col).agg(
        F.sum("c").alias("__n_lines"),
        F.count(F.lit(1)).alias("__n_distinct"),
        F.sum((F.col("c") - 1) * F.length("line")).alias("__dup_chars"),
        F.sum(F.col("c") * F.length("line")).alias("__line_chars"))

    out = base.join(la, id_col, "left")

    w_doc = Window.partitionBy(id_col)
    for n in (2, 3, 4):
        gx = base.select(id_col,
                         F.explode(_word_ngrams(F.col("__words"), n))
                         .alias("g"))
        gg = gx.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        ga = (gg.withColumn("__maxc", F.max("c").over(w_doc))
              .groupBy(id_col)
              .agg(F.max(F.when(F.col("c") == F.col("__maxc"),
                                F.col("c") * F.length("g")))
                   .alias(f"__top{n}chars")))
        out = out.join(ga, id_col, "left")

    g5 = base.select(id_col,
                     F.explode(_word_ngrams(F.col("__words"), 5)).alias("g"))
    gg5 = g5.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    ga5 = gg5.groupBy(id_col).agg(
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("g")))
        .alias("__dup5chars"),
        F.sum(F.col("c") * F.length("g")).alias("__tot5chars"))
    out = out.join(ga5, id_col, "left")

    nc = F.greatest(F.col("n_chars"), F.lit(1))
    nw = F.greatest(F.col("n_words"), F.lit(1))
    mean_word_len = (F.col("n_chars") - (F.col("n_words") - 1)) / nw
    metrics = {
        "mean_word_len": r6(mean_word_len),
        "dup_line_frac": r6((F.col("__n_lines") - F.col("__n_distinct"))
                            / F.greatest(F.col("__n_lines"), F.lit(1))),
        "dup_line_char_frac": r6(
            F.coalesce(F.col("__dup_chars"), F.lit(0))
            / F.greatest(F.col("__line_chars"), F.lit(1))),
        "top_2gram_char_frac": r6(
            F.coalesce(F.col("__top2chars"), F.lit(0)) / nc),
        "top_3gram_char_frac": r6(
            F.coalesce(F.col("__top3chars"), F.lit(0)) / nc),
        "top_4gram_char_frac": r6(
            F.coalesce(F.col("__top4chars"), F.lit(0)) / nc),
        "dup_5gram_char_frac": r6(
            F.coalesce(F.col("__dup5chars"), F.lit(0))
            / F.greatest(F.col("__tot5chars"), F.lit(1))),
        "symbol_word_ratio": r6(
            (F.col("__hashes") + F.col("__ellipses")) / nw),
        "alpha_word_frac": r6(F.col("__alpha_words") / nw),
    }
    for name, expr in metrics.items():
        out = out.withColumn(name, expr)
    t = GOPHER_THRESHOLDS
    gopher_pass = (
        (F.col("n_words") >= t["min_words"])
        & (F.col("n_words") <= t["max_words"])
        & (F.col("mean_word_len") >= t["min_mean_word_len"])
        & (F.col("mean_word_len") <= t["max_mean_word_len"])
        & (F.col("symbol_word_ratio") <= t["max_symbol_word_ratio"])
        & (F.col("alpha_word_frac") >= t["min_alpha_word_frac"])
        & (F.col("dup_line_frac") <= t["max_dup_line_frac"])
        & (F.col("dup_line_char_frac") <= t["max_dup_line_char_frac"])
        & (F.col("top_2gram_char_frac") <= t["max_top_2gram_char_frac"])
        & (F.col("top_3gram_char_frac") <= t["max_top_3gram_char_frac"])
        & (F.col("top_4gram_char_frac") <= t["max_top_4gram_char_frac"])
        & (F.col("dup_5gram_char_frac") <= t["max_dup_5gram_char_frac"]))
    return out.select(
        id_col, "n_words", *metrics.keys(),
        gopher_pass.alias("gopher_pass"))


# ---------------------------------------------------------------------------
# PII scrubbing (training-data redaction pass)
# ---------------------------------------------------------------------------

#: shared Java-regex/RE2 subset so the Spark expressions and the DuckDB
#: twin compile the same automata
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d()\- ]{7,}\d",
}


def pii_scrub_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses and international-format phone
    numbers from the text (each replaced by a typed placeholder token,
    applied in PII_PATTERNS order) and attach per-category match
    counts — the standard scrub pass before a corpus leaves the
    pipeline. Native regexp expressions only."""
    out = df
    redacted = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(text_col,
                                                     F.lit(pat), 0)))
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return out.withColumn("scrubbed", redacted)


# ---------------------------------------------------------------------------
# corpus bigram LM perplexity (statistical quality signal)
# ---------------------------------------------------------------------------

def bigram_perplexity_columns(docs: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              k: float = 0.5) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed bigram model
    trained on the corpus itself — the classic KenLM-style quality
    signal (gibberish and boilerplate score high, typical text low)
    without an external model: p(w2|w1) = (c(w1 w2) + k) /
    (c(w1) + k*V), cross_entropy = -mean ln p over the document's
    bigrams, perplexity = exp(cross_entropy). Documents with fewer
    than 2 tokens get NULLs.

    Scale: two corpus-wide gram-count aggregates (partial-aggregable
    groupBys) joined back on the gram key — standard key-partitioned
    shuffles, no broadcast of the (large) model tables, no Python."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    toks = docs.select(F.col(id_col), F.explode(words).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    pair_t = "array<struct<w1:string,w2:string>>"
    pairs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(F.element_at(words, i).alias("w1"),
                           F.element_at(words, i + 1).alias("w2")))) \
        .otherwise(F.array().cast(pair_t))
    big = (docs.select(F.col(id_col), F.explode(pairs).alias("p"))
           .select(id_col, F.col("p.w1").alias("w1"),
                   F.col("p.w2").alias("w2")))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (big.join(bc, ["w1", "w2"])
              .join(uni.withColumnRenamed("w", "w1"), "w1")
              .crossJoin(F.broadcast(vocab)))
    lp = F.log((F.col("c2") + F.lit(k))
               / (F.col("c1") + F.lit(k) * F.col("v")))
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg(lp)).alias("__ce"))
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return (docs.select(id_col).join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    r6(F.col("__ce")).alias("cross_entropy"),
                    r6(F.exp("__ce")).alias("perplexity")))
