"""Text analysis operators: quality stats, token counting, fingerprinting,
language-ID heuristic. All JVM-side built-ins (regexp/split/length) — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PUNCT_CLASS = "[.,!?;:]"
DIGIT_CLASS = "[0-9]"
# a BPE-ish tokenizer: words | numbers | any other non-space symbol
BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}


def text_stats(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: chars, bytes, words, punct/digit
    counts, mean word length, stopword count (en)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, " ")
    n_words = F.size(F.filter(words, lambda w: w != ""))
    punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    digits = n_chars - F.length(F.regexp_replace(t, DIGIT_CLASS, ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stops = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    return docs.select(
        F.col(key_col),
        n_chars.cast("bigint").alias("n_chars"),
        F.octet_length(t).cast("bigint").alias("n_bytes"),
        n_words.cast("bigint").alias("n_words"),
        punct.cast("bigint").alias("n_punct"),
        digits.cast("bigint").alias("n_digits"),
        stops.cast("bigint").alias("n_stopwords_en"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Simple [0,1] quality heuristic: length band + stopword presence -
    punctuation/digit excess. Deterministic arithmetic over text_stats."""
    s = text_stats(docs, text_col, key_col)
    length_ok = F.when((F.col("n_chars") >= 50) & (F.col("n_chars") <= 10000), 0.4).otherwise(0.0)
    stop_ok = F.least(F.col("n_stopwords_en").cast("double") / 5.0, F.lit(1.0)) * 0.4
    punct_pen = F.least(F.col("n_punct").cast("double") / F.greatest(F.col("n_chars"), F.lit(1)) * 4, F.lit(0.2))
    digit_pen = F.least(F.col("n_digits").cast("double") / F.greatest(F.col("n_chars"), F.lit(1)) * 2, F.lit(0.2))
    return s.select(
        key_col,
        F.round(length_ok + stop_ok + F.lit(0.2) - punct_pen - digit_pen, 4).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens and BPE-ish regex tokens per document."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, " "), lambda w: w != ""))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH), 0))
    return docs.select(
        F.col(key_col),
        ws.cast("bigint").alias("n_ws_tokens"),
        bpe.cast("bigint").alias("n_bpe_tokens"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 hex + a 60-bit integer fingerprint (md5
    prefix) usable as a dedup/bucketing key."""
    t = F.col(text_col)
    md5 = F.md5(t)
    fp60 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("bigint")
    return docs.select(F.col(key_col), md5.alias("md5"), fp60.alias("fp60"))


def langid(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language-ID heuristic: argmax language by stopword
    hits, 'unknown' when nothing matches. JVM-side only."""
    words = F.split(F.col(text_col), " ")
    scores = []
    for lang, sw in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in sw])
        scores.append(
            F.struct(
                F.size(F.filter(words, lambda w: F.array_contains(arr, w))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(key_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


def pattern_counts(docs, text_col: str = "text", key_col: str = "doc_id"):
    """Per-document counts of common scrub-list patterns (emails, URLs,
    digit runs) — the first pass of any PII/quality filter. Pure JVM
    regexp_count expressions (whole-stage codegen, no Python)."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    return docs.select(
        key_col,
        F.regexp_count(t, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"))
        .cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(r"https?://[^ ]+")).cast("bigint").alias("n_urls"),
        F.regexp_count(t, F.lit(r"[0-9]+")).cast("bigint").alias("n_digit_runs"),
    )
