"""Text analysis operators for corpus curation — all built-in
``pyspark.sql.functions`` (JVM-side, whole-stage codegen); no Python in
the hot path.

Each operator is expressible in ANSI SQL too (the DuckDB oracle in
``__spark_entry__.py`` verifies them at sf0.01), so every definition
here is deliberately deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword sets per language for the n-gram-free
# heuristic language ID. Deterministic, no model downloads.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "con", "por", "del"],
    "pt": ["o", "os", "uma", "para", "com", "por", "mais", "das", "dos", "em"],
}

# A BPE-ish token proxy: words, numbers, or single punctuation marks —
# the standard cheap token-count used for corpus budgeting.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Approximate token count: regexp extraction count (JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def word_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def _count_markers(text_lower: Column, words: list[str]) -> Column:
    """How many distinct marker words of a language occur in the text."""
    out = F.lit(0)
    for w in words:
        out = out + F.when(
            text_lower.rlike(r"(^|[^a-z])" + w + r"([^a-z]|$)"), 1
        ).otherwise(0)
    return out


def lang_id(text: Column) -> Column:
    """Heuristic language ID: the language whose stopword markers hit
    most (ties resolved in fixed key order); 'und' if nothing hits.

    argmax via array_max over (score, rank, lang) structs — rank =
    reverse key position, so a score tie picks the EARLIER key, same
    semantics as the fold-of-whens this replaces. The when-fold nested
    each comparison inside every later one and the generated code for
    the q23 gate blew janino's 64 KB method limit (whole-stage codegen
    fell back to interpreted with a noisy stack trace); the array form
    codegens compactly."""
    low = F.lower(text)
    scores = [(lang, _count_markers(low, ws)) for lang, ws in _LANG_MARKERS.items()]
    n = len(scores)
    best = F.array_max(F.array(*[
        F.struct(score.alias("s"), F.lit(n - i).alias("r"),
                 F.lit(lang).alias("l"))
        for i, (lang, score) in enumerate(scores)
    ]))
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + alpha ratio +
    punctuation sanity + mean word length band. Mirrors the usual
    Gopher/C4-style heuristics in pure column algebra."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    words = word_count(text)
    mean_wl = alpha / F.greatest(words, F.lit(1))
    len_ok = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(0.0)
    alpha_ratio = alpha / F.greatest(n, F.lit(1))
    punct_ok = F.when(punct / F.greatest(words, F.lit(1)) <= 0.3, 1.0).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 2.5) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    return F.round(
        0.25 * len_ok + 0.5 * alpha_ratio + 0.15 * punct_ok + 0.1 * wl_ok, 6
    )


def fingerprint64(text: Column) -> Column:
    """Document fingerprint: xxhash64 of whitespace-normalized,
    lowercased text — the exact-dedup key that survives trivial
    formatting differences."""
    return F.xxhash64(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_words", word_count(t))
        .withColumn("lang_pred", lang_id(t))
        .withColumn("quality", quality_score(t))
        .withColumn("fingerprint", fingerprint64(t))
    )
