"""Text-analysis column functions: tokens, quality, language-ID, fingerprints.

Training-data-pipeline scalar surface over a ``text`` column. Every
function is a composition of built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen — no Python in the hot path) chosen to have exact
DuckDB-oracle equivalents:

* token counting — whitespace tokens and a BPE-ish regex token count
* quality scoring — length / punctuation / stopword / repetition ratios
* language ID — stopword-marker scoring over a fixed language set
  (n-gram/marker heuristic; on the synthetic fixture corpus all texts
  draw from one word pool, so the *formula* — not corpus accuracy — is
  what the oracle verifies)
* fingerprinting — md5 content fingerprint over normalized text
  (rolling/Rabin-style hashes are in operators/dedup.py as SimHash)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer: word pieces, numbers, or single non-space symbols —
# a public-knowledge approximation of byte-pair pretokenization
# (GPT-2-style contraction/word/number/symbol split).
BPE_ISH_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Tiny per-language stopword markers (public common-word lists).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "une"],
    "zh": [],  # detected by Han-script ratio instead
}


def ws_token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens (letters runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_REGEX), 0))


def punct_ratio(col: Column) -> Column:
    """Non-alphanumeric-non-space chars / total chars."""
    stripped = F.regexp_replace(col, r"[^a-zA-Z0-9\s]", "")
    return (F.length(col) - F.length(stripped)) / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column, stopwords: list[str]) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    hits = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return hits / F.greatest(F.size(words), F.lit(1))


def han_ratio(col: Column) -> Column:
    """Fraction of characters in the CJK unified block (language cue)."""
    han = F.length(col) - F.length(F.regexp_replace(col, "[一-鿿]", ""))
    return han / F.greatest(F.length(col), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, 1].

    Rewards mid-length documents and real-word density; penalizes
    punctuation soup and token repetition (distinct/total ratio).
    Mirrors public web-corpus filtering recipes (C4/Gopher-style rules)
    in a declarative, oracle-checkable form.
    """
    n = F.length(col)
    words = F.split(F.lower(F.trim(col)), r"\s+")
    n_words = F.greatest(F.size(words), F.lit(1))
    distinct_ratio = F.size(F.array_distinct(words)) / n_words
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    avg_word_len = n / n_words
    wordlen_score = F.when((avg_word_len >= 3) & (avg_word_len <= 10), 1.0).otherwise(0.5)
    # +1e-9 before rounding: component weights produce exact quarter
    # fractions that land on round-4 ties, where engines' last-ulp
    # doubles disagree; the shared epsilon shifts ties off the boundary.
    return F.round(
        F.lit(0.4) * len_score
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.2) * wordlen_score
        + F.lit(0.1) * (1 - punct_ratio(col))
        + F.lit(1e-9),
        4,
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker scores (zh scored by Han-script ratio)."""
    scores = {
        lang: stopword_ratio(col, mk) for lang, mk in LANG_MARKERS.items() if mk
    }
    scores["zh"] = han_ratio(col)
    return scores


def lang_id(col: Column) -> Column:
    """Marker-word language classifier over {en, de, es, fr, zh}.

    Argmax of marker scores with fixed tie priority en > de > es > fr >
    zh; all-zero scores fall back to 'en' — fully deterministic, and the
    scores are exact small-integer ratios, so the DuckDB oracle's
    comparisons agree bit-for-bit.
    """
    s = lang_scores(col)
    argmax = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            F.lit("en"),
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), F.lit("de"))
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), F.lit("es"))
        .when(s["fr"] >= s["zh"], F.lit("fr"))
        .otherwise(F.lit("zh"))
    )
    all_zero = (s["en"] <= 0) & (s["de"] <= 0) & (s["es"] <= 0) & (s["fr"] <= 0) & (s["zh"] <= 0)
    return F.when(all_zero, F.lit("en")).otherwise(argmax)


def content_fingerprint(col: Column) -> Column:
    """md5 fingerprint of normalized content (exact-dup key)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.md5(c)
