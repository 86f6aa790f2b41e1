"""Text-analysis expressions for the LLM-data-pipeline surface.

All JVM-side Column expressions (regexp / split / higher-order functions) —
no Python UDFs — so they stream through whole-stage codegen over arbitrarily
large document tables.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword lists for the n-gram/stopword language-ID heuristic. Deliberately
# tiny: language ID here is a cheap pre-filter, not a classifier.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "dans"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty strings dropped."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def word_count(text: Column) -> Column:
    return F.size(tokens(text))


def token_count(text: Column) -> Column:
    """BPE-ish subword token estimate: word-parts, numbers, punctuation runs.

    Counts matches of a GPT-2-style pre-tokenizer regex (letters runs, digit
    runs, punctuation) — a deterministic proxy for tokenizer cost accounting
    at corpus scale.
    """
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))



def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    total = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(text))
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, n_sw.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic document-quality score in [0, 1].

    Blend of: reasonable length (saturating at 1000 chars), low punctuation
    ratio, mean word length in a sane band. Deterministic, expression-only.
    """
    length_component = F.least(F.length(text).cast("double") / 1000.0, F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    mean_wl = F.when(
        word_count(text) > 0,
        (F.length(F.regexp_replace(text, r"\s+", "")).cast("double"))
        / word_count(text).cast("double"),
    ).otherwise(F.lit(0.0))
    wl_component = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (length_component + punct_component + wl_component) / F.lit(3.0)


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over LANG_STOPWORDS; 'und' if no votes."""
    toks = tokens(F.lower(text))
    votes = []
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        votes.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.element_at(F.array_sort(F.array(*votes)), -1)
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of whitespace-normalized text.

    The rolling-hash idea from content-defined fingerprinting collapses to a
    single JVM hash over the normalized text for whole-document identity.
    """
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.xxhash64(normalized)
