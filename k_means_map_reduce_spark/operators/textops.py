"""Text-analysis queries over `documents` (SURVEY.md §2b LLM-pipeline, M3).

All hot-path logic is Column expressions from functions/text.py — zero Python
UDFs, so at corpus scale this is a single codegen'd scan + one shuffle for
the aggregating variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from ..functions.text import (
    lang_id,
    punct_ratio,
    token_count,
    word_count,
)

_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "text_stats_per_doc",
    oracle=f"""
    SELECT
      doc_id,
      LENGTH(text) AS n_chars_measured,
      CAST(len(list_filter(string_split_regex(TRIM(text), '\\s+'), t -> t != '')) AS INT) AS n_words,
      CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS INT) AS n_tokens,
      ROUND(CASE WHEN LENGTH(text) > 0
        THEN CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / LENGTH(text)
        ELSE 0.0 END, 8) AS punct_ratio
    FROM documents
    """,
)
def text_stats_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_measured"),
        word_count(F.col("text")).alias("n_words"),
        token_count(F.col("text")).alias("n_tokens"),
        F.round(punct_ratio(F.col("text")), 8).alias("punct_ratio"),
    )


@query(
    "text_stats_by_lang",
    oracle="""
    SELECT
      lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      CAST(SUM(CAST(len(list_filter(string_split_regex(TRIM(text), '\\s+'), t -> t != '')) AS BIGINT)) AS BIGINT) AS total_words
    FROM documents
    GROUP BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(word_count(F.col("text")).cast("bigint")).alias("total_words"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT
      doc_id,
      md5(LOWER(regexp_replace(TRIM(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5 content fingerprint of whitespace-normalized text (cross-engine
    checkable). The scale path uses xxhash64 (functions.doc_fingerprint) —
    same plan shape, cheaper hash."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


@query("text_lang_id")
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID crossed with the dataset's lang column
    (rows-only; the synthetic corpus draws the same vocabulary for every
    label, so this is a distribution report, not an accuracy claim —
    real-language identification is asserted in tests/test_textops.py on
    hand-written multilingual samples)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_id(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_ngram_profile",
    oracle="""
    WITH doc_toks AS (
      SELECT list_filter(string_split_regex(TRIM(LOWER(text)), '\\s+'), t -> t != '') AS toks
      FROM documents
    ),
    bigrams AS (
      SELECT UNNEST(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM doc_toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM bigrams
    GROUP BY bigram
    HAVING COUNT(*) >= 10
    """,
)
def text_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (n-gram profile): explode per-doc token bigrams,
    hash-aggregate. At 100 TB this is the canonical explode→agg shape with
    map-side partial aggregation absorbing the fan-out."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != "")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 10)
    )


@query("text_quality_scores")
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality + stopword signals per doc (rows-only; formula
    bounds and determinism asserted in tests/test_textops.py)."""
    from ..functions.text import quality_score, stopword_ratio

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        F.round(stopword_ratio(F.col("text"), "en"), 6).alias("en_stopword_ratio"),
    )
