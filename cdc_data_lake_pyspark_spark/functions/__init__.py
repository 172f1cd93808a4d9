"""Scalar/array function surface: text analysis for LLM-data pipelines."""

from cdc_data_lake_pyspark_spark.functions.text import (
    tokens,
    token_count,
    char_stats,
    shingles,
    doc_fingerprint,
    language_scores,
    language_id,
    quality_score,
    STOPWORDS,
)

__all__ = [
    "tokens",
    "token_count",
    "char_stats",
    "shingles",
    "doc_fingerprint",
    "language_scores",
    "language_id",
    "quality_score",
    "STOPWORDS",
]
