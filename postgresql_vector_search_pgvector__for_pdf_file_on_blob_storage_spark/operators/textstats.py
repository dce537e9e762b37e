"""Text-analysis operators over document tables (SURVEY.md §2B B6 + the
training-data ops): per-doc stats/quality, corpus-level token frequencies,
language distribution.

All native expressions — these are pure scans + one aggregation, the shape
that runs at 100 TB (map-side partial aggs, 8-byte/short shuffle keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ..utils import spread

__all__ = ["doc_stats", "token_frequencies", "language_distribution"]


def doc_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality metrics + heuristic language id."""
    return spread(df).select(
        F.col(id_col),
        *X.quality_metrics(text_col),
        X.language_id(text_col).alias("lang_pred"),
        X.fingerprint64(text_col).alias("fp"),
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus token frequencies: explode -> groupBy(token).count().
    Partial aggregation collapses each partition's counts before the
    exchange, so the shuffle carries one row per distinct token per
    partition — the canonical word-count shape."""
    return (
        spread(df)
        .select(F.explode(X.word_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= F.lit(min_count))
    )


def language_distribution(
    df: DataFrame, text_col: str = "text", lang_col: str | None = None
) -> DataFrame:
    """Predicted-language histogram; when a labeled column exists, also the
    confusion pairs (label, prediction, n) for accuracy checks."""
    pred = X.language_id(text_col).alias("lang_pred")
    if lang_col is None:
        return df.select(pred).groupBy("lang_pred").agg(F.count("*").alias("n"))
    return (
        df.select(F.col(lang_col).alias("lang_label"), pred)
        .groupBy("lang_label", "lang_pred")
        .agg(F.count("*").alias("n"))
    )
