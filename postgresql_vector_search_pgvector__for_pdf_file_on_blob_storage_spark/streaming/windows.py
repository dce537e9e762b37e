"""Streaming windowed aggregation, watermarks, stateful dedup, and
sessionization (SURVEY.md §2B B13).

The reference has no watermark/late-data handling (blob triggers are its
only streaming semantics); these operators close the capability gap for the
``events`` stream fixture.  Every streaming aggregation here has a batch
twin (queries package: ``events_tumbling_agg``, ``sessionize_events``) so
correctness is checked batch-vs-stream on the same data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window count/sum per key.  In append mode a
    window emits once its end passes the watermark; late rows beyond the
    watermark are dropped (the batch twin keeps them — tested difference)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n",
            "total_value",
        )
    )


def stateful_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only while it
    can still receive a duplicate (inside the watermark) — the 100 TB-safe
    version of global dropDuplicates."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "60 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via the native session_window (merges rows
    closer than ``gap`` per key)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Batch sessionization — the classic lag + gap-flag + running-sum
    composition (one shuffle on the session key; both window functions share
    the same partitioning so Catalyst plans a single exchange+sort)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    gap_flag = (
        F.when(
            F.unix_micros(F.col(ts_col))
            - F.unix_micros(F.lag(ts_col).over(w))
            > gap_seconds * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    running = Window.partitionBy(key_col).orderBy(ts_col, "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn("__new_session", gap_flag).withColumn(
        "session_id", F.sum("__new_session").over(running).cast("long")
    ).drop("__new_session")
