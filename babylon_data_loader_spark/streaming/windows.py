"""Streaming event analytics: watermarked tumbling/sliding windows and
session windows over an events stream (SURVEY.md §2.7 — absent from
the reference, required by the north star).

The batch twins of these live in queries/analytics.py
(q_sessionize); these functions accept either a static or streaming
DataFrame with (ts TIMESTAMP, user_id, event_type, value) and return
plans that run under `writeStream` with late-data handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts_ts",
) -> DataFrame:
    """Per-type event counts in tumbling windows; watermark bounds
    state and admits late rows up to the horizon."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts_ts",
) -> DataFrame:
    """Sliding-window mean value per event type."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration, slide).alias("win"),
            "event_type",
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,2)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_value")
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "avg_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts_ts",
) -> DataFrame:
    """Native session windows (gap-based), the streaming twin of
    q_sessionize."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
