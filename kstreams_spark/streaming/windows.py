"""Streaming windowed aggregations with watermarks (SURVEY.md §2.2:
windowedBy + until/late-data ↔ window()/session_window() + withWatermark).

These wrap the SAME aggregation expressions as the batch analogs in
operators/event_windows.py — one definition of the computation, two
execution modes, which is the point of building on Structured Streaming.

Watermarks bound state: a window is finalized (append mode) once the
watermark passes its end; later records are dropped — the declarative
version of Kafka Streams' retention `until()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstreams_spark.operators._util import dsum


def tumbling_agg_stream(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling count+sum per (window, event_type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


def sliding_agg_stream(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def session_agg_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def watermarked_dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup: dropDuplicates within the watermark horizon —
    state is purged as the watermark advances, so memory is bounded by
    (keys seen per horizon), not by stream length."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        (keys or ["user_id", "event_type"]) + ["ts"]
    )


def session_features_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of the batch per-session ML feature table
    (operators/analytics_extras.py::events_session_features): the same
    session_window grouping as session_agg_stream, widened with the
    per-type one-hot counts and the converted label — the feature rows
    a live propensity model consumes, emitted once per closed session
    in append mode (the suppress-until-window-closes shape). Parity
    with the batch query's (count, per-type, converted) columns on
    second-truncated input is pinned in tests/test_streaming.py."""

    def n_of(t: str):
        return (
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{t}")
        )

    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_of("view"),
            n_of("click"),
            n_of("purchase"),
            n_of("error"),
            n_of("signup"),
        )
    )
    return agg.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        "n_events",
        "n_view",
        "n_click",
        "n_purchase",
        "n_error",
        "n_signup",
        F.when(F.col("n_purchase") > 0, 1)
        .otherwise(0)
        .cast("long")
        .alias("converted"),
    )
