"""Streaming incremental OHLC rollup — materialized-view maintenance for
the batch `events_ohlc_daily` bars (operators/analytics_extras.py): each
microbatch contributes per-(event_type, day) PARTIALS (its own
open/high/low/close plus the (sec, event_id) endpoints that justify the
open/close election), appended epoch-keyed; the served bars are one
aggregation over the partials at read time.

Why partials, not merged bars: OHLC is a semigroup — two partials merge
by (earlier-endpoint open, max high, min low, later-endpoint close,
summed n) — so an epoch-keyed APPEND-ONLY table + read-time merge is
replay-insensitive by construction (the pair_index protocol every
streaming index in this repo follows): a replayed epoch hits the
exactly-once sink's no-op, and the merge never double-counts. In-place
bar mutation would need the full batch-vs-stored conflict dance and a
transactional table; this shape needs neither.

At 100 TB: a day's bar updates without re-scanning history — the whole
point of a continuous aggregate; partials per epoch are ≤ |types|·|days
touched by the batch| rows; compact old epochs with
ExactlyOnceParquetSink.compact().

Batch/stream parity (any split of the events into microbatches equals
the batch query exactly, including open/close tie semantics via the
unique (sec, event_id) order) is pinned in tests/test_streaming_rollup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink


def _partials(batch_df: DataFrame) -> DataFrame:
    """Per-(event_type, day) OHLC partial for ONE batch: the batch-local
    bar plus its endpoint keys. Same two-window/one-exchange shape as
    the batch operator."""
    ev = batch_df.select(
        "event_type",
        "value",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.date_trunc("day", "ts").alias("day"),
    )
    wa = Window.partitionBy("event_type", "day").orderBy("sec", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("sec").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "event_type",
        "day",
        "value",
        "sec",
        "event_id",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "day").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("sec"))).alias("first_sec"),
        F.min(F.when(F.col("rn_a") == 1, F.col("event_id"))).alias("first_id"),
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("sec"))).alias("last_sec"),
        F.min(F.when(F.col("rn_d") == 1, F.col("event_id"))).alias("last_id"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


class StreamingOhlcRollup:
    """foreachBatch maintainer: events stream → epoch-keyed OHLC
    partials in `out_dir`; `bars()` serves the merged view."""

    def __init__(self, out_dir: str) -> None:
        self.sink = ExactlyOnceParquetSink(out_dir)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.sink.is_committed(epoch_id):
            return
        self.sink.process_batch(_partials(batch_df), epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def bars(self, spark: SparkSession) -> DataFrame:
        """The served continuous aggregate: merge all committed partials
        into final bars — open/close elected by the global endpoint
        order across epochs, high/low/n by max/min/sum."""
        parts = self.sink.result(spark)
        if "event_type" not in parts.columns:
            return parts  # nothing committed yet
        wa = Window.partitionBy("event_type", "day").orderBy(
            "first_sec", "first_id"
        )
        wd = Window.partitionBy("event_type", "day").orderBy(
            F.col("last_sec").desc(), F.col("last_id").desc()
        )
        ranked = parts.select(
            "event_type",
            "day",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            F.row_number().over(wa).alias("rn_a"),
            F.row_number().over(wd).alias("rn_d"),
        )
        return ranked.groupBy("event_type", "day").agg(
            F.min(F.when(F.col("rn_a") == 1, F.col("open"))).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.min(F.when(F.col("rn_d") == 1, F.col("close"))).alias("close"),
            F.sum("n_events").cast("long").alias("n_events"),
        )


def _twap_partials(batch_df: DataFrame) -> DataFrame:
    """Per-(event_type, day) TWAP partial for one TIME-CONTIGUOUS
    microbatch: within-batch Σvalue·dt and Σdt over LOCF holds, plus the
    batch's endpoint readings so adjacent partials can bridge."""
    ev = batch_df.select(
        "event_type",
        "value",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.date_trunc("day", "ts").alias("day"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("sec", "event_id")
    wa = w  # ascending endpoint election
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("sec").desc(), F.col("event_id").desc()
    )
    seq = ev.select(
        "event_type",
        "day",
        "value",
        "sec",
        "event_id",
        (F.lead("sec").over(w) - F.col("sec")).alias("dt"),
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return seq.groupBy("event_type", "day").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("sec"))).alias("first_sec"),
        F.min(F.when(F.col("rn_a") == 1, F.col("event_id"))).alias("first_id"),
        F.min(F.when(F.col("rn_d") == 1, F.col("sec"))).alias("last_sec"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("last_value"),
        F.sum(
            F.when(
                F.col("dt").isNotNull(),
                (F.col("value") * F.col("dt")).cast("decimal(18,6)"),
            )
        ).alias("sum_vdt"),
        F.sum(F.when(F.col("dt").isNotNull(), F.col("dt"))).alias("sum_dt"),
        F.count(F.lit(1)).alias("n_obs"),
    )


class StreamingTwapRollup:
    """Incremental time-weighted-average maintenance — the continuous-
    aggregate twin of events_time_weighted_avg, with a genuinely
    NON-TRIVIAL merge: unlike OHLC (a plain semigroup), TWAP partials
    only merge when epochs are TIME-DISJOINT AND ORDERED per key — the
    streaming reality (watermarked, in-order arrival), and the same
    contract TimescaleDB's continuous aggregates place on their chunks.
    The read-time merge bridges adjacent partials with the LOCF hold
    last_value(i)·(first_sec(i+1) − last_sec(i)) — exactly the weight
    the batch query assigns across that boundary, so any time-split
    replay equals the batch answer (pinned in tests)."""

    def __init__(self, out_dir: str) -> None:
        self.sink = ExactlyOnceParquetSink(out_dir)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.sink.is_committed(epoch_id):
            return
        self.sink.process_batch(_twap_partials(batch_df), epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def bars(self, spark: SparkSession) -> DataFrame:
        parts = self.sink.result(spark)
        if "event_type" not in parts.columns:
            return parts
        w = Window.partitionBy("event_type", "day").orderBy(
            "first_sec", "first_id"
        )
        bridged = parts.select(
            "event_type",
            "day",
            "sum_vdt",
            "sum_dt",
            "n_obs",
            (F.lead("first_sec").over(w) - F.col("last_sec")).alias("bdt"),
            F.col("last_value").alias("bval"),
        )
        agg = bridged.groupBy("event_type", "day").agg(
            (
                F.sum(F.coalesce(F.col("sum_vdt"), F.lit(0).cast("decimal(18,6)")))
                + F.sum(
                    F.when(
                        F.col("bdt").isNotNull(),
                        (F.col("bval") * F.col("bdt")).cast("decimal(18,6)"),
                    ).otherwise(F.lit(0).cast("decimal(18,6)"))
                )
            ).alias("vdt"),
            (
                F.sum(F.coalesce(F.col("sum_dt"), F.lit(0)))
                + F.sum(F.coalesce(F.col("bdt"), F.lit(0)))
            ).alias("dt"),
            F.sum("n_obs").alias("n_rows"),
        )
        # group retention must match the batch twin's WHERE dt IS NOT
        # NULL: a day with >=2 events is emitted even when they all
        # share one second (dt sums to 0 → twa NULL via the nullif,
        # covered_s 0). Filtering dt > 0 dropped that degenerate group
        # stream-side only (ADVICE r7).
        return agg.filter(F.col("n_rows") >= 2).select(
            "event_type",
            "day",
            (
                F.col("vdt").cast("double")
                / F.nullif(F.col("dt"), F.lit(0))
            ).alias("twa"),
            (F.col("n_rows") - 1).cast("long").alias("n_holds"),
            F.col("dt").cast("long").alias("covered_s"),
        )
