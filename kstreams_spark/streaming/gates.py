"""Streaming curation gate — the ingest-time form of the curation
composites' FIRST stage: every arriving document is scored with the
same C4 quality scalar and Gopher repetition metric the batch pipelines
gate on, and split into kept vs dropped BEFORE it lands in the lake
(the cheapest possible rejection point: scan-shaped expressions, no
state, no shuffle beyond the epoch write).

Statelessness mirrors streaming/decontam.py: quality is a per-document
property, so per-batch cost is batch-sized and replay needs no merge
logic — exactly-once comes from the epoch-keyed sinks, committed
dropped-then-kept (a replayed epoch whose dropped side is committed
skips nothing it shouldn't: both sides are pure functions of the
batch).

The gate EXPRESSIONS are imported from the batch side
(text.c4_quality_expr, the Gopher dup-2-gram builder, DUP2_GATE), so
streaming and batch can never disagree about what 'kept' means —
pinned by the batch-parity test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.text import (
    DUP2_GATE,
    c4_quality_expr,
    spark_dup_char_frac,
    spark_ngram_arr,
)
from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

QUALITY_GATE = 0.5  # same threshold as every curation composite


def gate_scored(batch_df: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → same rows + (quality, dup2, is_kept)."""
    d = batch_df.withColumn("toks", F.split(F.col("text"), " "))
    scored = d.withColumn(
        "quality", c4_quality_expr(F.col("toks"))
    ).withColumn(
        "dup2", F.expr(spark_dup_char_frac(spark_ngram_arr(2)))
    )
    return scored.drop("toks").withColumn(
        "is_kept",
        (F.col("quality") >= QUALITY_GATE) & (F.col("dup2") <= DUP2_GATE),
    )


class StreamingCurationGate:
    """foreachBatch splitter: document stream → `kept_dir` (rows passing
    the quality + repetition gates, scores attached) + `dropped_dir`
    (the rejects with the same scores, for auditing)."""

    def __init__(self, kept_dir: str, dropped_dir: str) -> None:
        self.kept_sink = ExactlyOnceParquetSink(kept_dir)
        self.dropped_sink = ExactlyOnceParquetSink(dropped_dir)
        self.batches_seen = 0

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        scored = gate_scored(batch_df)
        self.dropped_sink.process_batch(
            scored.filter(~F.col("is_kept")).drop("is_kept"), epoch_id
        )
        self.kept_sink.process_batch(
            scored.filter(F.col("is_kept")).drop("is_kept"), epoch_id
        )

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def kept(self, spark: SparkSession) -> DataFrame:
        return self.kept_sink.result(spark)

    def dropped(self, spark: SparkSession) -> DataFrame:
        return self.dropped_sink.result(spark)
