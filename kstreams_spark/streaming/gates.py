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


class StreamingPerplexityGate:
    """The learned-filter deploy path (r10 — the ingest-time twin of
    text_bigram_surprise, composed from the SAME expressions via
    operators/text.bigram_pairs / surprise_per_doc, so batch and stream
    cannot disagree about a score): fit() trains the bigram LM once and
    persists it as two parquet tables — the model-loader seam, exactly
    how a CCNet-style filter ships to an ingest cluster — then every
    arriving document is scored against the FROZEN model and split on
    the bits_per_bigram_x1000 threshold before it reaches the lake.

    Statefulness: NONE beyond the frozen model — scoring is a pure
    function of (batch, model), so replay semantics come entirely from
    the epoch-keyed sink and per-batch cost is batch-bigrams × the two
    model joins (ctx broadcast, bigram join shuffled on (w1, w2)). Docs
    with < 2 tokens carry no LM score and are dropped by bigram_pairs —
    route them through StreamingCurationGate's length gates instead."""

    def __init__(
        self, model_dir: str, scored_dir: str, max_bits_x1000: int
    ) -> None:
        self.model_dir = model_dir
        self.max_bits_x1000 = max_bits_x1000
        self.sink = ExactlyOnceParquetSink(scored_dir)
        self.batches_seen = 0

    def fit(self, train_docs: DataFrame) -> None:
        """Train-once: persist (w1, w2, big_n) and (w1, ctx_n). Refit =
        a new model_dir (frozen-model contract, like the quantizers).

        Crash-safe: both tables are written into one staging directory
        which is RENAMED into place (the repo's displace-swap idiom), so
        a crash between the two table writes leaves only staging debris
        — swept by the next fit — never a half-model that bricks both
        fit (freshness check) and process_batch (missing table)."""
        import os
        import shutil

        from kstreams_spark.operators.text import (
            bigram_pairs,
            surprise_lm_counts,
        )

        live = os.path.join(self.model_dir, "model")
        if os.path.isdir(live):
            raise ValueError("fit requires a fresh model_dir")
        staged = live + ".new-del"
        if os.path.isdir(staged):  # debris from a crashed fit
            shutil.rmtree(staged)
        big, ctx = surprise_lm_counts(bigram_pairs(train_docs))
        big.write.parquet(os.path.join(staged, "big"))
        ctx.coalesce(1).write.parquet(os.path.join(staged, "ctx"))
        os.rename(staged, live)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from kstreams_spark.operators.text import (
            bigram_pairs,
            surprise_per_doc,
        )
        import os

        self.batches_seen += 1
        spark = batch_df.sparkSession
        live = os.path.join(self.model_dir, "model")
        big = spark.read.parquet(os.path.join(live, "big"))
        ctx = spark.read.parquet(os.path.join(live, "ctx"))
        scored = surprise_per_doc(bigram_pairs(batch_df), big, ctx)
        self.sink.process_batch(
            scored.withColumn(
                "is_kept",
                F.col("bits_per_bigram_x1000") <= F.lit(self.max_bits_x1000),
            ),
            epoch_id,
        )

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def scored(self, spark: SparkSession) -> DataFrame:
        return self.sink.result(spark)
