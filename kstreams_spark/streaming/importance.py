"""Streaming hashed-importance scoring — the ingest-time twin of
operators/sampling.py's sample_importance_hashed (DSIR-shaped): documents
arrive as a stream, each batch is scored against the target/raw bucket
distributions of EVERYTHING ingested so far (accumulated count index ∪
the batch itself), and (doc_id, n_tokens, imp_score, is_selected) lands
epoch-keyed before the raw text reaches the lake.

The index is an epoch-keyed APPEND-ONLY table of per-bucket partial
counts (bucket, r, t) — the pair_index protocol: no in-place merge, the
true counts are SUM across epochs at read time, and exactly-once commits
make the sum replay-insensitive. Commit order is scores-then-index.

Baseline identity: the batch operator's selection baseline (Σ doc scores
// Σ doc tokens over the corpus) equals Σ_b r_b·w_b // Σ_b r_b over the
bucket counts, so the streaming form needs NO per-doc history — the
count index alone reproduces the batch baseline over past ∪ present
(single whole-corpus batch == the batch operator bit-for-bit, pinned in
tests/test_streaming_importance.py).

At 100 TB: the index is ≤ 4096 rows per epoch regardless of batch size;
compact epochs with ExactlyOnceParquetSink.compact().
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.classify import N_BUCKETS, bucket_sql
from kstreams_spark.operators.sampling import IMP_SCALE, IMP_TARGET_LANG
from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink


def _bucket_counts(batch_df: DataFrame, target_lang: str) -> DataFrame:
    toks = batch_df.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "doc_id",
        "lang",
        F.expr(bucket_sql("tok")).cast("long").alias("bucket"),
    )
    return toks, toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("r"),
        F.sum(
            F.when(F.col("lang") == target_lang, 1).otherwise(0)
        ).alias("t"),
    )


class StreamingImportanceScorer:
    """foreachBatch scorer: (doc_id, text, lang) stream → `scores_dir`
    rows (doc_id, n_tokens, imp_score, is_selected), while `index_dir`
    accumulates per-bucket (r, t) count partials."""

    def __init__(
        self,
        index_dir: str,
        scores_dir: str,
        target_lang: str = IMP_TARGET_LANG,
    ) -> None:
        self.target_lang = target_lang
        self.scores_sink = ExactlyOnceParquetSink(scores_dir)
        self.index_sink = ExactlyOnceParquetSink(index_dir)
        self.index_dir = index_dir

    def _has_index(self) -> bool:
        return os.path.isdir(self.index_dir) and any(
            n.startswith("epoch=") for n in os.listdir(self.index_dir)
        )

    def bootstrap(self, df: DataFrame) -> None:
        """Warm start: absorb an existing corpus's counts WITHOUT
        emitting scores (pseudo-epoch -1)."""
        if self._has_index():
            raise ValueError("bootstrap requires an empty index_dir")
        _, counts = _bucket_counts(df, self.target_lang)
        self.index_sink.process_batch(counts, -1)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.scores_sink.is_committed(epoch_id) and self.index_sink.is_committed(
            epoch_id
        ):
            return
        spark = batch_df.sparkSession
        toks, batch_counts = _bucket_counts(batch_df, self.target_lang)
        batch_counts = batch_counts.localCheckpoint(eager=True)
        if not self.scores_sink.is_committed(epoch_id):
            combined = batch_counts
            if self._has_index():
                combined = combined.unionByName(
                    self.index_sink.result(spark).select("bucket", "r", "t")
                )
            counts = combined.groupBy("bucket").agg(
                F.sum("r").alias("r"), F.sum("t").alias("t")
            )
            tot = counts.agg(
                (F.sum("r") + N_BUCKETS).alias("r_tot"),
                (F.sum("t") + N_BUCKETS).alias("t_tot"),
            )
            weights = counts.crossJoin(F.broadcast(tot)).select(
                "bucket",
                "r",
                F.expr(
                    f"CAST(((t + 1) * r_tot * {IMP_SCALE}) "
                    f"DIV ((r + 1) * t_tot) AS BIGINT)"
                ).alias("w"),
            )
            # corpus-mean baseline over past ∪ present, from counts alone
            base = weights.agg(
                F.sum(F.col("r") * F.col("w")).alias("s_tot"),
                F.sum("r").alias("n_tot"),
            )
            scored = (
                toks.join(F.broadcast(weights.select("bucket", "w")), "bucket")
                .groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).alias("n_tokens"),
                    F.sum("w").cast("long").alias("imp_score"),
                )
            )
            out = scored.crossJoin(F.broadcast(base)).select(
                "doc_id",
                "n_tokens",
                "imp_score",
                F.when(
                    F.expr("imp_score DIV n_tokens")
                    >= F.expr("s_tot DIV n_tot"),
                    1,
                )
                .otherwise(0)
                .cast("long")
                .alias("is_selected"),
            )
            self.scores_sink.process_batch(out, epoch_id)
        if not self.index_sink.is_committed(epoch_id):
            self.index_sink.process_batch(batch_counts, epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def scores(self, spark: SparkSession) -> DataFrame:
        return self.scores_sink.result(spark)
