"""Streaming decontamination — the ingest-time form of
operators/decontam.py: documents arrive as a stream, the eval set is a
STATIC table, and every microbatch is split into clean vs contaminated
before it ever lands in the lake (the shape a production ingest runs so
contaminated text never touches training storage).

Statelessness is the point: contamination is a per-document property
against a fixed eval set, so unlike the near-dup index
(streaming/dedup.py) there is NO accumulated state — per-batch cost is
batch-sized, the eval shingle set broadcasts once, and replay needs no
merge logic. Exactly-once comes from the epoch-keyed parquet sink
(streaming/exactly_once.py): both outputs (clean + flagged) commit under
the batch's epoch id, so a crashed epoch replays idempotently per sink.

At 100 TB: the eval shingle table is ≤ ~10⁸ 16-byte md5 keys (benchmarks
are small relative to any corpus) — broadcast; the clean output is the
lake append, the flagged output is the quarantine/audit table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kstreams_spark.operators.decontam import DECON_N, decontaminate
from kstreams_spark.streaming.exactly_once import (
    ErasableIndexMixin,
    ExactlyOnceParquetSink,
)


class StreamingDecontaminator(ErasableIndexMixin):
    """foreachBatch splitter: (doc_id, text) stream → `clean_dir`
    (documents with zero eval n-gram overlap) + `flagged_dir` (the
    decontaminate() flag rows: doc_id, n_hit_ngrams, n_eval_docs_hit).
    One stream per instance; eval_df is static (doc_id-stable)."""

    def __init__(
        self,
        eval_df: DataFrame,
        clean_dir: str,
        flagged_dir: str,
        n: int = DECON_N,
    ) -> None:
        self.eval_df = eval_df
        self.n = n
        self.clean_sink = ExactlyOnceParquetSink(
            clean_dir, erase_cols=("doc_id",)
        )
        self.flagged_sink = ExactlyOnceParquetSink(
            flagged_dir, erase_cols=("doc_id",)
        )
        self.batches_seen = 0

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        flagged = decontaminate(batch_df, self.eval_df, self.n)
        # commit order flagged→clean: a crash between the two replays the
        # epoch, flagged no-ops (committed), clean commits — per-sink
        # exactly-once holds at every crash point
        self.flagged_sink.process_batch(flagged, epoch_id)
        clean = batch_df.join(flagged.select("doc_id"), "doc_id", "left_anti")
        self.clean_sink.process_batch(clean, epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def clean(self, spark: SparkSession) -> DataFrame:
        return self.clean_sink.result(spark)

    def flagged(self, spark: SparkSession) -> DataFrame:
        return self.flagged_sink.result(spark)

    def erasure_sinks(self) -> dict:
        """Erasure semantics (verbs from ErasableIndexMixin): both
        outputs are per-doc rows — the clean copy carries the doc's
        TEXT, the flag row its overlap stats — so an erased doc's rows
        leave both. This splitter keeps no cross-doc state (eval_df is
        the static reference), so erasure here is output hygiene, not
        index surgery."""
        return {"clean": self.clean_sink, "flagged": self.flagged_sink}
