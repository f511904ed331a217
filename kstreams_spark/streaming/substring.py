"""Streaming repeated-substring detection — the ingest-time form of
operators/substring.py: documents arrive as a stream, and each batch's
docs are scored for repeated-span coverage against EVERYTHING ingested
so far (accumulated window index ∪ the batch itself), before they land
in the lake.

The index is an epoch-keyed APPEND-ONLY table of positional window
hashes (doc_id, pos, sh) — the streaming/pair_index.py protocol: no
in-place merge, occurrence counts aggregate across epochs at read time,
and exactly-once needs no merge logic at all. Commit order is
flags-then-index (a replayed epoch whose flags are committed skips
scoring; the index cannot yet contain that epoch, so a batch never
collides with itself through the index).

Ingest-time semantics, stated plainly: a document is scored against the
PAST, not the future. The first copy of a span ingests clean; every
later copy arrives covered. A batch pipeline wanting retro-flags runs
the batch operator over the accumulated index — which is exactly the
union of this index's epochs.

At 100 TB: partition the index by a prefix of sh (bucket pruning = the
probe reads only matching hash ranges), compact epochs with
ExactlyOnceParquetSink.compact(); per-batch cost ∝ batch windows ×
matching index postings, never corpus².
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.substring import (
    SPAN_N,
    coverage_stats,
    positional_shingles,
)
from kstreams_spark.streaming.exactly_once import (
    ErasableIndexMixin,
    ExactlyOnceParquetSink,
)


class StreamingSubstringIndex(ErasableIndexMixin):
    """foreachBatch scorer: (doc_id, text) stream → `flags_dir` rows
    (doc_id, n_tokens, n_dup_starts, covered_tokens, is_flagged) — the
    ingest-time twin of dedup_substring_spans — while `index_dir`
    accumulates the positional window hashes."""

    def __init__(self, index_dir: str, flags_dir: str, n: int = SPAN_N) -> None:
        self.n = n
        self.flags_sink = ExactlyOnceParquetSink(
            flags_dir, erase_cols=("doc_id",)
        )
        self.index_sink = ExactlyOnceParquetSink(
            index_dir, erase_cols=("doc_id",)
        )
        self.index_dir = index_dir
        self.batches_seen = 0

    def _has_index(self) -> bool:
        return os.path.isdir(self.index_dir) and any(
            n.startswith("epoch=") for n in os.listdir(self.index_dir)
        )

    def bootstrap(self, df: DataFrame) -> None:
        """Warm start: absorb an existing corpus into the index WITHOUT
        emitting flags (pseudo-epoch -1; its internal duplication is
        assumed already handled by the batch operator)."""
        if self._has_index():
            raise ValueError("bootstrap requires an empty index_dir")
        self.index_sink.process_batch(
            positional_shingles(df, self.n), -1
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        if self.flags_sink.is_committed(epoch_id) and self.index_sink.is_committed(
            epoch_id
        ):
            return
        spark = batch_df.sparkSession
        ps = positional_shingles(batch_df, self.n).localCheckpoint(eager=True)
        if not self.flags_sink.is_committed(epoch_id):
            batch_occ = ps.groupBy("sh").agg(
                F.count(F.lit(1)).alias("occ_b")
            )
            if self._has_index():
                idx_occ = (
                    self.index_sink.result(spark)
                    .groupBy("sh")
                    .agg(F.count(F.lit(1)).alias("occ_i"))
                )
                occ = batch_occ.join(idx_occ, "sh", "left").select(
                    "sh",
                    (
                        F.col("occ_b") + F.coalesce(F.col("occ_i"), F.lit(0))
                    ).alias("occ"),
                )
            else:
                occ = batch_occ.select(
                    "sh", F.col("occ_b").alias("occ")
                )
            dup = ps.join(
                occ.filter(F.col("occ") >= 2).select("sh"), "sh"
            ).select("doc_id", "pos")
            base = batch_df.select(
                "doc_id",
                F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            )
            flags = coverage_stats(dup, base, self.n)
            self.flags_sink.process_batch(flags, epoch_id)
        if not self.index_sink.is_committed(epoch_id):
            self.index_sink.process_batch(ps, epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def flags(self, spark: SparkSession) -> DataFrame:
        return self.flags_sink.result(spark)

    def erasure_sinks(self) -> dict:
        """Erasure semantics (verbs from ErasableIndexMixin): the doc's
        positional window hashes leave the index — future batches'
        occurrence counts no longer include them (the erased-world
        contract; other docs' HISTORICAL flags stay, they are facts
        about those docs' own text) — and its flag rows leave the
        output."""
        return {"index": self.index_sink, "flags": self.flags_sink}
