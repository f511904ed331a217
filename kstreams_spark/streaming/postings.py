"""Streaming maintenance of the keyword postings serving index — the
retrieval family's ingest-time twin (VERDICT r8 task 6): documents
arrive as a stream, each microbatch lands in the live index as one
epoch-keyed delta (serving.upsert_postings_delta — same bucket layout,
same tombstone protocol), and probes served BETWEEN batches are already
correct because the probe's bucket-local max-epoch resolution merges
base + all committed deltas with no manifest on the query path.

Exactly-once: foreachBatch replays hand the same epoch_id, and a commit
MARKER directory per epoch (the ExactlyOnceParquetSink idea, markers
only — the data itself is the delta append) makes a replay of a
committed epoch a literal no-op. A crash BETWEEN the delta append and
the marker commit re-runs the same (delta, epoch) — the upsert crash
contract: duplicate rows are invisible to probes (dropDuplicates on the
full key) and physically removed by the next compaction.

Epoch namespace: the base build owns epoch 0 (serving.write_postings_index),
so stream deltas commit at epoch_id + 1 — a doc revised by batch 0 must
supersede its base rows, which requires a STRICTLY greater epoch.

At 100 TB this is the postings index's LSM write path: microbatch =
memtable flush, compact() (stream stopped, single actor —
serving.compact_postings_index) = the merge that folds deltas back to
fresh-build form without ever changing a probe answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kstreams_spark.serving import (
    compact_postings_index,
    probe_postings_index,
    upsert_postings_delta,
    write_postings_index,
)


class StreamingPostingsMaintainer:
    """foreachBatch maintainer for a live postings index at `index_dir`.
    The stream carries (doc_id, text) rows — new docs or re-ingested
    revisions. ONE stream per index_dir (the sink-family concurrency
    contract)."""

    def __init__(self, index_dir: str) -> None:
        self.index_dir = index_dir
        self.marker_root = index_dir + "_epochs"

    def _marker(self, epoch_id: int) -> str:
        return os.path.join(self.marker_root, f"epoch={epoch_id}")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.isdir(self._marker(epoch_id))

    def bootstrap(self, docs: DataFrame) -> None:
        """Build the base index (epoch 0) from an existing corpus."""
        if os.path.isdir(self.index_dir):
            raise ValueError("bootstrap requires a fresh index_dir")
        write_postings_index(docs, self.index_dir)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.is_committed(epoch_id):
            return  # replay of a committed epoch: exactly-once no-op
        if batch_df.isEmpty():
            os.makedirs(self._marker(epoch_id), exist_ok=True)
            return
        upsert_postings_delta(
            batch_df.select("doc_id", "text"),
            self.index_dir,
            epoch=epoch_id + 1,
        )
        os.makedirs(self._marker(epoch_id), exist_ok=True)  # commit point

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def probe(
        self, spark: SparkSession, terms: tuple[str, ...], k: int = 20
    ) -> DataFrame:
        """Serve a query against base + every committed delta — the
        merged view is what probe_postings_index already computes."""
        return probe_postings_index(spark, self.index_dir, terms, k=k)

    def compact(self, spark: SparkSession) -> int:
        """Fold deltas to fresh-build form (stream STOPPED; single
        actor). Markers are kept — a checkpoint-lagged replay of a
        pre-compaction epoch must stay a no-op."""
        return compact_postings_index(spark, self.index_dir)
