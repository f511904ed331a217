"""Streaming maintenance of the serving indexes — the retrieval/ANN
families' ingest-time twins (VERDICT r8 task 6): documents or embedding
vectors arrive as a stream, each microbatch lands in the live index as
one epoch-keyed delta (serving.upsert_* — same layouts, same tombstone
protocols), and probes served BETWEEN batches are already correct
because the probe-local max-epoch resolution merges base + all
committed deltas with no manifest on the query path.

Exactly-once: foreachBatch replays hand the same epoch_id, and a commit
MARKER directory per epoch (the ExactlyOnceParquetSink idea, markers
only — the data itself is the delta append) makes a replay of a
committed epoch a literal no-op. A crash BETWEEN the delta append and
the marker commit re-runs the same (delta, epoch) — the upsert crash
contract: duplicate rows are invisible to probes and physically removed
by the next compaction.

Epoch namespace: the base build owns epoch 0, so stream deltas commit
at epoch_id + 1 — a row revised by batch 0 must supersede its base
rows, which requires a STRICTLY greater epoch.

At 100 TB this is each index's LSM write path: microbatch = memtable
flush, compact() (stream stopped, single actor) = the merge that folds
deltas back to fresh-build form without ever changing a probe answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kstreams_spark.serving import (
    compact_ivf_pq_index,
    compact_ivf_sq8_index,
    compact_postings_index,
    probe_ivf_pq_index,
    probe_ivf_sq8_index,
    probe_postings_index,
    upsert_ivf_pq_delta,
    upsert_ivf_sq8_delta,
    upsert_postings_delta,
    write_ivf_pq_index,
    write_ivf_sq8_index,
    write_postings_index,
)


class _EpochMarkedMaintainer:
    """Shared foreachBatch skeleton: per-epoch commit markers around an
    idempotent-under-rerun delta upsert. ONE stream per index_dir (the
    sink-family concurrency contract). Subclasses supply _apply()."""

    def __init__(self, index_dir: str) -> None:
        self.index_dir = index_dir
        self.marker_root = index_dir + "_epochs"

    def _marker(self, epoch_id: int) -> str:
        return os.path.join(self.marker_root, f"epoch={epoch_id}")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.isdir(self._marker(epoch_id))

    def _apply(self, batch_df: DataFrame, epoch: int) -> None:
        raise NotImplementedError

    def _data_epoch(self, epoch_id: int) -> int:
        """Marker id → data epoch. Subclasses with extra epoch sources
        (the hybrid maintainer's erase offset) override ONLY this."""
        return epoch_id + 1

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.is_committed(epoch_id):
            return  # replay of a committed epoch: exactly-once no-op
        if not batch_df.isEmpty():
            self._apply(batch_df, self._data_epoch(epoch_id))
        os.makedirs(self._marker(epoch_id), exist_ok=True)  # commit point

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )


class StreamingPostingsMaintainer(_EpochMarkedMaintainer):
    """foreachBatch maintainer for a live keyword postings index. The
    stream carries (doc_id, text) rows — new docs or re-ingested
    revisions."""

    def bootstrap(self, docs: DataFrame) -> None:
        """Build the base index (epoch 0) from an existing corpus."""
        if os.path.isdir(self.index_dir):
            raise ValueError("bootstrap requires a fresh index_dir")
        write_postings_index(docs, self.index_dir)

    def _apply(self, batch_df: DataFrame, epoch: int) -> None:
        upsert_postings_delta(
            batch_df.select("doc_id", "text"), self.index_dir, epoch=epoch
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


class StreamingIvfSq8Maintainer(_EpochMarkedMaintainer):
    """foreachBatch maintainer for a live IVF-SQ8 ANN index. The stream
    carries (vec_id, embedding) rows — new vectors or re-embedded
    revisions; every batch quantizes with the base build's FROZEN
    params and assigns into its FROZEN centroid cells (the train-once
    contract — serving.write_ivf_sq8_index docstring)."""

    def bootstrap(
        self,
        emb: DataFrame,
        centroids: list[list[float]],
        params: DataFrame | None = None,
    ) -> None:
        if os.path.isdir(self.index_dir):
            raise ValueError("bootstrap requires a fresh index_dir")
        write_ivf_sq8_index(emb, self.index_dir, centroids, params=params)

    def _apply(self, batch_df: DataFrame, epoch: int) -> None:
        upsert_ivf_sq8_delta(
            batch_df.select("vec_id", "embedding"), self.index_dir, epoch=epoch
        )

    def probe(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int = 10,
        n_probe: int = 1,
    ) -> DataFrame:
        centroids = [
            [float(x) for x in r.cvec]
            for r in spark.read.parquet(self.index_dir + "/_centroids")
            .orderBy("cen_id")
            .collect()
        ]
        return probe_ivf_sq8_index(
            spark, self.index_dir, query_vec, centroids, k=k, n_probe=n_probe
        )

    def compact(self, spark: SparkSession) -> int:
        return compact_ivf_sq8_index(spark, self.index_dir)


class StreamingIvfPqMaintainer(_EpochMarkedMaintainer):
    """foreachBatch maintainer for a live IVF-PQ ANN index — closes the
    ingest matrix (VERDICT r9 task 3: postings and IVF-SQ8 had streaming
    maintainers; IVF-PQ had only the batch upsert, serving.py:428).
    The stream carries (vec_id, embedding) rows; every batch encodes
    with the base build's FROZEN `_codebook` sidecar (per-subspace
    nearest codeword) and assigns into its FROZEN `_centroids` cells —
    the same train-once contract as SQ8, so a stream-built index is the
    bit-twin of a batch rebuild with the same sidecars."""

    def bootstrap(
        self,
        emb: DataFrame,
        centroids: list[list[float]],
        codebooks,
    ) -> None:
        if os.path.isdir(self.index_dir):
            raise ValueError("bootstrap requires a fresh index_dir")
        write_ivf_pq_index(emb, self.index_dir, centroids, codebooks)

    def _apply(self, batch_df: DataFrame, epoch: int) -> None:
        upsert_ivf_pq_delta(
            batch_df.select("vec_id", "embedding"), self.index_dir, epoch=epoch
        )

    def probe(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int = 10,
        n_probe: int = 1,
    ) -> DataFrame:
        centroids = [
            [float(x) for x in r.cvec]
            for r in spark.read.parquet(self.index_dir + "/_centroids")
            .orderBy("cen_id")
            .collect()
        ]
        return probe_ivf_pq_index(
            spark, self.index_dir, query_vec, centroids, k=k, n_probe=n_probe
        )

    def compact(self, spark: SparkSession) -> int:
        return compact_ivf_pq_index(spark, self.index_dir)
