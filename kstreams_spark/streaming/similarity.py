"""Streaming similarity: an incremental LSH index via foreachBatch.

New embeddings arrive on a stream; each microbatch is (1) signed with the
SAME deterministic random-hyperplane signatures as the batch operators
(operators/similarity.py), (2) matched against the accumulated corpus by
signature bucket equi-join + exact fixed-point cosine verify, and
(3) appended to the index. Within-batch pairs are matched too (ordered
by vec_id), so the union of emissions over a whole stream equals the
batch `lsh_near_pairs` over the full corpus exactly — parity is pinned
on planted clusters in tests/test_streaming_similarity.py.

This makes the ANN story streaming-native like the rest of the engine:
the index is a parquet directory keyed by the same signatures a batch
job would compute, so batch and stream consumers share one artifact.
At 100 TB the index directory becomes a signature-partitioned lake table
(bucket pruning on sig = partition pruning) and the append becomes a
transactional-table commit; the foreachBatch body is unchanged.

Exactly-once: both outputs (emitted pairs, index entries) go through
epoch-keyed idempotent commits (streaming/exactly_once.py), ordered
pairs-then-index. A replayed epoch that already committed its pairs
skips matching entirely — the index cannot yet contain that epoch
(its commit is strictly later), so no pair is ever emitted twice and
no index entry ever matches itself. Proven by crash injection in
tests/test_streaming_similarity.py.

Shuffle budget per microbatch: signature projection is per-row (no
shuffle); n_tables bucket equi-joins against the index + distinct; one
verify join. Index reads are pruned to signature columns + candidates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.similarity import (
    LSH_BITS,
    N_TABLES,
    NEAR_MIN_COSINE,
    _cosine,
    _fx_dot,
    _fx_norm2,
    _sig_expr,
)
from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink


class StreamingLshIndex:
    """foreachBatch incremental ANN index: match new vectors against the
    accumulated corpus, then absorb them. One stream per index_dir."""

    def __init__(
        self,
        index_dir: str,
        out_dir: str,
        bits: int = LSH_BITS,
        n_tables: int = N_TABLES,
        min_cosine: float = NEAR_MIN_COSINE,
    ) -> None:
        self.index_dir = index_dir
        self.out_dir = out_dir
        self.bits = bits
        self.n_tables = n_tables
        self.min_cosine = min_cosine
        self.batches_seen = 0
        # epoch-keyed idempotent commits for both outputs — replayed
        # epochs are no-ops (see module docstring for the ordering proof)
        self._pairs_sink = ExactlyOnceParquetSink(out_dir)
        self._index_sink = ExactlyOnceParquetSink(index_dir)

    # ------------------------------------------------------------ internals

    def _signed(self, df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id",
            "embedding",
            _fx_norm2("embedding").alias("norm2"),
            *[
                _sig_expr(t, self.bits).alias(f"sig{t}")
                for t in range(self.n_tables)
            ],
        )

    def _has_index(self) -> bool:
        return os.path.isdir(self.index_dir) and any(
            n.startswith("epoch=") for n in os.listdir(self.index_dir)
        )

    def _bucket_pairs(self, a: DataFrame, b: DataFrame, ordered: bool) -> DataFrame:
        """(id1 from a) × (id2 from b) colliding in ANY table; `ordered`
        additionally requires id1 < id2 (within-batch self-join)."""
        left = a.select(
            F.col("vec_id").alias("id1"),
            *[F.col(f"sig{t}").alias(f"asig{t}") for t in range(self.n_tables)],
        )
        right = b.select(
            F.col("vec_id").alias("id2"),
            *[F.col(f"sig{t}").alias(f"bsig{t}") for t in range(self.n_tables)],
        )
        out = None
        for t in range(self.n_tables):
            cond = F.col(f"asig{t}") == F.col(f"bsig{t}")
            if ordered:
                cond = cond & (F.col("id1") < F.col("id2"))
            m = left.join(right, cond).select("id1", "id2")
            out = m if out is None else out.unionByName(m)
        return out

    # ------------------------------------------------------------- the sink

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        if self._pairs_sink.is_committed(epoch_id) and self._index_sink.is_committed(
            epoch_id
        ):
            return  # fully committed epoch replayed: exactly-once no-op
        spark = batch_df.sparkSession
        new = self._signed(batch_df)
        new.persist()
        try:
            if not self._pairs_sink.is_committed(epoch_id):
                # pairs commit strictly precedes index commit, so here the
                # index holds only strictly-earlier epochs — the batch can
                # never match itself through the index read
                sides = [self._bucket_pairs(new, new, ordered=True)]
                vec_sources = [new]
                if self._has_index():
                    index = spark.read.parquet(self.index_dir)
                    # index entries arrived strictly earlier: every
                    # (old, new) collision is a fresh pair regardless of
                    # id order — normalize to (lo, hi) so output keys
                    # match the batch twin
                    cross = self._bucket_pairs(index, new, ordered=False).select(
                        F.least("id1", "id2").alias("id1"),
                        F.greatest("id1", "id2").alias("id2"),
                    )
                    sides.append(cross)
                    vec_sources.append(index)
                cand = sides[0]
                for s in sides[1:]:
                    cand = cand.unionByName(s)
                cand = cand.distinct()

                vecs = vec_sources[0].select("vec_id", "embedding", "norm2")
                for v in vec_sources[1:]:
                    vecs = vecs.unionByName(
                        v.select("vec_id", "embedding", "norm2")
                    )
                v1 = vecs.select(
                    F.col("vec_id").alias("id1"),
                    F.col("embedding").alias("e1"),
                    F.col("norm2").alias("n1"),
                )
                v2 = vecs.select(
                    F.col("vec_id").alias("id2"),
                    F.col("embedding").alias("e2"),
                    F.col("norm2").alias("n2"),
                )
                pairs = (
                    cand.join(v1, "id1")
                    .join(v2, "id2")
                    .select(
                        "id1",
                        "id2",
                        _cosine(
                            _fx_dot("e1", "e2"), F.col("n1"), F.col("n2")
                        ).alias("cosine"),
                    )
                    .filter(F.col("cosine") >= self.min_cosine)
                )
                self._pairs_sink.process_batch(pairs, epoch_id)
            # absorb the batch AFTER the pairs commit (a crash between the
            # two commits replays into the pairs-committed branch above,
            # which skips matching and only completes this absorb)
            self._index_sink.process_batch(new, epoch_id)
        finally:
            new.unpersist()

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def result(self, spark: SparkSession) -> DataFrame:
        """All near-pairs from committed epochs."""
        committed = os.path.isdir(self.out_dir) and any(
            n.startswith("epoch=") for n in os.listdir(self.out_dir)
        )
        if not committed:
            return spark.createDataFrame(
                [], "id1 bigint, id2 bigint, cosine double"
            )
        return self._pairs_sink.result(spark).select("id1", "id2", "cosine")
