"""Generic streaming pair-mining index — the foreachBatch pattern behind
both streaming near-neighbor search (streaming/similarity.py) and
streaming near-dup detection (streaming/dedup.py).

Each microbatch is (1) SIGNED — projected to an id, one or more bucket
key columns, and whatever payload the verifier needs; (2) MATCHED —
bucket-collision candidates within the batch (id-ordered) and against
the accumulated index (normalized to (lo, hi)), then exact-verified by
the subclass; (3) ABSORBED into the index. Steps 2 and 3 are epoch-keyed
idempotent commits (streaming/exactly_once.py) ordered pairs-then-index:
a replayed epoch whose pairs are committed skips matching entirely — the
index cannot yet contain that epoch, so no pair is ever emitted twice
and nothing ever matches itself. One stream per index/out dir pair.

At 100 TB the index directory is a bucket-key-partitioned lake table and
the commits become transactional-table commits; the choreography here is
unchanged. Small-file accumulation across epochs is handled by
`ExactlyOnceParquetSink.compact()` (stream stopped): data consolidates
into one reserved epoch dir while the old dirs stay as empty commit
markers, so replay idempotence survives compaction. Subclasses implement `signed(df)` and `verify(cand, vecs)`;
bucket keys are OR-combined (a pair is a candidate if ANY key column
agrees), which is simultaneously multi-table LSH and multi-band MinHash.
Stream ids are assumed unique across the stream's lifetime (re-ingesting
an id is filtered from pairing with itself, but its payload would be
indexed twice — dedup upstream if sources can replay ids).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.streaming.exactly_once import (
    ErasableIndexMixin,
    ExactlyOnceParquetSink,
)


class StreamingPairIndex(ErasableIndexMixin):
    """Base: incremental bucket index with exactly-once pair emission.

    Subclass contract:
    - ``id_col``: name of the id column in signed frames;
    - ``key_cols``: bucket key column names (OR-combined);
    - ``out_schema``: DDL schema of the emitted pair rows (for the empty
      result before any commit);
    - ``signed(df)``: raw batch → (id_col, *key_cols, payload...);
    - ``verify(cand, vecs)``: (id1, id2) candidates + the union of signed
      rows they may reference → verified pair rows (out_schema columns).
    """

    id_col: str = "vec_id"
    key_cols: tuple[str, ...] = ()
    out_schema: str = "id1 bigint, id2 bigint"
    # columns that identify a document in the emitted pairs — BOTH
    # endpoints: a pair row names the erased doc either way around
    out_erase_cols: tuple[str, ...] = ("id1", "id2")

    def __init__(self, index_dir: str, out_dir: str) -> None:
        self.index_dir = index_dir
        self.out_dir = out_dir
        self.batches_seen = 0
        self._pairs_sink = ExactlyOnceParquetSink(
            out_dir, erase_cols=self.out_erase_cols
        )
        self._index_sink = ExactlyOnceParquetSink(
            index_dir, erase_cols=(self.id_col,)
        )

    # ------------------------------------------------------ subclass hooks

    def signed(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def verify(self, cand: DataFrame, vecs: DataFrame) -> DataFrame:
        raise NotImplementedError

    # ------------------------------------------------------------ plumbing

    def _has_index(self) -> bool:
        return os.path.isdir(self.index_dir) and any(
            n.startswith("epoch=") for n in os.listdir(self.index_dir)
        )

    def bucket_pairs(self, a: DataFrame, b: DataFrame, ordered: bool) -> DataFrame:
        """(id1 from a) × (id2 from b) agreeing on ANY key column;
        `ordered` additionally requires id1 < id2 (within-batch
        self-join)."""
        left = a.select(
            F.col(self.id_col).alias("id1"),
            *[F.col(k).alias(f"a_{k}") for k in self.key_cols],
        )
        right = b.select(
            F.col(self.id_col).alias("id2"),
            *[F.col(k).alias(f"b_{k}") for k in self.key_cols],
        )
        out = None
        for k in self.key_cols:
            cond = F.col(f"a_{k}") == F.col(f"b_{k}")
            if ordered:
                cond = cond & (F.col("id1") < F.col("id2"))
            m = left.join(right, cond).select("id1", "id2")
            out = m if out is None else out.unionByName(m)
        return out

    # ------------------------------------------------------------- the sink

    def bootstrap(self, df: DataFrame) -> None:
        """Warm start: absorb an existing corpus into the index WITHOUT
        emitting pairs (its internal pairs are assumed already mined by
        the batch twin). Must run before the stream's first epoch; the
        bootstrap commits as pseudo-epoch -1, which no streaming epoch id
        ever collides with."""
        if self._has_index():
            raise ValueError("bootstrap requires an empty index_dir")
        self._index_sink.process_batch(self.signed(df), -1)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        if self._pairs_sink.is_committed(epoch_id) and self._index_sink.is_committed(
            epoch_id
        ):
            return  # fully committed epoch replayed: exactly-once no-op
        spark = batch_df.sparkSession
        new = self.signed(batch_df)
        new.persist()
        try:
            if not self._pairs_sink.is_committed(epoch_id):
                # pairs commit strictly precedes index commit, so here
                # the index holds only strictly-earlier epochs
                cand = self.bucket_pairs(new, new, ordered=True)
                vecs = new
                if self._has_index():
                    # read through the sink, not the raw directory: the
                    # erasure sidecar must filter the accumulated index
                    # at MATCH time too — an erased doc's signatures can
                    # never pair with future batches (delete_docs)
                    index = self._index_sink.result(spark)
                    cross = (
                        self.bucket_pairs(index, new, ordered=False)
                        # a replayed id colliding with its own index entry
                        # is not a pair
                        .filter(F.col("id1") != F.col("id2"))
                        .select(
                            F.least("id1", "id2").alias("id1"),
                            F.greatest("id1", "id2").alias("id2"),
                        )
                    )
                    cand = cand.unionByName(cross)
                    vecs = vecs.unionByName(
                        index.select(*new.columns), allowMissingColumns=False
                    )
                pairs = self.verify(cand.distinct(), vecs)
                self._pairs_sink.process_batch(pairs, epoch_id)
            # absorb AFTER the pairs commit (a crash between the two
            # commits replays into the pairs-committed branch above,
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

    def erasure_sinks(self) -> dict[str, ExactlyOnceParquetSink]:
        """Erasure semantics (delete_docs/compact come from
        ErasableIndexMixin): an erased doc's signatures leave the
        accumulated index — no future batch can ever match against it
        (the erased-world contract, applied at match time via the
        sink-routed index read in process_batch) — and every emitted
        pair row naming it (either endpoint) leaves the output. Pair
        rows between OTHER docs are untouched: a pairwise verdict
        between Y and Z never depended on X."""
        return {"index": self._index_sink, "pairs": self._pairs_sink}

    def result(self, spark: SparkSession) -> DataFrame:
        """All verified pairs from committed epochs."""
        committed = os.path.isdir(self.out_dir) and any(
            n.startswith("epoch=") for n in os.listdir(self.out_dir)
        )
        if not committed:
            return spark.createDataFrame([], self.out_schema)
        cols = [f.split()[0] for f in self.out_schema.split(",")]
        return self._pairs_sink.result(spark).select(*[c.strip() for c in cols])
