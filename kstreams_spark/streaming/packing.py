"""Streaming sequence packing — the ingest-time form of
operators/packing.py: documents arrive as a stream and the packing
manifest grows incrementally, each microbatch's docs appended to each
shard's token stream exactly where the previous batch left off (a
partially-filled training sequence keeps filling across batches — no
padding is ever introduced at batch boundaries).

State is a per-shard NEXT-FREE-OFFSET integer — O(#shards) driver
state, the same bounded-driver-state class as kmeans' O(k·D) centroids.
It is also fully derivable from the committed manifest (next offset =
max(chunk_id·ctx + chunk_off + n_span) per shard), which is what makes
the commit protocol simple:

- epoch replay in-session: `is_committed` guard → neither the sink nor
  the offsets advance twice;
- crash between commit and offset update: restart calls `bootstrap()`,
  which rebuilds offsets from the committed manifest — the in-memory
  dict is a cache, never the source of truth.

Within a batch, docs pack in (md5(doc_id), doc_id) order per shard —
the batch operator's deterministic-permutation idiom — so a replayed
batch produces byte-identical manifest rows.

At 100 TB: the manifest is the lake table the dataloader reads
(partition by shard); per-batch cost is batch-sized (one partitioned
window + bounded explode), and bootstrap's scan is a per-shard MAX that
partition-prunes to each shard's tail epoch in a real lake layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.packing import (
    CTX_LEN,
    manifest_from_offsets,
    shard_offsets,
)
from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink


class StreamingSequencePacker:
    """foreachBatch packer: (doc_id, text, <shard_col>) stream →
    manifest rows (shard, chunk_id, doc_id, doc_off, chunk_off, n_span)
    in `manifest_dir`, epoch-keyed exactly-once."""

    def __init__(
        self,
        manifest_dir: str,
        ctx_len: int = CTX_LEN,
        shard_col: str = "lang",
    ) -> None:
        self.sink = ExactlyOnceParquetSink(manifest_dir)
        self.ctx_len = ctx_len
        self.shard_col = shard_col
        self.offsets: dict[str, int] = {}
        self.batches_seen = 0

    def bootstrap(self, spark: SparkSession) -> None:
        """Rebuild per-shard offsets from the committed manifest (call
        after a restart; a fresh directory leaves offsets empty)."""
        committed = self.sink.result(spark)
        if "shard" not in committed.columns:  # no committed epochs yet
            self.offsets = {}
            return
        rows = (
            committed.groupBy("shard")
            .agg(
                F.max(
                    F.col("chunk_id") * self.ctx_len
                    + F.col("chunk_off")
                    + F.col("n_span")
                ).alias("nxt")
            )
            .collect()
        )
        self.offsets = {r.shard: r.nxt for r in rows}

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        if self.sink.is_committed(epoch_id):
            return  # replayed epoch: neither output nor offsets advance
        spark = batch_df.sparkSession
        base = spark.createDataFrame(
            list(self.offsets.items()), "shard string, base long"
        )
        off = shard_offsets(batch_df, self.shard_col, base=base)
        manifest = manifest_from_offsets(off, self.ctx_len)
        # advance amounts computed BEFORE the commit (tiny: one row per
        # shard in the batch), applied to the dict only after it
        advances = {
            r.shard: r.total
            for r in off.groupBy("shard")
            .agg(F.sum("n").alias("total"))
            .collect()
        }
        self.sink.process_batch(manifest, epoch_id)
        for shard, total in advances.items():
            self.offsets[shard] = self.offsets.get(shard, 0) + total

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def manifest(self, spark: SparkSession) -> DataFrame:
        return self.sink.result(spark)
