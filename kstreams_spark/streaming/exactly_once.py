"""Exactly-once sink demonstration (SURVEY.md §2.2 last row:
`processing.guarantee=exactly_once` ↔ checkpoint + transactional or
idempotent sinks).

Kafka Streams gets exactly-once from broker transactions. Structured
Streaming's contract is different but equivalent in effect: the
checkpoint makes source offsets replayable per microbatch, and
foreachBatch hands every attempt of a batch the SAME epoch_id — so a
sink that commits each epoch atomically AND ignores re-commits of an
already-committed epoch yields end-to-end exactly-once results across
crashes and restarts.

This sink implements that contract on plain parquet:
- each epoch writes to a `_inprogress-<epoch>` staging dir (the leading
  underscore keeps Spark's file index from ever reading it),
- the commit point is a single atomic rename to `epoch=<epoch>`,
- a retry of a committed epoch sees the final dir and no-ops.

A crash between write and rename leaves only ignored staging files; the
replayed epoch overwrites them and commits once. At 100 TB the rename
dance is replaced by a transactional table format (Delta/Iceberg commit
protocol) — the foreachBatch body and the epoch-id idempotence argument
carry over unchanged.

Reference parity: the reference topology relies on at-least-once +
last-write-wins retained MQTT messages (BME680.java:256-259 QoS0
retained); this module is the declared exactly-once growth path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ExactlyOnceParquetSink:
    """Epoch-keyed idempotent foreachBatch sink: at-least-once delivery
    from the engine + idempotent epoch commits = exactly-once output."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir

    def _final_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"epoch={epoch_id}")

    def _staging_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"_inprogress-{epoch_id}")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._final_dir(epoch_id))

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.is_committed(epoch_id):
            return  # replay of a committed epoch: exactly-once no-op
        staging = self._staging_dir(epoch_id)
        batch_df.write.mode("overwrite").parquet(staging)
        os.rename(staging, self._final_dir(epoch_id))  # the commit point

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        """Wire to a stream. The checkpoint is what makes a crashed epoch
        replayable with the same epoch_id on restart."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def result(self, spark: SparkSession) -> DataFrame:
        """All committed epochs (epoch= partition column included)."""
        return spark.read.parquet(self.out_dir)
