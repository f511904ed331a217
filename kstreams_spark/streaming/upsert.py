"""Keyed upsert sink — the KTable⋈KTable / CDC MERGE pattern
(SURVEY.md §2.2 "KTable⋈KTable → foreachBatch + MERGE").

Without Delta/Iceberg on the classpath, MERGE INTO is emulated the
standard way (pyspark_guide "CDC / SCD2"): per microbatch, reduce the
batch to one row per key (latest wins), anti-join the existing snapshot
against the batch keys, union, and atomically swap the snapshot
directory. State = the snapshot table; the streaming query is the
changelog consumer.

At 100 TB: swap the directory dance for Delta's MERGE INTO (ACID, file
pruning) — the foreachBatch body is the part that carries over
unchanged. The latest-wins reduction is a per-batch groupBy on the key,
so batch cost ∝ batch size + snapshot rewrite; Delta limits the rewrite
to touched files.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class KeyedUpsertSink:
    """Maintains a latest-by-key parquet snapshot from a changelog stream."""

    def __init__(
        self,
        snapshot_dir: str,
        key_cols: list[str],
        seq_col: str,
    ) -> None:
        self.snapshot_dir = snapshot_dir
        self.key_cols = key_cols
        self.seq_col = seq_col

    def _reduce_latest(self, df: DataFrame) -> DataFrame:
        """One row per key: highest seq_col wins (ties broken arbitrarily
        within a batch are prevented by using a total-ordered seq)."""
        w = Window.partitionBy(*self.key_cols).orderBy(F.col(self.seq_col).desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _recover(self) -> None:
        """Make any single crash point survivable: if the snapshot dir is
        missing but a displaced `.old-*` exists (crash between the two
        swap renames), restore the newest one; if the snapshot exists,
        stale `.old-*` leftovers (crash before cleanup) are deleted —
        re-applying the interrupted batch is idempotent because the merge
        is latest-wins by seq_col."""
        import glob as _glob

        olds = sorted(_glob.glob(self.snapshot_dir + ".old-*"))
        if not os.path.exists(self.snapshot_dir):
            if olds:
                os.rename(olds.pop(), self.snapshot_dir)
        for stale in olds:
            shutil.rmtree(stale)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        self._recover()
        latest = self._reduce_latest(batch_df)
        if os.path.exists(self.snapshot_dir):
            current = spark.read.parquet(self.snapshot_dir)
            keys = latest.select(*self.key_cols)
            kept = current.join(keys, self.key_cols, "left_anti")
            merged = kept.unionByName(latest)
        else:
            merged = latest
        tmp = self.snapshot_dir + f".tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        # crash-safe swap: displace the current snapshot, move the new one
        # in, then delete the displaced copy. Every intermediate state is
        # recoverable by _recover() — the old rmtree-then-rename dance had
        # a window that lost the snapshot outright. (A real deployment
        # uses Delta MERGE and gets ACID from the table format.)
        old = self.snapshot_dir + f".old-{epoch_id}"
        if os.path.exists(self.snapshot_dir):
            os.rename(self.snapshot_dir, old)
        os.rename(tmp, self.snapshot_dir)
        if os.path.exists(old):
            shutil.rmtree(old)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        self._recover()
        return spark.read.parquet(self.snapshot_dir)

    def attach(self, changelog: DataFrame):
        """Wire to a streaming changelog: one upsert per microbatch."""
        return changelog.writeStream.foreachBatch(self.process_batch).start()
