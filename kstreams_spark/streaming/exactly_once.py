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
    from the engine + idempotent epoch commits = exactly-once output.

    Concurrency contract: ONE stream per out_dir. Epoch ids are
    per-query, so two queries sharing an out_dir would collide on the
    same epoch=N paths; the check→rename race is additionally closed by
    treating a failed rename onto an existing final dir as a concurrent
    commit of the same epoch (idempotent no-op), but cross-query sharing
    is still a semantic error — partition your outputs instead."""

    def __init__(self, out_dir: str, erase_cols: tuple[str, ...] = ()) -> None:
        self.out_dir = out_dir
        self.erase_cols = tuple(erase_cols)

    def _dels_dir(self) -> str:
        # leading underscore: hidden from every spark.read of out_dir
        return os.path.join(self.out_dir, "_dels")

    def delete_ids(self, spark: SparkSession, ids) -> None:
        """Index-side erasure (VERDICT r10 task 1 — the attribution-index
        twin of serving.delete_postings_docs): record the ids in the
        `_dels` sidecar so every read — result(), and therefore every
        in-batch read of an accumulated index — excludes any row whose
        `erase_cols` value is one of them, effective immediately.
        Physical removal happens at the next compact(), which folds the
        data without the erased rows and retires the sidecar.

        Crash contract (single actor, the compact() assumption): re-run
        the SAME ids to completion — the sidecar is append-only and
        duplicate ids are harmless (distinct at read). Erasure is
        durable against epoch replays: a checkpoint-lagged replay of an
        epoch containing an erased id re-commits nothing (the epoch
        marker survives erasure), and even a fresh re-ingest of the id
        stays invisible until the ids are deliberately removed by a
        future ingest AFTER a compact() retired the sidecar."""
        if not self.erase_cols:
            raise ValueError(
                "sink was built without erase_cols; erasure undefined"
            )
        os.makedirs(self.out_dir, exist_ok=True)
        spark.createDataFrame(
            [(int(i),) for i in ids], "del_id bigint"
        ).write.mode("append").parquet(self._dels_dir())

    def _apply_erasure(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        """Anti-join the `_dels` sidecar against every erase column.
        The sidecar is bounded by erasure-request volume between
        compactions (kilobytes), so the one read broadcasts."""
        if not os.path.isdir(self._dels_dir()):
            return df
        if not self.erase_cols:
            # a sidecar written by an erasure-enabled constructor must
            # never be silently ignored: serving the rows would undo
            # the erasure, and a compact() would discard the pending
            # deletes while folding the erased rows back in as live
            raise ValueError(
                f"{self.out_dir} has a _dels erasure sidecar but this "
                "sink was constructed without erase_cols — construct it "
                "the way the owning index does"
            )
        from pyspark.sql import functions as F

        dels = (
            spark.read.parquet(self._dels_dir())
            .select(F.col("del_id").alias("__del"))
            .distinct()
        )
        for c in self.erase_cols:
            df = df.join(
                F.broadcast(dels), F.col(c) == F.col("__del"), "left_anti"
            )
        return df

    def _final_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"epoch={epoch_id}")

    def _staging_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"_inprogress-{epoch_id}")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._final_dir(epoch_id))

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self._recover()  # heal an interrupted compact() first
        if self.is_committed(epoch_id):
            return  # replay of a committed epoch: exactly-once no-op
        staging = self._staging_dir(epoch_id)
        batch_df.write.mode("overwrite").parquet(staging)
        try:
            os.rename(staging, self._final_dir(epoch_id))  # the commit point
        except OSError:
            # lost a check→rename race: someone committed this epoch
            # between our is_committed probe and the rename. Their commit
            # carries the same replayed batch — dropping ours preserves
            # exactly-once.
            if not self.is_committed(epoch_id):
                raise

    def attach(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        output_mode: str = "append",
    ):
        """Wire to a stream. The checkpoint is what makes a crashed epoch
        replayable with the same epoch_id on restart. `output_mode`
        follows the upstream plan: "append" for record streams and
        suppressed final-only windows, "update" for a refining
        aggregation's changelog (each refinement lands in its epoch;
        result() then reads a changelog — last-wins by epoch per key)."""
        return (
            stream.writeStream.outputMode(output_mode)
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def _recover(self) -> None:
        """Heal an interrupted compact(): restore a displaced out_dir if
        the swap crashed mid-way, sweep stale displaced copies and
        staging roots. Every compact crash point resolves to either the
        pre-compaction or the post-compaction state — never a mix (the
        doubled-rows hazard a strip-after-commit design would have)."""
        import glob as _glob

        olds = sorted(_glob.glob(self.out_dir + ".old-*"))
        if not os.path.isdir(self.out_dir):
            if olds:
                os.rename(olds.pop(), self.out_dir)
        import shutil

        for stale in olds:
            shutil.rmtree(stale)
        for tmp in _glob.glob(self.out_dir + ".compact-*"):
            shutil.rmtree(tmp)

    def compact(self, spark: SparkSession, n_files: int = 1) -> int:
        """Maintenance op (stream must be STOPPED; single actor):
        consolidate all committed epoch data into one new reserved epoch
        dir, keeping every old epoch dir as an EMPTY commit marker so a
        checkpoint-lagged replay of a pre-compaction epoch is still an
        exactly-once no-op. Built as a whole-directory displace-swap: the
        new layout is staged completely, then swapped in two renames;
        _recover() (also run by process_batch/result) heals any crash
        point to a consistent snapshot. This is the small-files answer
        for long-running epoch-keyed sinks; on a real lake it's the table
        format's OPTIMIZE. Returns the reserved epoch id (negative,
        below the -1 bootstrap namespace, fresh per compaction)."""
        import shutil

        self._recover()
        epochs = [
            n for n in os.listdir(self.out_dir) if n.startswith("epoch=")
        ]
        if not epochs:
            return 0
        used = {int(n.split("=", 1)[1]) for n in epochs}
        new_id = min(min(used), -1) - 1
        # erased rows are dropped from the folded data, and the `_dels`
        # sidecar is deliberately NOT carried into the new layout — the
        # swap below is the physical-removal point of delete_ids()
        data = self._apply_erasure(
            spark, spark.read.parquet(self.out_dir)
        ).drop("epoch")
        tmp_root = self.out_dir + f".compact-{abs(new_id)}"
        data.coalesce(n_files).write.mode("overwrite").parquet(
            os.path.join(tmp_root, f"epoch={new_id}")
        )
        for n in epochs:  # empty marker dirs preserve replay idempotence
            os.makedirs(os.path.join(tmp_root, n), exist_ok=True)
        old = self.out_dir + f".old-{abs(new_id)}"
        os.rename(self.out_dir, old)
        os.rename(tmp_root, self.out_dir)
        shutil.rmtree(old)
        return new_id

    def result(self, spark: SparkSession) -> DataFrame:
        """All committed epochs (epoch= partition column included).
        Before any epoch has committed there is nothing to infer a schema
        from — return an empty untyped frame instead of throwing."""
        self._recover()
        has_commits = os.path.isdir(self.out_dir) and any(
            name.startswith("epoch=") for name in os.listdir(self.out_dir)
        )
        if not has_commits:
            return spark.createDataFrame([], "epoch bigint")
        return self._apply_erasure(spark, spark.read.parquet(self.out_dir))


class ErasableIndexMixin:
    """The erasure verb pair, defined ONCE for every accumulated-state
    index built on a set of ExactlyOnceParquetSinks (minhash/LSH pair
    indexes, aHash, substring, boilerplate). Subclasses implement
    `erasure_sinks()` and document their per-index semantics (which
    output rows name a doc, what future batches see) on that hook — the
    verb mechanics (sidecar hide now, physical removal at compact) live
    here so a contract change is one edit, not four."""

    def erasure_sinks(self) -> dict:
        """{name: ExactlyOnceParquetSink} — every sink a doc id must be
        erased from."""
        raise NotImplementedError

    def delete_docs(self, spark, ids) -> None:
        """GDPR erasure: hide the ids from every sink immediately
        (reads anti-join the `_dels` sidecars — including each index's
        in-batch read of its accumulated state, so an erased doc can
        never match a future batch); physical removal happens at the
        next compact(). Single actor; re-runnable (see
        ExactlyOnceParquetSink.delete_ids)."""
        for sink in self.erasure_sinks().values():
            sink.delete_ids(spark, ids)

    def compact(self, spark, n_files: int = 1) -> dict:
        """Fold every sink (stream STOPPED, single actor): consolidates
        epochs AND physically removes erased rows + `_dels` sidecars —
        the no-trace point of delete_docs."""
        return {
            name: sink.compact(spark, n_files)
            for name, sink in self.erasure_sinks().items()
        }
