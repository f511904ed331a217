"""Exactly-once guarantee, demonstrated and proven by forced failure:
checkpointed source replay + epoch-id-keyed idempotent commits means a
crash at the worst moment (after data is written, before the commit
rename) produces zero duplicates and zero losses after restart."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.StringType()),
    ]
)


def _write_batch(src_dir: str, name: str, ids: range) -> None:
    with open(os.path.join(src_dir, name), "w") as f:
        for i in ids:
            f.write(json.dumps({"event_id": i, "value": f"v{i}"}) + "\n")


class CrashingSink:
    """ExactlyOnceParquetSink wrapper that simulates a post-write,
    pre-commit crash on its first attempt: the staging data is fully on
    disk, but the epoch was never published."""

    def __init__(self, inner):
        self.inner = inner
        self.crashed_once = False

    def process_batch(self, batch_df, epoch_id: int) -> None:
        if self.inner.is_committed(epoch_id):
            return
        staging = self.inner._staging_dir(epoch_id)
        batch_df.write.mode("overwrite").parquet(staging)
        if not self.crashed_once:
            self.crashed_once = True
            raise RuntimeError("injected crash between write and commit")
        os.rename(staging, self.inner._final_dir(epoch_id))


def test_exactly_once_across_crash_and_restart(spark, tmp_path):
    from pyspark.errors import StreamingQueryException

    from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(out)
    _write_batch(src, "b1.json", range(0, 100))

    sink = ExactlyOnceParquetSink(out)
    crashy = CrashingSink(sink)

    # attempt 1: the injected crash fails the query AFTER the batch's
    # parquet hit disk — the at-least-once hazard made real
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        stream.writeStream.foreachBatch(crashy.process_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        raise AssertionError("expected the injected crash to fail the query")
    except StreamingQueryException:
        pass
    finally:
        q.stop()
    assert crashy.crashed_once
    # data is on disk in staging, but NOTHING is committed
    assert os.path.exists(sink._staging_dir(0))
    assert not any(n.startswith("epoch=") for n in os.listdir(out))

    # restart from the same checkpoint: the SAME epoch replays with the
    # SAME epoch_id and commits exactly once
    q2 = sink.attach(spark.readStream.schema(SCHEMA).json(src), ckpt)
    q2.processAllAvailable()

    # a second batch while running proves the stream continues normally
    _write_batch(src, "b2.json", range(100, 150))
    q2.processAllAvailable()
    q2.stop()

    got = sink.result(spark)
    assert got.count() == 150, "no duplicates, no losses"
    ids = sorted(r.event_id for r in got.select("event_id").collect())
    assert ids == list(range(150))


def test_committed_epoch_replay_is_noop(spark, tmp_path):
    """Crash AFTER the commit rename: the replayed epoch must not write a
    second copy (the idempotence half of the guarantee)."""
    from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

    out = str(tmp_path / "out2")
    os.makedirs(out)
    sink = ExactlyOnceParquetSink(out)
    batch = spark.createDataFrame([(i, f"v{i}") for i in range(10)], SCHEMA)
    sink.process_batch(batch, epoch_id=0)
    sink.process_batch(batch, epoch_id=0)  # replay of committed epoch
    assert sink.result(spark).count() == 10


def test_result_empty_before_any_commit(spark, tmp_path):
    """result() before the first commit returns an empty frame instead of
    throwing unable-to-infer-schema (ADVICE r2)."""
    from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "never_written"))
    assert sink.result(spark).count() == 0
    # and with the dir existing but holding only staging leftovers
    out = str(tmp_path / "staging_only")
    os.makedirs(os.path.join(out, "_inprogress-0"))
    assert ExactlyOnceParquetSink(out).result(spark).count() == 0


def test_lost_commit_race_is_noop(spark, tmp_path):
    """A rename that loses the check→rename race to a concurrent commit of
    the SAME epoch is an idempotent no-op, not an error (ADVICE r2)."""
    from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "raced"))
    sink.process_batch(spark.range(5).toDF("event_id"), 0)

    # force the entry guard to miss so process_batch re-attempts the
    # rename against the already-committed final dir (ENOTEMPTY)
    orig = sink.is_committed
    seen = []
    sink.is_committed = lambda e: (seen.append(e), False)[1] if not seen else orig(e)
    sink.process_batch(spark.range(5).toDF("event_id"), 0)  # must not raise

    rows = sink.result(spark).filter("epoch = 0").count()
    assert rows == 5  # still exactly once


def test_compact_preserves_rows_markers_and_future_epochs(spark, tmp_path):
    """compact() consolidates committed epochs into one reserved dir,
    keeps the old epoch dirs as empty commit markers (a lagged replay is
    still a no-op), shrinks the file count, and future epochs land
    normally. Second compaction picks a fresh reserved id."""
    import glob

    from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    for epoch in range(3):
        sink.process_batch(
            spark.range(epoch * 10, epoch * 10 + 10).toDF("event_id"), epoch
        )
    before_files = len(glob.glob(str(tmp_path / "out" / "epoch=*" / "*.parquet")))
    before_rows = sorted(
        r.event_id for r in sink.result(spark).select("event_id").collect()
    )

    new_id = sink.compact(spark)
    assert new_id <= -2
    after_files = len(glob.glob(str(tmp_path / "out" / "epoch=*" / "*.parquet")))
    assert after_files < before_files, (before_files, after_files)
    assert sorted(
        r.event_id for r in sink.result(spark).select("event_id").collect()
    ) == before_rows

    # markers intact: replaying a pre-compaction epoch is a no-op
    assert sink.is_committed(1)
    sink.process_batch(spark.range(100, 110).toDF("event_id"), 1)
    assert sink.result(spark).count() == 30

    # a genuinely new epoch still lands
    sink.process_batch(spark.range(30, 35).toDF("event_id"), 3)
    assert sink.result(spark).count() == 35

    # second compaction reserves a FRESH id (never collides with its own marker)
    second = sink.compact(spark)
    assert second < new_id
    assert sink.result(spark).count() == 35


def test_compact_crash_windows_never_double_or_lose(spark, tmp_path):
    """The compact swap's two dangerous windows, simulated: (a) out_dir
    displaced but the new layout not yet moved in → recovery restores
    the pre-compaction snapshot; (b) stale displaced copy next to a live
    compacted dir → swept, rows NOT doubled."""
    import shutil

    from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

    out = str(tmp_path / "out")
    sink = ExactlyOnceParquetSink(out)
    for epoch in range(2):
        sink.process_batch(
            spark.range(epoch * 10, epoch * 10 + 10).toDF("event_id"), epoch
        )

    # window (a): displaced, nothing moved in yet
    os.rename(out, out + ".old-7")
    assert sink.result(spark).count() == 20  # recovery restored it
    assert not os.path.exists(out + ".old-7")

    # window (b): live dir + stale displaced copy with the same data
    shutil.copytree(out, out + ".old-8")
    assert sink.result(spark).count() == 20  # swept, not doubled
    assert not os.path.exists(out + ".old-8")

    # and a leftover staging root from a dead compact is swept too
    shutil.copytree(out, out + ".compact-9")
    assert sink.result(spark).count() == 20
    assert not os.path.exists(out + ".compact-9")
