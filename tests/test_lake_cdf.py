"""Lake change-data-feed streaming source (sources/lake_cdf.py):
readStream over the snapshot lake's manifest log. Pins: full-history
stream contents per version (insert/delete/update/compaction-silence),
byte-parity with the batch snapshot_diff per version step, deterministic
replay (exactly-once recovery: a restarted checkpoint sees only new
versions), and the pure-rewrite filter."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import kstreams_spark.lake_snapshot as ls
from kstreams_spark.io import load_table
from kstreams_spark.lake_snapshot import (
    snapshot_compact,
    snapshot_delete_where,
    snapshot_diff,
    snapshot_publish,
    snapshot_read,
    snapshot_versions,
)
from kstreams_spark.sources.lake_cdf import (
    LakeChangeFeedDataSource,
    LakeChangeFeedStreamReader,
    step_changes,
)


def _corpus(spark, sf_dir, lo=0, hi=10):
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )
    return d.withColumn(
        "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
    ).withColumn("lang", F.lit("en"))


def _build_lake_v1_to_v5(spark, sf_dir, lake) -> None:
    """v1 publish(0..9) → v2 append(20,21) → v3 delete(0,1) →
    v4 rewrite train partition changing ONLY doc 2 → v5 compact."""
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1
    snapshot_publish(_corpus(spark, sf_dir, 20, 22), lake, mode="append")  # v2
    snapshot_delete_where(spark, lake, "doc_id IN (0, 1)")  # v3
    # v4: MERGE — doc 2's post-image; the merge rewrites the whole train
    # partition, so every other train row moves files UNCHANGED (the
    # rewrite-noise the row-level diff must filter)
    src = _corpus(spark, sf_dir, 2, 3).withColumn(
        "text", F.lit("rewritten body")
    )
    r = ls.snapshot_merge(spark, lake, src)
    assert r["updated"] == 1 and r["inserted"] == 0
    assert snapshot_compact(spark, lake, n_files=1) >= 1  # v5


def _read_cdf(spark, lake, tmp_path, qname, start_version=0):
    spark.dataSource.register(LakeChangeFeedDataSource)
    stream = (
        spark.readStream.format("kstreams_lake_cdf")
        .option("path", lake)
        .option("start_version", str(start_version))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {qname}").collect()


def test_full_history_stream_events(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "lake")
    _build_lake_v1_to_v5(spark, sf_dir, lake)
    rows = _read_cdf(spark, lake, tmp_path, "cdf_full")
    by_v = {}
    for r in rows:
        by_v.setdefault(r._commit_version, []).append(r)
    # v1: ten inserts
    assert sorted(r.doc_id for r in by_v[1]) == list(range(10))
    assert {r._change for r in by_v[1]} == {"insert"}
    # v2: the two appended docs
    assert sorted((r.doc_id, r._change) for r in by_v[2]) == [
        (20, "insert"),
        (21, "insert"),
    ]
    # v3: deletes only — the rewritten survivors are filtered
    assert sorted((r.doc_id, r._change) for r in by_v[3]) == [
        (0, "delete"),
        (1, "delete"),
    ]
    # v4: exactly one update (post-image), rewrite noise silent
    assert [(r.doc_id, r._change, r.text) for r in by_v[4]] == [
        (2, "update", "rewritten body")
    ]
    # v5 (compact): pure re-layout emits NOTHING
    assert 5 not in by_v
    # partition columns parsed off the directory names
    assert {r.split for r in by_v[1]} == {"train", "val"}
    assert {r.lang for r in rows} == {"en"}


def test_step_parity_with_snapshot_diff(spark, tmp_path, sf_dir):
    """Each version step's stream rows equal the batch snapshot_diff of
    that step (same keys, same _change, same data) — the streaming and
    batch halves of the change feed cannot drift."""
    lake = str(tmp_path / "lake")
    _build_lake_v1_to_v5(spark, sf_dir, lake)
    for v in (2, 3, 4, 5):
        got = {
            (r[0], r[4], r[1])  # (doc_id, _change, text)
            for r in step_changes(lake, v, ("doc_id",))
        }
        want = {
            (r.doc_id, r._change, r.text)
            for r in snapshot_diff(spark, lake, v - 1, v).collect()
        }
        assert got == want, f"v{v}: {got} != {want}"


def test_replay_is_deterministic_and_recovery_sees_only_new_versions(
    spark, tmp_path, sf_dir
):
    lake = str(tmp_path / "lake")
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1
    snapshot_publish(_corpus(spark, sf_dir, 20, 22), lake, mode="append")  # v2

    # unit replay: a committed slice regenerates bit-for-bit
    r = LakeChangeFeedStreamReader({"path": lake})
    batch, off = r.read({"version": 0})
    assert off == {"version": 2}
    assert sorted(batch) == sorted(r.readBetweenOffsets({"version": 0}, off))
    # caught-up reader: empty batch, offset unchanged
    empty, same = r.read(off)
    assert list(empty) == [] and same == off

    # run 1 consumes v1..v2, then the lake advances (foreachBatch — the
    # memory sink does not support checkpoint recovery)
    spark.dataSource.register(LakeChangeFeedDataSource)
    stream = (
        spark.readStream.format("kstreams_lake_cdf")
        .option("path", lake)
        .load()
    )
    ckpt = str(tmp_path / "ckpt_recover")

    def run(collector):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _eid: collector.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run1: list = []
    run(run1)
    assert len(run1) == 12

    snapshot_delete_where(spark, lake, "doc_id IN (20)")  # v3
    run2: list = []
    run(run2)
    # same checkpoint → ONLY the post-restart version's changes
    assert [(r.doc_id, r._change, r._commit_version) for r in run2] == [
        (20, "delete", 3)
    ]


def test_start_version_skips_history(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "lake")
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1
    snapshot_publish(_corpus(spark, sf_dir, 20, 22), lake, mode="append")  # v2
    rows = _read_cdf(spark, lake, tmp_path, "cdf_tail", start_version=1)
    assert sorted(r.doc_id for r in rows) == [20, 21]
    assert {r._commit_version for r in rows} == {2}


def test_schema_carries_lake_columns_plus_cdc_meta(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "lake")
    snapshot_publish(_corpus(spark, sf_dir), lake)
    spark.dataSource.register(LakeChangeFeedDataSource)
    stream = (
        spark.readStream.format("kstreams_lake_cdf")
        .option("path", lake)
        .load()
    )
    assert stream.columns == [
        "doc_id",
        "text",
        "split",
        "lang",
        "_change",
        "_commit_version",
    ]


def test_update_detection_ignores_nan_rewrites(tmp_path):
    """_eq: NaN == NaN (a compaction rewrite of a NaN row is silent) and
    arrays compare element-wise."""
    from kstreams_spark.sources.lake_cdf import _eq

    nan = float("nan")
    assert _eq(nan, nan)
    assert not _eq(nan, 1.0)
    assert _eq([1.0, nan], [1.0, nan])
    assert not _eq([1.0, nan], [nan, 1.0])
    assert _eq(None, None) and not _eq(None, 0)


def test_stream_spans_schema_evolution(spark, tmp_path, sf_dir):
    """The stream's schema is the latest version's; steps committed
    BEFORE an ADD-COLUMN evolve emit None for the later-added column
    (the same NULL-fill snapshot_read gives old files)."""
    lake = str(tmp_path / "lake_evolve")
    snapshot_publish(_corpus(spark, sf_dir, 0, 4), lake)  # v1: 4 docs
    evolved = (
        _corpus(spark, sf_dir, 30, 31).withColumn("quality", F.lit(0.9))
    )
    snapshot_publish(evolved, lake, mode="append", evolve=True)  # v2
    rows = _read_cdf(spark, lake, tmp_path, "cdf_evolved")
    assert {r.doc_id: r.quality for r in rows} == {
        0: None,
        1: None,
        2: None,
        3: None,
        30: 0.9,
    }
    assert all(r._change == "insert" for r in rows)


def test_mid_stream_schema_evolution_raises(spark, tmp_path, sf_dir):
    """ADVICE r12: a schema evolve committed AFTER the stream's plan
    fixed its column list must fail loudly (Delta's behavior), not
    silently drop the new column from every subsequent change row."""
    import pytest

    lake = str(tmp_path / "lake_mid_evolve")
    snapshot_publish(_corpus(spark, sf_dir, 0, 4), lake)  # v1
    plan_names = ["doc_id", "text", "split", "lang"]  # fixed pre-evolve
    # pre-evolve step replays fine under the plan-time columns
    assert len(step_changes(lake, 1, ("doc_id",), names=plan_names)) == 4
    evolved = _corpus(spark, sf_dir, 30, 31).withColumn(
        "quality", F.lit(0.9)
    )
    snapshot_publish(evolved, lake, mode="append", evolve=True)  # v2
    with pytest.raises(ValueError, match="restart the stream"):
        step_changes(lake, 2, ("doc_id",), names=plan_names)
