"""Partitioned lake change feed (sources/lake_cdf.py r13 — VERDICT r12
task 5): `kstreams_lake_cdf_dist` plans ONE InputPartition per changed
file (driver touches only manifests) and emits SIGNED rows (+1 add /
−1 remove); classification is either folded away by sign arithmetic or
done batch-side by classify_changes. Pins: F-files → F partitions,
signed-fold parity with the snapshot, classify_changes parity with
step_changes per version (incl. updates + compaction silence), rename
transparency, and streaming E2E with checkpoint determinism."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.lake_snapshot import (
    snapshot_compact,
    snapshot_delete_where,
    snapshot_merge,
    snapshot_publish,
    snapshot_read,
    snapshot_rename_column,
    snapshot_versions,
)
from kstreams_spark.sources.lake_cdf import (
    LakeChangeFeedDistDataSource,
    _signed_partitions,
    classify_changes,
    step_changes,
)


def _corpus(spark, sf_dir, lo=0, hi=20):
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )
    return d.withColumn(
        "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
    )


def _build_lake(spark, tmp_path, sf_dir) -> str:
    lake = str(tmp_path / "lake")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    snapshot_publish(
        _corpus(spark, sf_dir, 100, 110),
        lake,
        mode="append",
        partition_cols=("split",),
    )  # v2: inserts
    src = _corpus(spark, sf_dir, 0, 2).withColumn(
        "text", F.concat(F.lit("EDIT:"), F.col("text"))
    )
    snapshot_merge(
        spark, lake, src, key_cols=("doc_id",), partition_cols=("split",)
    )  # v3: updates
    snapshot_delete_where(
        spark, lake, "doc_id IN (4, 5)", partition_cols=("split",)
    )  # v4: deletes
    snapshot_compact(spark, lake, n_files=1, partition_cols=("split",))  # v5
    return lake


def _read_signed_stream(spark, lake, tmp_path, qname):
    spark.dataSource.register(LakeChangeFeedDistDataSource)
    q = (
        spark.readStream.format("kstreams_lake_cdf_dist")
        .option("path", lake)
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / (qname + "_ckpt")))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {qname}")


def test_f_changed_files_plan_f_partitions(spark, tmp_path, sf_dir):
    lake = _build_lake(spark, tmp_path, sf_dir)
    for v in snapshot_versions(lake):
        from kstreams_spark.lake_snapshot import _read_manifest

        m = _read_manifest(lake, v)
        f_changed = len(m["adds"]) + len(m["removes"])
        assert len(_signed_partitions(lake, v - 1, v)) == f_changed
    # a multi-version batch plans the union of its versions' files
    total = sum(
        len(_signed_partitions(lake, v - 1, v))
        for v in snapshot_versions(lake)
    )
    assert len(_signed_partitions(lake, 0, snapshot_versions(lake)[-1])) == total
    assert total > 4  # genuinely multi-partition


def test_signed_fold_reconstructs_the_snapshot(spark, tmp_path, sf_dir):
    """Σ sign per key over the whole feed = the latest world: updates'
    −old/+new pairs and compaction's equal-row pairs cancel exactly."""
    lake = _build_lake(spark, tmp_path, sf_dir)
    signed = _read_signed_stream(spark, lake, tmp_path, "dist_fold")
    net = (
        signed.groupBy("doc_id")
        .agg(F.sum("_side").alias("net"))
        .filter("net > 0")
    )
    last = (
        signed.filter("_side = 1")
        .groupBy("doc_id")
        .agg(F.expr("max_by(text, _commit_version)").alias("last"))
    )
    alive = {r.doc_id for r in net.collect()}
    last_by = {r.doc_id: r.last for r in last.collect()}
    world = {d: last_by[d] for d in alive}
    snap = {
        r.doc_id: r.text for r in snapshot_read(spark, lake).collect()
    }
    assert world == snap
    # compaction (v5) nets to zero for every key it touched
    v5 = signed.filter("_commit_version = 5")
    assert v5.count() > 0  # the rewrite DID emit signed rows...
    assert (
        v5.groupBy("doc_id").agg(F.sum("_side").alias("n")).filter("n != 0")
    ).count() == 0  # ...that cancel exactly


def test_classify_changes_matches_step_changes(spark, tmp_path, sf_dir):
    lake = _build_lake(spark, tmp_path, sf_dir)
    signed = _read_signed_stream(spark, lake, tmp_path, "dist_cls")
    got = classify_changes(signed, ("doc_id",))
    for v in snapshot_versions(lake):
        want = sorted(
            step_changes(
                lake, v, ("doc_id",), include_preimages=True
            )
        )
        have = sorted(
            tuple(r)
            for r in got.filter(F.col("_commit_version") == v).collect()
        )
        assert have == want, f"version {v}"


def test_signed_stream_spans_renames(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "ren_lake")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    snapshot_rename_column(lake, "text", "body")
    snapshot_publish(
        _corpus(spark, sf_dir, 100, 103).withColumnRenamed("text", "body"),
        lake,
        mode="append",
        partition_cols=("split",),
    )
    signed = _read_signed_stream(spark, lake, tmp_path, "dist_ren")
    # plan-time schema uses the NEW logical name; pre-rename files
    # resolve through the stable physical name — no NULL column
    assert "body" in signed.columns
    assert signed.filter(F.col("body").isNull()).count() == 0
    assert signed.count() == 23  # 20 v1 inserts + 3 v3 inserts
    # the rename version itself emitted nothing
    assert signed.filter("_commit_version = 2").count() == 0


def test_checkpoint_recovery_sees_only_new_versions(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "ckpt_lake")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    spark.dataSource.register(LakeChangeFeedDistDataSource)
    ckpt = str(tmp_path / "ckpt")
    rows: list = []

    def sink(df, _eid):
        rows.extend(tuple(r) for r in df.collect())

    def run_once():
        q = (
            spark.readStream.format("kstreams_lake_cdf_dist")
            .option("path", lake)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    n_first = len(rows)
    assert n_first == 20
    snapshot_publish(
        _corpus(spark, sf_dir, 100, 104),
        lake,
        mode="append",
        partition_cols=("split",),
    )
    run_once()
    assert len(rows) == n_first + 4  # no replay of v1's rows


def test_dist_version_cap_clamps_after_first_batch(spark, tmp_path, sf_dir):
    """ADVICE r13: latestOffset must honor max_versions_per_batch. The
    Python API hands latestOffset no start offset, so the FIRST batch
    of a run spans the outstanding backlog (clamping against an unknown
    checkpoint offset could regress the stream); every later batch
    advances at most the cap."""
    from kstreams_spark.sources.lake_cdf import (
        LakeChangeFeedPartitionedReader,
    )

    lake = str(tmp_path / "cap_lake")
    for lo in range(0, 10, 2):  # v1..v5
        snapshot_publish(
            _corpus(spark, sf_dir, lo, lo + 2),
            lake,
            mode="append" if lo else "replace",
            partition_cols=("split",),
        )
    r = LakeChangeFeedPartitionedReader(
        {"path": lake, "max_versions_per_batch": "1"}
    )
    assert r.latestOffset() == {"version": 5}  # restart shape: backlog
    # FRESH start (ADVICE r14): initialOffset runs first, so the start
    # version is a known clamp base — batch 0 honors the cap too
    rf = LakeChangeFeedPartitionedReader(
        {"path": lake, "max_versions_per_batch": "2", "start_version": "0"}
    )
    assert rf.initialOffset() == {"version": 0}
    assert rf.latestOffset() == {"version": 2}  # clamped from batch 0
    assert rf.latestOffset() == {"version": 4}
    assert rf.latestOffset() == {"version": 5}
    r2 = LakeChangeFeedPartitionedReader(
        {"path": lake, "max_versions_per_batch": "1"}
    )
    # restart-from-checkpoint shape: partitions() learns the progress
    r2.partitions({"version": 2}, {"version": 3})
    assert r2.latestOffset() == {"version": 4}  # clamped: 3 + 1
    assert r2.latestOffset() == {"version": 5}
    assert r2.latestOffset() == {"version": 5}  # never beyond latest


def test_dist_mid_stream_schema_evolution_raises(spark, tmp_path, sf_dir):
    """ADVICE r13: the partitioned feed needs the same plan-time-schema
    guard step_changes has — columns evolved in after plan time must
    raise, not silently vanish from every signed row."""
    import pytest

    from kstreams_spark.sources.lake_cdf import (
        LakeChangeFeedPartitionedReader,
    )

    lake = str(tmp_path / "evo_lake")
    snapshot_publish(
        _corpus(spark, sf_dir, 0, 4), lake, partition_cols=("split",)
    )  # v1
    plan_names = ["doc_id", "text", "split"]  # fixed pre-evolve
    r = LakeChangeFeedPartitionedReader({"path": lake}, names=plan_names)
    assert len(r.partitions({"version": 0}, {"version": 1})) >= 1
    evolved = _corpus(spark, sf_dir, 30, 31).withColumn(
        "quality", F.lit(0.9)
    )
    snapshot_publish(
        evolved, lake, mode="append", evolve=True,
        partition_cols=("split",),
    )  # v2
    with pytest.raises(ValueError, match="restart the stream"):
        r.partitions({"version": 1}, {"version": 2})


def test_group_by_name_collision_raises(spark, sf_dir):
    """ADVICE r13: KTable.group_by(name=...) colliding with an existing
    data column silently overwrote it pre-guard."""
    import pytest

    from kstreams_spark.dsl import StreamsBuilder

    snap = _corpus(spark, sf_dir)
    table = StreamsBuilder().table(snap, key="doc_id", order_by="doc_id")
    with pytest.raises(ValueError, match="collides"):
        table.group_by("split", name="text")
    # a fresh name still works
    grouped = table.group_by("split", name="grp")
    assert "grp" in grouped.df.columns
