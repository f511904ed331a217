"""SHALLOW CLONE (lake_snapshot.snapshot_clone, r14 — VERDICT r13
task 5): one metadata commit referencing the source's live files, zero
data copy (hardlinks: the inode link count is the filesystem-maintained
refcount). Pins: zero-copy identity (same inodes), divergence in both
directions, time travel on both tables, SOURCE VACUUM SAFETY (the
headline hazard — a force-zero-grace vacuum of the source must not
disturb the clone's reads, and vice versa), metadata carry
(constraints / column map / dropped-physical reservation / DVs /
epochs), and the refusal contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import kstreams_spark.lake_snapshot as ls
from kstreams_spark.io import load_table
from kstreams_spark.lake_snapshot import (
    snapshot_clone,
    snapshot_delete_where,
    snapshot_merge,
    snapshot_publish,
    snapshot_read,
    snapshot_rename_column,
    snapshot_set_constraint,
    snapshot_versions,
    table_constraints,
    vacuum,
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


def test_clone_is_zero_copy_and_diverges_both_ways(spark, tmp_path, sf_dir):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    snapshot_publish(_corpus(spark, sf_dir), src, partition_cols=("split",))
    v = snapshot_clone(src, dst)
    assert v == 1
    # identical rows at the clone point
    rows = lambda p: sorted(  # noqa: E731
        (r.doc_id, r.text) for r in snapshot_read(spark, p).collect()
    )
    assert rows(dst) == rows(src)
    # ZERO copy: every cloned data file shares its source inode
    for f in sorted(ls._live_files(dst, 1)):
        s, d = os.stat(os.path.join(src, f)), os.stat(os.path.join(dst, f))
        assert (s.st_dev, s.st_ino) == (d.st_dev, d.st_ino), f
        assert s.st_nlink >= 2
    # diverge the clone: delete there, source unaffected
    snapshot_delete_where(
        spark, dst, "doc_id IN (0, 1)", partition_cols=("split",)
    )
    assert len(rows(dst)) == len(rows(src)) - 2
    # diverge the source: append there, clone unaffected
    snapshot_publish(
        _corpus(spark, sf_dir, 100, 105),
        src,
        mode="append",
        partition_cols=("split",),
    )
    assert len(rows(src)) == 25 and len(rows(dst)) == 18
    # time travel works on BOTH: each table's v1 is its own clone point
    assert snapshot_read(spark, dst, version=1).count() == 20
    assert snapshot_read(spark, src, version=1).count() == 20


def test_source_vacuum_cannot_disturb_the_clone(spark, tmp_path, sf_dir):
    """The headline hazard: source compaction retires the shared files
    from the SOURCE's live set, then a force-zero-grace vacuum deletes
    the source's names — the clone, holding its own hardlinks, still
    reads every byte. And symmetrically for the clone's vacuum."""
    from kstreams_spark.lake_snapshot import snapshot_compact

    src = str(tmp_path / "vsrc")
    dst = str(tmp_path / "vdst")
    snapshot_publish(
        _corpus(spark, sf_dir).repartition(4),
        src,
        partition_cols=("split",),
    )
    snapshot_clone(src, dst)
    before = sorted(
        (r.doc_id, r.text) for r in snapshot_read(spark, dst).collect()
    )
    # source rewrites everything (compact) then vacuums hard
    snapshot_compact(spark, src, n_files=1, partition_cols=("split",))
    removed = vacuum(src, keep_versions=1, grace_seconds=0, force=True)
    assert removed > 0  # the pre-compact names really were deleted
    got = sorted(
        (r.doc_id, r.text) for r in snapshot_read(spark, dst).collect()
    )
    assert got == before  # clone intact, byte for byte
    # and the clone's own vacuum cannot disturb the source
    snapshot_compact(spark, dst, n_files=1, partition_cols=("split",))
    vacuum(dst, keep_versions=1, grace_seconds=0, force=True)
    assert snapshot_read(spark, src).count() == 20


def test_clone_carries_metadata(spark, tmp_path, sf_dir):
    """Constraints, column map + dropped-physical reservation, DVs, and
    committed epochs all travel; the clone enforces them immediately."""
    src = str(tmp_path / "msrc")
    dst = str(tmp_path / "mdst")
    snapshot_publish(_corpus(spark, sf_dir), src, partition_cols=("split",))
    snapshot_set_constraint(spark, src, "bounded", "doc_id < 1000")
    snapshot_rename_column(src, "text", "body")
    src_df = _corpus(spark, sf_dir, 0, 2).withColumnRenamed("text", "body")
    snapshot_merge(
        spark,
        src,
        src_df.withColumn("body", F.concat(F.lit("E:"), F.col("body"))),
        key_cols=("doc_id",),
        partition_cols=("split",),
        merge_on_read=True,
    )  # leaves live DVs
    snapshot_clone(src, dst)
    assert table_constraints(dst) == {"bounded": "doc_id < 1000"}
    assert ls.table_column_map(dst) == ls.table_column_map(src)
    assert ls.table_dvs(dst, 1) == ls.table_dvs(src, snapshot_versions(src)[-1])
    # the rename resolves: physical column reads back as `body`
    got = snapshot_read(spark, dst)
    assert "body" in got.columns and "text" not in got.columns
    # DV'd rows stay logically deleted in the clone
    assert got.filter(F.col("body").startswith("E:")).count() == 2
    assert got.count() == 20
    # constraint enforced on the clone's first write
    with pytest.raises(ValueError, match="bounded"):
        snapshot_publish(
            _corpus(spark, sf_dir, 0, 1)
            .withColumn("doc_id", F.col("doc_id") + F.lit(2000))
            .withColumnRenamed("text", "body"),
            dst,
            mode="append",
            partition_cols=("split",),
        )


def test_clone_pins_a_version_and_refuses_bad_targets(
    spark, tmp_path, sf_dir
):
    src = str(tmp_path / "psrc")
    snapshot_publish(
        _corpus(spark, sf_dir, 0, 10), src, partition_cols=("split",)
    )  # v1: 10 rows
    snapshot_publish(
        _corpus(spark, sf_dir, 10, 20),
        src,
        mode="append",
        partition_cols=("split",),
    )  # v2: 20 rows
    pinned = str(tmp_path / "pinned")
    snapshot_clone(src, pinned, version=1)
    assert snapshot_read(spark, pinned).count() == 10
    with pytest.raises(ValueError, match="already has commits"):
        snapshot_clone(src, pinned)
    with pytest.raises(ValueError, match="same table"):
        snapshot_clone(src, src)
    with pytest.raises(ValueError, match="not in committed"):
        snapshot_clone(src, str(tmp_path / "x"), version=9)


def test_deep_clone_copies_bytes(spark, tmp_path, sf_dir):
    src = str(tmp_path / "dsrc")
    dst = str(tmp_path / "ddst")
    snapshot_publish(_corpus(spark, sf_dir), src, partition_cols=("split",))
    snapshot_clone(src, dst, deep=True)
    assert snapshot_read(spark, dst).count() == 20
    for f in sorted(ls._live_files(dst, 1)):
        s, d = os.stat(os.path.join(src, f)), os.stat(os.path.join(dst, f))
        assert s.st_ino != d.st_ino, f  # distinct bytes


def test_crashed_clone_retry_completes(spark, tmp_path, sf_dir):
    """A clone that crashed after staging some hardlinks but before its
    commit leaves a version-less dir; re-running the clone is
    idempotent (hardlink identity) and commits."""
    src = str(tmp_path / "csrc")
    dst = str(tmp_path / "cdst")
    snapshot_publish(_corpus(spark, sf_dir), src, partition_cols=("split",))
    # simulate the crash: stage a few links by hand, no manifest
    staged = 0
    for f in sorted(ls._live_files(src, 1)):
        d = os.path.join(dst, f)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        os.link(os.path.join(src, f), d)
        staged += 1
        if staged == 2:
            break
    assert snapshot_versions(dst) == []
    snapshot_clone(src, dst)  # the retry
    assert snapshot_read(spark, dst).count() == 20
