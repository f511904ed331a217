"""Column mapping (lake_snapshot.snapshot_rename_column, r13 — VERDICT
r12 task 4): ALTER TABLE RENAME COLUMN as a metadata-only commit. Data
files keep the stable PHYSICAL name; the manifest's column_map binds
the logical name; every read/write path resolves it. Pins: physical
immutability, time travel per-version names, append/merge/delete/
compact/DV-delete after a rename, CDF + snapshot_diff transparency
(zero spurious changes), restore rewinds the map, and the guard set
(existing name, physical-name reuse, partition column, CHECK
reference)."""

from __future__ import annotations

import glob as g
import os

import pytest
from pyspark.sql import functions as F

import kstreams_spark.lake_snapshot as ls
from kstreams_spark.io import load_table
from kstreams_spark.lake_snapshot import (
    snapshot_compact,
    snapshot_delete_where,
    snapshot_delete_where_dv,
    snapshot_merge,
    snapshot_publish,
    snapshot_read,
    snapshot_rename_column,
    snapshot_restore,
    snapshot_set_constraint,
    snapshot_versions,
    table_column_map,
)
from kstreams_spark.sources.lake_cdf import step_changes


def _corpus(spark, sf_dir, lo=0, hi=20):
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )
    return d.withColumn(
        "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
    )


def test_rename_is_metadata_only_with_per_version_names(
    spark, tmp_path, sf_dir
):
    lake = str(tmp_path / "ren")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    files_v1 = ls._list_files(lake)
    mtimes = {f: os.path.getmtime(os.path.join(lake, f)) for f in files_v1}
    v2 = snapshot_rename_column(lake, "text", "body")
    assert v2 == 2
    # zero data movement
    assert ls._list_files(lake) == files_v1
    assert all(
        os.path.getmtime(os.path.join(lake, f)) == mtimes[f]
        for f in files_v1
    )
    assert table_column_map(lake) == {"body": "text"}
    # latest reads the new logical name, with the OLD files' data
    now = snapshot_read(spark, lake)
    assert now.columns == ["doc_id", "body", "split"]
    assert now.filter(F.col("body").isNull()).count() == 0
    assert now.count() == 20
    # time travel keeps v1's own name
    old = snapshot_read(spark, lake, version=1)
    assert old.columns == ["doc_id", "text", "split"]
    # a manifest-bypassing reader sees the PHYSICAL name (the contract)
    raw = spark.read.parquet(lake)
    assert "text" in raw.columns and "body" not in raw.columns


def test_all_write_paths_resolve_the_map(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "ren_verbs")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    snapshot_rename_column(lake, "text", "body")
    # append under the new name: files store the physical name
    snapshot_publish(
        _corpus(spark, sf_dir, 100, 105).withColumnRenamed("text", "body"),
        lake,
        mode="append",
        partition_cols=("split",),
    )
    assert snapshot_read(spark, lake).filter(
        F.col("body").isNull()
    ).count() == 0
    # merge: post-image under the new name
    src = (
        _corpus(spark, sf_dir, 0, 1)
        .withColumnRenamed("text", "body")
        .withColumn("body", F.lit("REPLACED"))
    )
    r = snapshot_merge(
        spark, lake, src, key_cols=("doc_id",), partition_cols=("split",)
    )
    assert (r["updated"], r["inserted"]) == (1, 0)
    got = (
        snapshot_read(spark, lake)
        .filter(F.col("doc_id") == 0)
        .first()
    )
    assert got.body == "REPLACED"
    # CoW delete with a predicate on the logical name
    assert (
        snapshot_delete_where(
            spark, lake, "body = 'REPLACED'", partition_cols=("split",)
        )
        == 1
    )
    # DV delete with a logical-name predicate
    n = snapshot_delete_where_dv(spark, lake, "doc_id = 1")
    assert n == 1
    ids = sorted(
        r.doc_id for r in snapshot_read(spark, lake).collect()
    )
    assert 0 not in ids and 1 not in ids and 100 in ids
    # compact materializes and keeps answers
    before = sorted(
        (r.doc_id, r.body) for r in snapshot_read(spark, lake).collect()
    )
    snapshot_compact(spark, lake, n_files=1, partition_cols=("split",))
    after = sorted(
        (r.doc_id, r.body) for r in snapshot_read(spark, lake).collect()
    )
    assert before == after
    # compaction rewrote under the physical name: raw files still 'text'
    raw = spark.read.parquet(lake)
    assert "text" in raw.columns and "body" not in raw.columns


def test_cdf_and_diff_span_renames_with_zero_spurious_changes(
    spark, tmp_path, sf_dir
):
    from kstreams_spark.lake_snapshot import snapshot_diff

    lake = str(tmp_path / "ren_cdf")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    v2 = snapshot_rename_column(lake, "text", "body")
    # the rename commit itself: a metadata-only step, zero change rows
    assert step_changes(lake, v2, ("doc_id",)) == []
    assert snapshot_diff(spark, lake, 1, v2).count() == 0
    # an append after the rename still keys/classifies correctly, and a
    # stream planned BEFORE the rename (old logical names) spans it
    snapshot_publish(
        _corpus(spark, sf_dir, 100, 103).withColumnRenamed("text", "body"),
        lake,
        mode="append",
        partition_cols=("split",),
    )
    pre_plan_names = ["doc_id", "text", "split"]  # plan-time, pre-rename
    rows = step_changes(lake, 3, ("doc_id",), names=pre_plan_names)
    assert sorted(r[0] for r in rows) == [100, 101, 102]
    assert all(r[-2] == "insert" and r[1] is not None for r in rows)
    # a stream planned AFTER the rename replays pre-rename steps too
    post_plan_names = ["doc_id", "body", "split"]
    rows_v1 = step_changes(lake, 1, ("doc_id",), names=post_plan_names)
    assert len(rows_v1) == 20 and all(r[1] is not None for r in rows_v1)
    # batch diff across the whole span: only the appends
    d = snapshot_diff(spark, lake, 1)
    assert sorted(r.doc_id for r in d.collect()) == [100, 101, 102]
    assert set(r._change for r in d.collect()) == {"insert"}


def test_restore_rewinds_the_column_map(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "ren_restore")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    snapshot_rename_column(lake, "text", "body")
    snapshot_restore(lake, 1)
    assert table_column_map(lake) == {}
    assert snapshot_read(spark, lake).columns == ["doc_id", "text", "split"]


def test_rename_guards(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "ren_guards")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    with pytest.raises(ValueError, match="no column"):
        snapshot_rename_column(lake, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        snapshot_rename_column(lake, "text", "doc_id")
    with pytest.raises(ValueError, match="partition column"):
        snapshot_rename_column(lake, "split", "part")
    # CHECK constraints referencing the column refuse
    snapshot_set_constraint(spark, lake, "has_text", "length(text) >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        snapshot_rename_column(lake, "text", "body")
    from kstreams_spark.lake_snapshot import snapshot_drop_constraint

    snapshot_drop_constraint(lake, "has_text")
    snapshot_rename_column(lake, "text", "body")
    # the forbid-reuse rule: 'text' is body's PHYSICAL name in files
    with pytest.raises(ValueError, match="PHYSICAL name"):
        snapshot_rename_column(lake, "doc_id", "text")
    # chained rename keeps the ORIGINAL physical name stable
    snapshot_rename_column(lake, "body", "content")
    assert table_column_map(lake) == {"content": "text"}
    assert (
        snapshot_read(spark, lake)
        .filter(F.col("content").isNull())
        .count()
        == 0
    )
    # replace resets the map (fresh schema, identity mapping)
    snapshot_publish(
        _corpus(spark, sf_dir, 0, 5), lake, partition_cols=("split",)
    )
    assert table_column_map(lake) == {}


def test_drop_column_is_metadata_only_with_reservation(
    spark, tmp_path, sf_dir
):
    """r13: DROP COLUMN without rewrite — reads exclude it, time travel
    keeps it, the physical name stays reserved against evolve-adds and
    renames, restore rewinds, replace resets."""
    from kstreams_spark.lake_snapshot import snapshot_drop_column

    lake = str(tmp_path / "drop")
    corpus = _corpus(spark, sf_dir).withColumn(
        "quality", F.col("doc_id").cast("double") / 10
    )
    snapshot_publish(corpus, lake, partition_cols=("split",))  # v1
    files_v1 = ls._list_files(lake)
    v2 = snapshot_drop_column(lake, "quality")
    assert v2 == 2 and ls._list_files(lake) == files_v1  # nothing moved
    assert snapshot_read(spark, lake).columns == ["doc_id", "text", "split"]
    # time travel still reads it
    old = snapshot_read(spark, lake, version=1)
    assert "quality" in old.columns
    assert old.filter(F.col("quality").isNull()).count() == 0
    # appends now come WITHOUT the column
    snapshot_publish(
        _corpus(spark, sf_dir, 100, 103),
        lake,
        mode="append",
        partition_cols=("split",),
    )
    assert snapshot_read(spark, lake).count() == 23
    # re-adding the dropped name refuses (its bytes are still in files)
    with pytest.raises(ValueError, match="PHYSICAL name"):
        snapshot_publish(
            _corpus(spark, sf_dir, 200, 201).withColumn(
                "quality", F.lit(0.5)
            ),
            lake,
            mode="append",
            partition_cols=("split",),
            evolve=True,
        )
    # renaming another column ONTO the dropped name refuses too
    with pytest.raises(ValueError, match="PHYSICAL name"):
        snapshot_rename_column(lake, "text", "quality")
    # a FRESH name still evolves fine
    snapshot_publish(
        _corpus(spark, sf_dir, 200, 201).withColumn("score", F.lit(0.5)),
        lake,
        mode="append",
        partition_cols=("split",),
        evolve=True,
    )
    assert "score" in snapshot_read(spark, lake).columns
    # restore rewinds the drop (column + reservation state of v1)
    snapshot_restore(lake, 1)
    now = snapshot_read(spark, lake)
    assert "quality" in now.columns
    assert now.filter(F.col("quality").isNull()).count() == 0


def test_drop_column_guards(spark, tmp_path, sf_dir):
    from kstreams_spark.lake_snapshot import snapshot_drop_column

    lake = str(tmp_path / "drop_guards")
    snapshot_publish(_corpus(spark, sf_dir), lake, partition_cols=("split",))
    with pytest.raises(ValueError, match="no column"):
        snapshot_drop_column(lake, "nope")
    with pytest.raises(ValueError, match="partition column"):
        snapshot_drop_column(lake, "split")
    snapshot_set_constraint(spark, lake, "has_text", "length(text) >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        snapshot_drop_column(lake, "text")
    # drop after a RENAME reserves the ORIGINAL physical name
    from kstreams_spark.lake_snapshot import snapshot_drop_constraint

    snapshot_drop_constraint(lake, "has_text")
    snapshot_rename_column(lake, "text", "body")
    snapshot_drop_column(lake, "body")
    from kstreams_spark.lake_snapshot import _read_manifest

    m = _read_manifest(lake, snapshot_versions(lake)[-1])
    assert m["dropped_physical"] == ["text"]
    with pytest.raises(ValueError, match="PHYSICAL name"):
        snapshot_publish(
            _corpus(spark, sf_dir, 0, 1).select("doc_id", "split")
            .withColumn("text", F.lit("x")),
            lake,
            mode="append",
            partition_cols=("split",),
            evolve=True,
        )
