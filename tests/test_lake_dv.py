"""Deletion vectors (lake_snapshot.snapshot_delete_where_dv): the
merge-on-read delete — row addresses recorded in a sidecar, data files
untouched; reads anti-join; rewrites materialize. Pins: invisibility +
physical immutability, position merging + no re-match, compaction
materialization with a SILENT CDF step, restore re-animating rows with
insert events, vacuum sidecar lifecycle, batch-diff parity (the
shared-file prune must not skip a file whose DV moved)."""

from __future__ import annotations

import glob as g
import os

from pyspark.sql import functions as F

import kstreams_spark.lake_snapshot as ls
from kstreams_spark.io import load_table
from kstreams_spark.lake_snapshot import (
    snapshot_compact,
    snapshot_delete_where_dv,
    snapshot_diff,
    snapshot_merge,
    snapshot_publish,
    snapshot_read,
    snapshot_restore,
    snapshot_versions,
    table_dvs,
    vacuum,
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
    ).withColumn("lang", F.lit("en"))


def _ids(spark, lake, version=None):
    return sorted(
        r.doc_id for r in snapshot_read(spark, lake, version=version).collect()
    )


def test_dv_delete_is_invisible_and_physically_immutable(
    spark, tmp_path, sf_dir
):
    lake = str(tmp_path / "dv")
    corpus = _corpus(spark, sf_dir)
    snapshot_publish(corpus, lake)  # v1
    files_v1 = ls._list_files(lake)
    mtimes = {
        f: os.path.getmtime(os.path.join(lake, f)) for f in files_v1
    }
    n = snapshot_delete_where_dv(spark, lake, "doc_id IN (0, 1, 2)")
    assert n == 3
    assert _ids(spark, lake) == [d for d in range(3, 20)]
    # data files: same set, byte-untouched
    assert ls._list_files(lake) == files_v1
    assert all(
        os.path.getmtime(os.path.join(lake, f)) == mtimes[f]
        for f in files_v1
    )
    # time travel: pre-delete rows intact
    assert _ids(spark, lake, version=1) == list(range(20))
    # the DV map points at one sidecar; positions recorded
    dvs = table_dvs(lake, snapshot_versions(lake)[-1])
    assert sum(len(p) for p in dvs.values()) == 3
    # already-deleted rows never re-match
    assert snapshot_delete_where_dv(spark, lake, "doc_id IN (0, 1, 2)") == 0
    # a second delete merges positions into the same files' vectors
    assert snapshot_delete_where_dv(spark, lake, "doc_id = 4") == 1
    dvs2 = table_dvs(lake, snapshot_versions(lake)[-1])
    assert sum(len(p) for p in dvs2.values()) == 4
    # every read-built verb sees the DV'd world: merge can't resurrect
    src = _corpus(spark, sf_dir, 0, 1).withColumn(
        "text", F.lit("back from the dead?")
    )
    r = snapshot_merge(spark, lake, src)
    assert r["updated"] == 0 and r["inserted"] == 1  # doc 0 is GONE: insert
    assert 0 in _ids(spark, lake)


def test_cdf_reports_dv_deletes_and_compaction_materializes_silently(
    spark, tmp_path, sf_dir
):
    lake = str(tmp_path / "dv_cdf")
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1
    snapshot_delete_where_dv(spark, lake, "doc_id IN (6, 7)")  # v2
    # the DV commit's change feed: exactly the two rows, as deletes
    ev = step_changes(lake, 2, ("doc_id",))
    assert sorted((r[0], r[-2]) for r in ev) == [
        (6, "delete"),
        (7, "delete"),
    ]
    # batch-diff parity — the shared-file prune must NOT skip the file
    # whose DV moved (every file is "shared" in a DV-only commit)
    diff = {
        r.doc_id: r._change for r in snapshot_diff(spark, lake, 1, 2).collect()
    }
    assert diff == {6: "delete", 7: "delete"}
    # compaction MATERIALIZES: dv map empties, rows stay correct...
    assert snapshot_compact(spark, lake, n_files=1) >= 1  # v3
    assert table_dvs(lake, snapshot_versions(lake)[-1]) == {}
    assert 6 not in _ids(spark, lake) and 7 not in _ids(spark, lake)
    # ...and the compact step is SILENT (the DV'd rows must not be
    # reported deleted a second time)
    assert step_changes(lake, 3, ("doc_id",)) == []


def test_restore_reanimates_dv_rows_with_insert_events(
    spark, tmp_path, sf_dir
):
    lake = str(tmp_path / "dv_restore")
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1
    snapshot_delete_where_dv(spark, lake, "doc_id = 5")  # v2
    assert 5 not in _ids(spark, lake)
    snapshot_restore(lake, 1)  # v3: the empty-DV world returns
    assert 5 in _ids(spark, lake)
    assert table_dvs(lake, 3) == {}
    ev = step_changes(lake, 3, ("doc_id",))
    assert [(r[0], r[-2]) for r in ev] == [(5, "insert")]


def test_vacuum_sweeps_unreferenced_dv_sidecars(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "dv_vac")
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1
    snapshot_delete_where_dv(spark, lake, "doc_id = 3")  # v2
    assert len(g.glob(os.path.join(lake, "_log", "dv-*.json"))) == 1
    # while referenced by a retained version, the sidecar survives
    vacuum(lake, keep_versions=2, grace_seconds=0, force=True)
    assert len(g.glob(os.path.join(lake, "_log", "dv-*.json"))) == 1
    assert 3 not in _ids(spark, lake)
    # compaction materializes (v3); dropping the DV versions orphans
    # the sidecar and vacuum sweeps it
    snapshot_compact(spark, lake, n_files=1)
    vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    assert g.glob(os.path.join(lake, "_log", "dv-*.json")) == []
    assert 3 not in _ids(spark, lake)


def test_dv_addressing_survives_relative_lake_path(spark, tmp_path, sf_dir):
    """ADVICE r12: with a RELATIVE lake path, _metadata.file_path (always
    absolute) used to miss the DV anti-join entirely — deleted rows
    silently reappeared. snapshot_read/delete_where_dv now abspath
    first."""
    rel_lake = os.path.relpath(str(tmp_path / "dv_rel"), os.getcwd())
    snapshot_publish(_corpus(spark, sf_dir), rel_lake)  # v1
    assert snapshot_delete_where_dv(spark, rel_lake, "doc_id IN (0, 1)") == 2
    assert _ids(spark, rel_lake) == list(range(2, 20))
    # repeated delete through the relative path: no re-match either
    assert snapshot_delete_where_dv(spark, rel_lake, "doc_id IN (0, 1)") == 0
    # absolute and relative reads agree
    assert _ids(spark, str(tmp_path / "dv_rel")) == list(range(2, 20))


def test_dv_tmp_staging_is_vacuum_swept(spark, tmp_path, sf_dir):
    """ADVICE r12: a crash between DV sidecar staging and rename leaks a
    `.tmp-dv-*` file; vacuum's age-guarded tmp sweep now covers it."""
    lake = str(tmp_path / "dv_tmp")
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1
    orphan = os.path.join(lake, "_log", ".tmp-dv-deadbeef.json")
    with open(orphan, "w") as fh:
        fh.write('{"dvs": {}}')
    old = os.path.getmtime(orphan) - 10
    os.utime(orphan, (old, old))
    vacuum(lake, keep_versions=1, grace_seconds=5, force=True)
    assert not os.path.exists(orphan)
    # a successful sidecar write leaves no staging file behind
    snapshot_delete_where_dv(spark, lake, "doc_id = 0")
    assert g.glob(os.path.join(lake, "_log", ".tmp-*")) == []


def test_dv_position_caps_bound_driver_state(
    spark, tmp_path, sf_dir, monkeypatch
):
    """ADVICE r12 (medium): DV positions are driver state and a per-scan
    broadcast — both the delete's collect and the read's broadcast are
    now capped at DRIVER_DV_MAX_POSITIONS; compaction (the cure) stays
    cap-exempt."""
    import pytest

    lake = str(tmp_path / "dv_cap")
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1: 20 docs
    monkeypatch.setattr(ls, "DRIVER_DV_MAX_POSITIONS", 3)
    with pytest.raises(ValueError, match="copy-on-write"):
        snapshot_delete_where_dv(spark, lake, "doc_id < 5")  # 5 > 3
    assert _ids(spark, lake) == list(range(20))  # nothing committed
    assert snapshot_delete_where_dv(spark, lake, "doc_id < 3") == 3  # == cap
    # budget accounts for EXISTING positions: 3 + 1 would exceed
    with pytest.raises(ValueError, match="snapshot_compact"):
        snapshot_delete_where_dv(spark, lake, "doc_id = 5")
    # reads refuse past the cap...
    monkeypatch.setattr(ls, "DRIVER_DV_MAX_POSITIONS", 2)
    with pytest.raises(ValueError, match="snapshot_compact"):
        snapshot_read(spark, lake).count()
    # ...but compaction is cap-exempt, materializes, and reads recover
    snapshot_compact(spark, lake, n_files=1)
    assert _ids(spark, lake) == list(range(3, 20))
    assert table_dvs(lake, snapshot_versions(lake)[-1]) == {}


def test_merge_on_read_is_dv_tombstones_plus_append(spark, tmp_path, sf_dir):
    """VERDICT r12 task 7 — DV-aware MERGE: matched rows become
    deletion-vector tombstones (prior data files byte-untouched),
    post-images append, ONE commit; the CDF classifies the pairs as
    UPDATES; restore re-animates; compaction materializes."""
    lake = str(tmp_path / "mor")
    snapshot_publish(_corpus(spark, sf_dir), lake)  # v1: docs 0..19
    files_v1 = ls._list_files(lake)
    mtimes = {f: os.path.getmtime(os.path.join(lake, f)) for f in files_v1}
    src = (
        _corpus(spark, sf_dir, 0, 2)
        .unionByName(_corpus(spark, sf_dir, 100, 103))
        .withColumn("text", F.concat(F.lit("NEW:"), F.col("text")))
    )
    r = snapshot_merge(
        spark, lake, src, key_cols=("doc_id",), merge_on_read=True
    )
    assert (r["updated"], r["inserted"]) == (2, 3)
    # prior data files: byte-untouched (merge-on-read's whole point)
    assert files_v1 <= ls._list_files(lake)
    assert all(
        os.path.getmtime(os.path.join(lake, f)) == mtimes[f]
        for f in files_v1
    )
    # reads: post-images win, inserts present, count right
    now = snapshot_read(spark, lake)
    assert now.count() == 23
    by_id = {x.doc_id: x.text for x in now.collect()}
    assert by_id[0].startswith("NEW:") and by_id[100].startswith("NEW:")
    assert not by_id[3].startswith("NEW:")
    # time travel: v1 intact
    assert snapshot_read(spark, lake, version=1).count() == 20
    # the CDF classifies tombstone+append pairs as UPDATES
    v2 = snapshot_versions(lake)[-1]
    rows = step_changes(lake, v2, ("doc_id",))
    changes = {r[0]: r[-2] for r in rows}
    assert changes[0] == "update" and changes[1] == "update"
    assert all(changes[d] == "insert" for d in (100, 101, 102))
    assert len(rows) == 5
    # a second MOR merge on an already-tombstoned key matches the
    # POST-image row (old address never re-matches)
    src2 = (
        _corpus(spark, sf_dir, 0, 1)
        .withColumn("text", F.lit("NEWER"))
    )
    r2 = snapshot_merge(
        spark, lake, src2, key_cols=("doc_id",), merge_on_read=True
    )
    assert (r2["updated"], r2["inserted"]) == (1, 0)
    assert snapshot_read(spark, lake).count() == 23
    assert {
        x.text
        for x in snapshot_read(spark, lake)
        .filter("doc_id = 0")
        .collect()
    } == {"NEWER"}
    # restore rewinds to the pre-merge world
    snapshot_restore(lake, 1)
    assert snapshot_read(spark, lake).count() == 20
    assert not snapshot_read(spark, lake).filter(
        "doc_id = 0"
    ).first().text.startswith("NEW")
    # wide-merge budget refusal
    import pytest as _pytest

    monkey_cap = ls.DRIVER_DV_MAX_POSITIONS
    try:
        ls.DRIVER_DV_MAX_POSITIONS = 1
        with _pytest.raises(ValueError, match="copy-on-write"):
            snapshot_merge(
                spark,
                lake,
                _corpus(spark, sf_dir, 0, 5).withColumn(
                    "text", F.lit("W")
                ),
                key_cols=("doc_id",),
                merge_on_read=True,
            )
    finally:
        ls.DRIVER_DV_MAX_POSITIONS = monkey_cap
    # compaction materializes whatever tombstones remain
    snapshot_compact(spark, lake, n_files=1)
    assert table_dvs(lake, snapshot_versions(lake)[-1]) == {}
    assert snapshot_read(spark, lake).count() == 20
