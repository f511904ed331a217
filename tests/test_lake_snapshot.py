"""Snapshot lake (r11 task 2): cross-partition atomic commits + time
travel over plain parquet.

The headline pair, mirroring test_hybrid_ingest's torn-read shape:
- RED-BEFORE: io.delete_where crashed between two partition swaps
  leaves the lake TORN — the doc deleted from partition A, alive in
  partition B — and _lake_recover (per-dir contract) cannot un-tear it.
- GREEN-AFTER: the same multi-partition delete through
  snapshot_delete_where is invisible until the single manifest rename;
  a crash at ANY earlier point (mid-rewrite orphan files, pre-commit)
  leaves every reader on the full old snapshot, and the re-run
  completes. Plus: time travel to the pre-delete version, compaction
  answer-stability, and vacuum sweeping orphans + expired versions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import kstreams_spark.lake_snapshot as ls
from kstreams_spark.io import _lake_recover, delete_where, load_table
from kstreams_spark.lake_snapshot import (
    snapshot_compact,
    snapshot_delete_where,
    snapshot_publish,
    snapshot_read,
    snapshot_versions,
    vacuum,
)

DOOMED = 6  # even → one row in split=train AND (via +1 twin) one in val


def _corpus(spark, sf_dir):
    """Fixture docs partitioned 2×1; the doomed doc has rows in BOTH
    split partitions (doc_id and its odd twin share a logical key)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.withColumn(
        "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
    ).withColumn("lang", F.lit("en"))


def _key_rows(spark, df, keys=(DOOMED, DOOMED + 1)):
    return (
        df.filter(F.col("doc_id").isin(list(keys)))
        .select("doc_id", "split")
        .collect()
    )


def test_plain_lake_delete_crash_is_torn_across_partitions(
    spark, tmp_path, sf_dir, monkeypatch
):
    """RED: the per-directory contract, demonstrated. The delete spans
    both split partitions; crashing after partition 1's swap leaves the
    lake half-deleted, and recovery keeps it that way."""
    lake = str(tmp_path / "plain")
    _corpus(spark, sf_dir).write.partitionBy("split", "lang").parquet(lake)
    cond = f"doc_id IN ({DOOMED}, {DOOMED + 1})"
    assert len(_key_rows(spark, spark.read.parquet(lake))) == 2

    real_rename = os.rename
    swaps = {"n": 0}

    def dying_rename(src, dst):
        if src.endswith(".new-del") or dst.endswith(".old-del"):
            swaps["n"] += 1
            if swaps["n"] == 3:  # partition 1 fully swapped; crash here
                raise OSError("injected crash between partition swaps")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", dying_rename)
    with pytest.raises(OSError, match="injected"):
        delete_where(spark, lake, cond)
    monkeypatch.setattr(os, "rename", real_rename)
    _lake_recover(lake)  # heals per dir — the tear is the point
    left = _key_rows(spark, spark.read.parquet(lake))
    assert len(left) == 1, (
        "expected the documented torn state: deleted in one partition, "
        f"alive in the other; got {left}"
    )


def test_snapshot_delete_is_all_or_nothing_with_time_travel(
    spark, tmp_path, sf_dir, monkeypatch
):
    """GREEN: same multi-partition delete through the manifest log."""
    lake = str(tmp_path / "snap")
    corpus = _corpus(spark, sf_dir)
    v1 = snapshot_publish(corpus, lake)
    assert v1 == 1
    n_total = corpus.count()
    cond = f"doc_id IN ({DOOMED}, {DOOMED + 1})"

    # crash 1: orphan files from a half-done rewrite (simulated by an
    # uncommitted append into ONE partition) are invisible to readers
    corpus.filter(F.col("doc_id") == DOOMED).filter("1=0").unionByName(
        corpus.limit(1)
    ).write.mode("append").partitionBy("split", "lang").parquet(lake)
    assert snapshot_read(spark, lake).count() == n_total

    # crash 2: the commit itself dies — every rewrite done, nothing
    # visible; both partitions still serve the doomed rows
    real_commit = ls._commit

    def dying_commit(*a, **k):
        raise RuntimeError("injected crash at commit")

    monkeypatch.setattr(ls, "_commit", dying_commit)
    with pytest.raises(RuntimeError, match="injected"):
        snapshot_delete_where(spark, lake, cond)
    assert len(_key_rows(spark, snapshot_read(spark, lake))) == 2  # all-old
    monkeypatch.setattr(ls, "_commit", real_commit)

    # the re-run commits: all-new across BOTH partitions atomically
    deleted = snapshot_delete_where(spark, lake, cond)
    assert deleted == 2
    v2 = snapshot_versions(lake)[-1]
    now = snapshot_read(spark, lake)
    assert len(_key_rows(spark, now)) == 0
    assert now.count() == n_total - 2

    # time travel: the pre-delete snapshot is intact
    old = snapshot_read(spark, lake, version=v1)
    assert len(_key_rows(spark, old)) == 2
    assert old.count() == n_total

    # vacuum: retire v1 + sweep the orphans; v2 unchanged
    removed = vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    assert removed > 0
    assert snapshot_versions(lake) == [v2]
    assert snapshot_read(spark, lake).count() == n_total - 2
    with pytest.raises(ValueError, match="not in committed versions"):
        snapshot_read(spark, lake, version=v1)


def test_snapshot_compact_is_answer_stable(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "cmp")
    corpus = _corpus(spark, sf_dir).repartition(4)
    snapshot_publish(corpus, lake)
    before = {
        (r.doc_id, r.text, r.split, r.lang)
        for r in snapshot_read(spark, lake).collect()
    }
    n = snapshot_compact(spark, lake, n_files=1)
    assert n >= 1
    after_df = snapshot_read(spark, lake)
    assert {
        (r.doc_id, r.text, r.split, r.lang) for r in after_df.collect()
    } == before
    # physically one live file per partition
    by_dir = {}
    for f in ls._live_files(lake, snapshot_versions(lake)[-1]):
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    assert all(len(v) == 1 for v in by_dir.values())
    # pre-compact version still readable until vacuumed
    assert snapshot_read(spark, lake, version=1).count() == len(before)
    vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    assert snapshot_read(spark, lake).count() == len(before)


def test_snapshot_null_predicate_rows_are_kept(spark, tmp_path):
    lake = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, "a", "train", "en"), (2, None, "train", "en"), (3, "b", "val", "en")],
        "doc_id long, text string, split string, lang string",
    )
    snapshot_publish(df, lake)
    # predicate is NULL for doc 2 — SQL DELETE keeps it
    assert snapshot_delete_where(spark, lake, "text = 'a'") == 1
    got = sorted(r.doc_id for r in snapshot_read(spark, lake).collect())
    assert got == [2, 3]


def test_snapshot_lake_sink_exactly_once_and_epoch_time_travel(
    spark, tmp_path, sf_dir, monkeypatch
):
    """SnapshotLakeSink: one snapshot commit per microbatch — replay of
    a committed epoch no-ops, a crash between append and commit leaves
    readers on the old snapshot and the replay heals, time travel
    reaches batch boundaries, and the committed-epoch set survives
    vacuum (a late replay after vacuum must STILL no-op)."""
    from kstreams_spark.lake_snapshot import SnapshotLakeSink

    docs = _corpus(spark, sf_dir)
    b0 = docs.filter(F.col("doc_id") < 100)
    b1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    b2 = docs.filter(F.col("doc_id") >= 200)
    lake = str(tmp_path / "stream_lake")
    sink = SnapshotLakeSink(lake)

    sink.process_batch(b0, 0)
    n0 = b0.count()
    assert snapshot_read(spark, lake).count() == n0
    sink.process_batch(b0, 0)  # replay: exactly-once no-op
    assert snapshot_read(spark, lake).count() == n0
    assert snapshot_versions(lake) == [1]

    # crash: epoch 1's append lands, the commit dies — readers stay on
    # epoch 0's snapshot; the replay appends again and commits once
    real_commit = ls._commit
    monkeypatch.setattr(
        ls, "_commit", lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    )
    with pytest.raises(RuntimeError, match="boom"):
        sink.process_batch(b1, 1)
    monkeypatch.setattr(ls, "_commit", real_commit)
    assert snapshot_read(spark, lake).count() == n0  # all-old
    sink.process_batch(b1, 1)
    n01 = n0 + b1.count()
    got = snapshot_read(spark, lake)
    assert got.count() == n01
    assert got.dropDuplicates(["doc_id"]).count() == n01  # no dup rows

    sink.process_batch(b2, 2)
    # time travel to the epoch-1 boundary
    assert snapshot_read(spark, lake, version=2).count() == n01
    assert sink.committed_epochs() == {0, 1, 2}

    # vacuum retires old versions AND the crash orphans; the epoch set
    # is carried forward, so a checkpoint-lagged replay still no-ops
    removed = vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    assert removed > 0  # the crashed append's orphan files at minimum
    total = docs.count()
    sink.process_batch(b0, 0)
    assert snapshot_read(spark, lake).count() == total
    assert sink.committed_epochs() == {0, 1, 2}


def test_erase_document_routes_snapshot_lake(spark, tmp_path, sf_dir):
    """erase_document on a snapshot lake: the delete is one atomic
    manifest commit (logical erasure), the report demands a vacuum for
    physical erasure, and time travel still serves the pre-erase
    snapshot until that vacuum runs."""
    from kstreams_spark.erasure import erase_document

    lake = str(tmp_path / "snap_lake")
    v1 = snapshot_publish(_corpus(spark, sf_dir), lake)
    doomed = DOOMED
    report = erase_document(spark, [doomed], lake_path=lake)
    assert report["lake_rows_deleted"] == 1
    assert report["lake_needs_vacuum"] is True
    now = snapshot_read(spark, lake)
    assert now.filter(F.col("doc_id") == doomed).count() == 0
    # pre-erase history is a retention-policy decision, not an accident
    old = snapshot_read(spark, lake, version=v1)
    assert old.filter(F.col("doc_id") == doomed).count() == 1
    vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    raw = spark.read.option("basePath", lake).parquet(lake)
    assert raw.filter(F.col("doc_id") == doomed).count() == 0


def test_snapshot_ops_handle_escaped_and_null_partition_values(spark, tmp_path):
    """Hive-escaped dir names (lang='a=b' → 'lang=a%3Db') and NULL
    partition values (__HIVE_DEFAULT_PARTITION__) must delete and
    compact correctly — comparing raw values to dir names silently
    duplicates the partition's rows after a rewrite (the old files
    never leave the manifest)."""
    lake = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [
            (1, "keep", "train", "a=b"),
            (2, "drop", "train", "a=b"),
            (3, "keep", "train", "c%d"),
            (4, "drop", "train", None),
            (5, "keep", "train", None),
            (6, "keep", "train", "pt BR"),
        ],
        "doc_id long, text string, split string, lang string",
    )
    snapshot_publish(df, lake)
    assert snapshot_delete_where(spark, lake, "text = 'drop'") == 2
    got = snapshot_read(spark, lake)
    assert got.count() == 4, sorted(
        (r.doc_id, r.lang) for r in got.collect()
    )
    assert sorted(r.doc_id for r in got.collect()) == [1, 3, 5, 6]
    # no duplicated rows per doc (the old-file-stays-live bug)
    assert got.dropDuplicates(["doc_id"]).count() == 4
    # compaction over the same weird partitions stays answer-stable
    df.filter("text = 'keep'").write.mode("append").partitionBy(
        "split", "lang"
    ).parquet(lake)  # orphan files to make partitions multi-file
    before = sorted((r.doc_id, r.lang) for r in snapshot_read(spark, lake).collect())
    snapshot_compact(spark, lake, n_files=1)
    after = sorted((r.doc_id, r.lang) for r in snapshot_read(spark, lake).collect())
    assert after == before


def test_snapshot_diff_change_feed(spark, tmp_path, sf_dir):
    """snapshot_diff: CDC between two snapshot versions — inserts,
    deletes, and updates classified from the manifest log, with the
    immutable-file pruning leaving unchanged files out of the diff."""
    from kstreams_spark.lake_snapshot import snapshot_diff

    lake = str(tmp_path / "diff")
    corpus = _corpus(spark, sf_dir)
    v1 = snapshot_publish(corpus, lake)
    # delete two docs, then "update" one by delete+reinsert with new text
    snapshot_delete_where(
        spark, lake, f"doc_id IN ({DOOMED}, {DOOMED + 1}, {DOOMED + 2})"
    )
    import kstreams_spark.lake_snapshot as lsnap

    m = lsnap._read_manifest(lake, snapshot_versions(lake)[-1])
    live = lsnap._live_files(lake, snapshot_versions(lake)[-1])
    before = lsnap._list_files(lake)
    corpus.filter(F.col("doc_id") == DOOMED + 2).withColumn(
        "text", F.lit("rewritten body")
    ).write.mode("append").partitionBy("split", "lang").parquet(lake)
    lsnap._commit(
        lake, live | (lsnap._list_files(lake) - before), "upsert", m["schema"]
    )
    v2 = snapshot_versions(lake)[-1]

    diff = snapshot_diff(spark, lake, v1, v2).collect()
    by_key = {r.doc_id: r for r in diff}
    assert by_key[DOOMED]._change == "delete"
    assert by_key[DOOMED + 1]._change == "delete"
    assert by_key[DOOMED + 2]._change == "update"
    assert by_key[DOOMED + 2].text == "rewritten body"
    assert len(diff) == 3, sorted((r.doc_id, r._change) for r in diff)


# --- r12: optimistic concurrency + vacuum reader grace ----------------------


def test_commit_race_append_retries_and_delete_aborts(
    spark, tmp_path, sf_dir, monkeypatch
):
    """The r12 commit protocol, both conflict policies:
    - a blind APPEND losing the commit race (a competing manifest
      appears between its version read and its os.link) retries onto
      the next version and MERGES the winner's live set — no lost files;
    - a DELETE whose base snapshot moved aborts loudly (its rewrite is
      stale) instead of silently building a manifest off the old base."""
    lake = str(tmp_path / "race")
    corpus = _corpus(spark, sf_dir)
    snapshot_publish(corpus.filter(F.col("doc_id") < 50), lake)
    n1 = snapshot_read(spark, lake).count()

    winner = corpus.filter(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 60)
    )
    loser = corpus.filter(F.col("doc_id") >= 60)
    n_win, n_lose = winner.count(), loser.count()

    # deterministic EEXIST: the first os.link onto a manifest path first
    # lets the "winner" commit that exact version, then proceeds — the
    # loser's link fails create-exclusive and the retry path runs
    real_link = os.link
    state = {"armed": True}

    def racing_link(src, dst):
        if state["armed"] and "_log" in dst and dst.endswith(".json"):
            state["armed"] = False
            snapshot_publish(winner, lake, mode="append")
            assert os.path.exists(dst), "winner should own this version"
        return real_link(src, dst)

    monkeypatch.setattr(os, "link", racing_link)
    snapshot_publish(loser, lake, mode="append")
    monkeypatch.setattr(os, "link", real_link)

    vs = snapshot_versions(lake)
    assert vs == [1, 2, 3], vs  # exactly one v2 (winner), loser on v3
    got = snapshot_read(spark, lake)
    assert got.count() == n1 + n_win + n_lose  # no lost files either side
    assert got.dropDuplicates(["doc_id"]).count() == got.count()

    # conflicting maintenance: a commit landing between delete_where's
    # base read and its commit invalidates the rewrite -> loud abort
    import kstreams_spark.lake_snapshot as lsnap

    real_pv = lsnap._partition_values
    once = {"armed": True}

    def commit_between(df, condition, partition_cols):
        if once["armed"]:
            once["armed"] = False
            snapshot_publish(
                corpus.filter(F.col("doc_id") < 5).withColumn(
                    "text", F.lit("competing write")
                ),
                lake,
                mode="append",
            )
        return real_pv(df, condition, partition_cols)

    monkeypatch.setattr(lsnap, "_partition_values", commit_between)
    with pytest.raises(ValueError, match="commit conflict"):
        snapshot_delete_where(spark, lake, f"doc_id = {DOOMED}")
    monkeypatch.setattr(lsnap, "_partition_values", real_pv)
    # the abort left no new manifest beyond the competitor's
    assert snapshot_versions(lake) == [1, 2, 3, 4]
    # re-run against the new latest commits cleanly
    assert snapshot_delete_where(spark, lake, f"doc_id = {DOOMED}") >= 1
    assert (
        snapshot_read(spark, lake).filter(F.col("doc_id") == DOOMED).count()
        == 0
    )


def test_concurrent_append_publishers_threads(spark, tmp_path):
    """Four true concurrent append-publishers: every writer commits
    exactly one version, no version is double-claimed (the O_EXCL
    guarantee), and the final snapshot holds every writer's rows."""
    import threading

    lake = str(tmp_path / "threads")
    base = spark.createDataFrame(
        [(0, "seed", "train", "en")],
        "doc_id long, text string, split string, lang string",
    )
    snapshot_publish(base, lake)

    errs = []

    def writer(i: int):
        try:
            df = spark.createDataFrame(
                [(100 + i, f"w{i}", "train", "en")],
                "doc_id long, text string, split string, lang string",
            )
            snapshot_publish(df, lake, mode="append")
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert snapshot_versions(lake) == [1, 2, 3, 4, 5]
    got = sorted(r.doc_id for r in snapshot_read(spark, lake).collect())
    assert got == [0, 100, 101, 102, 103]


def test_vacuum_reader_grace(spark, tmp_path, sf_dir):
    """Delta's retention contract: a reader pinned at an old version
    survives a vacuum inside the grace window (young versions are
    retained beyond keep_versions); sub-floor grace without force is
    refused; force + zero grace then folds history."""
    lake = str(tmp_path / "grace")
    corpus = _corpus(spark, sf_dir)
    v1 = snapshot_publish(corpus, lake)
    n_total = corpus.count()
    snapshot_delete_where(spark, lake, f"doc_id IN ({DOOMED}, {DOOMED + 1})")

    # default grace: v1's manifest is seconds old -> retained, reader OK
    removed = vacuum(lake, keep_versions=1)
    assert removed == 0
    pinned = snapshot_read(spark, lake, version=v1)
    assert pinned.count() == n_total  # the pinned reader completes

    with pytest.raises(ValueError, match="floor"):
        vacuum(lake, keep_versions=1, grace_seconds=0)

    vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    assert snapshot_versions(lake) == [2]
    with pytest.raises(ValueError, match="not in committed versions"):
        snapshot_read(spark, lake, version=v1)


def test_vacuum_sweeps_orphan_staging_dirs(spark, tmp_path, sf_dir):
    """r14: a writer that crashed between staging its files and moving
    them leaves an orphan .staging-* dir — age-guard-swept by vacuum
    (young staging dirs, i.e. in-flight writers, survive), and never
    visible to _list_files or readers."""
    import glob
    import os
    import time

    lake = str(tmp_path / "stage_sweep")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 4), lake)
    orphan = os.path.join(lake, ".staging-deadbeef")
    os.makedirs(os.path.join(orphan, "split=train"))
    with open(
        os.path.join(orphan, "split=train", "part-0.parquet"), "wb"
    ) as fh:
        fh.write(b"not really parquet")
    assert not any(".staging" in f for f in ls._list_files(lake))
    vacuum(lake)  # young: in-flight writer protection keeps it
    assert os.path.isdir(orphan)
    old = time.time() - 7200
    # r15: the sweep age-guards on the NEWEST mtime anywhere under the
    # staging dir (files landing in nested partition subdirs never bump
    # the root) — age every path, as a real 2h-old crash would be
    for sroot, _dirs, files in os.walk(orphan):
        os.utime(sroot, (old, old))
        for f in files:
            os.utime(os.path.join(sroot, f), (old, old))
    vacuum(lake, grace_seconds=3600)  # orphan is 2h old > 1h grace
    assert not glob.glob(os.path.join(lake, ".staging-*"))
    # a LIVE writer: root is old (created long ago) but a nested file
    # is fresh — must survive the sweep
    live = os.path.join(lake, ".staging-cafebabe")
    os.makedirs(os.path.join(live, "split=train"))
    with open(
        os.path.join(live, "split=train", "part-0.parquet"), "wb"
    ) as fh:
        fh.write(b"in flight")
    os.utime(live, (old, old))  # root mtime alone must NOT doom it
    vacuum(lake, grace_seconds=3600)
    assert os.path.isdir(live)


# --- r12: delta-log checkpointing (the 100 TB manifest-scaling answer) ----


def test_delta_log_checkpoint_cadence_and_resolution(spark, tmp_path, sf_dir):
    """Commits are DELTAS (adds/removes, no full file list); full state
    lands in a checkpoint sidecar every CHECKPOINT_INTERVAL commits;
    every version resolves correctly below/at/above the boundary."""
    import json

    lake = str(tmp_path / "cp")
    corpus = _corpus(spark, sf_dir)
    base = corpus.filter(F.col("doc_id") < 20)
    snapshot_publish(base, lake)  # v1
    counts = {1: base.count()}
    n = counts[1]
    for v in range(2, 13):  # v2..v12: one-doc blind appends
        add = corpus.filter(F.col("doc_id") == 20 + v)
        snapshot_publish(add, lake, mode="append")
        n += 1
        counts[v] = n
    assert snapshot_versions(lake) == list(range(1, 13))
    # checkpoint exactly at the interval, not elsewhere
    assert os.path.exists(ls._checkpoint_path(lake, ls.CHECKPOINT_INTERVAL))
    assert not os.path.exists(ls._checkpoint_path(lake, 12))
    # checkpoints are INVISIBLE to the version listing
    assert 10 in snapshot_versions(lake)
    # delta form: no "files" key, append adds exactly its own files
    m12 = ls._read_manifest(lake, 12)
    assert "files" not in m12
    assert m12["removes"] == [] and 1 <= len(m12["adds"]) <= 4
    # the checkpoint content equals the replayed chain
    with open(ls._checkpoint_path(lake, 10)) as fh:
        cp_files = set(json.load(fh)["files"])
    ls_cp = ls._checkpoint_path(lake, 10)
    os.rename(ls_cp, ls_cp + ".hidden")  # force a full-chain replay
    assert ls._live_files(lake, 10) == cp_files
    os.rename(ls_cp + ".hidden", ls_cp)
    # resolution below / at / above the checkpoint boundary
    for v in (1, 9, 10, 11, 12):
        assert snapshot_read(spark, lake, version=v).count() == counts[v]


def test_legacy_full_list_manifest_reads_and_extends(spark, tmp_path, sf_dir):
    """A pre-r12 manifest carrying the full `files` list acts as a
    self-checkpoint: reads work unchanged and new delta commits stack
    on top of it."""
    import json

    lake = str(tmp_path / "legacy")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 10)
    snapshot_publish(corpus, lake)  # v1, delta form (adds = everything)
    m = ls._read_manifest(lake, 1)
    legacy = {
        "version": 1,
        "op": "publish",
        "files": m["adds"],
        "schema": m["schema"],
        "epochs": m.get("epochs", []),
    }
    with open(ls._manifest_path(lake, 1), "w") as fh:
        json.dump(legacy, fh)
    assert snapshot_read(spark, lake, version=1).count() == corpus.count()
    add = _corpus(spark, sf_dir).filter(F.col("doc_id") == 30)
    snapshot_publish(add, lake, mode="append")  # v2: delta over legacy
    assert "files" not in ls._read_manifest(lake, 2)
    assert snapshot_read(spark, lake).count() == corpus.count() + 1


def test_vacuum_checkpoints_oldest_retained_version(spark, tmp_path, sf_dir):
    """Dropping manifests below the retained suffix must not strand the
    survivors' delta chains: vacuum writes a checkpoint for the oldest
    retained version first, so every retained version stays readable."""
    lake = str(tmp_path / "vaccp")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 10)
    snapshot_publish(corpus, lake)  # v1
    for v in range(2, 7):  # v2..v6
        snapshot_publish(
            corpus.filter(F.col("doc_id") == v), lake, mode="append"
        )
    counts = {
        v: snapshot_read(spark, lake, version=v).count()
        for v in snapshot_versions(lake)
    }
    vacuum(lake, keep_versions=3, grace_seconds=0, force=True)
    assert snapshot_versions(lake) == [4, 5, 6]
    assert os.path.exists(ls._checkpoint_path(lake, 4))
    for v in (4, 5, 6):
        assert snapshot_read(spark, lake, version=v).count() == counts[v]
    # dropped versions leave neither manifest nor checkpoint behind
    assert not os.path.exists(ls._manifest_path(lake, 1))
    assert not os.path.exists(ls._checkpoint_path(lake, 1))


def test_checkpoint_write_first_wins_and_leaves_no_tmp(tmp_path):
    """The sidecar is derived data: a lost write race is a silent no-op
    (content identical in real use) and tmp files never leak."""
    import glob as g
    import json

    lake = str(tmp_path / "race")
    os.makedirs(os.path.join(lake, "_log"))
    ls._write_checkpoint(lake, 5, {"a.parquet"})
    ls._write_checkpoint(lake, 5, {"b.parquet"})  # racer: loses, no-op
    with open(ls._checkpoint_path(lake, 5)) as fh:
        assert json.load(fh)["files"] == ["a.parquet"]
    assert not g.glob(os.path.join(lake, "_log", ".tmp-cp*"))


# --- r12: schema enforcement + ADD-COLUMN evolution ------------------------


def test_append_schema_drift_raises_before_writing(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "enforce")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 6), lake)
    files_before = ls._list_files(lake)
    drifted = (
        _corpus(spark, sf_dir)
        .filter(F.col("doc_id") == 30)
        .withColumn("extra", F.lit(1.5))
    )
    with pytest.raises(ValueError, match="evolve=True"):
        snapshot_publish(drifted, lake, mode="append")
    # enforcement fired BEFORE any data file landed
    assert ls._list_files(lake) == files_before
    assert snapshot_versions(lake) == [1]


def test_evolve_appends_column_with_per_version_schema(
    spark, tmp_path, sf_dir
):
    """ADD COLUMN: old files surface the new column as NULL (the
    explicit-schema scan), new rows carry values, and a time-travel pin
    sees ITS version's schema — not the latest one."""
    lake = str(tmp_path / "evolve")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 6), lake)
    evolved = (
        _corpus(spark, sf_dir)
        .filter(F.col("doc_id") == 30)
        .withColumn("quality", F.lit(0.75))
    )
    snapshot_publish(evolved, lake, mode="append", evolve=True)  # v2
    latest = snapshot_read(spark, lake)
    assert latest.columns == ["doc_id", "text", "split", "lang", "quality"]
    rows = {r.doc_id: r.quality for r in latest.collect()}
    assert rows[30] == 0.75
    assert all(rows[d] is None for d in rows if d != 30)
    # time travel: v1 keeps the pre-evolve schema
    assert snapshot_read(spark, lake, version=1).columns == [
        "doc_id",
        "text",
        "split",
        "lang",
    ]
    # delete/compact maintenance carries the evolved schema through
    assert snapshot_delete_where(spark, lake, "doc_id = 0") == 1
    assert snapshot_read(spark, lake).columns[-1] == "quality"


def test_evolve_rejects_non_append_changes(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "evolve_bad")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 6), lake)
    # type change
    retyped = (
        _corpus(spark, sf_dir)
        .filter(F.col("doc_id") == 30)
        .withColumn("doc_id", F.col("doc_id").cast("int"))
    )
    with pytest.raises(ValueError, match="exact prefix"):
        snapshot_publish(retyped, lake, mode="append", evolve=True)
    # dropped column
    dropped = (
        _corpus(spark, sf_dir).filter(F.col("doc_id") == 30).drop("text")
    )
    with pytest.raises(ValueError, match="exact prefix"):
        snapshot_publish(dropped, lake, mode="append", evolve=True)
    # replace may take ANY schema (the overwriteSchema path)
    snapshot_publish(dropped, lake, mode="replace")
    assert snapshot_read(spark, lake).columns == ["doc_id", "split", "lang"]
    # ...and the old version still reads with its own schema
    assert "text" in snapshot_read(spark, lake, version=1).columns


def test_sink_enforces_schema_against_committed(spark, tmp_path, sf_dir):
    from kstreams_spark.lake_snapshot import SnapshotLakeSink

    lake = str(tmp_path / "sink_enforce")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 6), lake)
    sink = SnapshotLakeSink(lake)
    drifted = (
        _corpus(spark, sf_dir)
        .filter(F.col("doc_id") == 30)
        .withColumn("extra", F.lit(1))
    )
    with pytest.raises(ValueError, match="SnapshotLakeSink"):
        sink.process_batch(drifted, 0)
    # matching batch commits fine
    sink.process_batch(_corpus(spark, sf_dir).filter(F.col("doc_id") == 30), 0)
    assert snapshot_versions(lake) == [1, 2]


def test_sharded_checkpoint_roundtrip_completion_and_vacuum(
    spark, tmp_path, sf_dir, monkeypatch
):
    """Checkpoints above CHECKPOINT_SHARD_FILES entries shard into
    part-{i}-of-{n} files: write/read roundtrip, torn-set fallback to
    the delta chain, in-place completion by a later writer, vacuum
    sweep of dropped versions' parts."""
    import glob as g
    import json

    monkeypatch.setattr(ls, "CHECKPOINT_SHARD_FILES", 3)
    lake = str(tmp_path / "shard")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 8)
    snapshot_publish(corpus.repartition(4), lake, partition_cols=())  # v1
    live = ls._live_files(lake, 1)
    assert len(live) > 3  # big enough to shard under the patched limit

    ls._write_checkpoint(lake, 1, live)
    parts = sorted(g.glob(os.path.join(lake, "_log", "v*checkpoint.part-*")))
    assert len(parts) >= 2
    assert not os.path.exists(ls._checkpoint_path(lake, 1))  # sharded form
    assert ls._read_checkpoint(lake, 1) == live
    # completeness declared in the names
    n = int(parts[0].rsplit("-of-", 1)[1].split(".")[0])
    assert len(parts) == n
    with open(parts[0]) as fh:
        assert json.load(fh)["n_parts"] == n

    # torn set: drop one part -> reader falls back (None), resolution
    # still works off the delta chain
    os.remove(parts[1])
    assert ls._read_checkpoint(lake, 1) is None
    assert ls._live_files(lake, 1) == live
    # a later writer COMPLETES the torn set in place (slices are a pure
    # function of the immutable live set)
    ls._write_checkpoint(lake, 1, live)
    assert ls._read_checkpoint(lake, 1) == live

    # vacuum sweeps dropped versions' checkpoint parts
    snapshot_publish(corpus.repartition(2), lake, partition_cols=())  # v2
    vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    assert g.glob(os.path.join(lake, "_log", "v0000000001.checkpoint*")) == []
    assert snapshot_read(spark, lake).count() == corpus.count()


# --- r12: MERGE INTO -------------------------------------------------------


def test_merge_upserts_atomically_with_time_travel(spark, tmp_path, sf_dir):
    from kstreams_spark.lake_snapshot import snapshot_merge

    lake = str(tmp_path / "merge")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 10)
    snapshot_publish(corpus, lake)  # v1
    # source: update docs 2,3 (post-image text), insert docs 30,31
    src = (
        _corpus(spark, sf_dir)
        .filter(F.col("doc_id").isin([2, 3, 30, 31]))
        .withColumn(
            "text",
            F.when(F.col("doc_id") < 10, F.lit("merged body")).otherwise(
                F.col("text")
            ),
        )
    )
    r = snapshot_merge(spark, lake, src)
    assert r == {"updated": 2, "inserted": 2, "deleted": 0, "version": 2}
    now = {x.doc_id: x.text for x in snapshot_read(spark, lake).collect()}
    assert len(now) == 12
    assert now[2] == "merged body" and now[3] == "merged body"
    assert now[0] != "merged body"  # survivors untouched
    # time travel: pre-merge snapshot intact
    old = {
        x.doc_id: x.text
        for x in snapshot_read(spark, lake, version=1).collect()
    }
    assert len(old) == 10 and old[2] != "merged body"


def test_merge_wide_source_skips_broadcast(
    spark, tmp_path, sf_dir, monkeypatch
):
    """ADVICE r14: a merge wider than DRIVER_MERGE_BROADCAST_MAX_KEYS
    must not force-broadcast the source keys (the driver collects every
    broadcast frame — an OOM vector at the documented 100 TB posture).
    Pin the gate by dropping the cap to 0: both CoW and MoR merges
    still produce identical results through the hint-free join."""
    import kstreams_spark.lake_snapshot as ls_mod
    from kstreams_spark.lake_snapshot import snapshot_merge

    monkeypatch.setattr(ls_mod, "DRIVER_MERGE_BROADCAST_MAX_KEYS", 0)
    for mor in (False, True):
        lake = str(tmp_path / f"merge_wide_{mor}")
        corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 10)
        snapshot_publish(corpus, lake)
        src = (
            _corpus(spark, sf_dir)
            .filter(F.col("doc_id").isin([2, 3, 30]))
            .withColumn("text", F.lit("wide merged"))
        )
        r = snapshot_merge(spark, lake, src, merge_on_read=mor)
        assert (r["updated"], r["inserted"]) == (2, 1)
        now = {x.doc_id: x.text for x in snapshot_read(spark, lake).collect()}
        assert len(now) == 11 and now[2] == "wide merged"


def test_merge_moves_row_across_partitions(spark, tmp_path, sf_dir):
    """An update whose source row carries a new partition value lands
    there while the old partition's rewrite drops the key."""
    from kstreams_spark.lake_snapshot import snapshot_merge

    lake = str(tmp_path / "merge_move")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 6), lake)
    moved = (
        _corpus(spark, sf_dir)
        .filter(F.col("doc_id") == 2)  # even -> split=train originally
        .withColumn("split", F.lit("val"))
    )
    r = snapshot_merge(spark, lake, moved)
    assert r["updated"] == 1 and r["inserted"] == 0
    rows = snapshot_read(spark, lake).filter(F.col("doc_id") == 2).collect()
    assert [x.split for x in rows] == ["val"]  # exactly one, moved


def test_merge_rejects_duplicate_source_keys(spark, tmp_path, sf_dir):
    from kstreams_spark.lake_snapshot import snapshot_merge

    lake = str(tmp_path / "merge_dup")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 6), lake)
    src = _corpus(spark, sf_dir).filter(F.col("doc_id") == 2)
    with pytest.raises(ValueError, match="one\\s+intent per key"):
        snapshot_merge(spark, lake, src.unionByName(src))


def test_merge_crash_before_commit_is_all_old(
    spark, tmp_path, sf_dir, monkeypatch
):
    from kstreams_spark.lake_snapshot import snapshot_merge

    lake = str(tmp_path / "merge_crash")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 6)
    snapshot_publish(corpus, lake)
    real_link = os.link

    def dying_link(src, dst):
        if "_log" in dst and dst.endswith(".json"):
            raise OSError("injected crash at the commit point")
        return real_link(src, dst)

    monkeypatch.setattr(os, "link", dying_link)
    src = _corpus(spark, sf_dir).filter(F.col("doc_id").isin([2, 30]))
    with pytest.raises(OSError, match="injected"):
        snapshot_merge(spark, lake, src)
    monkeypatch.setattr(os, "link", real_link)
    # readers still see v1 exactly; the staged rewrite is orphaned
    assert snapshot_versions(lake) == [1]
    assert snapshot_read(spark, lake).count() == corpus.count()
    vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    assert snapshot_read(spark, lake).count() == corpus.count()
    # re-run completes
    r = snapshot_merge(spark, lake, src)
    assert r["updated"] == 1 and r["inserted"] == 1


def test_merge_cdf_classification_and_evolve(spark, tmp_path, sf_dir):
    """The merge commit's change feed: updates for changed matched rows,
    inserts for the rest, rewrite noise silent; evolve=True NULL-fills
    survivors."""
    from kstreams_spark.lake_snapshot import snapshot_diff, snapshot_merge

    lake = str(tmp_path / "merge_cdf")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 6), lake)
    src = (
        _corpus(spark, sf_dir)
        .filter(F.col("doc_id").isin([2, 30]))
        .withColumn("text", F.lit("merged body"))
        .withColumn("quality", F.lit(0.5))
    )
    r = snapshot_merge(spark, lake, src, evolve=True)
    assert r["updated"] == 1 and r["inserted"] == 1
    diff = {
        x.doc_id: x._change
        for x in snapshot_diff(spark, lake, 1, 2).collect()
    }
    assert diff == {2: "update", 30: "insert"}
    rows = {x.doc_id: x.quality for x in snapshot_read(spark, lake).collect()}
    assert rows[2] == 0.5 and rows[30] == 0.5
    assert all(v is None for k, v in rows.items() if k not in (2, 30))


# --- r12: TIMESTAMP AS OF, RESTORE, OPTIMIZE ZORDER ------------------------


def test_timestamp_as_of_resolves_commit_times(spark, tmp_path, sf_dir):
    import time as _time

    from kstreams_spark.lake_snapshot import version_at_timestamp

    lake = str(tmp_path / "ts")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 6)
    snapshot_publish(corpus, lake)  # v1
    t_between = _time.time()
    _time.sleep(0.05)
    snapshot_publish(
        _corpus(spark, sf_dir).filter(F.col("doc_id") == 30),
        lake,
        mode="append",
    )  # v2
    assert version_at_timestamp(lake, t_between) == 1
    assert version_at_timestamp(lake, _time.time()) == 2
    assert (
        snapshot_read(spark, lake, at_timestamp=t_between).count()
        == corpus.count()
    )
    with pytest.raises(ValueError, match="at or before"):
        version_at_timestamp(lake, 0.0)  # before any commit
    with pytest.raises(ValueError, match="not both"):
        snapshot_read(spark, lake, version=1, at_timestamp=t_between)


def test_restore_rewinds_without_copying(spark, tmp_path, sf_dir):
    from kstreams_spark.lake_snapshot import snapshot_restore

    lake = str(tmp_path / "restore")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 6)
    snapshot_publish(corpus, lake)  # v1
    snapshot_delete_where(spark, lake, "doc_id IN (0, 1)")  # v2
    files_before = ls._list_files(lake)
    v3 = snapshot_restore(lake, 1)
    assert v3 == 3
    # nothing copied: the restore is one manifest commit
    assert ls._list_files(lake) == files_before
    assert snapshot_read(spark, lake).count() == corpus.count()
    # history preserved: the undone delete still readable
    assert snapshot_read(spark, lake, version=2).count() == corpus.count() - 2
    # the restore's manifest delta re-adds exactly what the delete removed
    m3 = ls._read_manifest(lake, 3)
    assert m3["adds"] and m3["removes"]
    # CDC sees the restore's row-level effect: docs 0,1 come back
    from kstreams_spark.lake_snapshot import snapshot_diff

    back = {
        r.doc_id: r._change for r in snapshot_diff(spark, lake, 2, 3).collect()
    }
    assert back == {0: "insert", 1: "insert"}
    with pytest.raises(ValueError, match="not in committed"):
        snapshot_restore(lake, 99)


def test_compact_zorder_rewrites_with_narrow_file_stats(
    spark, tmp_path, sf_dir
):
    """OPTIMIZE ZORDER BY: the rewritten files carry narrow (min, max)
    footer ranges on BOTH keys — the property scan pruning consumes."""
    import pyarrow.parquet as pq

    lake = str(tmp_path / "zorder")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .withColumn("split", F.lit("train"))
        .withColumn("lang", F.lit("en"))
    )
    snapshot_publish(docs.repartition(8), lake)  # v1: 8 scrambled files
    n = snapshot_compact(spark, lake, n_files=4, zorder_by=("doc_id", "n_chars"))
    assert n == 1
    after = snapshot_read(spark, lake)
    assert after.count() == docs.count()
    assert {r.doc_id for r in after.collect()} == {
        r.doc_id for r in docs.collect()
    }
    # footer (min, max) spans shrink on BOTH z-ordered keys vs the
    # scrambled pre-compact files (the property scan pruning consumes)
    def mean_span(version, col_idx):
        spans = []
        for f in sorted(ls._live_files(lake, version)):
            md = pq.read_metadata(os.path.join(lake, f))
            lo = min(
                md.row_group(i).column(col_idx).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(col_idx).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    v_pre, v_post = 1, snapshot_versions(lake)[-1]
    assert len(ls._live_files(lake, v_post)) == 4
    for col_idx in (0, 1):  # doc_id, n_chars
        assert mean_span(v_post, col_idx) < 0.8 * mean_span(v_pre, col_idx)


# --- r12: CHECK constraints ------------------------------------------------


def test_check_constraints_enforced_on_every_write_path(
    spark, tmp_path, sf_dir
):
    from kstreams_spark.lake_snapshot import (
        SnapshotLakeSink,
        snapshot_drop_constraint,
        snapshot_merge,
        snapshot_set_constraint,
        table_constraints,
    )

    lake = str(tmp_path / "check")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 6)
    snapshot_publish(corpus, lake)  # v1
    v = snapshot_set_constraint(
        spark, lake, "doc_id_bounded", "doc_id < 100"
    )
    assert v == 2
    assert table_constraints(lake) == {"doc_id_bounded": "doc_id < 100"}
    # the constraint commit moved no files
    assert ls._live_files(lake, 2) == ls._live_files(lake, 1)

    bad = _corpus(spark, sf_dir).filter(F.col("doc_id") == 200)
    files_before = ls._list_files(lake)
    with pytest.raises(ValueError, match="doc_id_bounded"):
        snapshot_publish(bad, lake, mode="append")
    with pytest.raises(ValueError, match="doc_id_bounded"):
        snapshot_merge(spark, lake, bad)
    with pytest.raises(ValueError, match="doc_id_bounded"):
        SnapshotLakeSink(lake).process_batch(bad, 0)
    # constraints survive replace (the Delta rule)
    with pytest.raises(ValueError, match="doc_id_bounded"):
        snapshot_publish(bad, lake, mode="replace")
    assert ls._list_files(lake) == files_before  # nothing landed
    # ...and the violating writes' staging dirs were torn down too
    import glob as _g
    import os as _os

    assert not _g.glob(_os.path.join(lake, ".staging-*"))
    # a passing append commits; constraints carry forward
    snapshot_publish(
        _corpus(spark, sf_dir).filter(F.col("doc_id") == 30),
        lake,
        mode="append",
    )
    assert table_constraints(lake) == {"doc_id_bounded": "doc_id < 100"}
    # NULL predicate passes (SQL CHECK rule)
    snapshot_set_constraint(
        spark, lake, "null_passes", "CASE WHEN doc_id >= 0 THEN NULL END"
    )
    snapshot_publish(
        _corpus(spark, sf_dir).filter(F.col("doc_id") == 31),
        lake,
        mode="append",
    )
    # drop restores writability
    snapshot_drop_constraint(lake, "doc_id_bounded")
    snapshot_publish(bad, lake, mode="append")
    assert "doc_id_bounded" not in table_constraints(lake)
    with pytest.raises(ValueError, match="no CHECK constraint"):
        snapshot_drop_constraint(lake, "doc_id_bounded")


def test_set_constraint_refuses_violating_existing_data(
    spark, tmp_path, sf_dir
):
    from kstreams_spark.lake_snapshot import snapshot_set_constraint

    lake = str(tmp_path / "check_existing")
    snapshot_publish(_corpus(spark, sf_dir).filter(F.col("doc_id") < 6), lake)
    with pytest.raises(ValueError, match="existing data"):
        snapshot_set_constraint(spark, lake, "impossible", "doc_id > 2")
    assert snapshot_versions(lake) == [1]


def test_snapshot_history_describes_every_commit(spark, tmp_path, sf_dir):
    from kstreams_spark.lake_snapshot import (
        snapshot_history,
        snapshot_merge,
        snapshot_set_constraint,
    )

    lake = str(tmp_path / "hist")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 6)
    snapshot_publish(corpus, lake)  # v1
    snapshot_set_constraint(spark, lake, "ids", "doc_id < 100")  # v2
    snapshot_merge(
        spark, lake, _corpus(spark, sf_dir).filter(F.col("doc_id") == 30)
    )  # v3
    snapshot_delete_where(spark, lake, "doc_id = 0")  # v4
    h = {r.version: r for r in snapshot_history(spark, lake).collect()}
    assert sorted(h) == [1, 2, 3, 4]
    assert h[1].op == "publish" and h[1].n_removes == 0
    assert h[2].op == "set-constraint-ids"
    assert h[2].n_adds == 0 and h[2].n_removes == 0  # metadata-only commit
    assert h[2].n_live == h[1].n_live
    assert h[3].op == "merge" and h[4].op == "delete_where"
    assert h[2].n_constraints == h[3].n_constraints == 1
    # live counts track the replayed chain and timestamps ascend
    ts = [h[v].ts for v in (1, 2, 3, 4)]
    assert ts == sorted(ts)
    # row-count ground truth at latest
    assert h[4].n_live == len(
        ls._live_files(lake, snapshot_versions(lake)[-1])
    )


def test_write_paths_refuse_mismatched_partition_cols(spark, tmp_path, sf_dir):
    """r12: a maintenance/append call whose partition_cols disagree with
    the on-disk layout is REFUSED before writing — appending a
    different partitioning into one tree yields mixed-depth directories
    and CONFLICTING_PARTITION_COLUMN_NAMES on every later scan (found
    live: delete_where's ('split','lang') default against a
    ('split',)-layout lake)."""
    from kstreams_spark.lake_snapshot import SnapshotLakeSink, snapshot_merge

    lake = str(tmp_path / "layout")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 6)
    snapshot_publish(corpus.drop("lang"), lake, partition_cols=("split",))
    files_before = ls._list_files(lake)
    one = corpus.drop("lang").filter(F.col("doc_id") == 0)
    with pytest.raises(ValueError, match="on-disk layout"):
        snapshot_delete_where(spark, lake, "doc_id = 0")  # default 2-col
    with pytest.raises(ValueError, match="on-disk layout"):
        snapshot_compact(spark, lake)  # default 2-col
    with pytest.raises(ValueError, match="on-disk layout"):
        snapshot_merge(spark, lake, one)  # default 2-col
    with pytest.raises(ValueError, match="on-disk layout"):
        snapshot_publish(one, lake, mode="append")  # default 2-col
    with pytest.raises(ValueError, match="on-disk layout"):
        SnapshotLakeSink(lake).process_batch(one, 0)
    assert ls._list_files(lake) == files_before  # nothing ever landed
    # the correct columns pass everywhere
    assert snapshot_delete_where(
        spark, lake, "doc_id = 0", partition_cols=("split",)
    ) == 1
    snapshot_merge(spark, lake, one, partition_cols=("split",))
    # replace may redefine the layout (full rewrite)
    snapshot_publish(corpus, lake, mode="replace")
    assert snapshot_read(spark, lake).count() == corpus.count()


def test_vacuum_dry_run_counts_without_touching(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "dry")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 6)
    snapshot_publish(corpus, lake)  # v1
    snapshot_publish(corpus, lake, mode="replace")  # v2: v1 files retire
    import glob as g

    before_files = ls._list_files(lake)
    before_log = sorted(g.glob(os.path.join(lake, "_log", "*")))
    would = vacuum(
        lake, keep_versions=1, grace_seconds=0, force=True, dry_run=True
    )
    assert would > 0
    # nothing moved: same data files, same log (no checkpoint written)
    assert ls._list_files(lake) == before_files
    assert sorted(g.glob(os.path.join(lake, "_log", "*"))) == before_log
    # the real run removes exactly what the dry run promised
    assert vacuum(lake, keep_versions=1, grace_seconds=0, force=True) == would


def test_snapshot_history_n_live_correct_after_vacuum(
    spark, tmp_path, sf_dir
):
    """ADVICE r12: after vacuum folds history, the oldest retained
    manifest is a DELTA against versions that no longer exist —
    accumulating n_live from 0 understated (or negated) every retained
    row. The replay now seeds from the oldest retained version's
    RESOLVED live set."""
    from kstreams_spark.lake_snapshot import snapshot_history

    lake = str(tmp_path / "hist_vac")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 8)
    snapshot_publish(corpus, lake)  # v1
    snapshot_publish(
        _corpus(spark, sf_dir).filter(F.col("doc_id") == 30),
        lake,
        mode="append",
    )  # v2
    snapshot_delete_where(spark, lake, "doc_id = 0")  # v3 (has removes)
    snapshot_delete_where(spark, lake, "doc_id = 1")  # v4
    vacuum(lake, keep_versions=2, grace_seconds=0, force=True)
    assert snapshot_versions(lake) == [3, 4]
    h = {r.version: r for r in snapshot_history(spark, lake).collect()}
    for v in (3, 4):
        truth = len(ls._live_files(lake, v))
        assert h[v].n_live == truth and truth > 0


def test_merge_survivors_is_one_plan_regardless_of_k(
    spark, tmp_path, sf_dir
):
    """VERDICT r12 task 2: a merge over K affected partitions must plan
    ONE scan of target + one semi + one anti join — never the K-branch
    filter+anti+union loop (hundreds of affected partitions used to
    build hundreds of plan branches, each re-scanning target)."""
    from kstreams_spark.lake_snapshot import _merge_survivors

    lake = str(tmp_path / "merge_plan")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 16)
    # 8 partitions: split x lang with lang varying by doc_id
    corpus = corpus.withColumn(
        "lang",
        F.concat(F.lit("l"), (F.col("doc_id") % 3).cast("string")),
    )
    snapshot_publish(corpus, lake)  # v1
    target = snapshot_read(spark, lake)
    src = corpus.filter(F.col("doc_id") < 6)  # both splits x all langs
    src_keys = src.select("doc_id").distinct()
    affected = (
        target.join(src_keys, ["doc_id"], "semi")
        .select("split", "lang")
        .distinct()
        .collect()
    )
    assert len(affected) >= 6  # K is genuinely multi-partition
    surv = _merge_survivors(
        spark, target, affected, src_keys, ["doc_id"], ("split", "lang")
    )
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan, plan
    # exactly 2 file scans: the lake (once, regardless of K) + the
    # source keys' own fixture scan
    assert plan.count("Scan parquet") == 2, plan
    # semantics: survivors are exactly the unmatched rows of affected
    # partitions
    assert sorted(r.doc_id for r in surv.collect()) == list(range(6, 16))


def test_staged_write_returns_exactly_its_files(spark, tmp_path, sf_dir):
    """r14: _write_staged replaces the before/after directory diff —
    it returns exactly this write's files (a concurrent writer's files
    in the same partitions can never be folded into the set), files
    land in the final partition layout under Spark's OWN dir escaping
    (escaped + NULL partition values included), and no .staging-* dir
    survives."""
    import glob
    import os

    lake = str(tmp_path / "staged")
    os.makedirs(lake)
    df = spark.createDataFrame(
        [(1, "a=b", "en"), (2, None, "en"), (3, "train", "en")],
        "doc_id long, split string, lang string",
    )
    new, new_stats = ls._write_staged(df, lake, ("split", "lang"))
    assert new == ls._list_files(lake)  # exactly this write's files
    # r15: every staged file carries footer-derived column stats
    assert set(new_stats) == new
    for s in new_stats.values():
        assert s["rows"] == 1 and "doc_id" in s["cols"]
        assert s["cols"]["doc_id"]["nulls"] == 0
    tops = {f.split(os.sep)[0] for f in new}
    assert tops == {
        "split=a%3Db",
        "split=__HIVE_DEFAULT_PARTITION__",
        "split=train",
    }
    assert not glob.glob(os.path.join(lake, ".staging-*"))
    # a second write into the SAME partition reports only its own files
    more, _ = ls._write_staged(
        spark.createDataFrame(
            [(4, "train", "en")], "doc_id long, split string, lang string"
        ),
        lake,
        ("split", "lang"),
    )
    assert more and not (more & new)
    # and the partition values read back through the snapshot layer
    snapshot_publish(
        spark.createDataFrame(
            [(1, "a=b", "en"), (2, None, "en")],
            "doc_id long, split string, lang string",
        ),
        str(tmp_path / "staged_rt"),
    )
    got = snapshot_read(spark, str(tmp_path / "staged_rt"))
    assert sorted((r.doc_id, r.split) for r in got.collect()) == [
        (1, "a=b"),
        (2, None),
    ]


def test_table_properties_lifecycle_and_functional_keys(
    spark, tmp_path, sf_dir
):
    """TBLPROPERTIES (r14): set/unset/carry-forward like constraints,
    survive unrelated commits, travel through clone — and the two
    FUNCTIONAL keys actually function: kstreams.checkpoint.interval
    re-tunes the delta-log checkpoint cadence,
    kstreams.vacuum.graceSeconds sets vacuum's default grace (explicit
    argument still wins, floor still applies)."""
    import glob

    from kstreams_spark.lake_snapshot import (
        snapshot_clone,
        snapshot_set_properties,
        snapshot_unset_properties,
        table_properties,
    )

    lake = str(tmp_path / "props")
    corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 6)
    snapshot_publish(corpus, lake)  # v1
    assert table_properties(lake) == {}
    v = snapshot_set_properties(
        lake, {"owner": "data-eng", "kstreams.checkpoint.interval": 2}
    )
    assert v == 2
    assert table_properties(lake) == {
        "owner": "data-eng",
        "kstreams.checkpoint.interval": "2",  # stored as strings
    }
    # carried through an unrelated commit; live files untouched
    snapshot_publish(
        _corpus(spark, sf_dir).filter(F.col("doc_id") == 30),
        lake,
        mode="append",
    )  # v3
    assert table_properties(lake)["owner"] == "data-eng"
    assert ls._live_files(lake, 2) == ls._live_files(lake, 1)
    # FUNCTIONAL: interval=2 -> v4 writes a checkpoint (default is 10)
    snapshot_publish(
        _corpus(spark, sf_dir).filter(F.col("doc_id") == 32),
        lake,
        mode="append",
    )  # v4
    assert glob.glob(
        os.path.join(lake, "_log", "v0000000004.checkpoint*")
    ), "property-tuned checkpoint cadence did not fire"
    # unset; unknown keys raise
    snapshot_unset_properties(lake, ["owner"])
    assert "owner" not in table_properties(lake)
    with pytest.raises(ValueError, match="no table propert"):
        snapshot_unset_properties(lake, ["owner"])
    # clone carries what remains
    dst = str(tmp_path / "props_clone")
    snapshot_clone(lake, dst)
    assert table_properties(dst) == {"kstreams.checkpoint.interval": "2"}
    # vacuum default grace from the property: sub-floor value still
    # refused without force (the floor is a safety contract, not a
    # property), a sane value is honored as the default
    snapshot_set_properties(lake, {"kstreams.vacuum.graceSeconds": 0})
    with pytest.raises(ValueError, match="floor"):
        vacuum(lake, keep_versions=1)
    snapshot_set_properties(lake, {"kstreams.vacuum.graceSeconds": 7200})
    vacuum(lake, keep_versions=1)  # 2h >= floor: accepted as default


def test_merge_when_matched_delete(spark, tmp_path, sf_dir):
    """r14 — Delta's WHEN MATCHED THEN DELETE arm (`delete_col`): one
    MERGE commit carries upserts AND deletes; flagged rows need only
    their keys, never write data, are exempt from CHECK enforcement,
    and a delete intent matching nothing is a no-op. Both CoW and
    merge-on-read (DV tombstone with no paired append)."""
    from kstreams_spark.lake_snapshot import (
        snapshot_merge,
        snapshot_set_constraint,
        table_dvs,
    )

    for mor in (False, True):
        lake = str(tmp_path / f"mwd_{mor}")
        corpus = _corpus(spark, sf_dir).filter(F.col("doc_id") < 10)
        snapshot_publish(corpus, lake)
        snapshot_set_constraint(spark, lake, "nonempty", "length(text) > 0")
        # source: update doc 0, delete docs 2+3, insert doc 100,
        # delete-intent for a nonexistent key 999 (no-op), with the
        # delete rows carrying NULL text (keys only — and the CHECK
        # must not fire on them)
        upd = corpus.filter(F.col("doc_id") == 0).withColumn(
            "text", F.concat(F.lit("EDIT:"), F.col("text"))
        )
        ins = _corpus(spark, sf_dir).filter(F.col("doc_id") == 100)
        dels = spark.createDataFrame(
            [(2, "train"), (3, "val"), (999, "train")],
            "doc_id long, split string",
        ).withColumn("text", F.lit(None).cast("string")).withColumn(
            "lang", F.lit("en")
        ).select("doc_id", "text", "split", "lang")
        src = (
            upd.withColumn("_rm", F.lit(False))
            .unionByName(ins.withColumn("_rm", F.lit(False)))
            .unionByName(dels.withColumn("_rm", F.lit(True)))
        )
        r = snapshot_merge(
            spark,
            lake,
            src,
            key_cols=("doc_id",),
            delete_col="_rm",
            merge_on_read=mor,
        )
        assert r["updated"] == 1 and r["inserted"] == 1, (mor, r)
        assert r["deleted"] == 2, (mor, r)  # 999 matched nothing
        got = {
            r2.doc_id: r2.text
            for r2 in snapshot_read(spark, lake).collect()
        }
        assert 2 not in got and 3 not in got and 999 not in got
        assert got[0].startswith("EDIT:") and 100 in got
        assert len(got) == 10 - 2 + 1
        if mor:  # the deletes are DV tombstones, not rewrites
            dvs = table_dvs(lake, snapshot_versions(lake)[-1])
            assert sum(len(p) for p in dvs.values()) == 3  # 0, 2, 3
