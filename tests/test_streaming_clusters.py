"""Batch/stream parity for incremental cluster resolution: pairs folded
in epoch-sized increments must land the EXACT (doc_id, keep_id,
n_members, is_kept) table the batch resolve_clusters computes on the
union of all pairs — including merges that only become visible across
epochs (A–B in one epoch, B–C in a later one), and under at-least-once
replay of a microbatch."""

from __future__ import annotations

import os

from kstreams_spark.io import load_table
from kstreams_spark.operators.dedup import ngram_jaccard_pairs, resolve_clusters
from kstreams_spark.streaming.clusters import StreamingClusterResolver


def _as_map(rows):
    return {r.doc_id: (r.keep_id, r.n_members, r.is_kept) for r in rows}


def test_cross_epoch_merge_matches_batch(spark, tmp_path):
    """A chain delivered one edge per epoch: epoch 0 = (1,5), epoch 1 =
    (5,9) must MERGE the {1,5} component with the fresh node 9 (relabel
    of existing rows, not just an append); epoch 2 = (20,21) is an
    independent component. Final state == batch resolve on all pairs."""
    res = StreamingClusterResolver(str(tmp_path / "snap"))
    epochs = [[(1, 5)], [(5, 9)], [(20, 21)]]
    seen = []
    for i, pairs in enumerate(epochs):
        seen += pairs
        res.process_batch(
            spark.createDataFrame(pairs, "id1 long, id2 long"), i
        )
        want = _as_map(
            resolve_clusters(
                spark.createDataFrame(seen, "doc_id1 long, doc_id2 long")
            ).collect()
        )
        got = _as_map(res.resolved(spark).collect())
        assert got == want, f"after epoch {i}: {got} != {want}"
    assert got[9] == (1, 3, False) and got[1] == (1, 3, True)


def test_replay_is_idempotent(spark, tmp_path):
    """At-least-once delivery: re-applying an absorbed epoch must leave
    the snapshot bit-identical (min-label merging is idempotent — the
    property that lets the sink skip epoch-commit markers)."""
    res = StreamingClusterResolver(str(tmp_path / "snap"))
    b0 = spark.createDataFrame([(1, 5), (5, 9)], "id1 long, id2 long")
    b1 = spark.createDataFrame([(9, 2)], "id1 long, id2 long")
    res.process_batch(b0, 0)
    res.process_batch(b1, 1)
    want = _as_map(res.resolved(spark).collect())
    res.process_batch(b1, 1)  # replayed epoch
    res.process_batch(b0, 0)  # stale replay out of order
    assert _as_map(res.resolved(spark).collect()) == want
    assert want[5] == (1, 4, False)


def test_stream_pairs_end_to_end_matches_batch(spark, tmp_path, sf_dir):
    """The full streaming dedup story: fixture verified pairs streamed in
    3 microbatches through a real writeStream → the resolver snapshot
    equals the batch dedup_cluster_resolution member table."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select(
        "doc_id1", "doc_id2"
    )
    want = _as_map(resolve_clusters(pairs).collect())
    assert want, "fixture must contain near-dup clusters"

    rows = pairs.collect()
    src = str(tmp_path / "pairs_stream")
    os.makedirs(src)
    chunk = (len(rows) + 2) // 3
    n_files = 0
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(
                [(r.doc_id1, r.doc_id2) for r in part], "id1 long, id2 long"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i}")
            )
            n_files += 1

    res = StreamingClusterResolver(str(tmp_path / "snap"))
    stream = (
        spark.readStream.schema("id1 long, id2 long")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    q = res.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert res.batches_seen >= 2, "parity must span multiple microbatches"
    assert _as_map(res.resolved(spark).collect()) == want


def test_swap_crash_recovery(spark, tmp_path):
    """Displace-swap crash windows (CLAUDE.md invariant): a crash between
    the two renames leaves only snap.old-N — _recover() must restore it;
    a stale .tmp-N from a crash before the swap is swept."""
    import shutil

    snap = str(tmp_path / "snap")
    res = StreamingClusterResolver(snap)
    res.process_batch(
        spark.createDataFrame([(1, 5)], "id1 long, id2 long"), 0
    )
    want = _as_map(res.resolved(spark).collect())

    # crash window: snapshot displaced, new one never moved in
    os.rename(snap, snap + ".old-1")
    shutil.copytree(snap + ".old-1", snap + ".tmp-1")
    assert _as_map(res.resolved(spark).collect()) == want
    assert not os.path.exists(snap + ".old-1")
    assert not os.path.exists(snap + ".tmp-1")
