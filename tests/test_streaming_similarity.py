"""Batch/stream parity for the incremental LSH index (VERDICT r2 #7):
streaming planted-cluster embeddings through StreamingLshIndex in several
microbatches must emit EXACTLY the pairs the batch lsh_near_pairs mines
from the full corpus — same signatures, same exact-cosine verify, same
threshold. Also pins that each pair is emitted exactly once (the
index-absorb-after-match discipline)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from kstreams_spark.operators.similarity import lsh_near_pairs
from kstreams_spark.streaming.similarity import StreamingLshIndex


def _planted(n_clusters: int = 12, n_copies: int = 6, seed: int = 5):
    rng = np.random.default_rng(seed)
    rows = []
    for cluster in range(n_clusters):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        for copy in range(n_copies):
            noisy = base + rng.normal(scale=0.02, size=64)
            rows.append(
                (cluster + n_clusters * copy, [float(x) for x in noisy])
            )
    return rows


def test_stream_matches_batch_on_planted_clusters(spark, tmp_path):
    rows = _planted()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # batch twin over the full corpus (cluster mates ≈ 0.97 cosine)
    want = {
        (r.id1, r.id2): r.cosine
        for r in lsh_near_pairs(emb, min_cosine=0.5).collect()
    }
    assert want, "planted corpus must produce near pairs"

    # stream the same corpus in 4 file-microbatches
    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "vec_id long, embedding array<float>"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i}")
            )
    idx = StreamingLshIndex(
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "pairs"),
        min_cosine=0.5,
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    q = idx.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert idx.batches_seen >= 2, "parity must span multiple microbatches"

    got_rows = idx.result(spark).collect()
    got = {(r.id1, r.id2): r.cosine for r in got_rows}
    # exactly once: no pair emitted twice across epochs
    assert len(got_rows) == len(got), "duplicate pair emissions"
    assert set(got) == set(want), (
        f"stream∖batch={set(got) - set(want)} batch∖stream={set(want) - set(got)}"
    )
    for k in want:  # same exact fixed-point cosine, bit-for-bit
        assert got[k] == pytest.approx(want[k], abs=0.0), k


def test_crash_between_pairs_and_index_commit_is_exactly_once(spark, tmp_path):
    """The at-least-once hazard made real for the incremental index: a
    crash AFTER an epoch's pairs commit but BEFORE its index commit. The
    replayed epoch must skip matching (its pairs are committed), finish
    only the index absorb, and the final pair set must still equal the
    batch twin with zero duplicates."""
    from pyspark.errors import StreamingQueryException

    rows = _planted()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    want = {
        (r.id1, r.id2): r.cosine
        for r in lsh_near_pairs(emb, min_cosine=0.5).collect()
    }

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    chunk = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "vec_id long, embedding array<float>"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i}")
            )

    idx = StreamingLshIndex(
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "pairs"),
        min_cosine=0.5,
    )
    # sabotage: epoch 1's index commit crashes once, AFTER pairs committed
    orig = idx._index_sink.process_batch
    state = {"crashed": False}

    def flaky(df, epoch_id):
        if epoch_id == 1 and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash between pairs and index commit")
        orig(df, epoch_id)

    idx._index_sink.process_batch = flaky

    def make_stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "b*"))
        )

    ckpt = str(tmp_path / "ckpt")
    q = idx.attach(make_stream(), ckpt)
    try:
        q.processAllAvailable()
        raise AssertionError("expected the injected crash to fail the query")
    except StreamingQueryException:
        pass
    finally:
        q.stop()
    assert state["crashed"]
    # epoch 1: pairs committed, index NOT — the dangerous half-state
    assert idx._pairs_sink.is_committed(1)
    assert not idx._index_sink.is_committed(1)

    # restart from the same checkpoint: epoch 1 replays, completes the
    # index absorb without re-emitting, then the stream drains normally
    q2 = idx.attach(make_stream(), ckpt)
    q2.processAllAvailable()
    q2.stop()

    got_rows = idx.result(spark).collect()
    got = {(r.id1, r.id2): r.cosine for r in got_rows}
    assert len(got_rows) == len(got), "duplicate pair emissions after replay"
    assert set(got) == set(want)


def test_bootstrap_warm_start(spark, tmp_path):
    """Warm start: bootstrap the index with half the corpus (no emission
    for its internal pairs), stream the other half — emissions must be
    exactly the batch pair set MINUS the pairs wholly inside the
    bootstrap set (those are the batch twin's job), with cross and
    new-new pairs all present."""
    rows = _planted()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    all_pairs = {
        (r.id1, r.id2) for r in lsh_near_pairs(emb, min_cosine=0.5).collect()
    }
    boot_ids = {r[0] for r in rows[: len(rows) // 2]}
    want = {
        p for p in all_pairs if not (p[0] in boot_ids and p[1] in boot_ids)
    }
    assert want and want != all_pairs

    idx = StreamingLshIndex(
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "pairs"),
        min_cosine=0.5,
    )
    idx.bootstrap(
        spark.createDataFrame(
            rows[: len(rows) // 2], "vec_id long, embedding array<float>"
        )
    )
    import pytest

    with pytest.raises(ValueError, match="empty index_dir"):
        idx.bootstrap(emb)

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    rest = rows[len(rows) // 2 :]
    chunk = (len(rest) + 1) // 2
    for i in range(2):
        part = rest[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "vec_id long, embedding array<float>"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i}")
            )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    q = idx.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.id1, r.id2) for r in idx.result(spark).collect()}
    assert got == want, (
        f"stream∖want={got - want} want∖stream={want - got}"
    )


def test_index_compaction_mid_stream_preserves_parity(spark, tmp_path):
    """Stop the stream halfway, compact() the index (small-files
    maintenance), resume from the same checkpoint: emissions over the
    whole run must still equal the batch pair set exactly — the
    consolidated index matches identically and new epochs land on top."""
    rows = _planted()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    want = {
        (r.id1, r.id2) for r in lsh_near_pairs(emb, min_cosine=0.5).collect()
    }

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "vec_id long, embedding array<float>"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i}")
            )

    idx = StreamingLshIndex(
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "pairs"),
        min_cosine=0.5,
    )

    def make_stream(max_files):
        return (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", str(max_files))
            .parquet(os.path.join(src, "b*"))
        )

    ckpt = str(tmp_path / "ckpt")
    # phase 1: ingest roughly half (2 microbatches of 1 file)
    q = idx.attach(make_stream(1), ckpt)
    import time

    deadline = time.time() + 120
    while idx.batches_seen < 2 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert idx.batches_seen >= 2

    # maintenance window: compact the index (stream stopped)
    import glob

    files_before = len(glob.glob(str(tmp_path / "index" / "epoch=*" / "*.parquet")))
    idx._index_sink.compact(spark)
    files_after = len(glob.glob(str(tmp_path / "index" / "epoch=*" / "*.parquet")))
    assert files_after <= files_before

    # phase 2: resume from the same checkpoint and drain
    q2 = idx.attach(make_stream(1), ckpt)
    q2.processAllAvailable()
    q2.stop()

    got_rows = idx.result(spark).collect()
    got = {(r.id1, r.id2) for r in got_rows}
    assert len(got_rows) == len(got), "duplicate emissions"
    assert got == want, (
        f"stream∖batch={got - want} batch∖stream={want - got}"
    )
