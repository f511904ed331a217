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
