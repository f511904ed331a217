"""Batch/stream parity for the incremental MinHash near-dup index: the
fixture documents streamed in several microbatches must emit EXACTLY the
pairs the batch propose→verify pipeline (ngram_jaccard_pairs over MinHash
band candidates, i.e. dedup_minhash_verified) mines from the full corpus
— same bands, same sketch Jaccard, same threshold, no duplicates."""

from __future__ import annotations

import os

from kstreams_spark.io import load_table
from kstreams_spark.operators.dedup import ngram_jaccard_pairs
from kstreams_spark.streaming.dedup import StreamingMinhashIndex


def test_stream_matches_batch_minhash_verified(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    want = {
        (r.doc_id1, r.doc_id2): (r.n_common, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert want, "fixture must contain verified near-dup pairs"

    # stream the same corpus in 3 parquet microbatches
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    rows = docs.collect()
    chunk = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, docs.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(src, f"b{i}"))

    idx = StreamingMinhashIndex(
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "pairs"),
        threshold=0.5,
    )
    stream = (
        spark.readStream.schema(docs.schema)
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
    got = {(r.id1, r.id2): (r.n_common, r.jaccard) for r in got_rows}
    assert len(got_rows) == len(got), "duplicate pair emissions"
    assert set(got) == set(want), (
        f"stream∖batch={set(got) - set(want)} batch∖stream={set(want) - set(got)}"
    )
    for k, v in want.items():  # exact integer counts, identical jaccard
        assert got[k] == v, (k, got[k], v)


def test_minhash_index_crash_replay_exactly_once(spark, tmp_path, sf_dir):
    """Same crash injection as the LSH index test, through the shared
    StreamingPairIndex choreography: fail epoch 1 after its pairs commit
    but before its index commit; restart must complete the absorb without
    re-emitting, and the final pair set must still equal the batch twin."""
    from pyspark.errors import StreamingQueryException

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    want = {
        (r.doc_id1, r.doc_id2)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    rows = docs.collect()
    chunk = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, docs.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(src, f"b{i}"))

    idx = StreamingMinhashIndex(
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "pairs"),
        threshold=0.5,
    )
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
            spark.readStream.schema(docs.schema)
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
    assert idx._pairs_sink.is_committed(1)
    assert not idx._index_sink.is_committed(1)

    q2 = idx.attach(make_stream(), ckpt)
    q2.processAllAvailable()
    q2.stop()

    got_rows = idx.result(spark).collect()
    got = {(r.id1, r.id2) for r in got_rows}
    assert len(got_rows) == len(got), "duplicate pair emissions after replay"
    assert got == want
