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
