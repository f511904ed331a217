"""Batch/stream parity + exactly-once replay for the streaming
decontamination splitter: streamed microbatches must flag exactly the
docs the batch operator flags, clean∪flagged must partition the corpus,
and a replayed epoch must not duplicate output."""

from __future__ import annotations

import os

from kstreams_spark.io import load_table
from kstreams_spark.operators.decontam import _fixture_eval, decontaminate
from kstreams_spark.streaming.decontam import StreamingDecontaminator


def _eval_df(spark, sf_dir):
    return _fixture_eval(load_table(spark, sf_dir, "documents"))


def test_stream_matches_batch_decontamination(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = _eval_df(spark, sf_dir)

    want = {
        r.doc_id: (r.n_hit_ngrams, r.n_eval_docs_hit)
        for r in decontaminate(docs, ev).collect()
    }
    assert want, "fixture must contain planted contamination"

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

    dec = StreamingDecontaminator(
        ev, str(tmp_path / "clean"), str(tmp_path / "flagged")
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    q = dec.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert dec.batches_seen >= 2, "parity must span multiple microbatches"

    got = {
        r.doc_id: (r.n_hit_ngrams, r.n_eval_docs_hit)
        for r in dec.flagged(spark).collect()
    }
    assert got == want

    clean_ids = {r.doc_id for r in dec.clean(spark).collect()}
    all_ids = {r.doc_id for r in rows}
    assert clean_ids | set(got) == all_ids
    assert clean_ids.isdisjoint(got), "clean and flagged must partition"


def test_replayed_epoch_is_idempotent(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = _eval_df(spark, sf_dir)
    dec = StreamingDecontaminator(
        ev, str(tmp_path / "clean"), str(tmp_path / "flagged")
    )
    dec.process_batch(docs, epoch_id=0)
    n_clean = dec.clean(spark).count()
    n_flagged = dec.flagged(spark).count()
    dec.process_batch(docs, epoch_id=0)  # at-least-once replay
    assert dec.clean(spark).count() == n_clean
    assert dec.flagged(spark).count() == n_flagged


def test_decontaminator_erasure(spark, tmp_path, sf_dir):
    """delete_docs on the splitter's per-doc outputs: the erased doc's
    clean copy (its full text) and flag row both vanish; compact()
    removes the bytes and the sidecar."""
    from pyspark.sql import functions as F

    from kstreams_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = _eval_df(spark, sf_dir)
    d = StreamingDecontaminator(
        ev, str(tmp_path / "clean"), str(tmp_path / "flagged")
    )
    d.process_batch(docs, 0)
    doomed = int(
        d.clean(spark).agg(F.min("doc_id")).first()[0]
    )
    d.delete_docs(spark, [doomed])
    assert d.clean(spark).filter(F.col("doc_id") == doomed).count() == 0
    assert d.flagged(spark).filter(F.col("doc_id") == doomed).count() == 0
    d.compact(spark)
    raw = spark.read.parquet(str(tmp_path / "clean"))
    assert raw.filter(F.col("doc_id") == doomed).count() == 0
    import os

    assert not os.path.isdir(str(tmp_path / "clean" / "_dels"))
