"""Streaming sequence packer (streaming/packing.py): single-batch parity
with the batch operator, cross-batch chunk continuation (interior chunks
stay exactly full — no padding at batch boundaries), replay idempotence,
and offset bootstrap from the committed manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.packing import CTX_LEN, pack_sequences
from kstreams_spark.streaming.packing import StreamingSequencePacker


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )


def _canon(df):
    return {
        (r.shard, r.chunk_id, r.doc_id, r.doc_off, r.chunk_off, r.n_span)
        for r in df.collect()
    }


def _check_tiling(man, docs):
    """Every token exactly once; interior chunks exactly CTX_LEN full."""
    per_doc = {
        r.doc_id: r.s
        for r in man.groupBy("doc_id").agg(F.sum("n_span").alias("s")).collect()
    }
    truth = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert per_doc == truth
    last = {
        r.shard: r.m
        for r in man.groupBy("shard").agg(F.max("chunk_id").alias("m")).collect()
    }
    for r in (
        man.groupBy("shard", "chunk_id")
        .agg(F.sum("n_span").alias("filled"))
        .filter(F.col("filled") != CTX_LEN)
        .collect()
    ):
        assert r.chunk_id == last[r.shard], (r.shard, r.chunk_id)


def test_single_batch_matches_batch_operator(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir)
    packer = StreamingSequencePacker(str(tmp_path / "man"))
    packer.process_batch(docs, epoch_id=0)
    got = _canon(packer.manifest(spark).drop("epoch"))
    want = _canon(pack_sequences(docs))
    assert got == want


def test_cross_batch_continuation_keeps_interior_chunks_full(
    spark, tmp_path, sf_dir
):
    docs = _docs(spark, sf_dir)
    rows = docs.orderBy("doc_id").collect()
    cut = len(rows) // 2
    b0 = spark.createDataFrame(rows[:cut], docs.schema)
    b1 = spark.createDataFrame(rows[cut:], docs.schema)
    packer = StreamingSequencePacker(str(tmp_path / "man"))
    packer.process_batch(b0, epoch_id=0)
    packer.process_batch(b1, epoch_id=1)
    man = packer.manifest(spark)
    _check_tiling(man, docs)
    # continuation is real: some chunk contains docs from BOTH epochs
    spanning = (
        man.groupBy("shard", "chunk_id")
        .agg(F.count_distinct("epoch").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spanning > 0


def test_replayed_epoch_is_idempotent(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir)
    packer = StreamingSequencePacker(str(tmp_path / "man"))
    packer.process_batch(docs, epoch_id=0)
    n = packer.manifest(spark).count()
    offs = dict(packer.offsets)
    packer.process_batch(docs, epoch_id=0)  # at-least-once replay
    assert packer.manifest(spark).count() == n
    assert packer.offsets == offs  # offsets did not double-advance


def test_bootstrap_restores_offsets_after_restart(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = docs.orderBy("doc_id").collect()
    cut = len(rows) // 2
    b0 = spark.createDataFrame(rows[:cut], docs.schema)
    b1 = spark.createDataFrame(rows[cut:], docs.schema)
    p1 = StreamingSequencePacker(str(tmp_path / "man"))
    p1.process_batch(b0, epoch_id=0)
    # crash: new instance, offsets rebuilt from the committed manifest
    p2 = StreamingSequencePacker(str(tmp_path / "man"))
    p2.bootstrap(spark)
    assert p2.offsets == p1.offsets
    p2.process_batch(b1, epoch_id=1)
    _check_tiling(p2.manifest(spark), docs)


def test_bootstrap_on_empty_dir_is_clean(spark, tmp_path):
    p = StreamingSequencePacker(str(tmp_path / "nothing"))
    p.bootstrap(spark)
    assert p.offsets == {}
