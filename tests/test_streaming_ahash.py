"""Streaming aHash image dedup (streaming/ahash.py): single-batch
consistency with the batch pairs operator, past-only dup semantics
across batches, replay idempotence, and warm-start bootstrap."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import QUERIES, load_all
from kstreams_spark.streaming.ahash import StreamingAhashIndex

load_all()


def _canon(df):
    return {r.doc_id: (r.ahash, r.is_dup, r.match_of) for r in df.collect()}


def test_single_batch_consistent_with_batch_pairs(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id", "text")
    s = StreamingAhashIndex(str(tmp_path / "idx"), str(tmp_path / "v"))
    s.process_batch(docs, epoch_id=0)
    got = _canon(s.verdicts(spark).drop("epoch"))
    assert len(got) == 200
    # a doc is a dup exactly when it appears as doc_id2 in some batch pair
    pair_rhs = {
        r.doc_id2
        for r in QUERIES["multimodal_image_ahash_pairs"](spark, sf_dir).collect()
    }
    dups = {d for d, (_, is_dup, _) in got.items() if is_dup}
    assert dups == pair_rhs
    # match_of is always the bucket minimum and never a dup itself
    for d, (h, is_dup, m) in got.items():
        assert got[m][0] == h and got[m][1] == 0
        assert m <= d


def test_first_copy_clean_later_copy_flagged(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") < 100)
    b1 = docs.filter(F.col("doc_id") >= 100)
    s = StreamingAhashIndex(str(tmp_path / "idx"), str(tmp_path / "v"))
    s.process_batch(b0, epoch_id=0)
    s.process_batch(b1, epoch_id=1)
    got = _canon(s.verdicts(spark).drop("epoch"))
    assert len(got) == 200
    # epoch-1 docs whose hash existed in epoch 0 are dups pointing there
    e0_hashes = {h for d, (h, _, _) in got.items() if d < 100}
    for d, (h, is_dup, m) in got.items():
        if d >= 100 and h in e0_hashes:
            assert is_dup == 1 and m < 100, (d, h, m)


def test_replay_and_bootstrap(spark, tmp_path, sf_dir):
    all_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id", "text")
    docs = all_docs.filter(F.col("doc_id") < 100)
    s = StreamingAhashIndex(str(tmp_path / "idx"), str(tmp_path / "v"))
    s.process_batch(docs, epoch_id=0)
    before = _canon(s.verdicts(spark).drop("epoch"))
    s.process_batch(docs, epoch_id=0)  # crash-replay
    assert _canon(s.verdicts(spark).drop("epoch")) == before

    # warm start: bootstrap absorbs hashes without emitting verdicts,
    # and later ingests collide against the bootstrapped corpus
    s2 = StreamingAhashIndex(str(tmp_path / "idx2"), str(tmp_path / "v2"))
    s2.bootstrap(docs)
    assert not s2.verdicts_sink.is_committed(-1)
    s2.process_batch(all_docs.filter(F.col("doc_id") >= 100), epoch_id=0)
    got = _canon(s2.verdicts(spark).drop("epoch"))
    boot_hashes = {h for _, (h, _, _) in before.items()}
    collided = [d for d, (h, _, _) in got.items() if h in boot_hashes]
    assert collided, "fixture guarantees cross-half hash collisions"
    for d in collided:
        assert got[d][1] == 1 and got[d][2] < 100, (d, got[d])
