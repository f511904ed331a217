"""Streaming substring index (streaming/substring.py): single-batch
parity with the batch operator, ingest-time past-only semantics across
batches, replay idempotence, and warm-start bootstrap."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.substring import SPAN_N, dedup_substring_spans
from kstreams_spark.streaming.substring import StreamingSubstringIndex

SPAN = " ".join(f"s{i}" for i in range(SPAN_N))
UA = " ".join(f"a{i}" for i in range(12))
UB = " ".join(f"b{i}" for i in range(12))


def _canon(df):
    return {
        r.doc_id: (r.n_tokens, r.n_dup_starts, r.covered_tokens, r.is_flagged)
        for r in df.collect()
    }


def test_single_batch_matches_batch_operator(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = StreamingSubstringIndex(
        str(tmp_path / "idx"), str(tmp_path / "flags")
    )
    idx.process_batch(docs, epoch_id=0)
    got = _canon(idx.flags(spark).drop("epoch"))
    want = _canon(dedup_substring_spans(spark, sf_dir))
    assert got == want and got


def test_later_copy_flags_but_first_stays_clean(spark, tmp_path):
    b0 = spark.createDataFrame([(1, f"{UA} {SPAN}")], ["doc_id", "text"])
    b1 = spark.createDataFrame(
        [(2, f"{UB} {SPAN}"), (3, f"{UA} {SPAN}")], ["doc_id", "text"]
    )
    idx = StreamingSubstringIndex(
        str(tmp_path / "idx"), str(tmp_path / "flags")
    )
    idx.process_batch(b0, epoch_id=0)
    idx.process_batch(b1, epoch_id=1)
    got = _canon(idx.flags(spark).drop("epoch"))
    # doc 1 ingested before any duplicate existed: clean (past-only)
    assert got[1] == (20, 0, 0, 0)
    # doc 2 shares only SPAN with the past: 8 covered of 20 — over the
    # 20% threshold, so it flags
    assert got[2] == (20, 1, SPAN_N, 1)
    # doc 3 is an exact copy of doc 1: fully covered, flagged
    assert got[3][1] == 20 - SPAN_N + 1  # every window duplicated
    assert got[3][2] == 20 and got[3][3] == 1


def test_replayed_epoch_is_idempotent(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = StreamingSubstringIndex(
        str(tmp_path / "idx"), str(tmp_path / "flags")
    )
    idx.process_batch(docs, epoch_id=0)
    want = _canon(idx.flags(spark).drop("epoch"))
    idx.process_batch(docs, epoch_id=0)  # at-least-once replay
    assert _canon(idx.flags(spark).drop("epoch")) == want
    # index did not double-absorb: a fresh batch with a copy of a doc
    # must count occ = 2 (1 indexed + 1 batch), flagging it fully...
    first = docs.orderBy("doc_id").first()
    copy = spark.createDataFrame(
        [(10_000_000, first.text)], ["doc_id", "text"]
    )
    idx.process_batch(copy, epoch_id=1)
    got = _canon(idx.flags(spark).drop("epoch"))
    assert got[10_000_000][3] == 1  # fully covered by the indexed original


def test_bootstrap_warm_start(spark, tmp_path):
    corpus = spark.createDataFrame([(1, f"{UA} {SPAN}")], ["doc_id", "text"])
    idx = StreamingSubstringIndex(
        str(tmp_path / "idx"), str(tmp_path / "flags")
    )
    idx.bootstrap(corpus)
    b = spark.createDataFrame([(2, f"{UB} {SPAN}")], ["doc_id", "text"])
    idx.process_batch(b, epoch_id=0)
    got = _canon(idx.flags(spark).drop("epoch"))
    assert 1 not in got  # bootstrap emits no flags
    assert got[2] == (20, 1, SPAN_N, 1)  # 8/20 covered > 20% threshold
