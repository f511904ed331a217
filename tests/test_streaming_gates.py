"""Streaming curation gate (streaming/gates.py): kept/dropped partition
the stream, the decision matches the batch composites' gate exactly
(shared expression, pinned here), and replay cannot duplicate."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.text import DUP2_GATE, c4_quality_expr
from kstreams_spark.operators.text import spark_dup_char_frac, spark_ngram_arr
from kstreams_spark.streaming.gates import QUALITY_GATE, StreamingCurationGate


def _batch_kept_ids(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    scored = d.select(
        "doc_id",
        c4_quality_expr(F.col("toks")).alias("quality"),
        F.expr(spark_dup_char_frac(spark_ngram_arr(2))).alias("dup2"),
    )
    return {
        r.doc_id
        for r in scored.filter(
            (F.col("quality") >= QUALITY_GATE)
            & (F.col("dup2") <= DUP2_GATE)
        ).collect()
    }


def test_stream_matches_batch_gate(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    gate = StreamingCurationGate(
        str(tmp_path / "kept"), str(tmp_path / "dropped")
    )
    rows = docs.collect()
    chunk = (len(rows) + 2) // 3
    src = str(tmp_path / "in")
    os.makedirs(src)
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, docs.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(src, f"b{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
    )
    q = gate.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert gate.batches_seen >= 2
    kept = {r.doc_id for r in gate.kept(spark).collect()}
    dropped = {r.doc_id for r in gate.dropped(spark).collect()}
    assert kept == _batch_kept_ids(spark, sf_dir)
    assert kept | dropped == {r.doc_id for r in rows}
    assert kept.isdisjoint(dropped)
    # the audit side carries the scores
    r0 = gate.dropped(spark).first()
    assert hasattr(r0, "quality") and hasattr(r0, "dup2")


def test_replayed_epoch_is_idempotent(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    gate = StreamingCurationGate(
        str(tmp_path / "kept"), str(tmp_path / "dropped")
    )
    gate.process_batch(docs, epoch_id=0)
    n_k, n_d = gate.kept(spark).count(), gate.dropped(spark).count()
    gate.process_batch(docs, epoch_id=0)
    assert gate.kept(spark).count() == n_k
    assert gate.dropped(spark).count() == n_d


class TestStreamingPerplexityGate:
    def _fit_gate(self, spark, tmp_path, sf_dir, thr=9000):
        from kstreams_spark.operators.text import SURPRISE_TRAIN_MOD
        from kstreams_spark.streaming.gates import StreamingPerplexityGate

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        gate = StreamingPerplexityGate(
            str(tmp_path / "model"), str(tmp_path / "scored"), thr
        )
        gate.fit(docs.filter(F.col("doc_id") % SURPRISE_TRAIN_MOD < 8))
        return gate, docs

    def test_stream_scores_equal_batch_op(self, spark, tmp_path, sf_dir):
        """Bit-twin: the frozen-model streaming score of every doc must
        EQUAL text_bigram_surprise's row for it (same LM slice, shared
        expressions) — including held-out docs' OOV charges."""
        from kstreams_spark.operators.text import text_bigram_surprise

        gate, docs = self._fit_gate(spark, tmp_path, sf_dir)
        gate.process_batch(docs, 0)
        got = {
            r.doc_id: (
                r.n_bigrams,
                r.bits_total,
                r.unseen_bigrams,
                r.oov_bigrams,
                r.bits_per_bigram_x1000,
            )
            for r in gate.scored(spark).collect()
        }
        want = {
            r.doc_id: (
                r.n_bigrams,
                r.bits_total,
                r.unseen_bigrams,
                r.oov_bigrams,
                r.bits_per_bigram_x1000,
            )
            for r in text_bigram_surprise(spark, sf_dir).collect()
        }
        assert got == want

    def test_threshold_split_and_replay(self, spark, tmp_path, sf_dir):
        gate, docs = self._fit_gate(spark, tmp_path, sf_dir, thr=8000)
        gate.process_batch(docs.filter(F.col("doc_id") < 200), 0)
        out = gate.scored(spark)
        rows = out.collect()
        assert rows
        for r in rows:
            assert r.is_kept == (r.bits_per_bigram_x1000 <= 8000)
        n = out.count()
        gate.process_batch(docs.filter(F.col("doc_id") < 200), 0)  # replay
        assert gate.scored(spark).count() == n

    def test_refit_refused(self, spark, tmp_path, sf_dir):
        import pytest as _pytest

        gate, docs = self._fit_gate(spark, tmp_path, sf_dir)
        with _pytest.raises(ValueError, match="fresh model_dir"):
            gate.fit(docs)

    def test_fit_is_crash_safe(self, spark, tmp_path, sf_dir):
        """A crash between the two model-table writes leaves only
        staging debris: the next fit sweeps it and succeeds, and a
        completed fit survives debris appearing later."""
        import os
        import shutil

        from kstreams_spark.streaming.gates import StreamingPerplexityGate

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        gate = StreamingPerplexityGate(
            str(tmp_path / "model"), str(tmp_path / "scored"), 9000
        )
        # simulate the crash window: staging dir exists with one table,
        # live model dir absent
        staged = os.path.join(str(tmp_path / "model"), "model.new-del")
        docs.limit(1).write.parquet(os.path.join(staged, "big"))
        gate.fit(docs.filter(F.col("doc_id") % 10 < 8))  # sweeps + refits
        assert os.path.isdir(os.path.join(str(tmp_path / "model"), "model"))
        assert not os.path.isdir(staged)
        gate.process_batch(docs.limit(50), 0)
        assert gate.scored(spark).count() > 0
        with _pytest_raises_value_error():
            gate.fit(docs)  # completed fit still refuses a refit


def _pytest_raises_value_error():
    import pytest as _pytest

    return _pytest.raises(ValueError, match="fresh model_dir")
