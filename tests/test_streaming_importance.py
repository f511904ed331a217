"""Streaming importance scorer (streaming/importance.py): single-batch
parity with sample_importance_hashed (incl. the counts-only baseline
identity), past-informed rescoring across batches, replay idempotence,
and warm-start bootstrap."""

from __future__ import annotations

from kstreams_spark.io import load_table
from kstreams_spark.registry import QUERIES, load_all
from kstreams_spark.streaming.importance import StreamingImportanceScorer

load_all()


def _canon(df):
    return {
        r.doc_id: (r.n_tokens, r.imp_score, r.is_selected)
        for r in df.collect()
    }


def test_single_batch_matches_batch_operator(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    s = StreamingImportanceScorer(
        str(tmp_path / "idx"), str(tmp_path / "scores")
    )
    s.process_batch(docs, epoch_id=0)
    got = _canon(s.scores(spark).drop("epoch"))
    want = _canon(QUERIES["sample_importance_hashed"](spark, sf_dir))
    assert got == want and got


def test_scoring_uses_accumulated_counts(spark, tmp_path):
    """A doc scored in epoch 1 must see epoch 0's counts: the en-heavy
    past makes en-typical buckets high-importance, so the same doc
    scores differently than it would against a cold index."""
    s = StreamingImportanceScorer(
        str(tmp_path / "idx"), str(tmp_path / "scores")
    )
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma", "en"), (2, "delta epsilon zeta", "de")],
        ["doc_id", "text", "lang"],
    )
    s.process_batch(b0, epoch_id=0)
    b1 = spark.createDataFrame(
        [(3, "alpha beta", "de"), (4, "delta epsilon", "de")],
        ["doc_id", "text", "lang"],
    )
    s.process_batch(b1, epoch_id=1)
    got = _canon(s.scores(spark).drop("epoch"))
    # doc 3 carries the en-associated tokens of the past: higher score
    assert got[3][1] > got[4][1], got
    assert got[3][2] == 1 and got[4][2] == 0, got


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    s = StreamingImportanceScorer(
        str(tmp_path / "idx"), str(tmp_path / "scores")
    )
    b0 = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "gamma delta", "de")],
        ["doc_id", "text", "lang"],
    )
    s.process_batch(b0, epoch_id=0)
    before = _canon(s.scores(spark).drop("epoch"))
    s.process_batch(b0, epoch_id=0)  # crash-replay
    after = _canon(s.scores(spark).drop("epoch"))
    assert before == after
    # counts not doubled: epoch 1 weights from exactly one copy of epoch 0
    b1 = spark.createDataFrame([(3, "alpha", "de")], ["doc_id", "text", "lang"])
    s.process_batch(b1, epoch_id=1)
    idx = s.index_sink.result(spark)
    assert idx.groupBy().sum("r").collect()[0][0] == 5  # 4 + 1 tokens


def test_bootstrap_warm_start(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    s = StreamingImportanceScorer(
        str(tmp_path / "idx"), str(tmp_path / "scores")
    )
    s.bootstrap(docs)
    assert not s.scores_sink.is_committed(-1)
    b = spark.createDataFrame(
        [(999_999, "alpha beta", "de")], ["doc_id", "text", "lang"]
    )
    s.process_batch(b, epoch_id=0)
    got = _canon(s.scores(spark).drop("epoch"))
    assert set(got) == {999_999}
