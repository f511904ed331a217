"""Streaming boilerplate scrubber (streaming/boilerplate.py):
single-batch parity with text_boilerplate_rewrite, ingest-time past-only
semantics across batches, replay idempotence, and warm-start bootstrap."""

from __future__ import annotations

from kstreams_spark.io import load_table
from kstreams_spark.registry import QUERIES, load_all
from kstreams_spark.streaming.boilerplate import StreamingBoilerplateScrubber

load_all()

# one 20-token paragraph (PARA_TOKENS) per string, distinct per label
P_BOILER = " ".join(f"nav{i}" for i in range(20))
P_A = " ".join(f"a{i}" for i in range(20))
P_B = " ".join(f"b{i}" for i in range(20))
P_C = " ".join(f"c{i}" for i in range(20))


def _canon(df):
    return {
        r.doc_id: (r.n_paras, r.n_kept, r.text_kept) for r in df.collect()
    }


def test_single_batch_matches_batch_operator(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    s = StreamingBoilerplateScrubber(
        str(tmp_path / "idx"), str(tmp_path / "clean")
    )
    s.process_batch(docs, epoch_id=0)
    got = _canon(s.clean(spark).drop("epoch"))
    want = _canon(QUERIES["text_boilerplate_rewrite"](spark, sf_dir))
    assert got == want and got


def test_paragraph_turns_boilerplate_only_once_threshold_reached(
    spark, tmp_path
):
    s = StreamingBoilerplateScrubber(
        str(tmp_path / "idx"), str(tmp_path / "clean"), min_docs=3
    )
    # epoch 0: two docs share the nav paragraph — below the 3-doc bar
    b0 = spark.createDataFrame(
        [(1, f"{P_BOILER} {P_A}"), (2, f"{P_BOILER} {P_B}")],
        ["doc_id", "text"],
    )
    s.process_batch(b0, epoch_id=0)
    got = _canon(s.clean(spark).drop("epoch"))
    assert got[1] == (2, 2, f"{P_BOILER} {P_A}")  # kept in full
    assert got[2] == (2, 2, f"{P_BOILER} {P_B}")

    # epoch 1: a third doc pushes the nav paragraph to 3 distinct docs —
    # THIS doc is scrubbed; the two earlier ones already landed clean
    b1 = spark.createDataFrame([(3, f"{P_BOILER} {P_C}")], ["doc_id", "text"])
    s.process_batch(b1, epoch_id=1)
    got = _canon(s.clean(spark).drop("epoch"))
    assert got[3] == (2, 1, P_C)
    assert got[1][1] == 2  # past stays as ingested (past-only semantics)


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    s = StreamingBoilerplateScrubber(
        str(tmp_path / "idx"), str(tmp_path / "clean"), min_docs=2
    )
    b0 = spark.createDataFrame(
        [(1, f"{P_BOILER} {P_A}"), (2, f"{P_BOILER} {P_B}")],
        ["doc_id", "text"],
    )
    s.process_batch(b0, epoch_id=0)
    before = _canon(s.clean(spark).drop("epoch"))
    s.process_batch(b0, epoch_id=0)  # crash-replay of the same epoch
    after = _canon(s.clean(spark).drop("epoch"))
    assert before == after
    # and the replay didn't double the index: doc 3's next-epoch count
    # still sees exactly 2 distinct docs for the shared paragraph
    b1 = spark.createDataFrame([(3, f"{P_BOILER} {P_C}")], ["doc_id", "text"])
    s.process_batch(b1, epoch_id=1)
    got = _canon(s.clean(spark).drop("epoch"))
    assert got[3] == (2, 1, P_C)


def test_bootstrap_warm_start(spark, tmp_path):
    s = StreamingBoilerplateScrubber(
        str(tmp_path / "idx"), str(tmp_path / "clean"), min_docs=3
    )
    corpus = spark.createDataFrame(
        [(1, f"{P_BOILER} {P_A}"), (2, f"{P_BOILER} {P_B}")],
        ["doc_id", "text"],
    )
    s.bootstrap(corpus)
    # no cleaned rows emitted by bootstrap
    assert not s.clean_sink.is_committed(-1)
    b = spark.createDataFrame([(3, f"{P_BOILER} {P_C}")], ["doc_id", "text"])
    s.process_batch(b, epoch_id=0)
    got = _canon(s.clean(spark).drop("epoch"))
    assert got[3] == (2, 1, P_C)  # bootstrap docs counted toward the bar
