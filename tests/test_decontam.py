"""Planted-contamination tests for the decontamination operator
(VERDICT r5 next-round #1): a doc sharing an 8-gram with an eval example
is flagged, an unrelated doc is not, counts are exact."""

from __future__ import annotations

from kstreams_spark.operators.decontam import decontaminate

# 10 tokens: contains exactly three 8-grams (positions 1..3)
CONTAMINATED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
CLEAN = "one two three four five six seven eight nine ten"
# eval example shares tokens 1..8 of CONTAMINATED (one single 8-gram)
EVAL_TEXT = "alpha beta gamma delta epsilon zeta eta theta"


def test_planted_contamination_flagged(spark):
    docs = spark.createDataFrame(
        [(1, CONTAMINATED), (2, CLEAN)], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(100, EVAL_TEXT)], ["eval_id", "text"])
    out = {r.doc_id: r for r in decontaminate(docs, ev).collect()}
    assert set(out) == {1}, "only the planted doc is flagged"
    assert out[1].n_hit_ngrams == 1  # exactly the one shared 8-gram
    assert out[1].n_eval_docs_hit == 1


def test_multiple_eval_hits_counted_distinctly(spark):
    # one doc hit by two eval examples; shared 8-gram counted once per text
    docs = spark.createDataFrame([(1, CONTAMINATED)], ["doc_id", "text"])
    ev = spark.createDataFrame(
        [
            (100, EVAL_TEXT),
            # tokens 2..9 of CONTAMINATED — a different 8-gram
            (101, "beta gamma delta epsilon zeta eta theta iota"),
        ],
        ["eval_id", "text"],
    )
    row = decontaminate(docs, ev).collect()[0]
    assert row.n_hit_ngrams == 2
    assert row.n_eval_docs_hit == 2


def test_short_docs_and_short_eval_are_safe(spark):
    # docs/evals under n tokens produce no shingles and never flag
    docs = spark.createDataFrame([(1, "too short")], ["doc_id", "text"])
    ev = spark.createDataFrame([(100, "also short")], ["eval_id", "text"])
    assert decontaminate(docs, ev).count() == 0


def test_no_broadcast_path_matches(spark):
    docs = spark.createDataFrame(
        [(1, CONTAMINATED), (2, CLEAN)], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(100, EVAL_TEXT)], ["eval_id", "text"])
    a = sorted(map(tuple, decontaminate(docs, ev, broadcast_eval=True).collect()))
    b = sorted(map(tuple, decontaminate(docs, ev, broadcast_eval=False).collect()))
    assert a == b
