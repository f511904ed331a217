"""Hashing-trick linear classifier (operators/classify.py): bucket hash
matches a Python md5 twin, injected model weights drive the margin, and
the decision is the exact integer sum."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kstreams_spark.operators.classify import (
    N_BUCKETS,
    bucket_sql,
    quality_classifier,
    synthesized_weights,
)


def _py_bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)


def test_bucket_expression_matches_python_md5(spark):
    toks = ["alpha", "beta", "", "é", "x1"]
    rows = (
        spark.createDataFrame([(t,) for t in toks], ["tok"])
        .select("tok", F.expr(bucket_sql("tok")).alias("b"))
        .collect()
    )
    got = {r.tok: r.b for r in rows}
    for t in toks:
        assert got[t] == _py_bucket(t), t
        assert 0 <= got[t] < N_BUCKETS


def test_injected_model_margin_exact(spark):
    # model: bucket("good") -> +5, bucket("bad") -> -7, others absent
    w = spark.createDataFrame(
        [(_py_bucket("good"), 5), (_py_bucket("bad"), -7)],
        ["bucket", "weight"],
    )
    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "bad bad"), (3, "good")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality_classifier(docs, w).collect()}
    # inner join vs the model: only modeled tokens count
    assert (out[1].margin, out[1].is_quality) == (5 + 5 - 7, 1)
    assert (out[2].margin, out[2].is_quality) == (-14, 0)
    assert (out[3].margin, out[3].is_quality) == (5, 1)
    assert out[1].n_tokens == 3  # duplicates count (bag of words)


def test_synthesized_weights_cover_range_and_are_deterministic(spark):
    w = synthesized_weights(spark).toPandas()
    assert len(w) == N_BUCKETS
    assert w.weight.min() >= -32768 and w.weight.max() <= 32767
    # both signs occur, so the fixture margin decision is non-trivial
    assert (w.weight > 0).any() and (w.weight < 0).any()
    # Python twin of the synthesis rule for one bucket
    b = 17
    h = hashlib.md5(f"qw{b}".encode()).hexdigest()
    expect = int(h[:4], 16) - 32768
    assert int(w.set_index("bucket").loc[b, "weight"]) == expect
