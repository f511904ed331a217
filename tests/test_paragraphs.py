"""Paragraph-grain dedup semantics (VERDICT r5 next-round #2): a
paragraph shared by two docs survives in exactly one; reassembly
preserves order; total-loss docs keep an empty row."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kstreams_spark.operators._util import spread  # noqa: F401 (import check)
from kstreams_spark.operators.paragraphs import (
    PARA_ID_STRIDE,
    _totals,
    ngram_jaccard_pairs,
    paragraph_rows,
    reassemble,
    resolve_clusters,
)

# 20-token paragraphs, by construction
P_SHARED = " ".join(f"s{i}" for i in range(20))
P_A = " ".join(f"a{i}" for i in range(20))
P_B = " ".join(f"b{i}" for i in range(20))


def _exact_dedup(docs):
    paras = paragraph_rows(docs)
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "pos")
    kept = (
        paras.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return reassemble(kept, _totals(docs))


def test_shared_paragraph_kept_in_exactly_one(spark):
    docs = spark.createDataFrame(
        [(1, f"{P_A} {P_SHARED}"), (2, f"{P_B} {P_SHARED}")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in _exact_dedup(docs).collect()}
    # doc 1 (lower id) keeps the shared paragraph, doc 2 loses it
    assert out[1].text_kept == f"{P_A} {P_SHARED}"
    assert out[2].text_kept == P_B
    assert (out[1].n_paras, out[1].n_kept) == (2, 2)
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)


def test_repeat_within_one_doc_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [(7, f"{P_SHARED} {P_A} {P_SHARED}")], ["doc_id", "text"]
    )
    row = _exact_dedup(docs).collect()[0]
    assert row.n_paras == 3 and row.n_kept == 2
    assert row.text_kept == f"{P_SHARED} {P_A}"


def test_total_loss_doc_keeps_empty_row(spark):
    docs = spark.createDataFrame(
        [(1, P_SHARED), (2, P_SHARED)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in _exact_dedup(docs).collect()}
    assert out[1].text_kept == P_SHARED and out[1].n_kept == 1
    assert out[2].text_kept == "" and out[2].n_kept == 0
    assert out[2].n_paras == 1


def test_neardup_catches_non_identical_paragraph(spark):
    # second doc's copy differs in ONE token (19/20 shared → Jaccard
    # over 3-gram shingles well above 0.5) — exact dedup keeps both,
    # near-dup keeps only the first
    near = P_SHARED.replace("s10", "zz")
    docs = spark.createDataFrame(
        [(1, P_SHARED), (2, near)], ["doc_id", "text"]
    )
    paras = paragraph_rows(docs)
    pdocs = paras.select(
        (F.col("doc_id") * PARA_ID_STRIDE + F.col("pos")).alias("doc_id"),
        F.col("para").alias("text"),
    )
    losers = (
        resolve_clusters(ngram_jaccard_pairs(pdocs))
        .filter(~F.col("is_kept"))
        .select(F.col("doc_id").alias("para_id"))
    )
    kept = paras.join(
        losers,
        paras.doc_id * PARA_ID_STRIDE + paras.pos == losers.para_id,
        "left_anti",
    )
    out = {r.doc_id: r for r in reassemble(kept, _totals(docs)).collect()}
    assert out[1].text_kept == P_SHARED
    assert out[2].n_kept == 0 and out[2].text_kept == ""
