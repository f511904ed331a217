"""Gopher repetition-metric semantics (VERDICT r5 next-round #3):
pathologically repetitive docs score near 1, diverse docs near 0, and
the builders agree between their Spark and DuckDB forms."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kstreams_spark.operators.text import (
    DUP2_GATE,
    duck_dup_char_frac,
    duck_dup_line_frac,
    duck_ngram_arr,
    spark_dup_char_frac,
    spark_dup_line_frac,
    spark_ngram_arr,
)

REPETITIVE = " ".join(["spam ham"] * 30)  # 60 tokens, 2 distinct
DIVERSE = " ".join(f"w{i}" for i in range(60))


def _spark_metrics(spark, text):
    df = spark.createDataFrame([(text,)], ["text"]).withColumn(
        "toks", F.split("text", " ")
    )
    return df.select(
        F.expr(spark_dup_line_frac()).alias("dl"),
        F.expr(spark_dup_char_frac(spark_ngram_arr(2))).alias("d2"),
        F.expr(spark_dup_char_frac(spark_ngram_arr(3))).alias("d3"),
    ).collect()[0]


def _duck_metrics(text):
    con = duckdb.connect()
    return con.execute(
        f"""
        WITH t AS (SELECT ? AS text, str_split(?, ' ') AS toks)
        SELECT {duck_dup_line_frac()} AS dl,
               {duck_dup_char_frac(duck_ngram_arr(2))} AS d2,
               {duck_dup_char_frac(duck_ngram_arr(3))} AS d3
        FROM t
        """,
        [text, text],
    ).fetchone()


def test_repetitive_doc_scores_high(spark):
    m = _spark_metrics(spark, REPETITIVE)
    assert m.dl > 0.5  # 3 identical 20-token lines
    assert m.d2 == 1.0 and m.d3 == 1.0  # every n-gram repeats; clamped
    assert m.d2 > DUP2_GATE  # the curation gate drops it


def test_diverse_doc_scores_zero(spark):
    m = _spark_metrics(spark, DIVERSE)
    assert m.dl == 0.0 and m.d2 == 0.0 and m.d3 == 0.0


def test_spark_duck_builders_agree_bitwise(spark):
    for text in (REPETITIVE, DIVERSE, "one", "a b c d e"):
        s = _spark_metrics(spark, text)
        d = _duck_metrics(text)
        assert (s.dl, s.d2, s.d3) == d, text
