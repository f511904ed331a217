"""operators/_util.global_row_number: the two-phase global rank must
equal the unpartitioned-window row_number on any total order, survive
shuffle-width changes, and handle degenerate inputs (empty, single row,
fewer rows than ranges)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kstreams_spark.operators._util import global_row_number


def _want(df, order):
    return {
        tuple(r)
        for r in df.withColumn(
            "rnk", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }


def test_matches_unpartitioned_window(spark):
    df = spark.range(5000).select(
        (F.col("id") % 37).alias("cnt"),
        F.concat(F.lit("t"), F.col("id")).alias("tok"),
    )
    order = [F.col("cnt").desc(), F.col("tok")]
    got = {tuple(r) for r in global_row_number(df, order, "rnk").collect()}
    assert got == _want(df, order)


def test_width_invariant(spark):
    df = spark.range(999).select(
        (F.col("id") % 7).alias("cnt"),
        F.col("id").alias("tok"),
    )
    order = [F.col("cnt").desc(), F.col("tok")]
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(
            (r.tok, r.rnk)
            for r in global_row_number(df, order, "rnk").collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        b = sorted(
            (r.tok, r.rnk)
            for r in global_row_number(df, order, "rnk").collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b


def test_degenerate_inputs(spark):
    order = [F.col("v")]
    empty = spark.createDataFrame([], "v long")
    assert global_row_number(empty, order, "rnk").count() == 0

    one = spark.createDataFrame([(42,)], "v long")
    assert [(r.v, r.rnk) for r in global_row_number(one, order, "rnk").collect()] == [
        (42, 1)
    ]

    few = spark.createDataFrame([(3,), (1,), (2,)], "v long")
    got = sorted(
        (r.v, r.rnk)
        for r in global_row_number(few, order, "rnk", n_ranges=32).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_prefix_sum_matches_unpartitioned_window(spark):
    from kstreams_spark.operators._util import global_prefix_sum

    df = spark.range(3000).select(
        (F.col("id") % 17).alias("k"),
        F.col("id").alias("tok"),
        ((F.col("id") * 7) % 101).alias("v"),
    )
    order = [F.col("k").desc(), F.col("tok")]
    got = {
        (r.tok, r.run)
        for r in global_prefix_sum(df, order, "v", "run").collect()
    }
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.tok, r.run)
        for r in df.withColumn(
            "run", F.sum("v").over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_prefix_sum_width_invariant_and_degenerate(spark):
    from kstreams_spark.operators._util import global_prefix_sum

    order = [F.col("v")]
    empty = spark.createDataFrame([], "v long")
    assert global_prefix_sum(empty, order, "v", "run").count() == 0
    few = spark.createDataFrame([(3,), (1,), (2,)], "v long")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        got = sorted(
            (r.v, r.run)
            for r in global_prefix_sum(few, order, "v", "run").collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert got == [(1, 1), (2, 3), (3, 6)]
