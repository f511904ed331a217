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


def test_pin_uses_reliable_checkpoint_when_dir_set(spark, tmp_path):
    """ADVICE r8 (medium): the partitioning pin must not be a
    MEMORY_AND_DISK persist (a recompute after executor loss would
    re-sample range bounds and silently mis-rank). With a checkpoint
    dir configured the pin must be a RELIABLE checkpoint — files land
    under the dir, and ranks stay correct."""
    import os

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # test session has none
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        df = spark.range(500).select(
            (F.col("id") % 5).alias("cnt"), F.col("id").alias("tok")
        )
        order = [F.col("cnt").desc(), F.col("tok")]
        got = {
            (r.tok, r.rnk)
            for r in global_row_number(df, order, "rnk").collect()
        }
        assert got == {
            (r.tok, r.rnk)
            for r in df.withColumn(
                "rnk",
                F.row_number().over(Window.orderBy(*order)).cast("long"),
            ).collect()
        }
        ckpt_files = [
            os.path.join(root, f)
            for root, _, files in os.walk(tmp_path / "ckpt")
            for f in files
        ]
        assert ckpt_files, "reliable checkpoint wrote no files"
    finally:
        # PySpark has no unsetCheckpointDir; clear the JVM-side option so
        # other tests keep the no-dir (localCheckpoint) path.
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty()
        )
    assert sc.getCheckpointDir() is None


def test_pin_truncates_lineage_without_dir(spark):
    """Without a checkpoint dir the pin must be a LAZY localCheckpoint
    (materialized at the offsets collect — _pin_partitioning's documented
    rationale: eager would cost one extra full pass for no additional
    guarantee): lineage truncated (plan scans an ExistingRDD, not the
    original range), so block loss fails loudly instead of re-sampling
    bounds."""
    df = spark.range(200).select(F.col("id").alias("v"))
    out = global_row_number(df, [F.col("v")], "rnk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan


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
