"""Subquery handling (SURVEY.md §4.1: Catalyst decorrelation — free) plus
pivot, KTable-style latest-by-key, and exact percentiles.

Subqueries run through spark.sql over temp views so the text exercises the
analyzer's scalar/IN/EXISTS decorrelation — Catalyst rewrites correlated
forms into joins (visible in .explain as left-semi joins), which is
exactly the plan a hand-written join would get.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table, register_views
from kstreams_spark.operators._util import dsum
from kstreams_spark.registry import query


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice >
      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
              / COUNT(o_totalprice) * 1.5
       FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders 50% above the mean price (decimal-exact
    mean; identical SQL text runs on both engines)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice >
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(o_totalprice) * 1.5
           FROM orders)
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 5000.0)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → Catalyst left-semi join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 5000.0)
        """
    )


@query(
    "subquery_correlated_exists",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND year(o.o_orderdate) = 1998)
      AND NOT EXISTS (SELECT 1 FROM events e
                      WHERE e.user_id = c.c_custkey)
    """,
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS — decorrelated to semi/anti joins."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND year(o.o_orderdate) = 1998)
          AND NOT EXISTS (SELECT 1 FROM events e
                          WHERE e.user_id = c.c_custkey)
        """
    )


@query(
    "pivot_qty_by_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
             AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
             AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus values become columns. Spark's pivot with an
    explicit value list ['O','F'] avoids the extra value-discovery job —
    always pass the list at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )


@query(
    "ktable_latest_by_key",
    oracle="""
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_type,
           value AS latest_value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def ktable_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable materialization (§2.2 table(topic)): latest record per key.
    Batch = row_number over ts desc; streaming twin = groupBy(key).agg(
    last) in update mode, or foreachBatch MERGE into a keyed store."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
            F.col("value").alias("latest_value"),
        )
    )


@query(
    "percentile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (both engines: index =
    p·(n−1), interpolate) — at 100 TB use `approx_quantiles` below (GK
    sketch, mergeable, no global sort); it is unregistered because sketch
    merges are partition-layout-dependent (see its docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.75).alias("q75"),
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probabilities: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB percentile path: percentile_approx (Greenwald-Khanna
    sketch, mergeable partials, no global sort — exact percentiles sort
    the world). Returns one `q_<pct>` column per probability.

    Deliberately NOT a registered query: GK sketch merges are
    partition-layout-dependent on continuous data (measured: three
    layouts of the sf0.01 lineitem prices give medians 52780.74 /
    52792.01 / 52770.20 at accuracy 1000), which violates the oracle
    gate's bit-determinism invariant. Rank error is still bounded by
    1/accuracy — asserted in tests/test_approx_quantiles.py. Use
    percentile_exact when the gate matters, this when N does."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(
            f"q_{str(p).replace('0.', '')}"
        )
        for p in probabilities
    ]
    return df.groupBy(*group_cols).agg(*aggs)
