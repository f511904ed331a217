"""Sort / limit / top-k and set operations (SURVEY.md §2.3).

Top-k = orderBy().limit(k): Catalyst plans TakeOrderedAndProject — each
partition keeps a k-sized heap, the driver merges P×k rows. No global sort
ever materializes, so this is the 100 TB-safe form of "ORDER BY ... LIMIT".
Every limit query carries a total order with a unique tie-break so the
selected row SET is deterministic (the driver compares sets, but ties at
the cut line would otherwise make the set itself nondeterministic).

Set ops map 1:1 to Spark: union/unionByName (bag), intersect/except
(set semantics → aggregate under the hood), distinct/dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query


@query(
    "sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 most expensive lineitems (TakeOrderedAndProject plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "sort_multi_key_limit",
    oracle="""
    SELECT o_orderpriority, o_orderdate, o_orderkey
    FROM orders
    ORDER BY o_orderpriority ASC, o_orderdate DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def sort_multi_key_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-direction multi-key sort with limit."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_orderdate").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
        .select("o_orderpriority", "o_orderdate", "o_orderkey")
    )


@query(
    "set_union_nations",
    oracle="""
    SELECT DISTINCT nk FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    )
    """,
)
def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union (bag) + distinct — nations having a customer or a supplier."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics) — nations with both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)  # set semantics (EXCEPT DISTINCT), unlike exceptAll


@query(
    "distinct_dropduplicates",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates ≡ SELECT DISTINCT (hash aggregate, map-side combine)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").dropDuplicates()


@query(
    "union_by_name",
    oracle="""
    SELECT nk, src FROM (
      SELECT c_nationkey AS nk, 'customer' AS src FROM customer
      UNION ALL
      SELECT s_nationkey AS nk, 'supplier' AS src FROM supplier
    )
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName — column-name-aligned union (robust to column order)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"), F.lit("customer").alias("src")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"), F.col("s_nationkey").alias("nk")
    )
    return c.unionByName(s)
