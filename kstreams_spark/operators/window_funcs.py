"""Window (analytic) functions (SURVEY.md §2.3 "window functions" row):
row_number/rank/dense_rank/ntile/lag/lead/running aggregates over
partitioned, ordered frames.

Scale posture: a window over partitionBy(k) is one shuffle on k plus a
per-partition sort — same cost class as a groupBy. The things that do NOT
scale are windows with no partitionBy (single-task total order) — the only
such query here is bounded (top-k) and handled by sort_limit instead.
Running sums use exact DECIMAL accumulation: both engines evaluate frames
in order, but DuckDB computes windowed SUMs with a segment tree, so float
addition order differs — decimal makes the result order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number with a unique tie-break key.
    At scale this is the standard top-k-per-group plan: shuffle on the
    group key, per-partition sort, early-out filter."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_rank_lag_lead",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           LAG(l_extendedprice) OVER w AS prev_price,
           LEAD(l_extendedprice) OVER w AS next_price
    FROM lineitem
    WHERE l_suppkey <= 3
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def window_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/lag/lead over a deterministic total order
    (shipdate + unique (orderkey, linenumber) tie-break)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("l_extendedprice").over(w).alias("prev_price"),
        F.lead("l_extendedprice").over(w).alias("next_price"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend — cumulative frame, exact decimal sum."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "window_ntile_quartiles",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile,
           FIRST_VALUE(o_orderkey) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
           ) AS top_order_in_status
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + first_value. The unpartitioned ntile is restricted to a 10%
    sample — a global ORDER BY window is a single-task sort and only
    acceptable on deliberately-bounded input."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    w_global = Window.orderBy("o_totalprice", "o_orderkey")
    w_status = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w_global).alias("price_quartile"),
        F.first("o_orderkey").over(w_status).alias("top_order_in_status"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING
           ) AS n_similar_priced
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based bounds) — count of the customer's orders
    within ±500 of each order's price."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-500, 500)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_priced"),
    )


@query(
    "window_cume_percent_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           cume_dist() OVER w AS cd,
           percent_rank() OVER w AS pr
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_cume_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist and percent_rank — distribution-position analytics.
    Both are ratios of exact integers (rows≤current/n, (rank-1)/(n-1)),
    so the doubles are bit-deterministic across engines."""
    li = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return li.select(
        "o_custkey",
        "o_orderkey",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


@query(
    "orders_active_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT o_custkey,
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d
      FROM orders
    ),
    grp AS (
      SELECT o_custkey, d,
             CAST(epoch(d) AS BIGINT) // 86400
               - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY d)
               AS isl
      FROM days
    ),
    islands AS (
      SELECT o_custkey, MIN(d) AS streak_start,
             COUNT(*) AS streak_days
      FROM grp GROUP BY o_custkey, isl
    ),
    best AS (
      SELECT o_custkey, streak_start, streak_days,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY streak_days DESC, streak_start)
               AS rn
      FROM islands
    )
    SELECT o_custkey, streak_start, streak_days
    FROM best WHERE rn = 1 AND streak_days >= 2
    """,
)
def orders_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each customer's LONGEST run of consecutive
    order days, via the classic day-number-minus-row-number trick
    (consecutive days share the difference, so the difference IS the
    island id — no self-joins, no recursion). Ties broken to the
    earliest streak; single-day 'streaks' filtered so the output is the
    interesting tail. epoch(d)//86400 is exact on day-truncated UTC
    timestamps in both engines.

    One o_custkey shuffle serves the distinct, the numbering window,
    the island aggregation, and the best-streak election — the same
    shared-prefix contract as sessionize (sessionize islands time by
    gap; this islands the CALENDAR by continuity)."""
    o = load_table(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey", F.date_trunc("day", "o_orderdate").alias("d")
    ).distinct()
    wn = Window.partitionBy("o_custkey").orderBy("d")
    grp = days.withColumn(
        "isl",
        (F.unix_timestamp("d") / 86400).cast("long")
        - F.row_number().over(wn),
    )
    islands = grp.groupBy("o_custkey", "isl").agg(
        F.min("d").alias("streak_start"),
        F.count(F.lit(1)).alias("streak_days"),
    )
    wb = Window.partitionBy("o_custkey").orderBy(
        F.col("streak_days").desc(), "streak_start"
    )
    return (
        islands.withColumn("rn", F.row_number().over(wb))
        .filter((F.col("rn") == 1) & (F.col("streak_days") >= 2))
        .select("o_custkey", "streak_start", "streak_days")
    )
