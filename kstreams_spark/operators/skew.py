"""Skew-handling techniques (SCALE.md): salting for hot keys, demonstrated
as oracle-checked queries — the DuckDB twin computes the UNSALTED form, so
the hash-match proves salting preserves semantics exactly (which is the
whole point: decimal-exact aggregation makes the two-phase rewrite
bit-identical, not just approximately right).

When to use: AQE's skew-join handles most cases automatically
(spark.sql.adaptive.skewJoin.enabled, on in the session factory); manual
salting is for skewed AGGREGATIONS (AQE doesn't split hot groupBy keys)
and for joins whose hot keys are known a priori.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query

N_SALTS = 16


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (hot) key:
    phase 1 groups by (key, salt) — 16× more groups, even partitions;
    phase 2 merges salts per key. The oracle is the PLAIN group-by:
    decimal-exact partial sums merge associatively, so results are
    bit-identical. At 100 TB this is the fix when one event_type holds
    half the stream and a single reducer would own it."""
    ev = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.col("event_id"), F.lit(N_SALTS)).alias("salt")
    phase1 = (
        ev.withColumn("salt", salt)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("n_part"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_part"),
        )
    )
    return phase1.groupBy("event_type").agg(
        F.sum("n_part").alias("n"),
        F.sum("sum_part").cast("double").alias("sum_value"),
    )


@query(
    "skew_salted_broadcast_join",
    oracle="""
    SELECT c.c_name, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_name
    """,
)
def skew_salted_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join: the small side is exploded ×16 (one copy per
    salt), the big side tags rows with a deterministic salt, and the join
    key becomes (key, salt) — a hot user's rows spread over 16 partitions
    instead of one. Oracle = the plain join; results bit-identical.

    (Here the small side would broadcast anyway — the query exists to
    pin the rewrite's correctness; the technique matters when BOTH sides
    are too big to broadcast and one key dominates.)"""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    salted_big = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)))
    salted_small = c.select(
        "c_custkey",
        "c_name",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))).alias("salt"),
    )
    return (
        salted_big.join(
            salted_small,
            (salted_big.user_id == salted_small.c_custkey)
            & (salted_big.salt == salted_small.salt),
        )
        .groupBy("c_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
