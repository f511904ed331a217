"""Oracle-checked queries written THROUGH the fluent DSL facade
(kstreams_spark/dsl.py) — the facade's semantics go through the same
DuckDB hash gate as every hand-written operator, so a regression in any
verb mapping (filter/mapValues/selectKey/branch/groupByKey/windowedBy)
fails the driver's value-hash, not just a unit test. The DSL is thin by
design (every verb a documented Spark construct), and these queries are
the standing proof that thin stayed thin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.dsl import StreamsBuilder
from kstreams_spark.io import load_table
from kstreams_spark.operators._util import dsum
from kstreams_spark.registry import query


@query(
    "dsl_topology_hourly_counts",
    oracle="""
    SELECT event_type AS etype,
           CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
             AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE value > 10
    GROUP BY 1, 2
    """,
)
def dsl_topology_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A five-verb DSL topology — filter → selectKey → groupByKey →
    windowedBy(1h) → aggregate — against a plain-SQL oracle: the Kafka
    Streams user's `stream.filter(..).selectKey(..).groupByKey()
    .windowedBy(..).aggregate(..)` spelled in kstreams_spark.dsl and
    hash-certified. The plan is exactly window_tumbling_agg's (one
    partial+final aggregate around one Exchange — the facade adds no
    operator), and the same chain attaches to a readStream source
    unchanged (tests/test_dsl.py's streaming rebuild)."""
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    table = (
        b.stream(ev, key="user_id")
        .filter(F.col("value") > 10)
        .select_key(F.col("event_type"), name="etype")
        .group_by_key()
        .windowed_by("ts", "1 hour")
        .aggregate(
            n=F.count(F.lit(1)),
            sum_value=dsum("value"),
        )
    )
    return table.df.select(
        "etype",
        F.col("window.start").alias("window_start"),
        "n",
        "sum_value",
    )
