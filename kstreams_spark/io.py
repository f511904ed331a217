"""Batch IO layer: load the driver fixture tables (TESTDATA.md).

All tables are single parquet files at <sf_dir>/<name>.parquet. Parquet is the
scan path that gives Catalyst predicate pushdown + column pruning for free
(SURVEY.md §4.1); the reference, by contrast, forwards whole JSON strings while
extracting one field (BME680.java:152,227).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain parquet scan — pushdown-friendly.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; we read it as raw nanos (legacy nanosAsLong conf) and
    truncate to a microsecond TimestampType — the same ns→µs truncation
    DuckDB applies in CAST(ts AS TIMESTAMP), so oracle parity holds.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
