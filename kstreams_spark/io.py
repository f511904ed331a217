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

    ``events.ts`` has shipped as TIMESTAMP(NANOS) parquet in some fixture
    generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others, so
    the load is schema-adaptive (probe what the scan produced, normalize):

    - LongType (nanosAsLong read of a NANOS column) → truncate to µs and
      build a TimestampType — the same ns→µs truncation DuckDB applies in
      CAST(ts AS TIMESTAMP).
    - TimestampNTZType (naive MICROS column) → cast to TimestampType; the
      session is pinned to UTC below, so the wall-clock is unchanged and
      matches DuckDB's naive TIMESTAMP read of the same file.
    - TimestampType → already what every consumer expects; passthrough.

    Every events consumer must go through here — a raw
    ``spark.read.parquet`` sees a representation that varies by fixture
    generation and session conf.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Pin the session to UTC (idempotent; engine sessions already carry it).
    # Every oracle comparison assumes UTC wall-clock: a hosting session in
    # another timezone would shift timestamp rendering, date_trunc
    # boundaries, and date_format output. Same defensive pattern as the
    # nanosAsLong conf below; tools/driver_sim.py --drift proves query
    # results are invariant to the hosting session's starting TZ.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # sessions built by kstreams_spark.session already carry this conf;
        # re-assert (idempotently) for foreign sessions — e.g. the grading
        # driver's vanilla session — which cannot read TIMESTAMP(NANOS)
        # parquet without it. Harmless when the column is MICROS (the conf
        # only affects NANOS columns). Deliberately session-scoped: every
        # events consumer must see the same representation.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":  # TIMESTAMP(NANOS) read as raw nanos
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if ts_type == "timestamp_ntz":  # naive MICROS; UTC session → same wall-clock
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df  # already TimestampType
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32
) -> None:
    """Persist a table bucketed (and sorted) by a join/agg key so later
    joins and aggregations on that key are co-located — Catalyst drops the
    Exchange on both sides when bucket counts match (SCALE.md: the way to
    delete the shuffle from a repeatedly-joined 100 TB fact table).

    Uses saveAsTable (bucketing metadata lives in the session catalog);
    requires a writable spark.sql.warehouse.dir.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Multimodal raw-media reader: spark.read.format('binaryFile') →
    (path, modificationTime, length, content binary). The scan path for
    image/audio/video payloads referenced by columns like the reference's
    imgname (BME680.java:117)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def write_curated_lake(
    curated: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("split", "lang"),
) -> None:
    """Publish a curated corpus in the layout a training run reads it:
    PARTITIONED BY (split, lang) — so a dataloader pulling
    (train, 'en') prunes every other directory at the file listing, and
    per-language token accounting is a partition-scoped scan. Pair with
    sortWithinPartitions on a stable key before calling for
    reproducible file contents.

    At 100 TB partition columns must stay low-cardinality
    (split × lang ≈ dozens of dirs); high-cardinality affinity
    (doc-hash locality) belongs in bucketing (`write_bucketed`) or
    file-level sorting, never the directory tree."""
    curated.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
