"""SparkSession factory tuned for this engine.

The reference runs a single Kafka Streams thread (BME680.java:212-216, topic
created --partitions 1, BME680.java:38). We instead target a multi-executor
cluster: AQE on, shuffle partitions sized to cores locally (would be set to
~2-3x total cores on a real cluster), Arrow enabled for the Pandas-UDF path,
UTC session timezone so results compare exactly against the DuckDB oracle.

NOTE on ANSI mode: Spark 4.x enables ANSI SQL mode by default, which makes
CAST('garbage' AS DOUBLE) throw. The engine's declared semantics
(SURVEY.md §2.1 R7) are NULL-on-bad-cast — all engine code uses try_cast /
try_* expressions so behavior is identical whether the hosting session has
ANSI on or off. The factory leaves ANSI at its default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "kstreams_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession with scale-aware defaults."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.ts is TIMESTAMP(NANOS) parquet; set the legacy read conf at
        # session build so plans cached before the first events load see the
        # same setting (io.load_table re-asserts it for vanilla sessions)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def startup_diagnostics(spark: SparkSession) -> dict[str, str]:
    """R15 parity (buildHeader/dumpVars, BME680.java:184-208): the
    reference dumps config, env vars, and system properties at startup.
    Spark-native form: the resolved SparkConf plus runtime identity —
    returned as a dict (log it, ship it to your run tracker)."""
    conf = dict(spark.sparkContext.getConf().getAll())
    conf["engine.version"] = spark.version
    conf["engine.master"] = spark.sparkContext.master
    conf["engine.defaultParallelism"] = str(spark.sparkContext.defaultParallelism)
    return conf
