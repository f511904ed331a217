"""Streaming sources (SURVEY.md §2.1 R1, §2.2 stream/table):
- Kafka source wrapper reproducing the reference's string-serde topology
  (builder.stream(TOPIC1) with Serdes.String(), BME680.java:215-216,224);
- file source (for broker-less tests and replay);
- rate source (synthetic load).

The Kafka connector jar (spark-sql-kafka) is not bundled in this
environment, so ``sensor_stream_from_kafka`` assembles the reader but a
``.load()`` will only succeed where the package is on the classpath —
option assembly is covered by unit tests, end-to-end Kafka by deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference deployment constants (BME680.java:52-60) — defaults only.
DEFAULT_TOPIC = "bme680"  # BME680.java:53
DEFAULT_OUTPUT_TOPIC = "bme680out"  # BME680.java:55


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Kafka source options. maxOffsetsPerTrigger bounds a microbatch —
    the backpressure knob the record-at-a-time reference never needed."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # at-least-once parity with Kafka Streams 2.0 defaults
        # (processing.guarantee unset, BME680.java:212-216)
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def with_string_serdes(raw: DataFrame) -> DataFrame:
    """Kafka's (binary key, binary value) → (string, string): the
    Serdes.String() config (BME680.java:215-216)."""
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )


def sensor_stream_from_kafka(
    spark: SparkSession, bootstrap_servers: str, topic: str = DEFAULT_TOPIC, **kw
) -> DataFrame:
    """KStream<String,String> equivalent: subscribe + string serdes (R1)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(bootstrap_servers, topic, **kw).items():
        reader = reader.option(k, v)
    return with_string_serdes(reader.load())


KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def sensor_stream_from_files(spark: SparkSession, path: str) -> DataFrame:
    """Broker-less stand-in: a directory of JSON-lines files with
    (key, value) string columns — same downstream schema as the Kafka
    source after serdes, so every topology runs unchanged in tests."""
    return spark.readStream.schema(KV_SCHEMA).json(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic keyed stream off the rate source — (key, value) strings
    where value alternates JSON / bare-scalar like the reference's wire
    format (FIXTURES.md §A)."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    temp = 60 + (F.col("value") % 40)  # spans the 75°F threshold
    return raw.select(
        (F.col("value") % 16).cast("string").alias("key"),
        F.when(
            F.col("value") % 3 == 0, temp.cast("string")
        )  # bare scalar branch
        .otherwise(
            F.format_string('{"bme680_tempf": "%d"}', temp)
        )  # JSON branch
        .alias("value"),
    )
