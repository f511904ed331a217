"""Kafka pass-through sink (SURVEY.md §2.1 R3): forward records unchanged
to an output topic — `source.to(OUTPUT_TOPIC)` (BME680.java:227).

Spark's Kafka sink wants string/binary `key` and `value` columns; the
wrapper validates that shape. At-least-once like the reference (Kafka
Streams 2.0 default); exactly-once needs foreachBatch + transactional
produce, documented in streaming/topology.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def kafka_writer_options(
    bootstrap_servers: str, topic: str, checkpoint_location: str
) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_location,
    }


def validate_kafka_sink_schema(df: DataFrame) -> None:
    cols = dict(df.dtypes)
    for required in ("key", "value"):
        if cols.get(required) not in ("string", "binary"):
            raise ValueError(
                f"kafka sink needs string/binary column {required!r}; "
                f"got {cols.get(required)!r} (columns: {list(cols)})"
            )


def write_passthrough(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    output_mode: str = "append",
):
    """writeStream to Kafka, unchanged records (R3). Returns the started
    query; requires the spark-sql-kafka package on the classpath.
    `output_mode`: "append" for record streams (the default, unchanged),
    "update" when forwarding a KTable changelog (dsl.KStream.to_kafka
    passes the stream's emission contract through)."""
    validate_kafka_sink_schema(df)
    writer = df.writeStream.format("kafka").outputMode(output_mode)
    for k, v in kafka_writer_options(
        bootstrap_servers, topic, checkpoint_location
    ).items():
        writer = writer.option(k, v)
    return writer.start()
