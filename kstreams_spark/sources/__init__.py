from kstreams_spark.sources.streams import (
    kafka_reader_options,
    rate_stream,
    sensor_stream_from_files,
    sensor_stream_from_kafka,
)

__all__ = [
    "kafka_reader_options",
    "rate_stream",
    "sensor_stream_from_files",
    "sensor_stream_from_kafka",
]
