from kstreams_spark.sinks.mqtt import MqttAlertSink
from kstreams_spark.sinks.kafka import kafka_writer_options

__all__ = ["MqttAlertSink", "kafka_writer_options"]
