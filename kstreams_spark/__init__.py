"""kstreams_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the `tspannhw/kstreams` reference
(a Kafka Streams sensor-alert topology, /root/reference/src/main/java/com/
dataflowdeveloper/kstream/BME680.java), re-expressed Spark-first.

Layers (see SURVEY.md):
- functions/   scalar & sensor-parsing expressions (R4-R10)
- operators/   relational + LLM-pipeline batch operators, each registered
               as a (queries, oracle_sql) pair for the DuckDB oracle gate
- sources/     batch/streaming source wrappers (parquet, kafka, rate, file)
- sinks/       kafka pass-through + MQTT alert sink (R3, R11)
- streaming/   structured-streaming topologies, windows, stateful ops
- plans/       plan inspection / explain helpers for scale tuning
"""

from kstreams_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
