"""The reference topology, Spark-first (SURVEY.md §3.1-3.2):

    builder.stream("bme680")            → source DataFrame (key,value strings)
      ├─ .foreach(processValues)        → MQTT alerts on temp > 75     (R2,R11)
      └─ .to("bme680out")               → unchanged pass-through       (R3)

Kafka Streams reads the topic ONCE and fans out to both sinks
(BME680.java:224-227). Two independent writeStream queries would read the
source twice with separate offsets; to preserve single-read semantics this
topology runs ONE foreachBatch that persists the microbatch, publishes
alerts, and forwards records (SURVEY.md §2.1 R3 note, §7.3).

Alert delivery is EXECUTOR-SIDE by default: pass ``alert_sink_factory``
(a picklable zero-arg factory, e.g. ``partial(MqttAlertSink, broker_url)``)
and each partition task builds its own client and publishes its own rows
(sinks/mqtt.py:publish_partitions) — the alert stream never funnels
through the driver, so an alert storm from a misbehaving sensor fleet
scales with the executors, not with one process. A driver-side callable
(``alert_sink=...``) is accepted ONLY with an explicit ``small_alerts=True``
acknowledgement, for topologies whose alert volume is known-bounded.

Sinks are injected as callables so tests (and brokers) are pluggable —
the same seam the reference exposes for MQTT (BME680.java:256-259).
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstreams_spark.functions.sensor import (
    TEMPERATURE_LIMIT,
    temperature_alerts,
)
from kstreams_spark.sinks.mqtt import publish_partitions

log = logging.getLogger(__name__)


class ReferenceTopology:
    """stream → {alert sink, pass-through sink} with single-read fan-out."""

    def __init__(
        self,
        forward_sink: Callable[[DataFrame], object],
        alert_sink_factory: Callable[[], object] | None = None,
        alert_sink: Callable[[list[str]], object] | None = None,
        temperature_limit: float = TEMPERATURE_LIMIT,
        json_path: str = "$.bme680_tempf",
        small_alerts: bool = False,
    ) -> None:
        if (alert_sink_factory is None) == (alert_sink is None):
            raise ValueError(
                "pass exactly one of alert_sink_factory (executor-side, "
                "default) or alert_sink (driver-side)"
            )
        if alert_sink is not None and not small_alerts:
            raise ValueError(
                "alert_sink collects every alert onto the driver; that is "
                "a choke point under an alert storm. Pass small_alerts=True "
                "to acknowledge the volume is bounded, or use "
                "alert_sink_factory for executor-side delivery."
            )
        self.alert_sink_factory = alert_sink_factory
        self.alert_sink = alert_sink
        self.forward_sink = forward_sink
        self.temperature_limit = temperature_limit
        self.json_path = json_path
        self.batches_seen = 0

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body — one read, two sinks (R2+R3).

        Default path: the filtered alert rows are published from inside
        each partition task (one client per task, built on the worker) —
        no driver collect anywhere. The opt-in ``small_alerts`` path
        collects the filtered alert strings onto the driver for callables
        that must run there (test harnesses, bounded fleets)."""
        self.batches_seen += 1
        batch_df.persist()
        try:
            alerts_df = temperature_alerts(
                batch_df.filter(F.col("value").isNotNull()),  # R9 null guard
                value_col="value",
                json_path=self.json_path,
                limit=self.temperature_limit,
            )
            if self.alert_sink_factory is not None:
                publish_partitions(alerts_df, self.alert_sink_factory)
            else:
                rows = alerts_df.select("alert").collect()
                if rows:
                    self.alert_sink([r.alert for r in rows])
            self.forward_sink(batch_df)
        finally:
            batch_df.unpersist()

    def start(self, source: DataFrame, trigger_seconds: float | None = None):
        """Assemble & launch (R12): writeStream.foreachBatch(...).start().
        Caller owns awaitTermination/stop (R13: graceful shutdown =
        query.stop(), checkpointed state resumes exactly where it left)."""
        writer = source.writeStream.foreachBatch(self.process_batch)
        if trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
