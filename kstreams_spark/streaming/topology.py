"""The reference topology, Spark-first (SURVEY.md §3.1-3.2):

    builder.stream("bme680")            → source DataFrame (key,value strings)
      ├─ .foreach(processValues)        → MQTT alerts on temp > 75     (R2,R11)
      └─ .to("bme680out")               → unchanged pass-through       (R3)

Kafka Streams reads the topic ONCE and fans out to both sinks
(BME680.java:224-227). Two independent writeStream queries would read the
source twice with separate offsets; to preserve single-read semantics this
topology runs ONE foreachBatch that persists the microbatch, publishes
alerts, and forwards records (SURVEY.md §2.1 R3 note, §7.3).

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

log = logging.getLogger(__name__)


class ReferenceTopology:
    """stream → {alert sink, pass-through sink} with single-read fan-out."""

    def __init__(
        self,
        alert_sink: Callable[[list[str]], object],
        forward_sink: Callable[[DataFrame], object],
        temperature_limit: float = TEMPERATURE_LIMIT,
        json_path: str = "$.bme680_tempf",
    ) -> None:
        self.alert_sink = alert_sink
        self.forward_sink = forward_sink
        self.temperature_limit = temperature_limit
        self.json_path = json_path
        self.batches_seen = 0

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body — one read, two sinks (R2+R3).

        The alert branch collects only the (small, filtered) alert strings;
        the pass-through branch hands the full DataFrame to the forward
        sink so it stays distributed (a Kafka forward never touches the
        driver)."""
        self.batches_seen += 1
        batch_df.persist()
        try:
            alerts = (
                temperature_alerts(
                    batch_df.filter(F.col("value").isNotNull()),  # R9 null guard
                    value_col="value",
                    json_path=self.json_path,
                    limit=self.temperature_limit,
                )
                .select("alert")
                .collect()
            )
            if alerts:
                self.alert_sink([r.alert for r in alerts])
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
