"""MQTT alert sink (SURVEY.md §2.1 R11) — the one connector Spark lacks.

Reproduces the reference's delivery semantics (BME680.java:167-176,269-286):
- QoS 0 (fire-and-forget) with retained=true → last-write-wins on the
  broker, which makes redelivery after a microbatch retry idempotent;
- lazy (re)connect before publish (BME680.java:139-142);
- auto-reconnect / clean-session / 10 s timeout connect options;
- injectable client for tests — the reference exposes the same seam via
  its `BME680(IMqttClient publisher)` constructor (BME680.java:256-259).

Deployment shape: used from ``foreachBatch`` — ONE client per batch
function invocation (i.e., per executor-side partition task when used via
foreachPartition, or driver-side in small topologies), never per record.
The default client is paho-mqtt when installed; otherwise the from-spec
MQTT 3.1.1 wire client (sinks/mqtt_wire.py — QoS-0 subset over raw
sockets, golden-frame + live-TCP tested), so the sink delivers for real
in either environment.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterable

log = logging.getLogger(__name__)

ALERT_TOPIC = "bme680warning"  # BME680.java:54
QOS_AT_MOST_ONCE = 0  # BME680.java:65


class MqttAlertSink:
    """Publishes alert strings to an MQTT topic, QoS 0, retained."""

    def __init__(
        self,
        broker_url: str = "tcp://localhost:1883",
        topic: str = ALERT_TOPIC,
        client_factory: Callable[[], object] | None = None,
        qos: int = QOS_AT_MOST_ONCE,
        retained: bool = True,
    ) -> None:
        self.broker_url = broker_url
        self.topic = topic
        self.qos = qos
        self.retained = retained
        self._factory = client_factory or self._paho_factory
        self._client: object | None = None

    def _paho_factory(self):
        try:
            import paho.mqtt.client as mqtt  # pragma: no cover - absent here
        except ImportError:
            # fall back to the from-spec wire client (mqtt_wire.py): the
            # QoS-0 subset the reference uses, over raw sockets
            from kstreams_spark.sinks.mqtt_wire import wire_client_factory

            return wire_client_factory(self.broker_url)()
        host = self.broker_url.split("://")[-1].split(":")[0]
        port = int(self.broker_url.rsplit(":", 1)[-1])
        client = mqtt.Client(clean_session=True)  # pragma: no cover
        client.reconnect_delay_set(min_delay=1, max_delay=10)
        client.connect(host, port, keepalive=60)
        return client

    def _ensure_connected(self) -> object:
        """Lazy (re)connect-on-use — BME680.java:139-142."""
        if self._client is None or not self._is_connected(self._client):
            self._client = self._factory()
        return self._client

    @staticmethod
    def _is_connected(client: object) -> bool:
        probe = getattr(client, "is_connected", None)
        return bool(probe()) if callable(probe) else True

    def publish(self, payload: str) -> None:
        client = self._ensure_connected()
        client.publish(self.topic, payload, qos=self.qos, retain=self.retained)

    def publish_all(self, payloads: Iterable[str]) -> int:
        n = 0
        for p in payloads:
            self.publish(p)
            n += 1
        if n:
            log.debug("published %d alerts to %s", n, self.topic)
        return n

    def close(self) -> None:
        if self._client is not None:
            disconnect = getattr(self._client, "disconnect", None)
            if callable(disconnect):
                disconnect()
            self._client = None


def publish_partitions(df, sink_factory, alert_col: str = "alert") -> None:
    """Executor-side publishing: one MQTT client per PARTITION TASK, built
    inside the worker (never serialized from the driver). Use from a
    foreachBatch body when the alert volume is too large to collect:

        def on_batch(batch_df, epoch_id):
            alerts = temperature_alerts(batch_df)
            publish_partitions(alerts, lambda: MqttAlertSink(broker_url=...))

    sink_factory must be picklable (a top-level function / functools
    partial, not a closure over live clients). QoS-0 retained delivery
    keeps per-partition retries idempotent."""

    def per_partition(rows) -> None:
        sink = sink_factory()
        try:
            sink.publish_all(r[alert_col] for r in rows)
        finally:
            sink.close()

    df.foreachPartition(per_partition)
