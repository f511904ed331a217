"""MQTT alert sink tests with an injected mock client — porting the
reference's test seam `BME680(IMqttClient publisher)` (BME680.java:256-259)."""

from __future__ import annotations

import pytest

from kstreams_spark.sinks.mqtt import MqttAlertSink


class MockClient:
    def __init__(self, fail_connected_after: int | None = None):
        self.published: list[tuple[str, str, int, bool]] = []
        self.connected = True
        self.disconnected = False

    def is_connected(self) -> bool:
        return self.connected

    def publish(self, topic, payload, qos=0, retain=False):
        self.published.append((topic, payload, qos, retain))

    def disconnect(self):
        self.disconnected = True


def test_publish_qos0_retained():
    client = MockClient()
    sink = MqttAlertSink(client_factory=lambda: client)
    sink.publish("Temperature warning 82.74")
    # QoS 0, retained=true — BME680.java:65,169-170
    assert client.published == [
        ("bme680warning", "Temperature warning 82.74", 0, True)
    ]


def test_lazy_reconnect_on_disconnect():
    """The reference re-inits MQTT when the client dropped
    (BME680.java:139-142); the sink must build a fresh client."""
    clients: list[MockClient] = []

    def factory():
        c = MockClient()
        clients.append(c)
        return c

    sink = MqttAlertSink(client_factory=factory)
    sink.publish("a")
    clients[0].connected = False  # simulate broker drop
    sink.publish("b")
    assert len(clients) == 2
    assert clients[1].published[0][1] == "b"


def test_publish_all_counts():
    client = MockClient()
    sink = MqttAlertSink(client_factory=lambda: client)
    assert sink.publish_all(["x", "y", "z"]) == 3
    assert len(client.published) == 3


def test_close_disconnects():
    client = MockClient()
    sink = MqttAlertSink(client_factory=lambda: client)
    sink.publish("x")
    sink.close()
    assert client.disconnected


def test_missing_paho_falls_back_to_wire_client():
    """paho is absent in this container: the default factory now falls
    back to the from-spec wire client (sinks/mqtt_wire.py) instead of
    raising ImportError — with no broker listening, the failure surfaces
    as the socket's connection error, proving a real dial was attempted
    (the delivery round-trip itself is tested in test_mqtt_wire.py)."""
    sink = MqttAlertSink(broker_url="tcp://127.0.0.1:1")  # nothing listens
    with pytest.raises(OSError):
        sink.publish("x")
