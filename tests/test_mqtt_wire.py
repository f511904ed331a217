"""From-spec MQTT 3.1.1 wire client (sinks/mqtt_wire.py): golden frame
bytes pinned against the OASIS spec, remaining-length round-trip, and a
REAL TCP round-trip — MqttAlertSink publishing retained QoS-0 alerts
through sockets to an in-process broker, including the lazy-reconnect
path the reference requires (BME680.java:139-142)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kstreams_spark.sinks.mqtt import ALERT_TOPIC, MqttAlertSink
from kstreams_spark.sinks.mqtt_wire import (
    DISCONNECT_PACKET,
    InProcessBroker,
    connect_packet,
    decode_remaining_length,
    encode_remaining_length,
    parse_connack,
    publish_packet,
    wire_client_factory,
)

# ---------------------------------------------------------------- goldens


def test_golden_connect_packet():
    # 0x10, len, 'MQTT' field, level 4, clean-session 0x02, keepalive 60,
    # client id 'ab' (spec §3.1 example structure, hand-computed)
    expected = bytes(
        [0x10, 0x0E]  # remaining length 14 = 10 var-header + 4 client id
        + [0x00, 0x04] + list(b"MQTT")
        + [0x04, 0x02, 0x00, 0x3C]
        + [0x00, 0x02] + list(b"ab")
    )
    assert connect_packet("ab", keepalive=60) == expected


def test_golden_publish_packet_retained_qos0():
    # 0x31 (PUBLISH + retain), len, topic 'a/b', payload 'hi' (§3.3)
    expected = bytes(
        [0x31, 0x07] + [0x00, 0x03] + list(b"a/b") + list(b"hi")
    )
    assert publish_packet("a/b", b"hi", qos=0, retain=True) == expected
    # retain bit off
    assert publish_packet("a/b", b"hi", qos=0, retain=False)[0] == 0x30


def test_qos_gt_zero_refused():
    with pytest.raises(NotImplementedError):
        publish_packet("t", b"x", qos=1)


def test_golden_disconnect_and_connack():
    assert DISCONNECT_PACKET == b"\xe0\x00"
    assert parse_connack(bytes([0x20, 0x02, 0x00, 0x00])) == (False, 0)
    assert parse_connack(bytes([0x20, 0x02, 0x01, 0x05])) == (True, 5)


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=0, max_value=268_435_455))
def test_remaining_length_roundtrip(n):
    enc = encode_remaining_length(n)
    assert 1 <= len(enc) <= 4
    it = iter(enc)
    assert decode_remaining_length(lambda: next(it)) == n
    # spec examples: 127 -> one byte, 128 -> 0x80 0x01
    assert encode_remaining_length(127) == b"\x7f"
    assert encode_remaining_length(128) == b"\x80\x01"


# ------------------------------------------------------------ live TCP e2e


def test_sink_publishes_retained_qos0_over_real_sockets():
    broker = InProcessBroker()
    try:
        sink = MqttAlertSink(
            broker_url=f"tcp://127.0.0.1:{broker.port}",
            client_factory=wire_client_factory(
                f"tcp://127.0.0.1:{broker.port}"
            ),
        )
        n = sink.publish_all(["Temperature warning 41.20", "x 42.00"])
        sink.close()
        assert n == 2
        import time

        for _ in range(50):  # broker thread drains asynchronously
            with broker._lock:
                if len(broker.published) == 2:
                    break
            time.sleep(0.05)
        assert [p[0] for p in broker.published] == [ALERT_TOPIC] * 2
        assert broker.published[0][1] == b"Temperature warning 41.20"
        assert all(qos == 0 and retain for _, _, qos, retain in broker.published)
        # retained = last write wins per topic
        assert broker.retained[ALERT_TOPIC] == b"x 42.00"
    finally:
        broker.close()


def test_lazy_reconnect_dials_new_connection():
    broker = InProcessBroker()
    try:
        factory = wire_client_factory(f"tcp://127.0.0.1:{broker.port}")
        sink = MqttAlertSink(
            broker_url=f"tcp://127.0.0.1:{broker.port}",
            client_factory=factory,
        )
        sink.publish("one")
        # simulate a dropped connection: client tears down its socket
        sink._client.disconnect()
        sink.publish("two")  # sink sees is_connected()=False -> refactory
        sink.close()
        import time

        for _ in range(50):
            with broker._lock:
                if broker.connects >= 2 and len(broker.published) == 2:
                    break
            time.sleep(0.05)
        assert broker.connects >= 2
        assert [p[1] for p in broker.published] == [b"one", b"two"]
    finally:
        broker.close()


def test_default_factory_falls_back_to_wire_client():
    """With paho absent (this environment), a sink built with NO
    client_factory must deliver through the wire client — the default
    path works, not just the injectable seam."""
    broker = InProcessBroker()
    try:
        sink = MqttAlertSink(broker_url=f"tcp://127.0.0.1:{broker.port}")
        sink.publish("via default factory")
        sink.close()
        import time

        for _ in range(50):
            with broker._lock:
                if broker.published:
                    break
            time.sleep(0.05)
        assert broker.published[0][1] == b"via default factory"
    finally:
        broker.close()
