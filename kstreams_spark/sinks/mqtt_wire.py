"""From-spec MQTT 3.1.1 wire client — the real-delivery path for the
alert sink (SURVEY.md §2.1 R11; BME680.java:167-176) in environments
without paho-mqtt.

paho is absent here and there is no network to vendor it, so the subset
of MQTT 3.1.1 the reference actually uses (OASIS spec: CONNECT/CONNACK
handshake, QoS-0 PUBLISH with the retain flag, DISCONNECT) is
implemented directly from the public specification, the same move
functions/avro_binary.py makes for Avro:

- remaining length is the spec's base-128 varint (§2.2.3);
- CONNECT carries protocol name 'MQTT', level 4, clean-session flag,
  keepalive, and the length-prefixed client id (§3.1);
- QoS-0 PUBLISH is fixed header 0x30|retain + length-prefixed topic +
  payload, no packet identifier (§3.3);
- CONNACK is 0x20 0x02 <flags> <return code> (§3.2).

Any MQTT 3.1.1 broker accepts these frames; `tests/test_mqtt_wire.py`
pins the exact bytes against hand-computed spec frames AND runs a real
TCP round-trip against an in-process broker. `wire_client_factory`
plugs into MqttAlertSink's injectable-client seam, so the sink's
QoS-0/retained/lazy-reconnect semantics ride real sockets.

Deliberately NOT implemented (the reference never uses them): QoS 1/2
(would need packet ids + PUBACK/PUBREC state), subscriptions, wills,
auth. publish(qos>0) raises rather than silently downgrading.
"""

from __future__ import annotations

import socket
import threading
from collections.abc import Callable

# ----------------------------------------------------------------- codec


def encode_remaining_length(n: int) -> bytes:
    """Base-128 varint, low group first, continuation bit 0x80 (§2.2.3);
    the spec caps it at 4 groups (268 435 455 bytes)."""
    if not 0 <= n <= 268_435_455:
        raise ValueError(f"remaining length out of range: {n}")
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_remaining_length(read1: Callable[[], int]) -> int:
    """Inverse of the above, reading one byte at a time (max 4)."""
    mult, value = 1, 0
    for _ in range(4):
        b = read1()
        value += (b & 0x7F) * mult
        if not b & 0x80:
            return value
        mult *= 128
    raise ValueError("malformed remaining length (>4 bytes)")


def _utf8_field(s: str) -> bytes:
    raw = s.encode("utf-8")
    if len(raw) > 0xFFFF:
        raise ValueError("MQTT utf-8 field exceeds 65535 bytes")
    return len(raw).to_bytes(2, "big") + raw


def connect_packet(
    client_id: str, keepalive: int = 60, clean_session: bool = True
) -> bytes:
    var = (
        _utf8_field("MQTT")
        + bytes([0x04])  # protocol level 4 = MQTT 3.1.1
        + bytes([0x02 if clean_session else 0x00])
        + keepalive.to_bytes(2, "big")
    )
    payload = _utf8_field(client_id)
    body = var + payload
    return bytes([0x10]) + encode_remaining_length(len(body)) + body


def publish_packet(
    topic: str, payload: bytes, qos: int = 0, retain: bool = True
) -> bytes:
    if qos != 0:
        raise NotImplementedError(
            "QoS 1/2 need packet ids + PUBACK/PUBREC state; the reference "
            "publishes QoS 0 only (BME680.java:65)"
        )
    body = _utf8_field(topic) + payload
    header = 0x30 | (0x01 if retain else 0x00)
    return bytes([header]) + encode_remaining_length(len(body)) + body


DISCONNECT_PACKET = bytes([0xE0, 0x00])


def parse_connack(frame: bytes) -> tuple[bool, int]:
    """→ (session_present, return_code); return code 0 = accepted."""
    if len(frame) != 4 or frame[0] != 0x20 or frame[1] != 0x02:
        raise ValueError(f"not a CONNACK: {frame.hex()}")
    return bool(frame[2] & 0x01), frame[3]


# ---------------------------------------------------------------- client


class MqttWireClient:
    """Minimal QoS-0 publisher speaking the frames above over TCP.
    Interface-compatible with the paho subset MqttAlertSink touches:
    is_connected() / publish(topic, payload, qos=, retain=) /
    disconnect()."""

    def __init__(
        self,
        host: str,
        port: int,
        client_id: str = "kstreams_spark",
        keepalive: int = 60,
        timeout: float = 10.0,  # BME680.java's 10 s connect timeout
    ) -> None:
        self.host, self.port = host, port
        self.client_id = client_id
        self.keepalive = keepalive
        self.timeout = timeout
        self._sock: socket.socket | None = None

    def connect(self) -> None:
        sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout
        )
        try:
            sock.sendall(
                connect_packet(
                    self.client_id, self.keepalive, clean_session=True
                )
            )
            frame = self._recv_exact(sock, 4)
            _, rc = parse_connack(frame)
            if rc != 0:
                raise ConnectionError(f"broker refused connection, rc={rc}")
        except BaseException:
            sock.close()  # no fd leak on CONNACK read/parse failure either
            raise
        self._sock = sock

    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("connection closed mid-frame")
            buf += chunk
        return buf

    def is_connected(self) -> bool:
        return self._sock is not None

    def publish(
        self, topic: str, payload, qos: int = 0, retain: bool = False
    ) -> None:
        if self._sock is None:
            raise ConnectionError("not connected")
        raw = payload.encode("utf-8") if isinstance(payload, str) else bytes(payload)
        try:
            self._sock.sendall(publish_packet(topic, raw, qos, retain))
        except OSError:
            # socket died under us: mark disconnected so the sink's
            # lazy-reconnect path builds a fresh client, then surface it
            self._teardown()
            raise

    def disconnect(self) -> None:
        if self._sock is not None:
            try:
                self._sock.sendall(DISCONNECT_PACKET)
            except OSError:
                pass
            self._teardown()

    def _teardown(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


def wire_client_factory(
    broker_url: str, client_id: str = "kstreams_spark"
) -> Callable[[], MqttWireClient]:
    """client_factory for MqttAlertSink: each call dials a FRESH
    connected client (the lazy-reconnect contract — the sink calls the
    factory whenever is_connected() is false)."""
    host = broker_url.split("://")[-1].rsplit(":", 1)[0]
    port = int(broker_url.rsplit(":", 1)[-1])

    def factory() -> MqttWireClient:
        c = MqttWireClient(host, port, client_id)
        c.connect()
        return c

    return factory


# ------------------------------------------------------- test broker seam


class InProcessBroker:
    """Threaded single-purpose MQTT 3.1.1 broker for tests: accepts
    CONNECT (answers CONNACK rc=0), records every PUBLISH as
    (topic, payload, qos, retain), ignores DISCONNECT. Retained-message
    semantics are modeled as last-write-wins per topic in `retained`."""

    def __init__(self) -> None:
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self.published: list[tuple[str, bytes, int, bool]] = []
        self.retained: dict[str, bytes] = {}
        self.connects = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket) -> None:
        conn.settimeout(5.0)
        try:
            while True:
                head = conn.recv(1)
                if not head:
                    return
                ptype = head[0]

                def _read1() -> int:
                    b = conn.recv(1)
                    if not b:  # peer closed mid-frame: surface as OSError
                        raise ConnectionError("peer closed mid-frame")
                    return b[0]

                length = decode_remaining_length(_read1)
                body = b""
                while len(body) < length:
                    chunk = conn.recv(length - len(body))
                    if not chunk:
                        return
                    body += chunk
                if ptype & 0xF0 == 0x10:  # CONNECT
                    with self._lock:
                        self.connects += 1
                    conn.sendall(bytes([0x20, 0x02, 0x00, 0x00]))
                elif ptype & 0xF0 == 0x30:  # PUBLISH
                    qos = (ptype >> 1) & 0x03
                    retain = bool(ptype & 0x01)
                    tlen = int.from_bytes(body[0:2], "big")
                    topic = body[2 : 2 + tlen].decode("utf-8")
                    payload = body[2 + tlen :]
                    with self._lock:
                        self.published.append((topic, payload, qos, retain))
                        if retain:
                            self.retained[topic] = payload
                elif ptype & 0xF0 == 0xE0:  # DISCONNECT
                    return
        except OSError:
            return
        finally:
            conn.close()

    def close(self) -> None:
        self._stop.set()
        self._srv.close()
        self._thread.join(timeout=2)
