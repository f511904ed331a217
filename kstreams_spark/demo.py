"""Broker-less runnable demo of the reference topology:

    python -m kstreams_spark.demo [workdir]

Writes the canonical BME680-style records (JSON / bare-scalar / garbage /
null — BME680.java:103-131's wire mix) to a file stream, runs
ReferenceTopology with the default EXECUTOR-SIDE alert path publishing
over REAL MQTT — the from-spec 3.1.1 wire client dialing an in-process
TCP broker (sinks/mqtt_wire.py) — and a parquet forward sink, drains
the stream, and prints what each sink saw, including the broker's
retained message. The same topology runs against real Kafka + an
external broker by swapping the source for sensor_stream_from_kafka
and the broker URL (see MIGRATION.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from functools import partial

from kstreams_spark.session import get_session
from kstreams_spark.sinks.mqtt import ALERT_TOPIC, MqttAlertSink
from kstreams_spark.sinks.mqtt_wire import InProcessBroker
from kstreams_spark.sources.streams import sensor_stream_from_files
from kstreams_spark.streaming.topology import ReferenceTopology

RECORDS = [
    ("k1", '{"bme680_tempf": "82.74", "uuid": "a"}'),  # JSON, hot → alert
    ("k2", '{"bme680_tempf": "70.10", "uuid": "b"}'),  # JSON, cool
    ("k3", " 88.5 "),  # bare scalar, hot → alert
    ("k4", "60.0"),  # bare scalar, cool
    ("k5", "garbage"),  # unparseable → forwarded, no alert (R7)
    ("k6", None),  # null value (R9 guard)
]


def main(workdir: str | None = None) -> int:
    workdir = workdir or tempfile.mkdtemp(prefix="kstreams_demo_")
    src = os.path.join(workdir, "in")
    fwd = os.path.join(workdir, "out")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "batch-0.json"), "w") as f:
        for k, v in RECORDS:
            f.write(json.dumps({"key": k, "value": v}) + "\n")

    spark = get_session(app_name="kstreams_demo", cores=4)
    broker = InProcessBroker()
    topo = ReferenceTopology(
        alert_sink_factory=partial(
            MqttAlertSink, broker_url=f"tcp://127.0.0.1:{broker.port}"
        ),
        forward_sink=lambda df: df.write.mode("append").parquet(fwd),
    )
    query = topo.start(sensor_stream_from_files(spark, src))
    query.processAllAvailable()
    query.stop()

    import time

    for _ in range(100):  # broker threads drain asynchronously
        with broker._lock:
            if len(broker.published) >= 2:
                break
        time.sleep(0.05)
    alerts = sorted(p[1].decode() for p in broker.published)
    retained = broker.retained.get(ALERT_TOPIC, b"").decode()
    broker.close()
    forwarded = spark.read.parquet(fwd).count()

    print(f"demo workdir: {workdir}")
    print(f"records in : {len(RECORDS)}")
    print(f"forwarded  : {forwarded} (pass-through sink, R3)")
    print(f"alerts     : {alerts} (executor tasks -> real MQTT frames, R2+R11)")
    print(f"retained   : {retained!r} (QoS-0 retained last-write-wins)")
    ok = (
        forwarded == len(RECORDS)
        and alerts
        == ["Temperature warning 82.74", "Temperature warning 88.50"]
        and retained in alerts
    )
    print("DEMO OK" if ok else "DEMO MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else None))
