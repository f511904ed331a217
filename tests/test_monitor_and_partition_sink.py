"""R14 listener parity + executor-side MQTT publishing tests."""

from __future__ import annotations

import glob
import json
import os

from kstreams_spark.sources.streams import sensor_stream_from_files
from kstreams_spark.streaming.monitor import StatusMonitor


def test_status_monitor_records_progress(spark, tmp_path):
    d = str(tmp_path / "mon_in")
    os.makedirs(d)
    with open(os.path.join(d, "a.json"), "w") as f:
        for i in range(50):
            f.write(json.dumps({"key": str(i), "value": "80.0"}) + "\n")

    mon = StatusMonitor()
    spark.streams.addListener(mon)
    try:
        q = (
            sensor_stream_from_files(spark, d)
            .writeStream.format("memory")
            .queryName("mon_out")
            .start()
        )
        q.processAllAvailable()
        qid = str(q.id)
        q.stop()
        # listener events are delivered asynchronously
        import time

        deadline = time.time() + 20
        while time.time() < deadline and qid not in mon.terminated:
            time.sleep(0.5)
        assert qid in mon.started
        assert qid in mon.terminated
        assert any(s.num_input_rows == 50 for s in mon.snapshots if s.query_id == qid)
    finally:
        spark.streams.removeListener(mon)


def test_publish_partitions_executor_side(spark, tmp_path, sf_dir):
    # FileSpoolSink lives in kstreams_spark.sinks.spool so executors can
    # unpickle it by import (a test-local class isn't importable there)
    from kstreams_spark.sinks.spool import FileSpoolSink
    from functools import partial

    from kstreams_spark.functions.sensor import temperature_alerts
    from kstreams_spark.io import load_table
    from kstreams_spark.sinks.mqtt import publish_partitions

    spool = str(tmp_path / "spool")
    os.makedirs(spool)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "props"
    ).withColumnRenamed("props", "value")
    alerts = temperature_alerts(ev, value_col="value", json_path="$.k", limit=90.0)
    expected = {r.alert for r in alerts.select("alert").collect()}
    assert expected, "fixture should produce alerts at limit=90"

    publish_partitions(alerts, partial(FileSpoolSink, spool))

    published: set[str] = set()
    for path in glob.glob(os.path.join(spool, "task-*.txt")):
        with open(path) as f:
            published.update(line for line in f.read().splitlines() if line)
    assert published == expected
