"""Streaming layer tests — broker-less: file source → memory/foreachBatch
sinks, driven synchronously with processAllAvailable() (the
TopologyTestDriver analog the reference never wrote, SURVEY.md §5.2)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark.sources.streams import sensor_stream_from_files
from kstreams_spark.streaming.topology import ReferenceTopology


def _write_records(path: str, records: list[tuple[str, str]]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        for k, v in records:
            f.write(json.dumps({"key": k, "value": v}) + "\n")


SENSOR_RECORDS = [
    ("k1", '{"bme680_tempf": "82.74", "uuid": "a"}'),  # JSON, hot → alert
    ("k2", '{"bme680_tempf": "70.10", "uuid": "b"}'),  # JSON, cool
    ("k3", " 88.5 "),  # bare scalar, hot → alert
    ("k4", "60.0"),  # bare scalar, cool
    ("k5", "garbage"),  # unparseable → NULL, dropped (R7 semantics)
    ("k6", None),  # null value (R9 guard)
]


def test_reference_topology_two_sinks(spark, tmp_path):
    src_dir = str(tmp_path / "stream_in")
    _write_records(src_dir, SENSOR_RECORDS)

    alerts: list[str] = []
    forwarded: list[tuple[str, str]] = []

    topo = ReferenceTopology(
        alert_sink=alerts.extend,
        small_alerts=True,  # bounded test harness — driver delivery opt-in
        forward_sink=lambda df: forwarded.extend(
            (r.key, r.value) for r in df.select("key", "value").collect()
        ),
    )
    q = topo.start(sensor_stream_from_files(spark, src_dir))
    q.processAllAvailable()
    q.stop()

    # R8+R10: only hot readings alert, with the reference's format string
    assert sorted(alerts) == [
        "Temperature warning 82.74",
        "Temperature warning 88.50",
    ]
    # R3: every record forwarded unchanged (including garbage and nulls)
    assert len(forwarded) == len(SENSOR_RECORDS)
    assert ("k5", "garbage") in forwarded
    assert topo.batches_seen >= 1


def test_reference_topology_executor_side_alerts_default(spark, tmp_path):
    """The DEFAULT alert path publishes from inside partition tasks
    (publish_partitions + per-task client) — no driver collect. Worker
    effects observed through FileSpoolSink's spool files."""
    import glob
    from functools import partial

    from kstreams_spark.sinks.spool import FileSpoolSink

    src_dir = str(tmp_path / "stream_in_exec")
    _write_records(src_dir, SENSOR_RECORDS)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)

    topo = ReferenceTopology(
        alert_sink_factory=partial(FileSpoolSink, spool),
        forward_sink=lambda df: df.count(),
    )
    q = topo.start(sensor_stream_from_files(spark, src_dir))
    q.processAllAvailable()
    q.stop()

    published: list[str] = []
    for path in glob.glob(os.path.join(spool, "task-*.txt")):
        with open(path) as f:
            published.extend(line for line in f.read().splitlines() if line)
    assert sorted(published) == [
        "Temperature warning 82.74",
        "Temperature warning 88.50",
    ]


def test_reference_topology_driver_sink_requires_optin():
    """Driver-side alert delivery is a scale hazard — constructor refuses
    it without the explicit small_alerts acknowledgement, and refuses
    ambiguous zero-or-two sink configurations."""
    with pytest.raises(ValueError, match="small_alerts"):
        ReferenceTopology(alert_sink=lambda xs: None, forward_sink=lambda df: None)
    with pytest.raises(ValueError, match="exactly one"):
        ReferenceTopology(forward_sink=lambda df: None)
    with pytest.raises(ValueError, match="exactly one"):
        ReferenceTopology(
            alert_sink=lambda xs: None,
            alert_sink_factory=lambda: None,
            forward_sink=lambda df: None,
            small_alerts=True,
        )


def test_tumbling_window_stream_matches_batch(spark, tmp_path, sf_dir):
    """The streaming tumbling agg must equal the batch analog on the same
    (fully-replayed) data — one computation, two execution modes."""
    from kstreams_spark.io import load_table
    from kstreams_spark.registry import QUERIES
    from kstreams_spark.streaming.windows import tumbling_agg_stream

    ev = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_parquet")
    ev.write.mode("overwrite").parquet(stream_dir)

    stream = spark.readStream.schema(ev.schema).parquet(stream_dir)
    q = (
        tumbling_agg_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in QUERIES["window_tumbling_agg"](spark, sf_dir).collect()
    }
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Late rows behind the watermark are dropped in append mode."""
    from pyspark.sql import types as T
    from kstreams_spark.streaming.windows import tumbling_agg_stream

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    d1 = str(tmp_path / "b1")
    os.makedirs(d1)
    with open(os.path.join(d1, "a.json"), "w") as f:
        # batch 1: events at 10:05 and 12:00 → watermark ends up at 11:50
        f.write(json.dumps({"ts": "2024-01-01 10:05:00", "event_type": "x", "value": 1.0}) + "\n")
        f.write(json.dumps({"ts": "2024-01-01 12:00:00", "event_type": "x", "value": 1.0}) + "\n")

    stream = spark.readStream.schema(schema).json(d1)
    q = (
        tumbling_agg_stream(stream, window_size="1 hour", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .start()
    )
    q.processAllAvailable()
    # batch 2: a LATE event at 10:20 — behind the 11:50 watermark
    with open(os.path.join(d1, "b.json"), "w") as f:
        f.write(json.dumps({"ts": "2024-01-01 10:20:00", "event_type": "x", "value": 9.0}) + "\n")
    q.processAllAvailable()
    q.stop()

    rows = {
        (str(r.window_start), r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM wm_out").collect()
    }
    # the 10:00 window was finalized with n=1; the late row did NOT reopen it
    assert ("2024-01-01 10:00:00", 1, 1.0) in rows
    assert not any(n == 2 for (_, n, _) in rows)


def test_stateful_edge_alerts(spark, tmp_path):
    """applyInPandasWithState: alerts only on upward crossings, state
    carries across microbatches."""
    from pyspark.sql import types as T
    from kstreams_spark.streaming.stateful import edge_alert_stream

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("reading", T.DoubleType()),
        ]
    )
    d = str(tmp_path / "readings")
    os.makedirs(d)
    rows_b1 = [
        ("k1", "2024-01-01 00:00:00", 70.0),
        ("k1", "2024-01-01 00:01:00", 80.0),  # crossing ↑ → alert
        ("k1", "2024-01-01 00:02:00", 85.0),  # still high → suppressed
        ("k2", "2024-01-01 00:00:30", 90.0),  # first reading high → alert
    ]
    with open(os.path.join(d, "b1.json"), "w") as f:
        for k, ts, v in rows_b1:
            f.write(json.dumps({"key": k, "ts": ts, "reading": v}) + "\n")

    stream = spark.readStream.schema(schema).json(d)
    q = (
        edge_alert_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("edge_out")
        .start()
    )
    q.processAllAvailable()
    # batch 2: k1 still high (suppressed), drops, then crosses again (alert)
    rows_b2 = [
        ("k1", "2024-01-01 00:03:00", 99.0),  # still high (state!) → suppressed
        ("k1", "2024-01-01 00:04:00", 60.0),  # cools
        ("k1", "2024-01-01 00:05:00", 76.0),  # crossing ↑ → alert
    ]
    with open(os.path.join(d, "b2.json"), "w") as f:
        for k, ts, v in rows_b2:
            f.write(json.dumps({"key": k, "ts": ts, "reading": v}) + "\n")
    q.processAllAvailable()
    q.stop()

    alerts = sorted(
        (r.key, r.reading)
        for r in spark.sql("SELECT * FROM edge_out").collect()
    )
    assert alerts == [("k1", 76.0), ("k1", 80.0), ("k2", 90.0)]


def test_streaming_dedup(spark, tmp_path):
    from pyspark.sql import types as T
    from kstreams_spark.streaming.windows import watermarked_dedup_stream

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    d = str(tmp_path / "dups")
    os.makedirs(d)
    with open(os.path.join(d, "a.json"), "w") as f:
        for _ in range(3):  # exact duplicate records
            f.write(json.dumps({"ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "click"}) + "\n")
        f.write(json.dumps({"ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "click"}) + "\n")

    stream = spark.readStream.schema(schema).json(d)
    q = (
        watermarked_dedup_stream(stream, keys=["user_id", "event_type"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n == 2


def test_stateful_timeout_summary(spark, tmp_path):
    """Punctuate parity: per-key summaries emit on EVENT-TIME state
    timeout (the key went quiet past the gap), triggered by the watermark
    advancing via a later batch for a different key."""
    from pyspark.sql import types as T
    from kstreams_spark.streaming.stateful import timeout_summary_stream

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("reading", T.DoubleType()),
        ]
    )
    d = str(tmp_path / "to_readings")
    os.makedirs(d)
    with open(os.path.join(d, "b1.json"), "w") as f:
        for ts, v in [("2024-01-01 00:00:00", 70.0), ("2024-01-01 00:01:00", 90.0)]:
            f.write(json.dumps({"key": "k1", "ts": ts, "reading": v}) + "\n")

    stream = spark.readStream.schema(schema).json(d)
    q = (
        timeout_summary_stream(stream, gap="1 minute", watermark="1 second")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("to_out")
        .start()
    )
    q.processAllAvailable()
    # k1's timeout is armed at 00:02:00 (last event 00:01 + 1 min gap);
    # a much later k2 event pushes the watermark far past it
    with open(os.path.join(d, "b2.json"), "w") as f:
        f.write(json.dumps({"key": "k2", "ts": "2024-01-01 01:00:00", "reading": 50.0}) + "\n")
    q.processAllAvailable()
    # timeouts fire against the batch's updated watermark on the NEXT batch
    with open(os.path.join(d, "b3.json"), "w") as f:
        f.write(json.dumps({"key": "k3", "ts": "2024-01-01 01:01:00", "reading": 10.0}) + "\n")
    q.processAllAvailable()
    q.stop()

    rows = {r.key: (r.n_readings, r.max_reading) for r in spark.sql("SELECT * FROM to_out").collect()}
    assert rows.get("k1") == (2, 90.0), rows


def test_backpressure_max_files_per_trigger(spark, tmp_path):
    """Backpressure: maxFilesPerTrigger bounds each microbatch (the
    file-source analog of Kafka's maxOffsetsPerTrigger) — the topology
    sees multiple small batches instead of one big one."""
    from pyspark.sql import types as T

    d = str(tmp_path / "bp_in")
    os.makedirs(d)
    for i in range(3):
        with open(os.path.join(d, f"f{i}.json"), "w") as f:
            f.write(json.dumps({"key": f"k{i}", "value": "99.0"}) + "\n")

    schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("value", T.StringType())]
    )
    alerts: list[str] = []
    topo = ReferenceTopology(
        alert_sink=alerts.extend, small_alerts=True,
        forward_sink=lambda df: df.count(),
    )
    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(d)
    )
    q = topo.start(source)
    q.processAllAvailable()
    q.stop()
    assert topo.batches_seen >= 3, topo.batches_seen
    assert len(alerts) == 3


def test_duration_ms_parser():
    from kstreams_spark.streaming.stateful import duration_ms

    assert duration_ms(1500) == 1500
    assert duration_ms("1 minute") == 60_000
    assert duration_ms("90 seconds") == 90_000
    assert duration_ms("500 ms") == 500
    assert duration_ms("2 hours") == 7_200_000
    import pytest

    with pytest.raises(ValueError):
        duration_ms("soon")
    with pytest.raises(ValueError):
        duration_ms("5 fortnights")


def test_demo_runs_end_to_end(spark, tmp_path):
    """`python -m kstreams_spark.demo` must stay runnable — it is the
    repo's one-command proof of the reference topology."""
    from kstreams_spark.demo import main

    assert main(str(tmp_path / "demo")) == 0


def test_rate_spike_stream_matches_batch(spark, tmp_path, sf_dir):
    """Streaming rate-spike monitor: feeding the batch query's own
    hourly bucket counts through the stateful stream (split across two
    microbatches on the time axis) reproduces the batch operator's
    flags exactly - the ROWS frame and the state deque are the same
    fold."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kstreams_spark.registry import QUERIES, load_all
    from kstreams_spark.streaming.stateful import rate_spike_stream

    load_all()
    batch = QUERIES["events_rate_spike"](spark, sf_dir).orderBy(
        "event_type", "bucket"
    )
    want = {
        (r.event_type, r.bucket): (r.n, r.n_trail, r.trail_sum, r.is_spike)
        for r in batch.collect()
    }
    buckets = sorted({b for (_, b) in want})
    split_at = buckets[len(buckets) // 2]
    rows = [
        {
            "event_type": et,
            "bucket": b.strftime("%Y-%m-%d %H:%M:%S"),
            "n": want[(et, b)][0],
        }
        for (et, b) in want
    ]
    d = str(tmp_path / "spike_in")
    _os.makedirs(d)
    with open(_os.path.join(d, "b0.json"), "w") as f:
        for r in rows:
            if r["bucket"] <= split_at.strftime("%Y-%m-%d %H:%M:%S"):
                f.write(_json.dumps(r) + "\n")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("bucket", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(d)
    q = (
        rate_spike_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("spike_out")
        .start()
    )
    q.processAllAvailable()
    with open(_os.path.join(d, "b1.json"), "w") as f:
        for r in rows:
            if r["bucket"] > split_at.strftime("%Y-%m-%d %H:%M:%S"):
                f.write(_json.dumps(r) + "\n")
    q.processAllAvailable()
    q.stop()
    got = {
        (r.event_type, r.bucket): (r.n, r.n_trail, r.trail_sum, r.is_spike)
        for r in spark.sql("SELECT * FROM spike_out").collect()
    }
    assert got == want and got


def test_session_stream_matches_batch_sessionize(spark, tmp_path, sf_dir):
    """session_agg_stream (session_window, 30-min gap) must produce the
    SAME sessions as the batch events_sessionize on the same replayed
    data. Input timestamps are truncated to whole seconds first — the
    grid the batch query's unix_timestamp floor computes gaps on — so
    both modes see identical gap arithmetic; the batch >= gap rule is
    session_window's own join rule."""
    from pyspark.sql import functions as F

    from kstreams_spark.io import load_table
    from kstreams_spark.registry import QUERIES
    from kstreams_spark.streaming.windows import session_agg_stream

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", "ts")
    )
    stream_dir = str(tmp_path / "events_sessionize")
    ev.write.mode("overwrite").parquet(stream_dir)

    stream = spark.readStream.schema(ev.schema).parquet(stream_dir)
    q = (
        session_agg_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, int(r.session_start.timestamp()), r.n_events)
        for r in spark.sql("SELECT * FROM session_out").collect()
    }
    want = {
        (r.user_id, r.start_s, r.n_events)
        for r in QUERIES["events_sessionize"](spark, sf_dir).collect()
    }
    assert got == want


def test_tumbling_append_suppresses_until_window_closes(spark, tmp_path):
    """Kafka Streams 2.x suppress(untilWindowCloses) twin (VERDICT r7
    task 5): in append mode a tumbling window emits NOTHING while open —
    even across multiple microbatches of updates — then EXACTLY ONE
    final row once the watermark passes its end, carrying the merged
    aggregate of every update. (Update-mode re-emission is the
    refinement mapping; this pins the final-result alerting shape the
    reference's trucking growth path uses.)"""
    from pyspark.sql import types as T

    from kstreams_spark.streaming.windows import tumbling_agg_stream

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    d = str(tmp_path / "supp")
    os.makedirs(d)

    def feed(name, rows):
        with open(os.path.join(d, name), "w") as f:
            for ts, v in rows:
                f.write(
                    json.dumps(
                        {"ts": ts, "event_type": "x", "value": v}
                    )
                    + "\n"
                )

    feed("b1.json", [("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:40:00", 2.0)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    q = (
        tumbling_agg_stream(stream, window_size="1 hour", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("suppress_out")
        .start()
    )
    q.processAllAvailable()
    # window [10:00, 11:00) is open (watermark 10:30) → suppressed
    assert spark.sql("SELECT * FROM suppress_out").count() == 0

    # a second microbatch UPDATES the same open window; watermark moves
    # to 10:40 — still inside, still suppressed
    feed("b2.json", [("2024-01-01 10:50:00", 4.0)])
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM suppress_out").count() == 0

    # watermark passes 11:00 → exactly one FINAL row, all three updates
    feed("b3.json", [("2024-01-01 12:00:00", 8.0)])
    q.processAllAvailable()
    q.stop()
    got = [
        (str(r.window_start), r.event_type, r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM suppress_out").collect()
    ]
    assert got == [("2024-01-01 10:00:00", "x", 3, 7.0)]


def test_session_window_append_emits_only_closed_sessions(spark, tmp_path):
    """Production session-window mode: APPEND + watermark — a session
    emits exactly once, only after the watermark passes its end; the
    still-open session is withheld. (The parity test above uses complete
    mode; this pins the late-data/finalization semantics, Kafka Streams'
    suppress-until-window-close.)"""
    import glob
    import os
    import shutil
    from datetime import datetime

    from pyspark.sql import functions as F

    from kstreams_spark.streaming.windows import session_agg_stream

    rows1 = [
        (1, datetime(2024, 1, 1, 10, 0, 0)),
        (1, datetime(2024, 1, 1, 10, 10, 0)),
    ]
    rows2 = [(1, datetime(2024, 1, 1, 13, 0, 0))]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for name, rows in (("a", rows1), ("b", rows2)):
        staging = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.parquet(staging)
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        shutil.move(part, f"{src}/{name}.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        session_agg_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("session_append_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = [
        (r.user_id, r.session_start, r.n_events)
        for r in spark.sql("SELECT * FROM session_append_out").collect()
    ]
    # the 10:00 session closed (watermark reached 12:50 > 10:40); the
    # 13:00 session is still open and must NOT appear
    assert got == [(1, datetime(2024, 1, 1, 10, 0, 0), 2)]


def test_session_features_stream_matches_batch(spark, tmp_path, sf_dir):
    """Streaming per-session features == the batch feature table on
    second-truncated events (the grid both sides compute on): same
    sessions, same one-hot counts, same converted label."""
    import glob
    import shutil

    from kstreams_spark.io import load_table
    from kstreams_spark.registry import QUERIES
    from kstreams_spark.streaming.windows import session_features_stream

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id",
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts"),
        "event_type",
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    staging = str(tmp_path / "stage")
    ev.coalesce(1).write.parquet(staging)
    (part,) = glob.glob(f"{staging}/part-*.parquet")
    shutil.move(part, f"{src}/a.parquet")

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        session_features_stream(stream, gap="30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_feat_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, int(r.session_start.timestamp())): (
            r.n_events,
            r.n_view,
            r.n_click,
            r.n_purchase,
            r.n_error,
            r.n_signup,
            r.converted,
        )
        for r in spark.sql("SELECT * FROM sess_feat_out").collect()
    }
    want = {
        (r.user_id, r.start_s): (
            r.n_events,
            r.n_view,
            r.n_click,
            r.n_purchase,
            r.n_error,
            r.n_signup,
            r.converted,
        )
        for r in QUERIES["events_session_features"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == want
