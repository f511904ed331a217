"""DSL stateful verbs + first-class sinks (r12 — VERDICT r11 tasks 4
and 6): transform_values (Processor API), suppress(untilWindowCloses),
to_parquet_exactly_once, to_kafka — each facade chain parity-pinned
against the direct engine pipeline, plus the crash-between-write-and-
commit replay through the facade."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kstreams_spark.dsl import KStream, StreamsBuilder

READING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("reading", T.DoubleType()),
    ]
)


def _feed(d: str, name: str, rows) -> None:
    with open(os.path.join(d, name), "w") as f:
        for key, ts, reading in rows:
            f.write(
                json.dumps({"key": key, "ts": ts, "reading": reading}) + "\n"
            )


B1 = [
    ("k1", "2024-01-01 00:00:00", 70.0),
    ("k1", "2024-01-01 00:01:00", 80.0),  # rising edge → alert
    ("k1", "2024-01-01 00:02:00", 85.0),  # still high → suppressed
    ("k2", "2024-01-01 00:00:30", 90.0),  # rising edge → alert
]
B2 = [
    ("k1", "2024-01-01 00:03:00", 99.0),  # still high (cross-batch state)
    ("k1", "2024-01-01 00:04:00", 60.0),  # drops
    ("k1", "2024-01-01 00:05:00", 76.0),  # crosses again → alert
]


def _run_edge_alerts(spark, d: str, qname: str, via_dsl: bool):
    from kstreams_spark.streaming.stateful import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        edge_alert_stream,
        make_edge_alert_fn,
    )

    stream = (
        spark.readStream.schema(READING_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    if via_dsl:
        out = (
            StreamsBuilder()
            .stream(stream, "key")
            .transform_values(
                make_edge_alert_fn(75.0), OUTPUT_SCHEMA, STATE_SCHEMA
            )
            .df
        )
    else:
        out = edge_alert_stream(stream, limit=75.0)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return sorted(
        (r.key, r.reading, r.alert)
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    )


def test_transform_values_equals_engine_twin(spark, tmp_path):
    """The facade's Processor API verb is the engine pipeline verbatim:
    same alerts, same cross-batch state carry."""
    d = str(tmp_path / "src")
    os.makedirs(d)
    _feed(d, "b1.json", B1)
    _feed(d, "b2.json", B2)

    got = _run_edge_alerts(spark, d, "dsl_edge", via_dsl=True)
    want = _run_edge_alerts(spark, d, "eng_edge", via_dsl=False)
    assert got == want
    assert [(k, r) for k, r, _ in got] == [
        ("k1", 76.0),
        ("k1", 80.0),
        ("k2", 90.0),
    ]


def test_transform_values_guards(spark, sf_dir):
    from kstreams_spark.io import load_table
    from kstreams_spark.streaming.stateful import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        make_edge_alert_fn,
    )

    batch = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="streaming verb"):
        KStream(batch, "doc_id").transform_values(
            make_edge_alert_fn(), OUTPUT_SCHEMA, STATE_SCHEMA
        )
    stream = batch.sparkSession.readStream.schema(
        READING_SCHEMA
    ).json(str(sf_dir))  # never started; shape check only
    with pytest.raises(ValueError, match="key column"):
        KStream(stream, "ts").transform_values(
            make_edge_alert_fn(), OUTPUT_SCHEMA, STATE_SCHEMA
        )


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _feed_events(d: str, name: str, rows) -> None:
    with open(os.path.join(d, name), "w") as f:
        for ts, v in rows:
            f.write(
                json.dumps({"ts": ts, "event_type": "x", "value": v}) + "\n"
            )


def _windowed_table(spark, d: str):
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    return (
        StreamsBuilder()
        .stream(stream.withWatermark("ts", "10 minutes"), "event_type")
        .group_by_key()
        .windowed_by("ts", "1 hour")
        .aggregate(
            n=F.count(F.lit(1)),
            sum_value=F.sum("value"),
        )
    )


def test_suppress_until_window_closes_via_dsl(spark, tmp_path):
    """The DSL suppress topology reproduces the engine twin
    (test_streaming.py::test_tumbling_append_suppresses_until_window_
    closes): nothing while the window is open across multiple update
    batches, exactly one merged final row once the watermark passes."""
    d = str(tmp_path / "supp")
    os.makedirs(d)
    _feed_events(
        d, "b1.json", [("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:40:00", 2.0)]
    )

    table = _windowed_table(spark, d).suppress()
    ks = table.to_stream()
    assert ks.output_mode == "append"  # the suppressed (final) contract
    q = ks.to(
        lambda df: df.writeStream.outputMode(ks.output_mode)
        .format("memory")
        .queryName("dsl_suppress")
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM dsl_suppress").count() == 0  # open

    _feed_events(d, "b2.json", [("2024-01-01 10:50:00", 4.0)])
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM dsl_suppress").count() == 0  # still open

    _feed_events(d, "b3.json", [("2024-01-01 12:00:00", 8.0)])
    q.processAllAvailable()
    q.stop()
    got = [
        (str(r.window.start), r.event_type, r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM dsl_suppress").collect()
    ]
    assert got == [("2024-01-01 10:00:00", "x", 3, 7.0)]


def test_unsuppressed_streaming_ktable_is_update_changelog(spark, tmp_path):
    """Without suppress, to_stream() carries the refining-changelog
    contract — the same open window emits its refinements."""
    d = str(tmp_path / "upd")
    os.makedirs(d)
    _feed_events(d, "b1.json", [("2024-01-01 10:05:00", 1.0)])
    ks = _windowed_table(spark, d).to_stream()
    assert ks.output_mode == "update"
    q = ks.to(
        lambda df: df.writeStream.outputMode(ks.output_mode)
        .format("memory")
        .queryName("dsl_update")
        .start()
    )
    q.processAllAvailable()
    n1 = spark.sql("SELECT * FROM dsl_update").count()
    assert n1 >= 1  # the open window already emitted a refinement
    q.stop()


def test_suppress_guards(spark, sf_dir, tmp_path):
    from kstreams_spark.io import load_table

    batch = load_table(spark, sf_dir, "documents")
    t = (
        StreamsBuilder()
        .stream(batch, "doc_id")
        .group_by_key()
        .count()
    )
    with pytest.raises(ValueError, match="windowed table"):
        t.suppress()
    d = str(tmp_path / "g")
    os.makedirs(d)
    batch_windowed = (
        StreamsBuilder()
        .stream(
            batch.withColumn("ts", F.current_timestamp()), "doc_id"
        )
        .group_by_key()
        .windowed_by("ts", "1 hour")
        .count()
    )
    with pytest.raises(ValueError, match="streaming emission"):
        batch_windowed.suppress()


def test_to_parquet_exactly_once_crash_replay_via_facade(
    spark, tmp_path, monkeypatch
):
    """VERDICT r11 task 6 done-criterion: the reference topology's
    sink shape through DSL verbs with crash-replay semantics — the
    first attempt dies AFTER the batch's parquet hit staging but BEFORE
    the commit rename; the restarted facade chain replays the same
    epoch and commits exactly once (no duplicates, no losses)."""
    from pyspark.errors import StreamingQueryException

    from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

    d = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    os.makedirs(out)
    _feed(d, "b1.json", B1)

    real = ExactlyOnceParquetSink.process_batch
    state = {"crashed": False}

    def crash_once(self, batch_df, epoch_id):
        if not state["crashed"]:
            batch_df.write.mode("overwrite").parquet(
                self._staging_dir(epoch_id)
            )
            state["crashed"] = True
            raise RuntimeError("injected crash between write and commit")
        return real(self, batch_df, epoch_id)

    monkeypatch.setattr(ExactlyOnceParquetSink, "process_batch", crash_once)

    def chain():
        stream = spark.readStream.schema(READING_SCHEMA).json(d)
        return (
            StreamsBuilder()
            .stream(stream, "key")
            .filter(F.col("reading").isNotNull())
            .to_parquet_exactly_once(out, ckpt)
        )

    q = chain()
    with pytest.raises(StreamingQueryException):
        q.processAllAvailable()
    q.stop()
    assert state["crashed"]
    # staging on disk, nothing committed — the at-least-once hazard
    assert not any(n.startswith("epoch=") for n in os.listdir(out))

    # restart the SAME facade chain: the replayed epoch commits once
    q2 = chain()
    q2.processAllAvailable()
    _feed(d, "b2.json", B2)
    q2.processAllAvailable()
    q2.stop()

    got = ExactlyOnceParquetSink(out).result(spark)
    assert got.count() == len(B1) + len(B2)  # no duplicates, no losses
    keys = sorted(
        (r.key, r.reading) for r in got.select("key", "reading").collect()
    )
    assert keys == sorted((k, v) for k, _, v in B1 + B2)


def test_to_kafka_validates_schema_before_start(spark, tmp_path):
    d = str(tmp_path / "src")
    os.makedirs(d)
    _feed(d, "b1.json", B1)
    stream = spark.readStream.schema(READING_SCHEMA).json(d)
    with pytest.raises(ValueError, match="kafka sink needs"):
        KStream(stream, "key").to_kafka("localhost:9092", "t", str(tmp_path / "c"))


def test_wallclock_punctuate_emits_on_idle_key(spark, tmp_path):
    """VERDICT r12 task 6: WALL_CLOCK_TIME punctuate — an idle key's
    summary emits on processing-time expiry, reached through the facade
    as transform_values(..., timeout="processing"). Processing-time
    timeouts keep the engine scheduling batches (shouldRunAnotherBatch
    stays true), so processAllAvailable never quiesces — the documented
    contract in make_wallclock_summary_fn; the test therefore POLLS the
    sink instead."""
    import time as _time

    from kstreams_spark.streaming.stateful import (
        COUNT_STATE_SCHEMA,
        SUMMARY_SCHEMA,
        make_wallclock_summary_fn,
    )

    d = str(tmp_path / "wc_src")
    os.makedirs(d)
    _feed(d, "b1.json", [
        ("k1", "2024-01-01 00:00:00", 70.0),
        ("k1", "2024-01-01 00:01:00", 90.0),
    ])
    stream = spark.readStream.schema(READING_SCHEMA).json(d)
    out = (
        StreamsBuilder()
        .stream(stream, "key")
        .transform_values(
            make_wallclock_summary_fn(1_000),
            SUMMARY_SCHEMA,
            COUNT_STATE_SCHEMA,
            timeout="processing",
        )
        .df
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wc_out")
        .start()
    )
    try:
        # no new data arrives; the wall clock alone must flush k1
        deadline = _time.time() + 60
        rows = {}
        while _time.time() < deadline and "k1" not in rows:
            _time.sleep(0.5)
            rows = {
                r.key: (r.n_readings, r.max_reading)
                for r in spark.sql("SELECT * FROM wc_out").collect()
            }
        assert rows.get("k1") == (2, 90.0), rows
    finally:
        q.stop()


def test_sliding_band_stream_matches_batch_twin(spark, tmp_path):
    """r15 KS 2.7 streaming twin: the stateful sliding-band processor
    fed across MULTIPLE microbatches equals the batch
    sliding_aggregate on the union — peers at equal timestamps
    included — and a within-band late arrival still computes its exact
    band (complete=1)."""
    from kstreams_spark.streaming.stateful import sliding_band_stream

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    d = str(tmp_path / "slide_src")
    os.makedirs(d)

    def feed(name, rows):
        with open(os.path.join(d, name), "w") as f:
            for k, ts, v in rows:
                f.write(json.dumps({"k": k, "ts": ts, "v": v}) + "\n")

    b1 = [
        (1, "2024-01-01 10:00:00", 10),
        (1, "2024-01-01 10:04:00", 20),
        (1, "2024-01-01 10:04:00", 30),  # peer tie
        (2, "2024-01-01 10:00:00", 7),
    ]
    feed("b1.json", b1)
    stream = spark.readStream.schema(schema).json(d)
    q = (
        sliding_band_stream(stream, "k", "ts", "v", band_s=300)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("slide_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: k1 advances; one within-band LATE row for k1
        b2 = [
            (1, "2024-01-01 10:06:00", 40),
            (1, "2024-01-01 10:05:00", 50),  # late but within band
            (2, "2024-01-01 10:20:00", 9),
        ]
        feed("b2.json", b2)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.key, str(r.ts), r.value): (r.n_band, r.sum_band, r.complete)
        for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    # batch twin over the union
    from kstreams_spark.dsl import StreamsBuilder as SB

    allrows = b1 + [
        (1, "2024-01-01 10:06:00", 40),
        (1, "2024-01-01 10:05:00", 50),
        (2, "2024-01-01 10:20:00", 9),
    ]
    bdf = spark.createDataFrame(
        allrows, "k long, ts string, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    twin = (
        SB()
        .stream(bdf, key="k")
        .group_by_key()
        .sliding_aggregate("ts", "5 minutes", n="COUNT(*)", s="SUM(v)")
    )
    want = {
        (r.k, str(r.ts), r.v): (r.n, r.s) for r in twin.df.collect()
    }
    assert set(got) == set(want)
    for key, (n, s, complete) in got.items():
        if key == (1, "2024-01-01 10:05:00", 50):
            # processed AFTER 10:06 arrived in its batch, but its band
            # start is above the eviction floor: exact AND the batch
            # twin's numbers (late row's band excludes the 10:06 row —
            # the RANGE frame never looks forward)
            assert complete == 1
        assert (n, s) == want[key], (key, (n, s), want[key])
    # the 10:06 row's band saw the late 10:05 row? No — it was emitted
    # BEFORE the late row was processed in-batch order... both are in
    # one batch, sorted: 10:05 processes first. Cross-check explicitly:
    assert got[(1, "2024-01-01 10:06:00", 40)][0:2] == want[
        (1, "2024-01-01 10:06:00", 40)
    ]
