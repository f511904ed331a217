"""Stream-stream interval join + rate source tests (SURVEY.md §2.2
stream⋈stream; §2.1 R1 synthetic-load source)."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from kstreams_spark.streaming.joins import interval_join_stream


def _write(d: str, rows: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_interval_join_matches_within_window(spark, tmp_path):
    err_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("l_ts", T.TimestampType()),
            T.StructField("error_id", T.LongType()),
        ]
    )
    click_schema = T.StructType(
        [
            T.StructField("r_user_id", T.LongType()),
            T.StructField("r_ts", T.TimestampType()),
            T.StructField("click_id", T.LongType()),
        ]
    )
    d1, d2 = str(tmp_path / "errors"), str(tmp_path / "clicks")
    _write(
        d1,
        [
            {"user_id": 1, "l_ts": "2024-01-01 10:30:00", "error_id": 100},
            {"user_id": 2, "l_ts": "2024-01-01 10:30:00", "error_id": 200},
        ],
    )
    _write(
        d2,
        [
            # in window (10:20-10:30 for user 1)
            {"r_user_id": 1, "r_ts": "2024-01-01 10:25:00", "click_id": 11},
            {"r_user_id": 1, "r_ts": "2024-01-01 10:29:00", "click_id": 12},
            # out of window (too early)
            {"r_user_id": 1, "r_ts": "2024-01-01 10:05:00", "click_id": 13},
            # after the error (not "before" semantics)
            {"r_user_id": 1, "r_ts": "2024-01-01 10:31:00", "click_id": 14},
            # wrong user
            {"r_user_id": 3, "r_ts": "2024-01-01 10:29:00", "click_id": 15},
        ],
    )
    errors = spark.readStream.schema(err_schema).json(d1)
    clicks = spark.readStream.schema(click_schema).json(d2)
    # r15: the DEFAULT is JoinWindows.of(d)'s symmetric ±window — the
    # 10:31 click (1 min AFTER the error) now matches too
    joined = interval_join_stream(errors, clicks, window="10 minutes")
    q = (
        joined.select("error_id", "click_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sj_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.error_id, r.click_id) for r in spark.sql("SELECT * FROM sj_out").collect()
    }
    assert got == {(100, 11), (100, 12), (100, 14)}
    # the old trailing form is JoinWindows.of(d).after(0)
    errors2 = spark.readStream.schema(err_schema).json(d1)
    clicks2 = spark.readStream.schema(click_schema).json(d2)
    trailing = interval_join_stream(
        errors2, clicks2, window="10 minutes", after="0 seconds"
    )
    q2 = (
        trailing.select("error_id", "click_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sj_trail")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got2 = {
        (r.error_id, r.click_id)
        for r in spark.sql("SELECT * FROM sj_trail").collect()
    }
    assert got2 == {(100, 11), (100, 12)}


def test_interval_join_geometry_matches_batch_twin(spark, tmp_path):
    """JoinWindows geometry parity (r15, VERDICT r14 task 3): the
    symmetric default, `.before()`, and `.after()` forms each produce
    exactly the pairs a BATCH range join with the same band produces,
    over a lattice of event-time offsets that exercises every boundary
    (−11..+11 min around the left event, inclusive edges)."""
    from pyspark.sql import functions as F

    err_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("l_ts", T.TimestampType()),
            T.StructField("error_id", T.LongType()),
        ]
    )
    click_schema = T.StructType(
        [
            T.StructField("r_user_id", T.LongType()),
            T.StructField("r_ts", T.TimestampType()),
            T.StructField("click_id", T.LongType()),
        ]
    )
    left_rows = [
        {"user_id": 1, "l_ts": "2024-01-01 10:30:00", "error_id": 100}
    ]
    right_rows = [
        {
            "r_user_id": 1,
            "r_ts": f"2024-01-01 {10 + (30 + off) // 60}:"
            f"{(30 + off) % 60:02d}:00",
            "click_id": 1000 + off,
        }
        for off in (-11, -10, -9, -5, -1, 0, 1, 5, 9, 10, 11)
    ]
    d1, d2 = str(tmp_path / "g_err"), str(tmp_path / "g_clk")
    _write(d1, left_rows)
    _write(d2, right_rows)
    batch_l = spark.read.schema(err_schema).json(d1)
    batch_r = spark.read.schema(click_schema).json(d2)

    cases = [
        ("sym", {}, "10 minutes", "10 minutes"),
        ("before", {"before": "5 minutes"}, "5 minutes", "10 minutes"),
        ("after", {"after": "2 minutes"}, "10 minutes", "2 minutes"),
    ]
    for name, kw, b, a in cases:
        expected = {
            (r.error_id, r.click_id)
            for r in batch_l.join(
                batch_r,
                (batch_l.user_id == batch_r.r_user_id)
                & (
                    batch_r.r_ts
                    >= batch_l.l_ts - F.expr(f"INTERVAL {b}")
                )
                & (
                    batch_r.r_ts
                    <= batch_l.l_ts + F.expr(f"INTERVAL {a}")
                ),
            ).collect()
        }
        errors = spark.readStream.schema(err_schema).json(d1)
        clicks = spark.readStream.schema(click_schema).json(d2)
        joined = interval_join_stream(
            errors, clicks, window="10 minutes", **kw
        )
        q = (
            joined.select("error_id", "click_id")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"sjg_{name}")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            (r.error_id, r.click_id)
            for r in spark.sql(f"SELECT * FROM sjg_{name}").collect()
        }
        assert got == expected, (name, got, expected)
        # boundary sanity: the band edges are inclusive, one past drops
        offs = sorted(c - 1000 for _, c in got)
        lo = -int(b.split()[0])
        hi = int(a.split()[0])
        assert offs == [o for o in (-11, -10, -9, -5, -1, 0, 1, 5, 9, 10, 11) if lo <= o <= hi]


def test_rate_stream_produces_dual_format(spark):
    """The synthetic rate source emits the reference's wire format
    (JSON / bare-scalar mix) — run one micro-batch and check both shapes
    flow through the alert pipeline."""
    from kstreams_spark.functions.sensor import temperature_alerts
    from kstreams_spark.sources.streams import rate_stream

    src = rate_stream(spark, rows_per_second=500)
    alerts = temperature_alerts(src, value_col="value")
    q = (
        alerts.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_out")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM rate_out").collect()[0].n
            if n > 0:
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM rate_out LIMIT 50").collect()
        assert rows, "rate stream produced no alerts in 30s"
        assert all(r.alert.startswith("Temperature warning ") for r in rows)
        assert all(r.reading > 75.0 for r in rows)
    finally:
        q.stop()


def test_interval_left_join_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: an unmatched left row is held in
    state until the watermark proves no match can arrive, then emitted
    with nulls — Kafka Streams' leftJoin grace-period semantics."""
    err_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("l_ts", T.TimestampType()),
            T.StructField("error_id", T.LongType()),
        ]
    )
    click_schema = T.StructType(
        [
            T.StructField("r_user_id", T.LongType()),
            T.StructField("r_ts", T.TimestampType()),
            T.StructField("click_id", T.LongType()),
        ]
    )
    d1, d2 = str(tmp_path / "l_errors"), str(tmp_path / "l_clicks")
    _write(d1, [{"user_id": 1, "l_ts": "2024-01-01 10:00:00", "error_id": 100}])
    _write(d2, [{"r_user_id": 2, "r_ts": "2024-01-01 10:00:00", "click_id": 10}])

    errors = spark.readStream.schema(err_schema).json(d1)
    clicks = spark.readStream.schema(click_schema).json(d2)
    joined = interval_join_stream(
        errors, clicks, window="10 minutes", watermark="5 minutes",
        join_type="left_outer",
    )
    q = (
        joined.select("error_id", "click_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lsj_out")
        .start()
    )
    q.processAllAvailable()
    # nothing can be emitted yet: the 10:00 error might still match
    assert spark.sql("SELECT count(*) n FROM lsj_out").collect()[0].n == 0

    # advance BOTH watermarks far past 10:00 + window + delay
    import os as _os, json as _json
    with open(_os.path.join(d1, "b2.json"), "w") as f:
        f.write(_json.dumps({"user_id": 9, "l_ts": "2024-01-01 12:00:00", "error_id": 900}) + "\n")
    with open(_os.path.join(d2, "b2.json"), "w") as f:
        f.write(_json.dumps({"r_user_id": 9, "r_ts": "2024-01-01 12:00:00", "click_id": 90}) + "\n")
    q.processAllAvailable()
    q.processAllAvailable()  # extra cycle: state eviction runs on the next batch
    q.stop()
    rows = {(r.error_id, r.click_id) for r in spark.sql("SELECT * FROM lsj_out").collect()}
    # the 10:00 error emits with NULL click once the watermark passed it
    assert (100, None) in rows, rows


def test_interval_right_join_emits_nulls_after_watermark(spark, tmp_path):
    """Right-outer stream-stream join — the mirror of the left_outer
    pin: an unmatched RIGHT row (click with no error in its window) is
    held until the watermark passes, then emitted with null left
    columns. SURVEY §2.2 claims inner/left/right/full; VERDICT r6 #4
    flagged right/full as supported-but-unpinned."""
    err_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("l_ts", T.TimestampType()),
            T.StructField("error_id", T.LongType()),
        ]
    )
    click_schema = T.StructType(
        [
            T.StructField("r_user_id", T.LongType()),
            T.StructField("r_ts", T.TimestampType()),
            T.StructField("click_id", T.LongType()),
        ]
    )
    d1, d2 = str(tmp_path / "r_errors"), str(tmp_path / "r_clicks")
    _write(d1, [{"user_id": 2, "l_ts": "2024-01-01 10:00:00", "error_id": 100}])
    _write(d2, [{"r_user_id": 1, "r_ts": "2024-01-01 10:00:00", "click_id": 10}])

    errors = spark.readStream.schema(err_schema).json(d1)
    clicks = spark.readStream.schema(click_schema).json(d2)
    joined = interval_join_stream(
        errors, clicks, window="10 minutes", watermark="5 minutes",
        join_type="right_outer",
    )
    q = (
        joined.select("error_id", "click_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rsj_out")
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT count(*) n FROM rsj_out").collect()[0].n == 0

    # distinct filename: the file source tracks seen files by name, so a
    # second _write to part.json would be invisible (left test uses b2.json)
    with open(os.path.join(d1, "b2.json"), "w") as f:
        f.write(json.dumps({"user_id": 9, "l_ts": "2024-01-01 12:00:00", "error_id": 900}) + "\n")
    with open(os.path.join(d2, "b2.json"), "w") as f:
        f.write(json.dumps({"r_user_id": 9, "r_ts": "2024-01-01 12:00:00", "click_id": 90}) + "\n")
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    rows = {(r.error_id, r.click_id) for r in spark.sql("SELECT * FROM rsj_out").collect()}
    assert (None, 10) in rows, rows


def test_interval_full_join_emits_nulls_both_sides(spark, tmp_path):
    """Full-outer stream-stream join: unmatched rows on BOTH sides emit
    with nulls once the watermark clears them, and matched rows emit
    joined — all three classes from one query."""
    err_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("l_ts", T.TimestampType()),
            T.StructField("error_id", T.LongType()),
        ]
    )
    click_schema = T.StructType(
        [
            T.StructField("r_user_id", T.LongType()),
            T.StructField("r_ts", T.TimestampType()),
            T.StructField("click_id", T.LongType()),
        ]
    )
    d1, d2 = str(tmp_path / "f_errors"), str(tmp_path / "f_clicks")
    _write(
        d1,
        [
            {"user_id": 1, "l_ts": "2024-01-01 10:05:00", "error_id": 100},
            {"user_id": 3, "l_ts": "2024-01-01 10:00:00", "error_id": 300},
        ],
    )
    _write(
        d2,
        [
            {"r_user_id": 1, "r_ts": "2024-01-01 10:00:00", "click_id": 10},
            {"r_user_id": 4, "r_ts": "2024-01-01 10:00:00", "click_id": 40},
        ],
    )

    errors = spark.readStream.schema(err_schema).json(d1)
    clicks = spark.readStream.schema(click_schema).json(d2)
    joined = interval_join_stream(
        errors, clicks, window="10 minutes", watermark="5 minutes",
        join_type="full_outer",
    )
    q = (
        joined.select("error_id", "click_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("fsj_out")
        .start()
    )
    q.processAllAvailable()

    with open(os.path.join(d1, "b2.json"), "w") as f:
        f.write(json.dumps({"user_id": 9, "l_ts": "2024-01-01 12:00:00", "error_id": 900}) + "\n")
    with open(os.path.join(d2, "b2.json"), "w") as f:
        f.write(json.dumps({"r_user_id": 9, "r_ts": "2024-01-01 12:00:00", "click_id": 90}) + "\n")
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    rows = {(r.error_id, r.click_id) for r in spark.sql("SELECT * FROM fsj_out").collect()}
    assert (100, 10) in rows, rows       # user 1: click in error's window
    assert (300, None) in rows, rows     # error with no click
    assert (None, 40) in rows, rows      # click with no error
