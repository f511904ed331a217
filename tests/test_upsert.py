"""KeyedUpsertSink: changelog stream → latest-by-key snapshot (the
foreachBatch MERGE pattern), across multiple microbatches."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from kstreams_spark.streaming.upsert import KeyedUpsertSink

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _append(d: str, name: str, rows: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_upsert_latest_by_key_across_batches(spark, tmp_path):
    src = str(tmp_path / "changelog")
    snap = str(tmp_path / "snapshot")
    _append(
        src,
        "b1.json",
        [
            {"k": "a", "seq": 1, "payload": "a1"},
            {"k": "a", "seq": 2, "payload": "a2"},  # same-batch: seq 2 wins
            {"k": "b", "seq": 1, "payload": "b1"},
        ],
    )
    sink = KeyedUpsertSink(snap, key_cols=["k"], seq_col="seq")
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = sink.attach(stream)
    q.processAllAvailable()
    state = {r.k: (r.seq, r.payload) for r in sink.snapshot(spark).collect()}
    assert state == {"a": (2, "a2"), "b": (1, "b1")}

    # batch 2: update a, insert c — b untouched
    _append(
        src,
        "b2.json",
        [
            {"k": "a", "seq": 3, "payload": "a3"},
            {"k": "c", "seq": 1, "payload": "c1"},
        ],
    )
    q.processAllAvailable()
    q.stop()
    state = {r.k: (r.seq, r.payload) for r in sink.snapshot(spark).collect()}
    assert state == {"a": (3, "a3"), "b": (1, "b1"), "c": (1, "c1")}


def test_swap_crash_points_are_recoverable(spark, tmp_path):
    """The displace-swap leaves a recoverable state at every crash point;
    the worst one (snapshot displaced, new copy not yet moved in) used to
    lose the snapshot outright under rmtree-then-rename."""
    import os
    import shutil

    from kstreams_spark.streaming.upsert import KeyedUpsertSink

    snap = str(tmp_path / "snap")
    sink = KeyedUpsertSink(snap, key_cols=["k"], seq_col="seq")
    sink.process_batch(
        spark.createDataFrame([("a", 1, "v1"), ("b", 1, "w1")], "k string, seq long, v string"),
        0,
    )

    # simulate the crash WINDOW: snapshot displaced to .old, new dir absent
    os.rename(snap, snap + ".old-9")
    assert not os.path.exists(snap)

    # next batch recovers the displaced snapshot before merging
    sink.process_batch(
        spark.createDataFrame([("a", 2, "v2")], "k string, seq long, v string"),
        1,
    )
    got = {(r.k, r.seq, r.v) for r in sink.snapshot(spark).collect()}
    assert got == {("a", 2, "v2"), ("b", 1, "w1")}, got  # nothing lost

    # stale .old next to a live snapshot (crash before cleanup) is swept
    shutil.copytree(snap, snap + ".old-3")
    assert sink.snapshot(spark).count() == 2
    assert not os.path.exists(snap + ".old-3")
