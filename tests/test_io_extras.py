"""IO extras: bucketed tables (co-located joins), binaryFile reader
(multimodal scan path), observe() metrics (the declarative version of the
reference's per-record debug logging, R16), console/memory sinks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table, read_binary_files, write_bucketed
from kstreams_spark.plans.inspect import count_exchanges


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must join with ZERO shuffle
    exchanges — the SCALE.md recipe for repeatedly-joined fact tables."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        write_bucketed(o, "orders_b", "o_custkey", 8)
        write_bucketed(
            c.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8
        )
        ob = spark.table("orders_b")
        cb = spark.table("customer_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ob.join(cb, "o_custkey")
        assert count_exchanges(joined) == 0, joined._jdf.queryExecution().toString()
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_binary_file_reader(spark, tmp_path):
    d = str(tmp_path / "media")
    os.makedirs(d)
    payloads = {"a.img": b"\x89fakepng" * 10, "b.img": b"RIFFfakewav" * 5}
    for name, content in payloads.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(content)
    df = read_binary_files(spark, d, "*.img")
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == set(payloads)
    assert bytes(rows["a.img"].content) == payloads["a.img"]
    assert rows["b.img"].length == len(payloads["b.img"])


def test_observe_metrics(spark, sf_dir):
    """df.observe(): pipeline metrics without a second pass — replaces the
    reference's per-record log lines (BME680.java:137,164)."""
    from pyspark.sql import Observation

    obs = Observation("alerts")
    ev = load_table(spark, sf_dir, "events")
    df = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("value") > 300.0).cast("int")).alias("n_hot"),
    ).filter(F.col("value") > 300.0)
    n_hot = df.count()
    assert obs.get["n_rows"] == ev.count()
    assert obs.get["n_hot"] == n_hot


def test_console_sink_runs(spark, tmp_path):
    """Console sink (debug topology tail) accepts a full streaming query."""
    import json

    d = str(tmp_path / "console_in")
    os.makedirs(d)
    with open(os.path.join(d, "a.json"), "w") as f:
        f.write(json.dumps({"key": "k", "value": "77.7"}) + "\n")
    from kstreams_spark.sources.streams import sensor_stream_from_files

    q = (
        sensor_stream_from_files(spark, d)
        .writeStream.format("console")
        .option("truncate", "false")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_startup_diagnostics(spark):
    """R15: config dump parity (BME680.java:184-208)."""
    from kstreams_spark.session import startup_diagnostics

    d = startup_diagnostics(spark)
    assert d["engine.master"].startswith("local[")
    assert int(d["engine.defaultParallelism"]) >= 1
    assert "spark.sql.shuffle.partitions" in d


def test_multimodal_resize_deterministic_and_bounded(spark, sf_dir):
    """multimodal_resize: stride decimation respects the byte budget,
    identity when payload already fits (stride 1 ⇒ resized == payload),
    and two runs are row-identical (the rows-only driver check leans on
    this determinism)."""
    import hashlib

    from kstreams_spark.operators.multimodal import (
        RESIZE_TARGET_BYTES,
        multimodal_resize,
        resize_stub,
    )

    a = sorted(multimodal_resize(spark, sf_dir).collect())
    b = sorted(multimodal_resize(spark, sf_dir).collect())
    assert a == b and len(a) > 0
    for r in a:
        assert r.new_bytes <= RESIZE_TARGET_BYTES or r.stride == 1
        assert r.stride >= 1 and r.new_width >= 1 and r.new_height >= 1

    small = b"tiny payload"
    rec = resize_stub(small, RESIZE_TARGET_BYTES)
    assert rec["stride"] == 1
    assert rec["resized_md5"] == hashlib.md5(small).hexdigest()


def test_multimodal_features_feed_similarity(spark, sf_dir):
    """The claim in decode_features' docstring, executed: the mapInPandas
    feature vectors (array<float>) plug straight into the ANN operators —
    exact top-k over the decoded features runs and ranks every doc's
    self-match first."""
    from kstreams_spark.operators.multimodal import decode_features
    from kstreams_spark.operators.similarity import brute_force_topk

    feats = decode_features(spark, sf_dir).select(
        F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    topk = brute_force_topk(feats, n_queries=5).collect()
    rank1 = {r.qid: r.cid for r in topk if r.rank == 1}
    assert len(rank1) == 5
    assert all(cid == qid for qid, cid in rank1.items())
