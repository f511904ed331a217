"""Streaming hardening: checkpoint restart recovery (R13 / exactly-once
posture), update-mode running counts (KTable materialization §2.2),
stream-static enrichment joins, and non-parquet batch format round-trips."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

KV_SCHEMA = T.StructType(
    [T.StructField("key", T.StringType()), T.StructField("value", T.StringType())]
)


def _append(d: str, name: str, rows: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_checkpoint_restart_no_reprocessing(spark, tmp_path):
    """Stop a checkpointed query, add data, restart: the new query resumes
    from the checkpointed offset — batch 1 is not reprocessed (the
    exactly-once source side of R13's graceful shutdown story)."""
    src = str(tmp_path / "ck_src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "ck_out")
    _append(src, "b1.json", [{"key": "a", "value": "1"}, {"key": "b", "value": "2"}])

    def start_query():
        return (
            spark.readStream.schema(KV_SCHEMA)
            .json(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start_query()
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 2

    _append(src, "b2.json", [{"key": "c", "value": "3"}])
    q = start_query()
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(out)
    # 3 total — batch 1 NOT duplicated on restart
    assert rows.count() == 3
    assert {r.key for r in rows.collect()} == {"a", "b", "c"}


def test_update_mode_running_count(spark, tmp_path):
    """groupBy(key).count() in update mode = KTable running count
    (§2.2 groupByKey().count()): re-emits revised rows per batch."""
    src = str(tmp_path / "rc_src")
    _append(src, "b1.json", [{"key": "x", "value": "1"}, {"key": "x", "value": "2"}])
    q = (
        spark.readStream.schema(KV_SCHEMA)
        .json(src)
        .groupBy("key")
        .count()
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rc_out")
        .start()
    )
    q.processAllAvailable()
    _append(src, "b2.json", [{"key": "x", "value": "3"}, {"key": "y", "value": "1"}])
    q.processAllAvailable()
    q.stop()
    # update mode appends revisions to the memory sink; the latest row per
    # key is the current KTable state
    rows = spark.sql(
        "SELECT key, max(count) AS c FROM rc_out GROUP BY key"
    ).collect()
    state = {r.key: r.c for r in rows}
    assert state == {"x": 3, "y": 1}


def test_stream_static_enrichment_join(spark, tmp_path, sf_dir):
    """Stream ⋈ static broadcast (§2.2 stream⋈GlobalKTable): enrich a
    stream of user events with the static customer dimension."""
    from kstreams_spark.io import load_table

    src = str(tmp_path / "en_src")
    _append(
        src,
        "b1.json",
        [{"key": "0", "value": "a"}, {"key": "1", "value": "b"}, {"key": "99999", "value": "c"}],
    )
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("key"), "c_name"
    )
    stream = spark.readStream.schema(KV_SCHEMA).json(src)
    enriched = stream.join(F.broadcast(customers), "key", "left")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("en_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.key: r.c_name for r in spark.sql("SELECT * FROM en_out").collect()}
    assert rows["0"] is not None and rows["1"] is not None
    assert rows["99999"] is None  # left join preserves unmatched stream rows


def test_csv_json_orc_roundtrip(spark, sf_dir, tmp_path):
    """Non-parquet batch formats (csv/json/orc): write the nation table
    out and read it back with an explicit schema — values identical."""
    from kstreams_spark.io import load_table

    n = load_table(spark, sf_dir, "nation")
    want = sorted((r.n_nationkey, r.n_name, r.n_regionkey) for r in n.collect())
    schema = n.schema
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / f"nation_{fmt}")
        writer = n.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            writer = writer.option("header", "true")
        writer.save(path)
        reader = spark.read.schema(schema).format(fmt)
        if fmt == "csv":
            reader = reader.option("header", "true")
        got = sorted(
            (r.n_nationkey, r.n_name, r.n_regionkey)
            for r in reader.load(path).collect()
        )
        assert got == want, f"{fmt} roundtrip mismatch"
