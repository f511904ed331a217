"""Avro binary round-trip as a registered, oracle-checked query.

The reference declares Avro as its growth path ("we will convert to avro
and then process with schema", BME680.java:41-44). `functions/avro_binary.py`
implements the Avro 1.12 binary encoding from the public spec; this module
is the proof it works: encode four event columns to Avro bytes on the
executors, decode them back, and hash-compare the result against the
identity SELECT in DuckDB. Null union branches are exercised on real data
by deterministically nulling event_type / value on a modulus of event_id
(same CASE on both sides), so the ["null", T] encoding is covered by the
driver gate, not just unit tests.

Shuffle budget: ZERO — both UDFs are stateless per-row transforms inside
Arrow batches; the plan is scan → project (encode) → project (decode).
Linear, partition-parallel, no exchange. At 100 TB this is the cheapest
shape there is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.functions.avro_binary import decode_col, encode_col
from kstreams_spark.io import load_table
from kstreams_spark.registry import query


@query(
    "avro_roundtrip",
    oracle="""
    SELECT event_id,
           user_id,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END
             AS event_type,
           CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value
    FROM events
    """,
)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Avro binary → decode == identity (BME680.java:41-44).

    The nulling CASEs force both union branches (["null","string"] and
    ["null","double"]) through the wire format on every run; the oracle
    applies the identical CASEs to the raw table, so a hash match proves
    encode∘decode == id including the null paths.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % 11 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    payload = e.select(
        encode_col(
            F.col("event_id"), F.col("user_id"), F.col("event_type"), F.col("value")
        ).alias("avro")
    )
    decoded = payload.select(decode_col(F.col("avro")).alias("rec"))
    return decoded.select(
        F.col("rec.event_id").alias("event_id"),
        F.col("rec.user_id").alias("user_id"),
        F.col("rec.event_type").alias("event_type"),
        F.col("rec.value").alias("value"),
    )


@query(
    "avro_ocf_roundtrip",
    oracle="""
    SELECT event_id,
           user_id,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END
             AS event_type,
           CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value
    FROM events
    """,
)
def avro_ocf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → complete Avro OBJECT CONTAINER FILES → decode ==
    identity (r10; functions/avro_ocf.py — the FILE format the
    reference's declared Avro growth path ships records in,
    BME680.java:41-44). Each group of 100 event_ids becomes one real
    multi-block OCF: magic, schema/codec metadata map, deterministic
    sync marker, 40-record data blocks with per-block sync verification
    on the way back. The oracle is the identity SELECT with the same
    null-union CASEs as avro_roundtrip, so a hash match proves the
    whole container chain — record frames, block framing, metadata,
    sync discipline — not just the record codec.

    Shuffle budget: ONE groupBy (the file-packing exchange every bulk
    writer pays — at 100 TB this is the repartition before a write);
    collect_list is made layout-invariant by sort_array (the
    partition-order rule); encode/decode are per-file Python UDFs over
    file-count rows (corpus-row count ÷ 100), not per-record."""
    from pyspark.sql import types as T

    from kstreams_spark.functions.avro_binary import (
        decode_sensor_record_at,
        encode_sensor_record,
    )
    from kstreams_spark.functions.avro_ocf import (
        decode_ocf,
        encode_ocf,
        sync_for,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % 11 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    grouped = e.groupBy((F.col("event_id") / 100).cast("long").alias("g")).agg(
        F.sort_array(
            F.collect_list(
                F.struct("event_id", "user_id", "event_type", "value")
            )
        ).alias("recs")
    )

    @F.udf(T.BinaryType())
    def make_ocf(g, recs):
        frames = [
            encode_sensor_record(
                r.event_id, r.user_id, r.event_type, r.value
            )
            for r in recs
        ]
        return encode_ocf(frames, sync_for(f"ocf:{g}"))

    rec_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
    )

    @F.udf(rec_type)
    def parse_ocf(buf):
        _, records = decode_ocf(bytes(buf), decode_sensor_record_at)
        return records

    files = grouped.select(make_ocf(F.col("g"), F.col("recs")).alias("ocf"))
    return files.select(
        F.explode(parse_ocf(F.col("ocf"))).alias("rec")
    ).select("rec.event_id", "rec.user_id", "rec.event_type", "rec.value")
