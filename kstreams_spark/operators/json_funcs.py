"""JSON function battery (SURVEY.md §2.3 "json" row): get_json_object is
exercised by the flagship; this adds json_tuple, from_json→field access,
and to_json round-tripping.

Oracle notes: DuckDB builds JSON with to_json(struct_pack(...)) — key
order follows construction order in both engines and neither emits
whitespace, so the strings compare equal as long as values are int/string
(double rendering differs between engines and is kept out of to_json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kstreams_spark.io import load_table
from kstreams_spark.registry import query


@query(
    "json_tuple_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k,
           json_extract_string(props, '$.missing') AS missing
    FROM events
    """,
)
def json_tuple_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple: multi-field extraction in one pass (one parse per row,
    vs one per get_json_object call) — the cheap way to pull several
    fields from 100 TB of raw JSON."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.json_tuple(F.col("props"), "k", "missing").alias("k", "missing")
    )


@query(
    "from_json_typed",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events
    """,
)
def from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema → typed struct column (the
    schema-on-read → fixed-schema path the reference only aspired to,
    BME680.java:41-44)."""
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = F.from_json(F.col("props"), schema)
    return ev.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        (parsed["k"] * 2).alias("k_doubled"),
    )


@query(
    "to_json_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(to_json(struct_pack(id := event_id, et := event_type)) AS VARCHAR)
             AS packed,
           json_extract_string(
             CAST(to_json(struct_pack(id := event_id, et := event_type)) AS VARCHAR),
             '$.et') AS et_back
    FROM events WHERE event_id < 200
    """,
)
def to_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct(...)) serialization + re-extraction — the write side
    of the JSON surface (what a Kafka producer of enriched records emits)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    packed = F.to_json(
        F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("et"))
    )
    return ev.select(
        "event_id",
        packed.alias("packed"),
        F.get_json_object(packed, "$.et").alias("et_back"),
    )


@query(
    "json_schema_inference",
    oracle="""
    SELECT 'STRUCT<k: BIGINT>' AS props_schema,
           COUNT(*) AS n_rows,
           COUNT(json_extract(props, '$.k')) AS n_parsed
    FROM events
    """,
)
def json_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema_of_json — schema-on-read inference for the §1.3/§1.4 story
    (the reference carries schemaless JSON strings; Spark derives the
    read schema from a sample). schema_of_json requires a FOLDABLE
    argument (inference happens at plan time), so the sample is the
    documented canonical props shape; the query then PROVES the inferred
    schema holds corpus-wide by parsing every row with it and counting
    successes (n_parsed == n_rows iff the single-shape assumption is
    true — the oracle counts rows whose $.k extracts). The schema string
    itself is pinned against Spark's rendering."""
    ev = load_table(spark, sf_dir, "events")
    inferred = F.schema_of_json(F.lit('{"k": 69}'))
    parsed = F.from_json("props", "k BIGINT")
    return ev.agg(
        F.first(inferred).alias("props_schema"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count(parsed.getField("k")).alias("n_parsed"),
    )
