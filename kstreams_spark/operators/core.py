"""Relational core: scan, project, filter, cast, conditional, JSON — the
reference's own operator set (SURVEY.md §2.1 R4-R10) on the driver fixtures.

The flagship `sensor_alert_pipeline` is the reference's entire query
(BME680.java:136-178) transplanted onto the `events` table: `props` plays the
role of the Kafka record value ($.k ↔ $.bme680_tempf).

Scale notes: every query here is a narrow scan→project→filter pipeline —
no shuffle at all. Catalyst pushes the filters and prunes columns down to
the parquet reader (verified via .explain in tests), so at 100 TB these run
at scan speed with WholeStageCodegen and zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.functions.sensor import dual_format_reading, temperature_alerts
from kstreams_spark.io import load_table
from kstreams_spark.registry import query


@query(
    "sensor_alert_pipeline",
    oracle="""
    WITH parsed AS (
      SELECT event_id,
             TRY_CAST(CASE WHEN instr(props, '{') > 0
                           THEN json_extract_string(props, '$.k')
                           ELSE trim(props) END AS DOUBLE) AS reading
      FROM events
    )
    SELECT event_id, reading,
           printf('Temperature warning %04.2f', reading) AS alert
    FROM parsed
    WHERE reading IS NOT NULL AND reading > 75.0
    """,
)
def sensor_alert_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4-R10 composed: dual-format extract → try_cast → threshold → alert."""
    events = load_table(spark, sf_dir, "events")
    return temperature_alerts(
        events.select("event_id", F.col("props").alias("value")),
        value_col="value",
        json_path="$.k",
    ).select("event_id", "reading", "alert")


@query(
    "scan_project",
    oracle="""
    SELECT event_id, event_type, value FROM events
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned parquet scan (reads 3 of 6 columns; ReadSchema check in
    tests). The reference forwards whole records (BME680.java:227)."""
    return load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")


@query(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 30.0 AND l_discount BETWEEN 0.02 AND 0.08
          AND l_returnflag = 'R'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates — pushed to the parquet scan (R8/R9 analog)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30.0)
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "conditional_projection",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                WHEN event_type = 'error' THEN 'failure'
                ELSE 'engagement' END AS category,
           CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS is_high,
           upper(trim(event_type)) AS et_norm
    FROM events
    """,
)
def conditional_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise dispatch + trim — the R5/R6 conditional-projection shape."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .when(F.col("event_type") == "error", "failure")
        .otherwise("engagement")
        .alias("category"),
        F.when(F.col("value") > 100.0, 1).otherwise(0).alias("is_high"),
        F.upper(F.trim(F.col("event_type"))).alias("et_norm"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object (R4, BME680.java:152 jsonpath parity) + numeric cast."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return ev.select(
        "event_id", k.alias("k_str"), k.try_cast("bigint").alias("k_num")
    )


@query(
    "null_on_bad_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(event_type AS DOUBLE) AS bad_cast,
           TRY_CAST(trim(concat(' ', CAST(event_id AS VARCHAR), ' ')) AS BIGINT)
             AS roundtrip_id
    FROM events
    """,
)
def null_on_bad_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine cast semantics (R7): NULL on garbage, not an exception — the
    reference's Float.parseFloat would kill its stream thread
    (BME680.java:157)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_type").try_cast("double").alias("bad_cast"),
        F.trim(F.concat(F.lit(" "), F.col("event_id").cast("string"), F.lit(" ")))
        .try_cast("bigint")
        .alias("roundtrip_id"),
    )


@query(
    "dual_format_parse",
    oracle="""
    WITH mixed AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN CAST(value AS VARCHAR)
                  WHEN event_id % 7 = 0 THEN 'garbage'
                  ELSE props END AS wire_value
      FROM events
    )
    SELECT event_id,
           TRY_CAST(CASE WHEN instr(wire_value, '{') > 0
                         THEN json_extract_string(wire_value, '$.k')
                         ELSE trim(wire_value) END AS DOUBLE) AS reading
    FROM mixed
    """,
)
def dual_format_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 dispatch over a synthesized JSON/bare-scalar/garbage mix — the
    property the hypothesis tests also pin (SURVEY.md §5.2 item 4).

    Note: the bare-scalar branch routes a double through CAST(AS VARCHAR);
    both engines render e.g. 6.55 identically for these magnitudes.
    """
    ev = load_table(spark, sf_dir, "events")
    wire = (
        F.when(F.col("event_id") % 3 == 0, F.col("value").cast("string"))
        .when(F.col("event_id") % 7 == 0, F.lit("garbage"))
        .otherwise(F.col("props"))
    )
    return ev.select(
        "event_id", dual_format_reading(wire, "$.k").alias("reading")
    )
