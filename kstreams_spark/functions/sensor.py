"""The reference's per-record pipeline (BME680.java:136-178) as declarative
Spark columns — reusable in batch and streaming.

Reference semantics reproduced:
- dual-format dispatch: value containing '{' is JSON, else bare scalar
  (BME680.java:151-155, R5);
- JSONPath extraction of the reading field (BME680.java:152, R4 — the
  reference pulls ``$.bme680_tempf`` via jayway json-path);
- trim of the bare-scalar branch (BME680.java:154, R6);
- string→float cast (BME680.java:157, R7) — the reference's
  ``Float.parseFloat`` THROWS on garbage and would kill the stream thread;
  this engine's declared semantics are NULL-on-bad-cast (try_cast), so a
  poison record degrades to a dropped row instead of an outage;
- threshold filter > 75 °F (BME680.java:68,160, R8) with null guard (R9);
- alert text ``Temperature warning %04.2f`` via format_string
  (BME680.java:64,161, R10) — Spark's format_string uses java.util.Formatter,
  exact parity with the reference's String.format.

Everything here is built-in column expressions: JVM-side, codegen'd, no
Python in the hot path — at 100 TB this pipeline is a single narrow
projection+filter stage with full predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEMPERATURE_LIMIT = 75.0  # BME680.java:68
TEMPERATURE_WARNING = "Temperature warning %04.2f"  # BME680.java:64
JSON_PATH = "$.bme680_tempf"  # BME680.java:70

# Implicit sensor record schema (BME680.java:104-131; FIXTURES.md §A).
SENSOR_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType()),
        T.StructField("systemtime", T.StringType()),
        T.StructField("starttime", T.StringType()),
        T.StructField("end", T.StringType()),
        T.StructField("te", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("ipaddress", T.StringType()),
        T.StructField("cputemp", T.DoubleType()),
        T.StructField("memory", T.DoubleType()),
        T.StructField("diskusage", T.StringType()),
        T.StructField("VL53L1X_distance_in_mm", T.LongType()),
        T.StructField("bme680_tempf", T.StringType()),
        T.StructField("bme680_tempc", T.StringType()),
        T.StructField("bme680_humidity", T.StringType()),
        T.StructField("bme680_pressure", T.StringType()),
        T.StructField("BH1745_red", T.StringType()),
        T.StructField("BH1745_green", T.StringType()),
        T.StructField("BH1745_blue", T.StringType()),
        T.StructField("BH1745_clear", T.StringType()),
        T.StructField("ltr559_prox", T.StringType()),
        T.StructField("ltr559_lux", T.StringType()),
        T.StructField("lsm303d_accelerometer", T.StringType()),
        T.StructField("lsm303d_magnetometer", T.StringType()),
        T.StructField("imgname", T.StringType()),
        T.StructField("imgnamep", T.StringType()),
    ]
)


def dual_format_reading(value: Column, json_path: str = JSON_PATH) -> Column:
    """R4+R5+R6+R7: JSON-or-bare-scalar reading extraction, NULL on garbage."""
    extracted = F.when(
        F.instr(value, "{") > 0, F.get_json_object(value, json_path)
    ).otherwise(F.trim(value))
    return extracted.try_cast("double")


def temperature_alerts(
    df: DataFrame,
    value_col: str = "value",
    json_path: str = JSON_PATH,
    limit: float = TEMPERATURE_LIMIT,
) -> DataFrame:
    """R4-R10 composed: the reference's entire query as one narrow pipeline.

    Input: any DataFrame with a string column ``value_col``. Output adds
    ``reading`` (double) and ``alert`` (string), keeping only rows above the
    threshold — mirroring processValues() (BME680.java:136-178).
    """
    reading = dual_format_reading(F.col(value_col), json_path)
    return (
        df.withColumn("reading", reading)
        .filter(F.col("reading").isNotNull() & (F.col("reading") > F.lit(limit)))
        .withColumn("alert", F.format_string(TEMPERATURE_WARNING, F.col("reading")))
    )


def parse_sensor_json(value: Column) -> Column:
    """Full-record parse (the Avro-intent path, BME680.java:41-44):
    ``from_json`` against the implicit schema → one struct column."""
    return F.from_json(value, SENSOR_SCHEMA)


def accel_vector(packed: Column) -> Column:
    """lsm303d packed 3-vector '+00.06g : -01.01g : +00.04g' → array<double>
    (FIXTURES.md §A; BME680.java:111,129)."""
    cleaned = F.regexp_replace(packed, "[gG ]", "")
    return F.transform(F.split(cleaned, ":"), lambda x: x.try_cast("double"))
