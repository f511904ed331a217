"""Property-based tests (hypothesis) for the dual-format sensor parser —
pinning the engine's NULL-on-garbage cast semantics vs the reference's
throwing Float.parseFloat (SURVEY.md §2.1 R7, §5.2 item 4)."""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from kstreams_spark.functions.sensor import (
    SENSOR_SCHEMA,
    accel_vector,
    dual_format_reading,
    parse_sensor_json,
)
from pyspark.sql import functions as F


def _parse_values(spark, values: list[str | None]) -> list[float | None]:
    df = spark.createDataFrame(
        [(v,) for v in values], "value string"
    ).select(dual_format_reading(F.col("value"), "$.bme680_tempf").alias("r"))
    return [r.r for r in df.collect()]


finite_floats = st.floats(
    min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
)


@pytest.mark.usefixtures("spark")
class TestDualFormatParser:
    @settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.lists(finite_floats, min_size=1, max_size=8))
    def test_bare_scalars_roundtrip(self, spark, temps):
        got = _parse_values(spark, [f"  {t} " for t in temps])
        assert all(
            g is not None and math.isclose(g, t, rel_tol=1e-9)
            for g, t in zip(got, temps)
        )

    @settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.lists(finite_floats, min_size=1, max_size=8))
    def test_json_records_extract(self, spark, temps):
        vals = [json.dumps({"bme680_tempf": str(t), "other": "x"}) for t in temps]
        got = _parse_values(spark, vals)
        assert all(
            g is not None and math.isclose(g, t, rel_tol=1e-9)
            for g, t in zip(got, temps)
        )

    @settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(blacklist_characters="{}0123456789"),
                min_size=1,
                max_size=12,
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_garbage_yields_null_not_error(self, spark, garbage):
        """Float.parseFloat would throw and kill the stream thread
        (BME680.java:157); the engine must yield NULL."""
        got = _parse_values(spark, garbage)
        # strings without digits can only parse as NULL (modulo 'Infinity'/'NaN')
        for g, raw in zip(got, garbage):
            token = raw.strip().lower()
            if token in ("infinity", "+infinity", "-infinity", "nan", "inf", "+inf", "-inf"):
                continue
            assert g is None, (raw, g)

    def test_json_without_field_is_null(self, spark):
        got = _parse_values(spark, ['{"other": 1}', "{broken json", None])
        assert got == [None, None, None]


def test_full_record_parse(spark):
    """from_json against the implicit sensor schema (the Avro-intent path,
    BME680.java:41-44) + packed accelerometer vector split."""
    record = {
        "uuid": "20181220031556_e547",
        "systemtime": "12/19/2018 22:15:56",
        "cputemp": 52.0,
        "memory": 26.5,
        "VL53L1X_distance_in_mm": 134,
        "bme680_tempf": "82.74",
        "lsm303d_accelerometer": "+00.06g : -01.01g : +00.04g",
        "imgname": "/opt/demo/images/bog_image_20181220031556_e547.jpg",
    }
    df = spark.createDataFrame([(json.dumps(record),)], "value string").select(
        parse_sensor_json(F.col("value")).alias("rec")
    )
    row = df.select(
        "rec.bme680_tempf",
        "rec.cputemp",
        "rec.VL53L1X_distance_in_mm",
        F.to_timestamp("rec.systemtime", "MM/dd/yyyy HH:mm:ss").alias("st"),
        accel_vector(F.col("rec.lsm303d_accelerometer")).alias("accel"),
        "rec.imgname",
    ).collect()[0]
    assert row.bme680_tempf == "82.74"
    assert row.cputemp == 52.0
    assert row.VL53L1X_distance_in_mm == 134
    assert row.st is not None and row.st.year == 2018
    assert row.accel == [0.06, -1.01, 0.04]
    assert row.imgname.endswith(".jpg")
    assert len(SENSOR_SCHEMA.fields) == 25


def test_kafka_option_assembly():
    from kstreams_spark.sources.streams import kafka_reader_options
    from kstreams_spark.sinks.kafka import kafka_writer_options

    r = kafka_reader_options("host:6667", max_offsets_per_trigger=10000)
    assert r["subscribe"] == "bme680"  # BME680.java:53
    assert r["maxOffsetsPerTrigger"] == "10000"
    w = kafka_writer_options("host:6667", "bme680out", "/tmp/ckpt")
    assert w["topic"] == "bme680out"  # BME680.java:55


def test_kafka_sink_schema_validation(spark):
    from kstreams_spark.sinks.kafka import validate_kafka_sink_schema

    ok = spark.createDataFrame([("k", "v")], "key string, value string")
    validate_kafka_sink_schema(ok)  # no raise
    bad = spark.createDataFrame([(1, "v")], "key int, value string")
    with pytest.raises(ValueError):
        validate_kafka_sink_schema(bad)


def test_multimodal_decode_deterministic(spark):
    """The decode stub must be deterministic (drives the rows-only check)."""
    from kstreams_spark.operators.multimodal import decode_stub

    a = decode_stub(b"hello world")
    b = decode_stub(b"hello world")
    assert a == b
    assert a["n_bytes"] == 11
    assert len(a["feature"]) == 4
    assert abs(sum(a["feature"]) - 1.0) < 1e-9
