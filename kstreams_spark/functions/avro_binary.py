"""Pure-Python Avro *binary encoding* codec, run as Arrow-batched Pandas
UDFs — the executable form of the reference's declared Avro growth path
("we will convert to avro and then process with schema",
BME680.java:41-44).

Neither the spark-avro datasource jar nor a Python avro library exists in
this environment (and there is no network to vendor one), so the wire
format is implemented directly from the public Avro 1.12 specification
(§ Binary Encoding): longs are zigzag varints, doubles are 8-byte
little-endian IEEE 754, strings are length-prefixed utf-8, and a
["null", T] union writes its branch index first. Any Avro library given
AVRO_SENSOR_SCHEMA can decode these bytes; `avro_codec.py` remains the
spark-avro wrapper for clusters that do carry the jar.

Scale posture: both directions are stateless per-row transforms inside
Arrow batches — no shuffle, linear scan, parallel by partition.

Verification: the registered query ``avro_roundtrip``
(operators/avro_ops.py) runs encode→decode over the events table and is
hash-compared against the identity SELECT in DuckDB (null union branches
forced on a modulus of event_id); ``tests/test_avro_binary.py`` pins the
exact wire bytes against hand-computed zigzag/varint expectations,
including both null-branch encodings.
"""

from __future__ import annotations

import struct

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Field order is the record's wire order — fixed by the schema.
AVRO_SENSOR_SCHEMA = """
{
  "type": "record", "name": "SensorEvent",
  "fields": [
    {"name": "event_id", "type": "long"},
    {"name": "user_id", "type": "long"},
    {"name": "event_type", "type": ["null", "string"], "default": null},
    {"name": "value", "type": ["null", "double"], "default": null}
  ]
}
"""


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(n: int, out: bytearray) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


def encode_sensor_record(
    event_id: int, user_id: int, event_type: str | None, value: float | None
) -> bytes:
    """One SensorEvent → Avro binary (single-record, schema-less frame)."""
    out = bytearray()
    _write_long(int(event_id), out)
    _write_long(int(user_id), out)
    if event_type is None:
        _write_long(0, out)  # union branch: null
    else:
        _write_long(1, out)  # union branch: string
        raw = event_type.encode("utf-8")
        _write_long(len(raw), out)
        out += raw
    if value is None or pd.isna(value):
        _write_long(0, out)
    else:
        _write_long(1, out)
        out += struct.pack("<d", float(value))
    return bytes(out)


def decode_sensor_record(buf: bytes) -> tuple[int, int, str | None, float | None]:
    event_id, pos = _read_long(buf, 0)
    user_id, pos = _read_long(buf, pos)
    branch, pos = _read_long(buf, pos)
    if branch:
        n, pos = _read_long(buf, pos)
        event_type = buf[pos : pos + n].decode("utf-8")
        pos += n
    else:
        event_type = None
    branch, pos = _read_long(buf, pos)
    if branch:
        (value,) = struct.unpack_from("<d", buf, pos)
        pos += 8
    else:
        value = None
    if pos != len(buf):
        raise ValueError(f"trailing {len(buf) - pos} bytes after record")
    return event_id, user_id, event_type, value


DECODED_TYPE = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@F.pandas_udf(T.BinaryType())
def avro_encode_sensor(
    event_id: pd.Series, user_id: pd.Series, event_type: pd.Series, value: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            encode_sensor_record(e, u, t, v)
            for e, u, t, v in zip(event_id, user_id, event_type, value)
        ]
    )


@F.pandas_udf(DECODED_TYPE)
def avro_decode_sensor(payload: pd.Series) -> pd.DataFrame:
    rows = [decode_sensor_record(bytes(b)) for b in payload]
    return pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value"]
    )


def encode_col(event_id: Column, user_id: Column, event_type: Column, value: Column) -> Column:
    return avro_encode_sensor(event_id, user_id, event_type, value)


def decode_col(payload: Column) -> Column:
    return avro_decode_sensor(payload)
