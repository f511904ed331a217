"""Golden-bytes tests for the pure-Python Avro binary codec
(kstreams_spark/functions/avro_binary.py) plus the Spark round-trip.

Wire bytes are HAND-COMPUTED from the Avro 1.12 spec (§ Binary Encoding):
long = zigzag varint, string = length-prefixed utf-8, double = 8-byte
little-endian IEEE 754, ["null", T] union = branch-index long then value.
Any Avro library given AVRO_SENSOR_SCHEMA must produce/accept exactly
these bytes — the test pins our codec to the public wire format, not to
itself.
"""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kstreams_spark.functions.avro_binary import (
    decode_sensor_record,
    encode_sensor_record,
)

# ---------------------------------------------------------------- golden bytes


def test_golden_bytes_all_fields_present():
    # record: event_id=1, user_id=2, event_type="click", value=1.5
    #   zigzag(1)=2          -> 0x02
    #   zigzag(2)=4          -> 0x04
    #   union branch 1       -> zigzag(1)=2 -> 0x02
    #   len("click")=5       -> zigzag(5)=10 -> 0x0A, then b"click"
    #   union branch 1       -> 0x02
    #   1.5 as <d            -> 00 00 00 00 00 00 F8 3F
    expected = bytes(
        [0x02, 0x04, 0x02, 0x0A]
        + list(b"click")
        + [0x02, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xF8, 0x3F]
    )
    assert encode_sensor_record(1, 2, "click", 1.5) == expected
    assert decode_sensor_record(expected) == (1, 2, "click", 1.5)


def test_golden_bytes_null_branches_and_negative_long():
    # record: event_id=-1, user_id=300, event_type=None, value=None
    #   zigzag(-1)=1             -> 0x01
    #   zigzag(300)=600=0x258    -> varint LSB-first: 0xD8 0x04
    #   union branch 0 (null)    -> 0x00   (event_type)
    #   union branch 0 (null)    -> 0x00   (value)
    expected = bytes([0x01, 0xD8, 0x04, 0x00, 0x00])
    assert encode_sensor_record(-1, 300, None, None) == expected
    assert decode_sensor_record(expected) == (-1, 300, None, None)


def test_golden_bytes_multibyte_varint_and_utf8():
    # record: event_id=2**31, user_id=0, event_type="é", value=-0.0
    # zigzag(2**31) = 2**32 = 0x1_0000_0000
    #   varint: 0x80 0x80 0x80 0x80 0x10
    # zigzag(0) = 0 -> 0x00
    # "é" utf-8 = 0xC3 0xA9, len 2 -> zigzag(2)=4 -> 0x04
    expected = bytes(
        [0x80, 0x80, 0x80, 0x80, 0x10, 0x00, 0x02, 0x04, 0xC3, 0xA9, 0x02]
    ) + struct.pack("<d", -0.0)
    got = encode_sensor_record(2**31, 0, "é", -0.0)
    assert got == expected
    eid, uid, et, val = decode_sensor_record(expected)
    assert (eid, uid, et) == (2**31, 0, "é")
    assert val == 0.0 and math.copysign(1.0, val) == -1.0  # -0.0 preserved


def test_trailing_bytes_rejected():
    buf = encode_sensor_record(1, 2, None, None) + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        decode_sensor_record(buf)


# ------------------------------------------------------------- property check


@settings(max_examples=200, deadline=None)
@given(
    event_id=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    user_id=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    event_type=st.one_of(st.none(), st.text(max_size=40)),
    value=st.one_of(
        st.none(),
        st.floats(allow_nan=False, width=64),
    ),
)
def test_roundtrip_property(event_id, user_id, event_type, value):
    buf = encode_sensor_record(event_id, user_id, event_type, value)
    assert decode_sensor_record(buf) == (event_id, user_id, event_type, value)


# --------------------------------------------------- vectorized twin parity


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.one_of(st.none(), st.text(max_size=20)),
            st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
        ),
        max_size=50,
    )
)
def test_vectorized_batch_matches_scalar(rows):
    """The NumPy batch codec (what the pandas UDFs actually run) must emit
    byte-identical frames to the from-spec scalar reference, and decode
    them back to the same tuples (None -> NaN in the float column, the
    Arrow from_pandas null convention)."""
    import numpy as np
    import pandas as pd

    from kstreams_spark.functions.avro_binary import (
        decode_sensor_batch,
        encode_sensor_batch,
    )

    eid = pd.Series([r[0] for r in rows], dtype=object).astype("int64")
    uid = pd.Series([r[1] for r in rows], dtype=object).astype("int64")
    et = pd.Series([r[2] for r in rows], dtype=object)
    val = pd.Series([r[3] for r in rows], dtype="float64")
    enc = encode_sensor_batch(eid, uid, et, val)
    assert list(enc) == [encode_sensor_record(*r) for r in rows]
    dec = decode_sensor_batch(enc)
    for i, r in enumerate(rows):
        e, u, t, v = decode_sensor_record(enc.iloc[i])
        assert dec["event_id"].iloc[i] == e
        assert dec["user_id"].iloc[i] == u
        assert (dec["event_type"].iloc[i] is None and t is None) or dec[
            "event_type"
        ].iloc[i] == t
        got_v = dec["value"].iloc[i]
        if v is None:
            assert np.isnan(got_v)
        else:
            assert got_v == v


def test_vectorized_trailing_bytes_rejected():
    import pandas as pd

    from kstreams_spark.functions.avro_binary import decode_sensor_batch

    buf = encode_sensor_record(1, 2, None, None) + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        decode_sensor_batch(pd.Series([buf], dtype=object))


# ------------------------------------------------------------ spark round-trip


def test_spark_roundtrip_matches_input(spark):
    """Distributed encode→decode == identity on the events fixture, nulls
    forced through both union branches (same shape as the registered
    avro_roundtrip query)."""
    from kstreams_spark.operators.avro_ops import avro_roundtrip
    from kstreams_spark.io import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    got = avro_roundtrip(spark, sf).orderBy("event_id").collect()
    want = (
        load_table(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            F.when(F.col("event_id") % 7 == 0, F.lit(None))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(F.col("event_id") % 11 == 0, F.lit(None))
            .otherwise(F.col("value"))
            .alias("value"),
        )
        .orderBy("event_id")
        .collect()
    )
    assert len(got) == len(want) and len(got) > 0
    assert got == want
    # both null branches actually exercised
    assert any(r.event_type is None for r in got)
    assert any(r.value is None for r in got)


class TestOcfContainer:
    """functions/avro_ocf.py: the Avro Object Container File layer —
    framing, metadata, sync discipline, spec-edge metadata blocks."""

    def _frames(self, n=100):
        from kstreams_spark.functions.avro_binary import encode_sensor_record

        return [
            encode_sensor_record(
                i, i * 7, None if i % 3 == 0 else f"t{i}",
                None if i % 5 == 0 else i / 4.0,
            )
            for i in range(n)
        ]

    def _roundtrip(self, frames, **kw):
        from kstreams_spark.functions.avro_binary import (
            decode_sensor_record_at,
        )
        from kstreams_spark.functions.avro_ocf import (
            decode_ocf,
            encode_ocf,
            sync_for,
        )

        buf = encode_ocf(frames, sync_for("t"), **kw)
        return buf, decode_ocf(buf, decode_sensor_record_at)

    def test_multiblock_roundtrip_and_metadata(self):
        frames = self._frames(100)
        buf, (meta, recs) = self._roundtrip(frames, records_per_block=16)
        assert len(recs) == 100
        assert recs[7] == (7, 49, "t7", 1.75)
        assert recs[15] == (15, 105, None, None)  # i%3==0 and i%5==0
        assert recs[16] == (16, 112, "t16", 4.0)
        assert meta["avro.codec"] == b"null"
        assert b'"name":"SensorEvent"' in meta["avro.schema"]
        # 100 frames / 16 per block = 7 blocks, each ends with the sync
        from kstreams_spark.functions.avro_ocf import sync_for

        assert buf.count(sync_for("t")) == 8  # header + 7 blocks

    def test_empty_file_roundtrip(self):
        _, (meta, recs) = self._roundtrip([])
        assert recs == [] and meta["avro.codec"] == b"null"

    def test_bad_magic_and_torn_sync_rejected(self):
        import pytest as _pytest

        from kstreams_spark.functions.avro_binary import (
            decode_sensor_record_at,
        )
        from kstreams_spark.functions.avro_ocf import decode_ocf

        buf, _ = self._roundtrip(self._frames(10))
        with _pytest.raises(ValueError, match="not an Avro"):
            decode_ocf(b"Obj\x02" + buf[4:], decode_sensor_record_at)
        corrupted = buf[:-1] + bytes([buf[-1] ^ 0xFF])  # last sync byte
        with _pytest.raises(ValueError, match="sync marker"):
            decode_ocf(corrupted, decode_sensor_record_at)
        with _pytest.raises(ValueError, match="truncated"):
            decode_ocf(buf[:-8], decode_sensor_record_at)

    def test_unsupported_codec_named(self):
        import pytest as _pytest

        from kstreams_spark.functions.avro_binary import (
            _write_long,
            decode_sensor_record_at,
        )
        from kstreams_spark.functions.avro_ocf import (
            AVRO_MAGIC,
            decode_ocf,
            sync_for,
        )

        out = bytearray(AVRO_MAGIC)
        _write_long(1, out)
        for part in (b"avro.codec", b"deflate"):
            _write_long(len(part), out)
            out += part
        _write_long(0, out)
        out += sync_for("t")
        with _pytest.raises(ValueError, match="deflate"):
            decode_ocf(bytes(out), decode_sensor_record_at)

    def test_negative_count_metadata_block(self):
        """Spec edge: a metadata map block with NEGATIVE count carries a
        byte size after it — stock writers may emit this form."""
        from kstreams_spark.functions.avro_binary import (
            _write_long,
            decode_sensor_record_at,
        )
        from kstreams_spark.functions.avro_ocf import (
            AVRO_MAGIC,
            decode_ocf,
            sync_for,
        )

        out = bytearray(AVRO_MAGIC)
        entries = bytearray()
        for k, v in ((b"avro.codec", b"null"), (b"avro.schema", b"{}")):
            _write_long(len(k), entries)
            entries += k
            _write_long(len(v), entries)
            entries += v
        _write_long(-2, out)
        _write_long(len(entries), out)
        out += entries
        _write_long(0, out)
        out += sync_for("t")
        meta, recs = decode_ocf(bytes(out), decode_sensor_record_at)
        assert meta["avro.codec"] == b"null" and recs == []


def test_ocf_truncated_mid_varint_is_valueerror():
    """The decode contract is ValueError on ANY malformed input — a cut
    inside the metadata map's varints must not leak IndexError."""
    import pytest as _pytest

    from kstreams_spark.functions.avro_binary import (
        decode_sensor_record_at,
        encode_sensor_record,
    )
    from kstreams_spark.functions.avro_ocf import (
        decode_ocf,
        encode_ocf,
        sync_for,
    )

    buf = encode_ocf([encode_sensor_record(1, 2, "t", 0.5)], sync_for("t"))
    for cut in (5, 12, 20, len(buf) - 3):
        with _pytest.raises(ValueError):
            decode_ocf(buf[:cut], decode_sensor_record_at)
