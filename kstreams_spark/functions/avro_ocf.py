"""Avro Object Container File (OCF) layer, from the public Avro 1.12
spec ("Object Container Files"): magic `Obj\\x01`, a file-metadata map
carrying `avro.schema` (the writer schema JSON) and `avro.codec`, a
16-byte sync marker, then data blocks of (record count, serialized
byte length, records, sync marker). The reference declares Avro as its
growth path ("we will convert to avro and then process with schema",
BME680.java:41-44); `functions/avro_binary.py` covers the record
encoding — this module covers the FILE format those records ship in,
so a corpus written here is readable by any stock Avro reader and
vice versa (null codec).

Decoder scope: null codec only (deflate would be feasible via stdlib
zlib but stock writers default to null; raise names the codec), strict
sync-marker verification per block (a torn or mis-appended file fails
loudly, not silently short), and spec-complete metadata map reading
(negative block counts with byte sizes included, though this writer
emits the common positive form).
"""

from __future__ import annotations

import hashlib

from kstreams_spark.functions.avro_binary import _read_long, _write_long

AVRO_MAGIC = b"Obj\x01"
SYNC_LEN = 16

SENSOR_SCHEMA_JSON = (
    '{"type":"record","name":"SensorEvent","fields":['
    '{"name":"event_id","type":"long"},'
    '{"name":"user_id","type":"long"},'
    '{"name":"event_type","type":["null","string"]},'
    '{"name":"value","type":["null","double"]}]}'
)


def sync_for(key: str) -> bytes:
    """Deterministic 16-byte sync marker (md5 digest of the file key) —
    fixtures need replayable bytes; a production writer draws random."""
    return hashlib.md5(key.encode("utf-8")).digest()


def _write_bytes(raw: bytes, out: bytearray) -> None:
    _write_long(len(raw), out)
    out += raw


def encode_ocf(
    records: list[bytes],
    sync: bytes,
    schema_json: str = SENSOR_SCHEMA_JSON,
    records_per_block: int = 40,
) -> bytes:
    """Pre-encoded Avro record frames → one complete OCF file (null
    codec), multiple data blocks so block iteration is exercised."""
    if len(sync) != SYNC_LEN:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(AVRO_MAGIC)
    meta = {"avro.schema": schema_json, "avro.codec": "null"}
    _write_long(len(meta), out)
    for k in sorted(meta):
        _write_bytes(k.encode("utf-8"), out)
        _write_bytes(meta[k].encode("utf-8"), out)
    _write_long(0, out)  # metadata map terminator
    out += sync
    for i in range(0, len(records), records_per_block):
        chunk = records[i : i + records_per_block]
        payload = b"".join(chunk)
        _write_long(len(chunk), out)
        _write_long(len(payload), out)
        out += payload
        out += sync
    return bytes(out)


def decode_ocf(buf: bytes, read_record):
    """One OCF file → (metadata dict, list of decoded records).
    `read_record(buf, pos) -> (record, new_pos)` supplies the record
    decoding (records are not self-delimiting in Avro). Verifies magic,
    per-block sync markers, and block byte counts; ValueError on any
    mismatch or unsupported codec."""
    if buf[:4] != AVRO_MAGIC:
        raise ValueError("not an Avro object container file")
    try:
        return _decode_ocf_body(buf, read_record)
    except IndexError as e:
        # _read_long walks byte-by-byte: a file cut mid-varint (or mid
        # metadata entry) surfaces as IndexError — the contract is
        # ValueError on ANY malformed input, so callers can quarantine
        raise ValueError("truncated object container file") from e


def _decode_ocf_body(buf: bytes, read_record):
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count → block byte size follows
            n = -n
            _, pos = _read_long(buf, pos)
        for _ in range(n):
            klen, pos = _read_long(buf, pos)
            key = buf[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _read_long(buf, pos)
            meta[key] = buf[pos : pos + vlen]
            pos += vlen
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported OCF codec {codec!r}; scope is null")
    sync = buf[pos : pos + SYNC_LEN]
    if len(sync) != SYNC_LEN:
        raise ValueError("truncated header sync marker")
    pos += SYNC_LEN
    records = []
    while pos < len(buf):
        count, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        end = pos + size
        if end + SYNC_LEN > len(buf):
            raise ValueError("truncated data block")
        for _ in range(count):
            rec, pos = read_record(buf, pos)
            records.append(rec)
        if pos != end:
            raise ValueError(
                f"block decoded {pos - (end - size)} bytes, declared {size}"
            )
        if buf[pos : pos + SYNC_LEN] != sync:
            raise ValueError("sync marker mismatch (torn or corrupt block)")
        pos += SYNC_LEN
    return meta, records
