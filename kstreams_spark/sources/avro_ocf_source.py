"""Avro OCF as a Spark 4 Python DataSource — `.avro` files of
SensorEvent records become first-class DataFrames on BOTH halves of the
seam: `spark.read.format("kstreams_avro_ocf").load(dir)` scans a
directory one-partition-per-file (the jsonl source's split rule), and
`df.write.format("kstreams_avro_ocf").save(dir)` publishes one complete
container file per task under the SAME two-phase staged-rename commit
the JSONL writer proved out (JsonlWriter is subclassed — only the
extension and the partition serializer differ, so the
append-collision / orphan-sweep / stale-grace contracts carry over
verbatim).

Scope: the sensor-event record schema the from-spec codec implements
(functions/avro_binary.py) — event_id/user_id/event_type/value with
the reference's declared null unions (BME680.java:41-44). Files written
here are stock-reader-compatible OCF (null codec, real sync markers);
files read here must carry that record schema.

At 100 TB: the reader's parallelism is the file layout (like every
container format — size files toward the 128–256 MB scan-task target),
and the writer's file-per-task matches how bulk Avro exports shard.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from kstreams_spark.sources.jsonl import JsonlWriter, _list_files

SENSOR_SCHEMA_DDL = (
    "event_id bigint, user_id bigint, event_type string, value double"
)


class OcfFilePartition(InputPartition):
    def __init__(self, file_path: str) -> None:
        self.file_path = file_path


class AvroOcfReader(DataSourceReader):
    def __init__(self, schema, options: dict[str, str]) -> None:
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        return [
            OcfFilePartition(f) for f in _list_files(self.path, ".avro")
        ]

    def read(self, partition: OcfFilePartition) -> Iterator[tuple]:
        from kstreams_spark.functions.avro_binary import (
            decode_sensor_record_at,
        )
        from kstreams_spark.functions.avro_ocf import decode_ocf

        with open(partition.file_path, "rb") as fh:
            buf = fh.read()
        _, records = decode_ocf(buf, decode_sensor_record_at)
        yield from records


class AvroOcfWriter(JsonlWriter):
    """The JSONL two-phase commit with an OCF partition serializer:
    each task's rows become ONE complete container file (real metadata
    map, sync markers, multi-block framing)."""

    EXT = ".avro"

    def _serialize_partition(self, iterator, tmp_path: str) -> int:
        from kstreams_spark.functions.avro_binary import (
            encode_sensor_record,
        )
        from kstreams_spark.functions.avro_ocf import encode_ocf, sync_for

        idx = {n: i for i, n in enumerate(self.field_names)}
        frames = [
            encode_sensor_record(
                row[idx["event_id"]],
                row[idx["user_id"]],
                row[idx["event_type"]],
                row[idx["value"]],
            )
            for row in iterator
        ]
        payload = encode_ocf(
            frames, sync_for(os.path.basename(tmp_path)), records_per_block=512
        )
        with open(tmp_path, "wb") as fh:
            fh.write(payload)
        return len(frames)


class AvroOcfDataSource(DataSource):
    """`spark.dataSource.register(AvroOcfDataSource)` then
    read/write with format "kstreams_avro_ocf"."""

    @classmethod
    def name(cls) -> str:
        return "kstreams_avro_ocf"

    def schema(self) -> str:
        return SENSOR_SCHEMA_DDL

    def reader(self, schema) -> AvroOcfReader:
        return AvroOcfReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> AvroOcfWriter:
        names = set(schema.fieldNames())
        want = {"event_id", "user_id", "event_type", "value"}
        if names != want:
            raise ValueError(
                f"kstreams_avro_ocf writes the sensor-event schema {sorted(want)}, "
                f"got {sorted(names)}"
            )
        return AvroOcfWriter(schema, self.options, overwrite)
