"""Simulated live sensor source — a Spark 4 STREAMING Python DataSource
(`simpleStreamReader`) that emits the reference pipeline's exact wire
shape: (key string, value string) records mixing JSON readings, bare
scalars, and garbage (the R4/R5/R7 input classes of BME680.java:152).

Why it exists: the reference's real source is a Kafka topic and the
spark-sql-kafka jar is not in this sandbox (sources/streams.py documents
the gated path). This source gives the SAME topology a genuinely LIVE
streaming input — offsets, microbatches, replay — with zero external
processes, so `ReferenceTopology` runs end-to-end here (pinned in
tests/test_sensor_sim_source.py) and a deployment swaps `.format(
"kstreams_sensor_sim")` for `.format("kafka")` with no other change.

Exactly-once contract: offsets are a monotone record index; `read`
advances it deterministically and `readBetweenOffsets` regenerates any
committed slice bit-for-bit (records are a pure function of their
index), so checkpoint recovery replays identical microbatches — the
same property a replayable log gives Kafka's reader.

`max_records` caps the stream (then `read` stops advancing) so
processAllAvailable terminates in tests; a live deployment would leave
it unbounded like any feed.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

BATCH_SIZE = 20
MAX_RECORDS = 100


def sim_record(i: int) -> tuple[str, str | None]:
    """Deterministic record i — the reference's input mix: JSON reading /
    bare scalar / garbage / NULL, temperatures 60.0–99.9 °F so both
    alert (>75) and pass branches carry volume."""
    t = 60.0 + (i * 7919 % 400) / 10.0
    if i % 17 == 13:
        return (f"k{i}", None)  # R9 null guard class
    if i % 10 == 7:
        return (f"k{i}", f"not-a-reading-{i}")  # R7 NULL-on-garbage class
    if i % 3 == 0:
        return (f"k{i}", f'{{"bme680_tempf": "{t:.2f}", "uuid": "sim-{i}"}}')
    return (f"k{i}", f"{t:.2f}")  # R5 bare-scalar class


class SensorSimStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict[str, str]) -> None:
        self.batch_size = int(options.get("batch_size", str(BATCH_SIZE)))
        self.max_records = int(options.get("max_records", str(MAX_RECORDS)))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        i0 = start["index"]
        i1 = min(i0 + self.batch_size, self.max_records)
        return iter([sim_record(i) for i in range(i0, i1)]), {"index": i1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # recovery replay: pure function of the offset range
        return iter(
            [sim_record(i) for i in range(start["index"], end["index"])]
        )


class SensorSimDataSource(DataSource):
    """`spark.dataSource.register(SensorSimDataSource)` then
    `spark.readStream.format("kstreams_sensor_sim").load()`."""

    @classmethod
    def name(cls) -> str:
        return "kstreams_sensor_sim"

    def schema(self) -> str:
        # Kafka-after-string-serdes shape (sources/streams.py)
        return "key string, value string"

    def simpleStreamReader(self, schema) -> SensorSimStreamReader:
        return SensorSimStreamReader(self.options)
