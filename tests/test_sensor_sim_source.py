"""The simulated live sensor source (sources/sensor_sim.py): a real
streaming Python DataSource driving the REFERENCE topology end-to-end in
this sandbox — the closest runnable stand-in for the env-gated Kafka
path — plus determinism and replay contracts."""

from __future__ import annotations

from kstreams_spark.sources.sensor_sim import (
    SensorSimDataSource,
    SensorSimStreamReader,
    sim_record,
)
from kstreams_spark.streaming.topology import ReferenceTopology


def _stream(spark, **opts):
    spark.dataSource.register(SensorSimDataSource)
    r = spark.readStream.format("kstreams_sensor_sim")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_stream_delivers_deterministic_records(spark, tmp_path):
    q = (
        _stream(spark, max_records=60, batch_size=25)
        .writeStream.format("memory")
        .queryName("sensor_sim_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sensor_sim_out").collect()
    assert len(rows) == 60
    got = {(r.key, r.value) for r in rows}
    assert got == {sim_record(i) for i in range(60)}
    # every input class present: JSON, scalar, garbage, NULL
    vals = [r.value for r in rows]
    assert any(v and v.startswith("{") for v in vals)
    assert any(v and v.replace(".", "").isdigit() for v in vals)
    assert any(v and v.startswith("not-a-reading") for v in vals)
    assert any(v is None for v in vals)


def test_replay_slice_is_bit_identical():
    r = SensorSimStreamReader({})
    batch, off = r.read({"index": 10})
    replay = r.readBetweenOffsets({"index": 10}, off)
    assert list(batch) == list(replay)


def test_reference_topology_runs_live_on_simulated_source(spark, tmp_path):
    """R1+R12 end-to-end with a LIVE source: the same topology that
    would consume Kafka consumes the simulated feed — alerts carry the
    reference's format string for exactly the >75 °F readings, and every
    record (garbage and NULLs included) is forwarded unchanged."""
    alerts: list[str] = []
    forwarded: list[tuple] = []
    topo = ReferenceTopology(
        alert_sink=alerts.extend,
        small_alerts=True,
        forward_sink=lambda df: forwarded.extend(
            (r.key, r.value) for r in df.select("key", "value").collect()
        ),
    )
    q = topo.start(_stream(spark, max_records=80, batch_size=30))
    q.processAllAvailable()
    q.stop()

    assert len(forwarded) == 80
    assert set(forwarded) == {sim_record(i) for i in range(80)}

    # alert oracle: replay the generator, apply the reference rule
    import json

    expect = []
    for i in range(80):
        _, v = sim_record(i)
        if v is None or v.startswith("not-a-reading"):
            continue
        t = float(json.loads(v)["bme680_tempf"]) if v.startswith("{") else float(v)
        if t > 75.0:
            expect.append(f"Temperature warning {t:05.2f}")
    assert sorted(alerts) == sorted(expect)
    assert expect  # the mix really exercises the alert branch
    assert topo.batches_seen >= 3  # 80 records / 30 per batch → ≥3 batches
