"""StreamingOhlcRollup: incremental continuous-aggregate maintenance
must equal the batch events_ohlc_daily under ANY microbatch split, and
its epoch-keyed partials must make replay a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import QUERIES, load_all
from kstreams_spark.streaming.rollup import StreamingOhlcRollup

load_all()

SF = "/root/testdata/sf0.001"


def _batch_bars(spark):
    return {
        (r.event_type, r.day): (r.open, r.high, r.low, r.close, r.n_events)
        for r in QUERIES["events_ohlc_daily"](spark, SF).collect()
    }


def _stream_bars(roll, spark):
    return {
        (r.event_type, r.day): (r.open, r.high, r.low, r.close, r.n_events)
        for r in roll.bars(spark).collect()
    }


def test_single_batch_matches_batch_query(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    roll = StreamingOhlcRollup(str(tmp_path / "bars"))
    roll.process_batch(ev, 0)
    assert _stream_bars(roll, spark) == _batch_bars(spark)


def test_cross_batch_merge_matches_batch_query(spark, tmp_path):
    """Split WITHIN days (event_id parity) so every bar's open/close
    election must merge across epochs — the semigroup path, not the
    disjoint-keys shortcut."""
    ev = load_table(spark, SF, "events")
    roll = StreamingOhlcRollup(str(tmp_path / "bars"))
    roll.process_batch(ev.filter(F.col("event_id") % 2 == 0), 0)
    roll.process_batch(ev.filter(F.col("event_id") % 2 == 1), 1)
    assert _stream_bars(roll, spark) == _batch_bars(spark)


def test_replayed_epoch_is_noop(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    roll = StreamingOhlcRollup(str(tmp_path / "bars"))
    half = ev.filter(F.col("event_id") % 2 == 0)
    roll.process_batch(half, 0)
    before = _stream_bars(roll, spark)
    roll.process_batch(half, 0)  # crash-replay of a committed epoch
    roll.process_batch(half.limit(3), 0)  # even a DIFFERENT replay body
    assert _stream_bars(roll, spark) == before


def test_attach_drives_rollup_through_real_stream(spark, tmp_path):
    """The foreachBatch wiring end-to-end: a rate-limited file stream
    (one parquet file per microbatch) must land the same bars as the
    batch query."""
    import glob
    import os
    import shutil

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # two plain files under src → two microbatches at maxFilesPerTrigger=1
    for name, half in (("a", 0), ("b", 1)):
        staging = str(tmp_path / f"stage_{name}")
        ev.filter(F.col("event_id") % 2 == half).coalesce(1).write.parquet(
            staging
        )
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        shutil.move(part, f"{src}/{name}.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    roll = StreamingOhlcRollup(str(tmp_path / "bars"))
    q = roll.attach(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert _stream_bars(roll, spark) == _batch_bars(spark)


def _batch_twap(spark):
    return {
        (r.event_type, r.day): (r.twa, r.n_holds, r.covered_s)
        for r in QUERIES["events_time_weighted_avg"](spark, SF).collect()
    }


def _stream_twap(roll, spark):
    return {
        (r.event_type, r.day): (r.twa, r.n_holds, r.covered_s)
        for r in roll.bars(spark).collect()
    }


def test_twap_time_split_matches_batch(spark, tmp_path):
    """TWAP's bridge merge: epochs split at a TIME boundary (the
    continuous-aggregate contract) must reproduce the batch query
    exactly, including the cross-boundary LOCF hold weights."""
    from kstreams_spark.streaming.rollup import StreamingTwapRollup

    ev = load_table(spark, SF, "events")
    mid = ev.agg(F.percentile_approx("ts", 0.5).alias("m")).first().m
    roll = StreamingTwapRollup(str(tmp_path / "twap"))
    roll.process_batch(ev.filter(F.col("ts") <= mid), 0)
    roll.process_batch(ev.filter(F.col("ts") > mid), 1)
    assert _stream_twap(roll, spark) == _batch_twap(spark)


def test_twap_degenerate_one_second_day_matches_batch(spark, tmp_path):
    """Stream/batch parity on the degenerate group the dt>0 filter used
    to drop (ADVICE r7): a day whose >=2 events all share one second is
    emitted by the batch twin (twa NULL, covered_s 0) — bars() must
    retain it too, keyed on n_rows >= 2 not dt > 0."""
    import datetime as _dt
    import os

    from kstreams_spark.streaming.rollup import StreamingTwapRollup

    rows = [
        # degenerate day: 3 events, one shared second
        (1, _dt.datetime(2026, 1, 1, 12, 0, 0), 1, "gauge", 5.0, "{}"),
        (2, _dt.datetime(2026, 1, 1, 12, 0, 0), 1, "gauge", 6.0, "{}"),
        (3, _dt.datetime(2026, 1, 1, 12, 0, 0), 1, "gauge", 7.0, "{}"),
        # normal day for contrast
        (4, _dt.datetime(2026, 1, 2, 12, 0, 0), 1, "gauge", 1.0, "{}"),
        (5, _dt.datetime(2026, 1, 2, 12, 0, 10), 1, "gauge", 3.0, "{}"),
        # singleton day: emitted by NEITHER side
        (6, _dt.datetime(2026, 1, 3, 12, 0, 0), 1, "gauge", 9.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "sf_tiny")
    os.makedirs(sf_dir)
    ev.coalesce(1).write.parquet(sf_dir + "/events.parquet")

    want = {
        (r.event_type, r.day): (r.twa, r.n_holds, r.covered_s)
        for r in QUERIES["events_time_weighted_avg"](spark, sf_dir).collect()
    }
    assert len(want) == 2  # degenerate + normal day, no singleton
    deg = want[("gauge", _dt.datetime(2026, 1, 1))]
    assert deg[0] is None and deg[2] == 0

    from kstreams_spark.io import load_table

    loaded = load_table(spark, sf_dir, "events")
    roll = StreamingTwapRollup(str(tmp_path / "twap"))
    roll.process_batch(loaded.filter(F.col("event_id") <= 2), 0)
    roll.process_batch(loaded.filter(F.col("event_id") > 2), 1)
    assert _stream_twap(roll, spark) == want


def test_twap_single_batch_and_replay(spark, tmp_path):
    from kstreams_spark.streaming.rollup import StreamingTwapRollup

    ev = load_table(spark, SF, "events")
    roll = StreamingTwapRollup(str(tmp_path / "twap"))
    roll.process_batch(ev, 0)
    want = _batch_twap(spark)
    assert _stream_twap(roll, spark) == want
    roll.process_batch(ev.limit(5), 0)  # replay with a different body
    assert _stream_twap(roll, spark) == want
