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


def test_twap_single_batch_and_replay(spark, tmp_path):
    from kstreams_spark.streaming.rollup import StreamingTwapRollup

    ev = load_table(spark, SF, "events")
    roll = StreamingTwapRollup(str(tmp_path / "twap"))
    roll.process_batch(ev, 0)
    want = _batch_twap(spark)
    assert _stream_twap(roll, spark) == want
    roll.process_batch(ev.limit(5), 0)  # replay with a different body
    assert _stream_twap(roll, spark) == want
