"""Custom stateful streaming operator (SURVEY.md §2.2 Processor API ↔
applyInPandasWithState): rising-edge alert suppression.

The reference fires an MQTT alert on EVERY hot reading (BME680.java:
160-161,167-176) — a stream of "still hot" spam. This operator keeps one
boolean per key ("was the last reading above the limit?") and emits an
alert only on the upward crossing — the trucking-app alerting pattern the
reference aspires to (BME680.java:46-47).

State is one tiny row per key, stored in Spark's state store (HDFS- or
RocksDB-backed at scale); the batch twin is operators/event_windows.py::
stateful_alert_suppression (lag window), oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("reading", T.DoubleType()),
        T.StructField("alert", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("was_high", T.BooleanType())])


def make_edge_alert_fn(limit: float = 75.0):
    """Builds the applyInPandasWithState body (closure over the limit)."""

    def fn(
        key: tuple[str, ...],
        pdfs: Iterator[pd.DataFrame],
        state: Any,  # pyspark.sql.streaming.state.GroupState
    ) -> Iterator[pd.DataFrame]:
        (was_high,) = state.get if state.exists else (False,)
        out_rows: list[dict[str, object]] = []
        # Arrow may deliver one key's batch as MULTIPLE chunks in
        # arbitrary chunk order — sorting within each chunk is not event
        # order. Materialize the key's batch and sort once (per-key batch
        # data must fit the worker anyway; same contract as
        # applyInPandas). R9 null guard: garbage casts drop without
        # updating state.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True)
            vals = whole.sort_values("ts")["reading"].dropna()
            if len(vals):
                high = vals > limit
                rising = high & ~high.shift(fill_value=was_high)
                out_rows.extend(
                    {
                        "key": key[0],
                        "reading": float(r),
                        "alert": f"Temperature warning {r:05.2f}",
                    }
                    for r in vals[rising]
                )
                was_high = bool(high.iloc[-1])
        state.update((was_high,))
        if out_rows:
            yield pd.DataFrame(out_rows)

    return fn


def edge_alert_stream(
    keyed_readings: DataFrame, limit: float = 75.0
) -> DataFrame:
    """keyed_readings: (key string, ts timestamp, reading double) stream →
    (key, reading, alert) rows only on upward threshold crossings."""
    return keyed_readings.groupBy("key").applyInPandasWithState(
        make_edge_alert_fn(limit),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_readings", T.LongType()),
        T.StructField("max_reading", T.DoubleType()),
    ]
)

COUNT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def make_timeout_summary_fn(gap_ms: int):
    """applyInPandasWithState body with an EVENT-TIME TIMEOUT — the Kafka
    Streams `punctuate` equivalent (SURVEY.md §2.2 Processor API):
    accumulate per-key state while data flows; when the WATERMARK passes
    last-seen-event + gap, the engine invokes this function once more
    with state.hasTimedOut — we emit the summary and clear the state.
    (Event-time, not processing-time: processing-time timeouts re-arm on
    every batch and never quiesce under processAllAvailable.)"""

    def fn(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        if state.hasTimedOut:
            n, mx = state.get
            state.remove()
            yield pd.DataFrame(
                [{"key": key[0], "n_readings": int(n), "max_reading": float(mx)}]
            )
            return
        n, mx = state.get if state.exists else (0, float("-inf"))
        last_ms = 0
        for pdf in pdfs:
            vals = pdf["reading"].dropna()
            n += int(len(vals))
            if len(vals):
                mx = max(mx, float(vals.max()))
            if len(pdf):
                last_ms = max(
                    last_ms, int(pdf["ts"].max().timestamp() * 1000)
                )
        state.update((n, mx))
        state.setTimeoutTimestamp(last_ms + gap_ms)

    return fn


def make_wallclock_summary_fn(idle_ms: int):
    """ProcessingTimeTimeout twin of make_timeout_summary_fn — Kafka
    Streams' WALL_CLOCK_TIME punctuate (the reference's declared
    growth path, BME680.java:46-47; STREAM_TIME is the event-time
    variant above). Re-arm semantics, stated as the contract the
    event-time docstring only warned about: the timeout arms at (wall
    clock when the arming batch COMMITS) + idle, EVERY batch that
    delivers data for the key re-arms it, and a fire needs a LATER
    microbatch to execute — the engine evaluates timeouts only while a
    batch runs, so an idle stream with no further triggers emits
    nothing and `processAllAvailable()` alone cannot flush it (tests
    sleep past the idle window, then trigger one more batch). That is
    also why the event-time variant, not this one, is the
    deterministic default: wall-clock firing depends on scheduling,
    never on the data."""

    def fn(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        if state.hasTimedOut:
            n, mx = state.get
            state.remove()
            yield pd.DataFrame(
                [{"key": key[0], "n_readings": int(n), "max_reading": float(mx)}]
            )
            return
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            vals = pdf["reading"].dropna()
            n += int(len(vals))
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((n, mx))
        state.setTimeoutDuration(idle_ms)

    return fn


def wallclock_summary_stream(
    keyed_readings: DataFrame, idle: str | int = "2 seconds"
) -> DataFrame:
    """(key, ts, reading) stream → one (key, n_readings, max_reading)
    summary per key once the key has been quiet for `idle` of WALL
    CLOCK — no watermark required (processing-time state timeouts are
    watermark-independent). See make_wallclock_summary_fn for the
    re-arm/fire contract."""
    return keyed_readings.groupBy("key").applyInPandasWithState(
        make_wallclock_summary_fn(duration_ms(idle)),
        outputStructType=SUMMARY_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


_UNIT_MS = {
    "ms": 1,
    "millisecond": 1,
    "second": 1_000,
    "sec": 1_000,
    "minute": 60_000,
    "min": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def duration_ms(d: str | int) -> int:
    """Parse a Spark-style duration ('90 seconds', '1 minute', '500 ms')
    or bare-int milliseconds into milliseconds."""
    if isinstance(d, int):
        return d
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+)\s*", d)
    unit = m.group(2).lower() if m else ""
    if unit.endswith("s") and unit not in _UNIT_MS:
        unit = unit[:-1]
    if not m or unit not in _UNIT_MS:
        raise ValueError(
            f"unparseable duration {d!r}; use e.g. '90 seconds' or int ms"
        )
    return int(m.group(1)) * _UNIT_MS[unit]


def timeout_summary_stream(
    keyed_readings: DataFrame,
    gap: str | int = "1 minute",
    watermark: str = "1 second",
) -> DataFrame:
    """(key, ts, reading) stream → one (key, n_readings, max_reading)
    summary per quiet period: the summary emits when the watermark passes
    the key's last event + gap (requires a watermark on ts)."""
    gap_ms = duration_ms(gap)
    return (
        keyed_readings.withWatermark("ts", watermark)
        .groupBy("key")
        .applyInPandasWithState(
            make_timeout_summary_fn(gap_ms),
            outputStructType=SUMMARY_SCHEMA,
            stateStructType=COUNT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


# --- trailing-window rate-spike monitor -----------------------------------
# Streaming twin of operators/event_windows.py::events_rate_spike (which
# itself is the analytic twin of the reference's R14 periodic ops
# monitor): per event_type, hourly bucket counts arrive (an upstream
# tumbling-window agg or a pre-bucketed feed) and each bucket is flagged
# against the trailing SPIKE_TRAIL buckets' sum held in state — a
# bounded deque per key, the applyInPandasWithState analogue of the
# batch query's ROWS BETWEEN frame.

SPIKE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("bucket", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("n_trail", T.LongType()),
        T.StructField("trail_sum", T.LongType()),
        T.StructField("is_spike", T.LongType()),
    ]
)

# trailing counts as a fixed-width array (index 0 = oldest); -1 = empty
SPIKE_STATE_SCHEMA = T.StructType(
    [T.StructField("trail", T.ArrayType(T.LongType()))]
)


def make_rate_spike_fn(trail: int, spike_x: int):
    """applyInPandasWithState body: per key, fold bucket counts in
    bucket order through a bounded trailing deque."""

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (deque,) = state.get if state.exists else ([],)
        deque = list(deque or [])
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out_rows: list[dict[str, object]] = []
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values("bucket")
            for _, row in whole.iterrows():
                n = int(row["n"])
                n_trail = len(deque)
                trail_sum = sum(deque)
                is_spike = int(
                    n_trail > 0 and n * n_trail > spike_x * trail_sum
                )
                out_rows.append(
                    {
                        "event_type": key[0],
                        "bucket": row["bucket"],
                        "n": n,
                        "n_trail": n_trail,
                        "trail_sum": trail_sum,
                        "is_spike": is_spike,
                    }
                )
                deque.append(n)
                if len(deque) > trail:
                    deque.pop(0)
        state.update(([int(x) for x in deque],))
        if out_rows:
            yield pd.DataFrame(out_rows)

    return fn


def rate_spike_stream(
    bucket_counts: DataFrame, trail: int | None = None, spike_x: int | None = None
) -> DataFrame:
    """(event_type, bucket timestamp, n long) stream of CLOSED bucket
    counts → spike-flagged rows. Buckets must arrive per key in
    non-decreasing bucket order across batches (the upstream
    watermarked tumbling agg emits exactly that); within a batch any
    order is fine — the fold sorts. State per key is ≤ `trail` longs."""
    from kstreams_spark.operators.event_windows import SPIKE_TRAIL, SPIKE_X

    return bucket_counts.groupBy("event_type").applyInPandasWithState(
        make_rate_spike_fn(
            SPIKE_TRAIL if trail is None else trail,
            SPIKE_X if spike_x is None else spike_x,
        ),
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        stateStructType=SPIKE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --- sliding time-difference bands (KS 2.7, streaming twin) ----------------
# Streaming twin of dsl.KGroupedStream.sliding_aggregate (KIP-450): per
# key, each record is emitted with the COUNT/SUM of the same-key records
# whose event time falls in [ts - band, ts] — ties are PEERS (all
# records at one timestamp enter the band before any of them emits,
# matching the batch RANGE frame). State per key is the (ts, value)
# pairs within `band` of the newest timestamp seen — bounded by the
# key's event rate × band, the sliding window's inherent state, and
# exactly what Kafka Streams' sliding-window store retains.

SLIDING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.LongType())),
        T.StructField("floor_us", T.LongType()),
    ]
)


def make_sliding_band_fn(band_s: int):
    """applyInPandasWithState body. Records are processed in event-time
    order within each batch; a record no older than `band` behind the
    key's newest timestamp computes its EXACT band even when it arrives
    late (the qualifying pairs are still in state); an older one emits
    with complete=0 — its band start predates the eviction floor, so
    the count could be short (stated, never silently wrong)."""

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        us = 1_000_000
        band_us = band_s * us
        if state.exists:
            ts_list, vals, floor_us = state.get
            ts_list, vals = list(ts_list or []), list(vals or [])
        else:
            ts_list, vals, floor_us = [], [], None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[dict[str, object]] = []
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values("ts")
            # group equal timestamps: peers enter state together
            for ts_val, grp in whole.groupby("ts", sort=True):
                t_us = int(pd.Timestamp(ts_val).value // 1000)
                for _, row in grp.iterrows():
                    ts_list.append(t_us)
                    vals.append(int(row["value"]))
                lo = t_us - band_us
                n_band = s_band = 0
                for t2, v2 in zip(ts_list, vals):
                    if lo <= t2 <= t_us:
                        n_band += 1
                        s_band += v2
                complete = int(floor_us is None or lo >= floor_us)
                for _, row in grp.iterrows():
                    out.append(
                        {
                            "key": key[0],
                            "ts": ts_val,
                            "value": int(row["value"]),
                            "n_band": n_band,
                            "sum_band": s_band,
                            "complete": complete,
                        }
                    )
            hmax = max(ts_list)
            new_floor = hmax - band_us
            keep = [
                (t2, v2)
                for t2, v2 in zip(ts_list, vals)
                if t2 >= new_floor
            ]
            ts_list = [t for t, _ in keep]
            vals = [v for _, v in keep]
            floor_us = (
                new_floor
                if floor_us is None
                else max(floor_us, new_floor)
            )
        state.update((ts_list, vals, floor_us))
        if out:
            yield pd.DataFrame(out)

    return fn


def sliding_band_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    band_s: int,
) -> DataFrame:
    """(key, ts, value) stream → each record widened with its trailing
    [ts − band_s, ts] same-key band COUNT and SUM (module comment above
    for the peers/lateness contract). Emission is APPEND-ONLY: a record
    is emitted ONCE with the band as of its processing — a later
    within-band arrival computes ITS OWN exact band but does not
    retract already-emitted rows (Kafka Streams' sliding windows emit
    those as window UPDATES; that changelog form is the windowed-
    aggregation family's job, stated). `value_col` must be integral —
    the repo's integer-aggregation doctrine; batch parity with
    dsl.sliding_aggregate is pinned in tests/test_dsl_stateful.py."""
    key_field = events.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField("key", key_field.dataType),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.LongType()),
            T.StructField("n_band", T.LongType()),
            T.StructField("sum_band", T.LongType()),
            T.StructField("complete", T.LongType()),
        ]
    )
    keyed = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("long").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_sliding_band_fn(band_s),
        outputStructType=out_schema,
        stateStructType=SLIDING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
