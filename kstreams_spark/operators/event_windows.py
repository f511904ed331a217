"""Event-time windowed aggregations — batch analogs of the streaming
windows (SURVEY.md §2.2: windowedBy tumbling/hopping/session) over the
`events` table. The same expressions run in Structured Streaming with
``withWatermark`` (see kstreams_spark/streaming/windows.py); registering
the batch form gives the driver a DuckDB-checkable twin.

Scale posture: a windowed agg is a groupBy on (window, key) — shuffle
volume ∝ distinct windows × keys, not input rows (map-side combine). The
sliding window multiplies input by window/slide (here 4×) BEFORE the
combine — at 100 TB pick slide ratios consciously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import dsum
from kstreams_spark.registry import query


@query(
    "window_tumbling_agg",
    oracle="""
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
             AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows × event_type (streaming twin:
    groupBy(window(ts, '1 hour'), event_type) under a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


@query(
    "window_sliding_agg",
    oracle="""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               - unnest(generate_series(0, 3)) * INTERVAL '15 minutes'
               AS window_start,
             value
      FROM events
    )
    SELECT window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM expanded
    GROUP BY window_start
    """,
)
def window_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min (each event lands in 4 windows).
    The oracle expands windows explicitly — same semantics as Spark's
    window(ts, '1 hour', '15 minutes')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "window_session_agg",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL '30 minutes'
                       OR lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def window_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via
    session_window — Spark merges events closer than the gap; session end
    = last event + gap. The oracle sessionizes classically (lag + cumsum),
    which is also the batch fallback pattern pre-Spark-3.2."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "stateful_alert_suppression",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value
      FROM events
    )
    SELECT event_id, user_id, ts, value
    FROM seq
    WHERE value > 300.0 AND (prev_value IS NULL OR prev_value <= 300.0)
    """,
)
def stateful_alert_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rising-edge alerting: fire only when a reading crosses the threshold
    upward — suppressing the repeated "still high" alerts the reference
    would emit per record (BME680.java:160-161 fires on every hot reading).
    Batch form = lag window; streaming form = applyInPandasWithState
    (kstreams_spark/streaming/stateful.py) keeping last value per key."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .filter(
            (F.col("value") > 300.0)
            & (F.col("prev_value").isNull() | (F.col("prev_value") <= 300.0))
        )
        .select("event_id", "user_id", "ts", "value")
    )


@query(
    "stream_dedup_first_per_key",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           ts AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the first occurrence — the batch twin of
    streaming dropDuplicates(['user_id','event_type']) within a watermark."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


# Spike detection: a bucket is a spike when its count exceeds SPIKE_X ×
# the trailing-window average — the analytic twin of the reference's
# periodic ops monitor (R14, BME680.java's scheduled status print): the
# monitor WATCHES rates, this query FLAGS the anomalous ones. Integer
# cross-multiply (n · window > SPIKE_X · trailing_sum) — no division.
SPIKE_TRAIL = 6  # trailing buckets (preceding, excluding current)
SPIKE_X = 3


@query(
    "events_rate_spike",
    oracle=f"""
    WITH buckets AS (
      SELECT event_type,
             CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    trailed AS (
      SELECT event_type, bucket, n,
             COUNT(n) OVER w AS n_trail,
             COALESCE(SUM(n) OVER w, 0) AS trail_sum
      FROM buckets
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN {SPIKE_TRAIL} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket, n,
           n_trail::BIGINT AS n_trail,
           trail_sum::BIGINT AS trail_sum,
           CASE WHEN n_trail > 0
                 AND n * n_trail > {SPIKE_X} * trail_sum
                THEN 1 ELSE 0 END AS is_spike
    FROM trailed
    """,
)
def events_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly event counts flagged against the trailing
    {SPIKE_TRAIL}-bucket average: spike when n > {SPIKE_X}× the trailing
    mean (integer cross-multiply; buckets with no history never flag).
    ONE shuffle (the bucket agg) + one partitioned window over the tiny
    bucket table — the window input is |types|·|hours| rows, not events.
    Streaming twin: the same flag over windowed counts with a watermark,
    state bounded by SPIKE_TRAIL buckets per type."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-SPIKE_TRAIL, -1)
    )
    trailed = buckets.select(
        "event_type",
        "bucket",
        "n",
        F.count("n").over(w).cast("long").alias("n_trail"),
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("trail_sum"),
    )
    return trailed.select(
        "event_type",
        "bucket",
        "n",
        "n_trail",
        "trail_sum",
        F.when(
            (F.col("n_trail") > 0)
            & (F.col("n") * F.col("n_trail") > SPIKE_X * F.col("trail_sum")),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_spike"),
    )
