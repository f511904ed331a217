"""Oracle-checked queries written THROUGH the fluent DSL facade
(kstreams_spark/dsl.py) — the facade's semantics go through the same
DuckDB hash gate as every hand-written operator, so a regression in any
verb mapping (filter/mapValues/selectKey/branch/groupByKey/windowedBy)
fails the driver's value-hash, not just a unit test. The DSL is thin by
design (every verb a documented Spark construct), and these queries are
the standing proof that thin stayed thin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.dsl import StreamsBuilder
from kstreams_spark.io import load_table
from kstreams_spark.operators._util import dsum
from kstreams_spark.registry import query


@query(
    "dsl_topology_hourly_counts",
    oracle="""
    SELECT event_type AS etype,
           CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
             AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE value > 10
    GROUP BY 1, 2
    """,
)
def dsl_topology_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A five-verb DSL topology — filter → selectKey → groupByKey →
    windowedBy(1h) → aggregate — against a plain-SQL oracle: the Kafka
    Streams user's `stream.filter(..).selectKey(..).groupByKey()
    .windowedBy(..).aggregate(..)` spelled in kstreams_spark.dsl and
    hash-certified. The plan is exactly window_tumbling_agg's (one
    partial+final aggregate around one Exchange — the facade adds no
    operator), and the same chain attaches to a readStream source
    unchanged (tests/test_dsl.py's streaming rebuild)."""
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    table = (
        b.stream(ev, key="user_id")
        .filter(F.col("value") > 10)
        .select_key(F.col("event_type"), name="etype")
        .group_by_key()
        .windowed_by("ts", "1 hour")
        .aggregate(
            n=F.count(F.lit(1)),
            sum_value=dsum("value"),
        )
    )
    return table.df.select(
        "etype",
        F.col("window.start").alias("window_start"),
        "n",
        "sum_value",
    )


@query(
    "dsl_ktable_groupby_reaggregate",
    oracle="""
    WITH latest AS (
      SELECT * FROM (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders)
      WHERE rn = 1)
    SELECT o_orderpriority AS prio,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS latest_revenue
    FROM latest GROUP BY 1
    """,
)
def dsl_ktable_groupby_reaggregate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KTable.groupBy().aggregate() — the KGroupedTable verb family
    (r13, the last unmapped Kafka Streams 2.0 DSL family; SURVEY §2.2,
    pom.xml:41-45 ceiling): materialize a table of each customer's
    LATEST order (latest-per-key with a unique tie-break — the KTable),
    re-key it by order priority, and re-aggregate count + revenue. On
    the snapshot relation the adder/subtractor contract holds by
    construction (dsl.KTable.group_by docstring); the incremental
    changelog twin is LakeMaterializedAggregate's sign fold with this
    grouping as a derived group expression
    (tests/test_materialized.py::test_derived_group_reaggregation).
    Plan: one latest-per-key window shuffle + one re-key aggregation
    exchange — exactly the two repartition topics Kafka Streams would
    create."""
    orders = load_table(spark, sf_dir, "orders")
    b = StreamsBuilder()
    table = b.table(
        orders,
        key="o_custkey",
        order_by=F.struct("o_orderdate", "o_orderkey"),
    )
    out = table.group_by("o_orderpriority", name="prio").aggregate(
        n_customers=F.count(F.lit(1)),
        latest_revenue=dsum("o_totalprice"),
    )
    return out.df


@query(
    "dsl_ktable_fk_join",
    oracle="""
    WITH cust AS (  -- thinned dimension: every 3rd key dangles
      SELECT c_custkey, c_mktsegment
      FROM customer WHERE c_custkey % 3 <> 0
    )
    SELECT COALESCE(c_mktsegment, 'none') AS segment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM orders LEFT JOIN cust ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def dsl_ktable_fk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable FOREIGN-KEY join (r14 stretch — Kafka Streams 2.4's
    KTable.join(other, foreignKeyExtractor), KIP-213; one verb past
    the SURVEY §2.2 ceiling): the orders table (keyed o_orderkey,
    carrying FK o_custkey) left-joins a THINNED customer dimension
    (every third key removed) so dangling FKs are live — a join that
    drops them, or re-keys the result off the left primary key,
    moves the 'none' group's sums. Result re-aggregated per segment
    for a compact hash. Plan: one equi-join (AQE broadcasts the dim
    side) + one aggregation exchange — versus Kafka Streams' two
    internal topics (subscription + response) for the same verb."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 3 != 0
    )
    b = StreamsBuilder()
    left = b.table(orders, key="o_orderkey", order_by="o_orderkey")
    dim = b.table(
        cust.select("c_custkey", "c_mktsegment"),
        key="c_custkey",
        order_by="c_custkey",
    )
    enriched = left.join_foreign(dim, foreign_key="o_custkey", how="left")
    return (
        enriched.df.withColumn(
            "segment", F.coalesce(F.col("c_mktsegment"), F.lit("none"))
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "dsl_cogroup_user_activity",
    oracle="""
    WITH clicks AS (
      SELECT user_id, COUNT(*) AS n_clicks,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    buys AS (
      SELECT user_id, COUNT(*) AS n_purchases,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT COALESCE(c.user_id, b.user_id) AS user_id,
           COALESCE(n_clicks, 0) AS n_clicks,
           click_value,
           COALESCE(n_purchases, 0) AS n_purchases,
           purchase_value
    FROM clicks c FULL OUTER JOIN buys b ON c.user_id = b.user_id
    """,
)
def dsl_cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUP (r14 — Kafka Streams 2.5's KGroupedStream.cogroup,
    KIP-150; with the FK join the second verb past the §2.2 ceiling):
    the click stream and the purchase stream — two differently-shaped
    streams sharing a key domain — fold their OWN aggregators into one
    per-user table. Keys present in only one stream keep the other
    stream's aggregation-over-nothing (COUNT pinned to 0 via fill,
    SUM stays NULL — the KS initializer semantics), which the oracle's
    FULL OUTER JOIN + COALESCE replays; a cogroup that inner-joins the
    streams, or cross-applies an aggregator, moves row counts or sums.
    Plan: one aggregation exchange per stream + one key-aligned join —
    versus the single shared RocksDB store KS funnels both streams
    through."""
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    clicks = b.stream(
        ev.filter(F.col("event_type") == "click"), key="user_id"
    ).group_by_key()
    buys = b.stream(
        ev.filter(F.col("event_type") == "purchase"), key="user_id"
    ).group_by_key()
    table = (
        clicks.cogroup(
            n_clicks=F.count(F.lit(1)),
            click_value=dsum("value"),
        )
        .cogroup(
            buys,
            n_purchases=F.count(F.lit(1)),
            purchase_value=dsum("value"),
        )
        .aggregate(fill={"n_clicks": 0, "n_purchases": 0})
    )
    return table.df


@query(
    "dsl_sliding_time_difference",
    oracle="""
    WITH slid AS (
      SELECT user_id, event_type,
             COUNT(*) OVER w AS n_band,
             SUM(CAST(value AS DECIMAL(18,6))) OVER w AS v_band
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(n_band)::BIGINT AS band_events,
           CAST(SUM(v_band) AS DOUBLE) AS band_value,
           CAST(MAX(n_band) AS BIGINT) AS max_band
    FROM slid GROUP BY event_type
    """,
)
def dsl_sliding_time_difference(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KS 2.7 SlidingWindows.ofTimeDifference through the DSL facade
    (r15 — KIP-450, the third verb past the 2.0 ceiling after the FK
    join and cogroup): for every event, the per-user trailing
    10-minute band's COUNT and DECIMAL SUM — the record-anchored
    window tumbling/hopping cannot express — then a per-event_type
    fingerprint (events, summed band sizes, summed band values, max
    band). RANGE frames make equal timestamps PEERS, so the per-record
    bands — and therefore every sum — are deterministic under any
    partitioning (the drift-gate property); both engines implement the
    identical SQL-standard frame.

    Shuffle budget: ONE user_id exchange serves the window, then a
    ≤|event_type| aggregate."""
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    slid = (
        b.stream(ev, key="user_id")
        .group_by_key()
        .sliding_aggregate(
            "ts",
            "10 minutes",
            n_band="COUNT(*)",
            v_band="SUM(CAST(value AS DECIMAL(18,6)))",
        )
    )
    return slid.df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("n_band").cast("bigint").alias("band_events"),
        F.sum("v_band").cast("double").alias("band_value"),
        F.max("n_band").cast("bigint").alias("max_band"),
    )


@query(
    "dsl_stream_versioned_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id
      FROM events WHERE event_type IN ('error', 'click')
    ), filled AS (
      SELECT *,
             last_value(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_err, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS click_id_asof
      FROM tagged
    )
    SELECT event_id, user_id, click_id_asof
    FROM filled WHERE is_err = 1 AND click_id_asof IS NOT NULL
    """,
)
def dsl_stream_versioned_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KS 3.5 versioned-KTable join through the DSL facade (r15,
    KIP-914): error events join the click-version history AS OF each
    error's event time — the newest click by the same user at or
    before it, inner form (errors before any click drop, the KS join
    rule). The facade's union+LOCF as-of shape is hash-certified
    against the windowed SQL the batch operator family uses; the
    version tie-break (event_id) makes same-timestamp versions
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    stream = b.stream(
        ev.filter(F.col("event_type") == "error").select(
            "user_id", "ts", "event_id"
        ),
        key="user_id",
    )
    versions = b.table_versioned(
        ev.filter(F.col("event_type") == "click").select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.col("event_id").alias("version_id"),
            F.col("event_id").alias("click_id_asof"),
        ),
        key="user_id",
    )
    out = stream.join_versioned_table(
        versions,
        ts_col="ts",
        valid_from="valid_from",
        version_order="version_id",
        how="inner",
    )
    return out.df.select("event_id", "user_id", "click_id_asof")
