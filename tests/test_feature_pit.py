"""composite_feature_snapshot_pit: the leakage contract. Every
commercial feature on a session row derives ONLY from orders strictly
before that session's start — an order at or after session start must
contribute nothing (VERDICT r8 task 7). Planted fixture: per user, one
order well before the session, one at EXACTLY the session-start second
(the strict-< tie), one after; plus an order-free user."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kstreams_spark import registry

registry.load_all()

UTC = dt.timezone.utc
# session: three events within the 30-min gap -> one session per user
SESSION_START = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=UTC)
START_S = int(SESSION_START.timestamp())


@pytest.fixture(scope="module")
def pit_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pit_sf")
    events = []
    for uid in (1, 2):  # user 2 = no orders at all
        for i, off in enumerate((0, 60, 120)):
            events.append(
                (
                    uid * 10 + i,
                    SESSION_START + dt.timedelta(seconds=off),
                    uid,
                    "view" if i else "purchase",
                    1.0,
                    "{}",
                )
            )
    spark.createDataFrame(
        events, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "events.parquet"))

    orders = [
        # (orderkey, custkey, status, totalprice, orderdate, priority)
        (1, 1, "F", 100.25, SESSION_START - dt.timedelta(days=2), "1-URGENT"),
        (2, 1, "F", 50.50, SESSION_START, "1-URGENT"),  # the strict-< tie
        (3, 1, "O", 999.99, SESSION_START + dt.timedelta(days=1), "1-URGENT"),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "orders.parquet"))
    return str(root)


def test_pit_features_exclude_orders_at_or_after_session_start(
    spark, pit_dir
):
    rows = {
        r.user_id: r
        for r in registry.QUERIES["composite_feature_snapshot_pit"](
            spark, pit_dir
        ).collect()
    }
    u1 = rows[1]
    # only order 1 (2 days prior) is visible; the same-second order 2 and
    # the next-day order 3 must contribute NOTHING
    assert u1.start_s == START_S
    assert u1.f_orders_pit == 1
    assert u1.m_cents_pit == 10025  # 100.25 only — not 100.25+50.50
    assert u1.r_days_pit == 2
    assert u1.has_order_history == 1
    assert u1.converted == 1  # the planted purchase event

    u2 = rows[2]  # no order history -> explicit zeros, flag 0
    assert (
        u2.f_orders_pit == 0
        and u2.m_cents_pit == 0
        and u2.r_days_pit == 0
        and u2.has_order_history == 0
    )


def test_pit_matches_naive_oracle_on_planted_fixture(spark, pit_dir):
    """The engine's union+LOCF rewrite equals the naive theta-join
    oracle on the planted edge fixture too (DuckDB replays the same
    parquet)."""
    import duckdb

    from oracle_harness import assert_parity

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{pit_dir}/{t}.parquet/*.parquet'"
        )
    sdf = registry.QUERIES["composite_feature_snapshot_pit"](
        spark, pit_dir
    ).toPandas()
    odf = con.execute(
        registry.ORACLES["composite_feature_snapshot_pit"]
    ).fetchdf()
    assert_parity(sdf, odf, "composite_feature_snapshot_pit")
