"""kstreams_spark/dsl.py: the fluent Kafka-Streams-style facade. Every
verb chain is asserted ROW-EQUAL against the hand-written DataFrame
pipeline it claims to map to (the facade must add zero semantics), the
plan stays what the direct pipeline plans (broadcast enrich stays a
BroadcastHashJoin), and the reference topology rebuilt through the DSL
produces the exact alert/forward outputs of the dedicated
ReferenceTopology — the 'a reference user can switch' proof, in both
batch and streaming mode from one topology definition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from kstreams_spark.dsl import StreamsBuilder
from kstreams_spark.functions.sensor import (
    TEMPERATURE_LIMIT,
    dual_format_reading,
    temperature_alerts,
)
from kstreams_spark.io import load_table


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stateless_chain_equals_direct_pipeline(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    got = (
        b.stream(ev, key="user_id")
        .filter(F.col("value") > 10)
        .map_values(v2=F.col("value") * 2, tag=F.upper("event_type"))
        .group_by_key()
        .count()
    )
    want = (
        ev.filter(F.col("value") > 10)
        .withColumn("v2", F.col("value") * 2)
        .withColumn("tag", F.upper("event_type"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    assert _rows(got.df, "user_id", "count") == _rows(want, "user_id", "count")


def test_branch_is_first_match_partition(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    # overlapping predicates: value>50 ⊂ value>10 — first-match means
    # branch 2 must NOT contain any value>50 row
    hi, mid, rest = b.stream(ev, key="user_id").branch(
        F.col("value") > 50, F.col("value") > 10, F.lit(True)
    )
    n = ev.count()
    n_hi, n_mid, n_rest = hi.df.count(), mid.df.count(), rest.df.count()
    assert n_hi + n_mid + n_rest == n, "branches must partition the stream"
    assert mid.df.filter(F.col("value") > 50).count() == 0
    assert rest.df.filter(F.col("value") > 10).count() == 0
    assert n_hi == ev.filter(F.col("value") > 50).count()


def test_windowed_count_equals_direct_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    got = (
        b.stream(ev, key="event_type")
        .group_by_key()
        .windowed_by("ts", "1 hour")
        .count()
    )
    want = ev.groupBy("event_type", F.window("ts", "1 hour")).agg(
        F.count(F.lit(1)).alias("count")
    )
    g = got.df.select("event_type", F.col("window.start"), "count")
    w = want.select("event_type", F.col("window.start"), "count")
    assert _rows(g, "event_type", "start", "count") == _rows(
        w, "event_type", "start", "count"
    )


def test_rekey_merge_flatmap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    s = b.stream(ev, key="user_id")
    rekeyed = s.select_key(F.col("event_type"), name="etype")
    assert rekeyed.key == "etype"
    counts = rekeyed.group_by_key().count()
    want = ev.groupBy(F.col("event_type").alias("etype")).agg(
        F.count(F.lit(1)).alias("count")
    )
    assert _rows(counts.df, "etype", "count") == _rows(want, "etype", "count")

    a, br = s.branch(F.col("value") > 50, F.lit(True))
    merged = a.merge(br)
    assert merged.df.count() == ev.count()

    fm = s.flat_map_values(
        F.split(F.col("event_type"), "_"), name="word"
    )
    want_n = ev.select(F.explode(F.split("event_type", "_"))).count()
    assert fm.df.count() == want_n


def test_join_table_broadcast_enrich(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    b = StreamsBuilder()
    table = b.table(
        cust.withColumn("v", F.lit(1)), key="user_id", order_by="v"
    )
    got = b.stream(ev, key="user_id").join_table(table, how="left")
    want = ev.join(
        F.broadcast(cust.withColumn("v", F.lit(1))), "user_id", "left"
    )
    assert got.df.count() == want.count()
    plan = got.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_join_windowed_equals_range_condition(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    c = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    b = StreamsBuilder()
    got = b.stream(a, key="user_id").join_windowed(
        b.stream(c, key="user_id"), ts_col="ts", within="10 MINUTES"
    )
    want = a.join(
        c.withColumnRenamed("ts", "ts_r").withColumnRenamed("value", "value_r"),
        "user_id",
    ).filter(
        (F.col("ts_r") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    assert got.df.count() == want.count()


def test_ktable_latest_join_tostream(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    t = b.table(ev, key="user_id", order_by=F.struct("ts", "event_id"))
    # one row per key, and it is the max-(ts, event_id) row
    assert t.df.count() == ev.select("user_id").distinct().count()
    top = ev.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id")).alias("m")
    ).select("user_id", "m.event_id")
    assert _rows(t.df, "user_id", "event_id") == _rows(
        top, "user_id", "event_id"
    )
    t2 = b.table(
        ev.select("user_id", "value"), key="user_id", order_by="value"
    ).map_values(vmax=F.col("value"))
    joined = t.join(t2).to_stream()
    assert joined.key == "user_id"
    assert joined.df.count() == t.df.count()


def test_peek_observe_metrics(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    obs = Observation("dsl_peek")
    b = StreamsBuilder()
    out = (
        b.stream(ev, key="user_id")
        .peek(obs, F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .filter(F.col("value") > 0)
    )
    out.df.write.format("noop").mode("overwrite").save()
    assert obs.get["n"] == ev.count()


def test_reference_topology_via_dsl_streaming(spark, tmp_path, sf_dir):
    """The switch proof: the reference topology (extract → threshold →
    alert leg + pass-through leg) written in DSL verbs, run under
    Structured Streaming from a file source, produces EXACTLY the
    alert set temperature_alerts (the pinned R4-R10 pipeline) computes
    in batch, and forwards every record unchanged."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key"),
        # dual-format values: half raw scalars, half JSON, some garbage
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit('{"bme680_tempf": '), (F.col("doc_id") % 120).cast("string"), F.lit("}")),
        )
        .when(F.col("doc_id") % 3 == 1, (F.col("doc_id") % 120).cast("string"))
        .otherwise(F.lit("not-a-number"))
        .alias("value"),
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    want_alerts = sorted(
        r.alert for r in temperature_alerts(docs).collect()
    )
    assert want_alerts, "fixture must trip the threshold"

    stream = spark.readStream.schema(docs.schema).parquet(src)
    b = StreamsBuilder()
    reading = dual_format_reading(F.col("value"))
    alerts_leg, forward_leg = (
        b.stream(stream, key="key")
        .map_values(reading=reading)
        .branch(
            F.col("reading").isNotNull()
            & (F.col("reading") > TEMPERATURE_LIMIT),
            F.lit(True),
        )
    )
    alert_dir, fwd_dir = str(tmp_path / "alerts"), str(tmp_path / "fwd")

    def parquet_sink(path):
        return lambda df: (
            df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", path + "_ckpt")
            .start()
        )

    q1 = alerts_leg.map_values(
        alert=F.format_string("Temperature warning %04.2f", F.col("reading"))
    ).to(parquet_sink(alert_dir))
    q2 = forward_leg.to(parquet_sink(fwd_dir))
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()
    got_alerts = sorted(
        r.alert for r in spark.read.parquet(alert_dir).collect()
    )
    assert got_alerts == want_alerts
    fwd = spark.read.parquet(fwd_dir)
    assert fwd.count() + len(got_alerts) == docs.count()
    # pass-through leg carries the records verbatim (key and value)
    assert (
        fwd.join(docs, ["key", "value"], "left_anti").count() == 0
    )


def test_session_window_count_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    got = (
        b.stream(ev, key="user_id")
        .group_by_key()
        .session_windowed_by("ts", "30 minutes")
        .count()
    )
    want = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count(F.lit(1)).alias("count"))
    g = got.df.select("user_id", F.col("window.start"), "count")
    w = want.select("user_id", F.col("session_window.start"), "count")
    assert _rows(g, "user_id", "start", "count") == _rows(
        w, "user_id", "start", "count"
    )


def test_branch_null_predicates_still_partition(spark):
    """A NULL predicate verdict must not drop the record from every
    branch — the catch-all leg receives it (SQL filter semantics per
    branch, first-match across branches)."""
    df = spark.createDataFrame(
        [(1, 60.0), (2, 5.0), (3, None)], "k long, v double"
    )
    b = StreamsBuilder()
    hi, rest = b.stream(df, key="k").branch(F.col("v") > 50, F.lit(True))
    assert {r.k for r in hi.df.collect()} == {1}
    assert {r.k for r in rest.df.collect()} == {2, 3}


def test_join_windowed_left_keeps_unmatched(spark):
    """The time band lives in the JOIN CONDITION: a left row with no
    in-window partner survives a left join with null-extended right
    columns (a post-join band filter would silently drop it)."""
    a = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:00:00")],
        "k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    c = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 7.0)], "k long, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b = StreamsBuilder()
    got = b.stream(a, key="k").join_windowed(
        b.stream(c, key="k"), ts_col="ts", within="10 MINUTES", how="left"
    )
    rows = {r.k: r.v_r for r in got.df.collect()}
    assert rows == {1: 7.0, 2: None}


def test_flat_map_values_guards_the_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    with pytest.raises(ValueError, match="key"):
        b.stream(ev, key="user_id").flat_map_values(
            F.split("event_type", "_"), name="user_id"
        )


def test_windowed_ktable_join_refuses_bare_key(spark, sf_dir):
    """A windowed aggregation's logical key is (key, window); joining
    it with a bare-keyed table must be a loud error, never a silent
    per-window fan-out."""
    ev = load_table(spark, sf_dir, "events")
    b = StreamsBuilder()
    windowed = (
        b.stream(ev, key="user_id")
        .group_by_key()
        .windowed_by("ts", "1 hour")
        .count()
    )
    assert windowed.keys == ["user_id", "window"]
    plain = b.stream(ev, key="user_id").group_by_key().count("total")
    with pytest.raises(ValueError, match="key shape mismatch"):
        windowed.join(plain)
    # two same-shape windowed tables DO join, on (key, window)
    w2 = (
        b.stream(ev, key="user_id")
        .group_by_key()
        .windowed_by("ts", "1 hour")
        .aggregate(s=F.sum("value"))
    )
    j = windowed.join(w2)
    assert j.df.count() == windowed.df.count()


def test_join_foreign_semantics_and_guards(spark, sf_dir):
    """r14 stretch (KS 2.4 FK join): result keyed by the LEFT primary
    key, dangling FKs drop (inner) or NULL-fill (left), and the guard
    surface refuses windowed sides / composite right keys / missing FK
    columns / value-column collisions."""
    import pytest
    from pyspark.sql import functions as F

    from kstreams_spark.dsl import StreamsBuilder
    from kstreams_spark.io import load_table

    b = StreamsBuilder()
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("doc_id") < 12)
        .withColumn("owner", (F.col("doc_id") % 5).cast("long"))
    )
    left = b.table(docs, key="doc_id", order_by="doc_id")
    dim = b.table(
        spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c")], "owner_id long, nm string"
        ),
        key="owner_id",
        order_by="owner_id",
    )
    inner = left.join_foreign(dim, foreign_key="owner")
    assert inner.keys == ["doc_id"]
    got = {(r.doc_id, r.nm) for r in inner.df.collect()}
    assert all(nm in ("a", "b", "c") for _, nm in got)
    # owners 3 and 4 dangle: inner drops them
    assert {d for d, _ in got} == {
        d for d in range(12) if d % 5 in (0, 1, 2)
    }
    lj = left.join_foreign(dim, foreign_key="owner", how="left")
    assert lj.df.count() == 12
    assert lj.df.filter(F.col("nm").isNull()).count() == sum(
        1 for d in range(12) if d % 5 in (3, 4)
    )
    # guards
    with pytest.raises(ValueError, match="inner/left"):
        left.join_foreign(dim, foreign_key="owner", how="full")
    with pytest.raises(ValueError, match="not a column"):
        left.join_foreign(dim, foreign_key="nope")
    two_key = b.table(docs, key="doc_id", order_by="doc_id")
    two_key.keys = ["doc_id", "owner"]
    with pytest.raises(ValueError, match="single primary key"):
        left.join_foreign(two_key, foreign_key="owner")
    clash = b.table(
        spark.createDataFrame(
            [(0, 1)], "owner_id long, n_chars long"
        ),
        key="owner_id",
        order_by="owner_id",
    )
    with pytest.raises(ValueError, match="collide"):
        left.join_foreign(clash, foreign_key="owner")


def test_cogroup_semantics_and_guards(spark, sf_dir):
    """r14 (KS 2.5 cogroup): per-stream aggregators fold into one
    per-key table; missing-side fill; name-collision / key-shape /
    windowed guards."""
    import pytest
    from pyspark.sql import functions as F

    from kstreams_spark.dsl import StreamsBuilder

    b = StreamsBuilder()
    s1 = b.stream(
        spark.createDataFrame(
            [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double"
        ),
        key="k",
    ).group_by_key()
    s2 = b.stream(
        spark.createDataFrame([(2, 3), (3, 4)], "k long, n long"),
        key="k",
    ).group_by_key()
    out = (
        s1.cogroup(n_a=F.count(F.lit(1)), sum_a=F.sum("v"))
        .cogroup(s2, n_b=F.count(F.lit(1)))
        .aggregate(fill={"n_a": 0, "n_b": 0})
    )
    got = {r.k: (r.n_a, r.sum_a, r.n_b) for r in out.df.collect()}
    assert got == {1: (2, 30.0, 0), 2: (1, 5.0, 1), 3: (0, None, 1)}
    assert out.keys == ["k"]
    # guards
    with pytest.raises(ValueError, match="disjoint"):
        s1.cogroup(n=F.count(F.lit(1))).cogroup(
            s2, n=F.count(F.lit(1))
        ).aggregate()
    with pytest.raises(ValueError, match="at least one"):
        s1.cogroup(n=F.count(F.lit(1))).cogroup(s2).aggregate()
    with pytest.raises(ValueError, match="windowed cogroup"):
        ts = b.stream(
            spark.createDataFrame(
                [(1, "2024-01-01 00:00:00")], "k long, ts string"
            ).withColumn("ts", F.col("ts").cast("timestamp")),
            key="k",
        ).group_by_key().windowed_by("ts", "1 hour")
        s1.cogroup(n=F.count(F.lit(1))).cogroup(
            ts, m=F.count(F.lit(1))
        ).aggregate()
    # r15 guards (ADVICE r14): renaming a stream's key onto an existing
    # data column would silently duplicate the name; aggregate names
    # must not collide with the key either
    s3 = b.stream(
        # differently-named key AND a data column already named "k"
        spark.createDataFrame([(2, 7, 1)], "kk long, k long, v long"),
        key="kk",
    ).group_by_key()
    with pytest.raises(ValueError, match="already has a column named 'k'"):
        s1.cogroup(a=F.count(F.lit(1))).cogroup(
            s3, c=F.sum("v")
        ).aggregate()
    with pytest.raises(ValueError, match="collide with the key"):
        s1.cogroup(k=F.count(F.lit(1))).aggregate()


def test_sliding_aggregate_band_golden_and_peers(spark):
    """r15 KS 2.7 sliding windows: per-record trailing band, with
    equal timestamps aggregating as PEERS (RANGE frame) — both tied
    records see the same band, so results are partition-invariant."""
    from pyspark.sql import functions as F

    from kstreams_spark.dsl import StreamsBuilder

    rows = [
        (1, "2024-01-01 10:00:00", 10),
        (1, "2024-01-01 10:04:00", 20),
        (1, "2024-01-01 10:04:00", 30),  # tie: peer of the 10:04 row
        (1, "2024-01-01 10:20:00", 40),
        (2, "2024-01-01 10:04:00", 99),  # other key: separate band
    ]
    df = spark.createDataFrame(
        rows, "k long, ts string, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = (
        StreamsBuilder()
        .stream(df, key="k")
        .group_by_key()
        .sliding_aggregate("ts", "5 minutes", n="COUNT(*)", s="SUM(v)")
    )
    got = {
        (r.k, str(r.ts), r.v): (r.n, r.s) for r in out.df.collect()
    }
    assert got[(1, "2024-01-01 10:00:00", 10)] == (1, 10)
    # both tied rows see the full 3-row band (peers)
    assert got[(1, "2024-01-01 10:04:00", 20)] == (3, 60)
    assert got[(1, "2024-01-01 10:04:00", 30)] == (3, 60)
    assert got[(1, "2024-01-01 10:20:00", 40)] == (1, 40)
    assert got[(2, "2024-01-01 10:04:00", 99)] == (1, 99)
    assert out.key == "k"


def test_versioned_table_join_picks_whole_versions(spark):
    """r15 KS 3.5 (KIP-914): the as-of election returns ONE version's
    columns as a unit — a newer version with a NULL field must NOT
    inherit the older version's value for that field (the per-column
    LOCF bug the struct packing exists to prevent); inner/left forms;
    same-timestamp versions resolve by the version tie-break."""
    from pyspark.sql import functions as F

    from kstreams_spark.dsl import StreamsBuilder

    b = StreamsBuilder()
    versions = b.table_versioned(
        spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00", 1, "alpha", 100),
                # newer version: name NULL (must shadow 'alpha')
                (1, "2024-01-01 10:10:00", 2, None, 200),
                # two versions at the SAME instant: tie-break wins
                (2, "2024-01-01 10:00:00", 3, "low", 1),
                (2, "2024-01-01 10:00:00", 4, "high", 2),
            ],
            "k long, vf string, vid long, name string, score long",
        ).withColumn("vf", F.col("vf").cast("timestamp")),
        key="k",
    )
    stream = b.stream(
        spark.createDataFrame(
            [
                (1, "2024-01-01 10:05:00", 11),  # sees v1 (alpha, 100)
                (1, "2024-01-01 10:10:00", 12),  # exactly at v2: (NULL, 200)
                (2, "2024-01-01 10:00:00", 13),  # tie: vid 4 (high, 2)
                (3, "2024-01-01 10:00:00", 14),  # no version at all
            ],
            "k long, ts string, rid long",
        ).withColumn("ts", F.col("ts").cast("timestamp")),
        key="k",
    )
    left = stream.join_versioned_table(
        versions, ts_col="ts", valid_from="vf", version_order="vid",
        how="left",
    )
    got = {r.rid: (r.name, r.score) for r in left.df.collect()}
    assert got == {
        11: ("alpha", 100),
        12: (None, 200),  # whole v2, NOT ('alpha', 200)
        13: ("high", 2),
        14: (None, None),
    }
    inner = stream.join_versioned_table(
        versions, ts_col="ts", valid_from="vf", version_order="vid",
        how="inner",
    )
    assert sorted(r.rid for r in inner.df.collect()) == [11, 12, 13]
    # collision guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide with stream"):
        b.stream(
            spark.createDataFrame([(1, 5)], "k long, score long"),
            key="k",
        ).join_versioned_table(
            versions, ts_col="score", valid_from="vf",
            version_order="vid",
        )
