"""Incremental view maintenance (streaming/materialized.py): the
KTable-aggregation model with the snapshot lake as the changelog.
Parity contract: after inserts, deletes, value-updates, group-moving
updates, and a compaction, the maintained view is row-equal (values
AND decimal types) to the aggregate recomputed from the latest
snapshot — maintained by delta arithmetic only, never a rescan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.lake_snapshot import (
    snapshot_compact,
    snapshot_delete_where,
    snapshot_merge,
    snapshot_publish,
    snapshot_read,
    snapshot_versions,
)
from kstreams_spark.streaming.materialized import LakeMaterializedAggregate


def _docs(spark, sf_dir, lo=0, hi=40):
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("double").alias("chars"),
        )
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )
    return d.withColumn(
        "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
    )


def _rows(df):
    return sorted(
        (r.lang, r.n_rows, r.val_sum) for r in df.collect()
    )


def test_view_tracks_lake_through_all_change_kinds(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    snapshot_publish(_docs(spark, sf_dir), lake, partition_cols=("split",))

    m = LakeMaterializedAggregate(view, ("lang",), "chars")
    start_v = m.bootstrap(spark, lake)
    # bootstrap parity
    assert _rows(m.result(spark)) == _rows(
        m._aggregate(snapshot_read(spark, lake))
    )

    q = m.attach(spark, lake, str(tmp_path / "ckpt"), start_v)
    try:
        # inserts
        snapshot_publish(
            _docs(spark, sf_dir, 100, 115),
            lake,
            mode="append",
            partition_cols=("split",),
        )
        # deletes
        snapshot_delete_where(
            spark, lake, "doc_id IN (0, 1, 2)", partition_cols=("split",)
        )
        # a VALUE update and a GROUP-MOVING update in one merge
        src = _docs(spark, sf_dir, 4, 6)
        src = src.withColumn(
            "chars",
            F.when(F.col("doc_id") == 4, F.col("chars") + 1000).otherwise(
                F.col("chars")
            ),
        ).withColumn(
            "lang",
            F.when(F.col("doc_id") == 5, F.lit("zz")).otherwise(
                F.col("lang")
            ),
        )
        snapshot_merge(
            spark, lake, src, key_cols=("doc_id",), partition_cols=("split",)
        )
        # pure re-layout: must move nothing in the view
        snapshot_compact(spark, lake, n_files=1, partition_cols=("split",))
        q.processAllAvailable()
    finally:
        q.stop()

    recomputed = m._aggregate(snapshot_read(spark, lake))
    assert _rows(m.result(spark)) == _rows(recomputed)
    # the moved doc's new group exists with exactly one row
    got = {r.lang: (r.n_rows, r.val_sum) for r in m.result(spark).collect()}
    assert got["zz"][0] == 1
    # dtypes: the fold stays DECIMAL end-to-end (no float drift channel)
    assert dict(m.result(spark).dtypes)["val_sum"] == "decimal(28,6)"
    assert dict(recomputed.dtypes)["val_sum"] == "decimal(28,6)"
    # the view has its own history: one version per applied batch
    assert len(snapshot_versions(view)) >= 2


def test_replayed_epoch_is_a_noop_and_postimage_only_rejected(
    spark, tmp_path, sf_dir
):
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    snapshot_publish(_docs(spark, sf_dir), lake, partition_cols=("split",))
    m = LakeMaterializedAggregate(view, ("lang",), "chars")
    m.bootstrap(spark, lake)

    batch = spark.createDataFrame(
        [(999, "en", 10.0, "train", "insert", 2)],
        "doc_id long, lang string, chars double, split string,"
        " _change string, _commit_version int",
    )
    m.process_batch(batch, 7)
    after_once = _rows(m.result(spark))
    v_once = snapshot_versions(view)[-1]
    m.process_batch(batch, 7)  # replay: recognized via the epoch set
    assert _rows(m.result(spark)) == after_once
    assert snapshot_versions(view)[-1] == v_once

    post_only = batch.withColumn("_change", F.lit("update"))
    with pytest.raises(ValueError, match="include_preimages"):
        m.process_batch(post_only, 8)


def test_derived_group_reaggregation(spark, tmp_path, sf_dir):
    """KGroupedTable (r13, VERDICT r12 task 3): the view groups by a
    DERIVED expression (the KTable.groupBy re-keying) — an update that
    moves a row between derived groups must subtract from the old
    group and add to the new (the adder/subtractor contract), folded
    incrementally and row-equal to the recompute. Built through the
    DSL facade's KGroupedTable.materialized() so the facade wiring is
    covered too."""
    from kstreams_spark.dsl import StreamsBuilder

    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    snapshot_publish(_docs(spark, sf_dir), lake, partition_cols=("split",))

    # facade: table -> group_by(derived SQL) -> materialized maintainer
    snap = snapshot_read(spark, lake)
    table = StreamsBuilder().table(snap, key="doc_id", order_by="doc_id")
    grouped = table.group_by(
        "CASE WHEN chars >= 300 THEN 'long' ELSE 'short' END",
        name="size_class",
    )
    m = grouped.materialized(view, "chars")
    assert m.group_cols == ("size_class",)
    start_v = m.bootstrap(spark, lake)
    assert _batch_parity(spark, m, lake)

    q = m.attach(spark, lake, str(tmp_path / "ckpt"), start_v)
    try:
        # group-moving update: push one short doc over the boundary
        src = _docs(spark, sf_dir, 3, 4).withColumn(
            "chars", F.lit(1000.0)
        )
        snapshot_merge(
            spark, lake, src, key_cols=("doc_id",), partition_cols=("split",)
        )
        # plus inserts and a delete
        snapshot_publish(
            _docs(spark, sf_dir, 200, 210),
            lake,
            mode="append",
            partition_cols=("split",),
        )
        snapshot_delete_where(
            spark, lake, "doc_id IN (6, 7)", partition_cols=("split",)
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert _batch_parity(spark, m, lake)
    got = {
        r.size_class: r.n_rows for r in m.result(spark).collect()
    }
    assert set(got) == {"long", "short"}

    # a Column-object grouping cannot travel to the maintainer
    with pytest.raises(ValueError, match="SQL string"):
        table.group_by(F.col("lang"), name="g").materialized(view, "chars")


def _batch_parity(spark, m, lake):
    recomputed = sorted(
        tuple(r) for r in m._aggregate(snapshot_read(spark, lake)).collect()
    )
    return sorted(tuple(r) for r in m.result(spark).collect()) == recomputed


def test_facade_kgrouped_table_matches_direct_pipeline(spark, sf_dir):
    """dsl_ktable_groupby_reaggregate's facade chain is row-equal to
    the hand-written window + aggregate pipeline (the test_dsl parity
    contract, applied to the new verb family)."""
    from pyspark.sql import Window

    from kstreams_spark.registry import QUERIES

    got = sorted(
        tuple(r) for r in QUERIES["dsl_ktable_groupby_reaggregate"](
            spark, sf_dir
        ).collect()
    )
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.struct("o_orderdate", "o_orderkey").desc()
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    from kstreams_spark.operators._util import dsum

    direct = (
        latest.withColumn("prio", F.col("o_orderpriority"))
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("o_totalprice").alias("latest_revenue"),
        )
    )
    assert got == sorted(tuple(r) for r in direct.collect())


def test_view_via_distributed_signed_feed(spark, tmp_path, sf_dir):
    """r13: the same fold, fed by the PARTITIONED signed feed
    (kstreams_lake_cdf_dist) — the +1/−1 sides are exactly the
    preimage/postimage signs, so the maintained view stays row-equal
    to the recompute through inserts, group-moving updates, deletes,
    and a compaction (whose ± pairs cancel)."""
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    snapshot_publish(_docs(spark, sf_dir), lake, partition_cols=("split",))
    m = LakeMaterializedAggregate(view, ("lang",), "chars")
    start_v = m.bootstrap(spark, lake)
    q = m.attach(
        spark, lake, str(tmp_path / "ckpt"), start_v, distributed=True
    )
    try:
        snapshot_publish(
            _docs(spark, sf_dir, 100, 110),
            lake,
            mode="append",
            partition_cols=("split",),
        )
        src = _docs(spark, sf_dir, 4, 6).withColumn(
            "lang",
            F.when(F.col("doc_id") == 5, F.lit("zz")).otherwise(
                F.col("lang")
            ),
        )
        snapshot_merge(
            spark, lake, src, key_cols=("doc_id",), partition_cols=("split",)
        )
        snapshot_delete_where(
            spark, lake, "doc_id IN (0, 1)", partition_cols=("split",)
        )
        snapshot_compact(spark, lake, n_files=1, partition_cols=("split",))
        q.processAllAvailable()
    finally:
        q.stop()
    recomputed = m._aggregate(snapshot_read(spark, lake))
    assert _rows(m.result(spark)) == _rows(recomputed)
    assert dict(m.result(spark).dtypes)["val_sum"] == "decimal(28,6)"


def test_fk_move_changelog_parity(spark, tmp_path, sf_dir):
    """FOREIGN-KEY join, incremental changelog form (r14 stretch —
    KS 2.4 / KIP-213): the per-partner aggregate is maintained from the
    LEFT table's signed change feed grouped by the FK column; an
    FK-VALUE update's preimage/postimage rows move the left row's
    contribution BETWEEN join partners. Parity: the maintained
    per-partner view joined to the dimension equals
    KTable.join_foreign recomputed from the latest snapshot — before
    and after the FK move, across inserts and deletes too."""
    from kstreams_spark.dsl import StreamsBuilder

    lake = str(tmp_path / "fk_lake")
    view = str(tmp_path / "fk_view")
    # left table: docs with an FK 'owner' into a tiny dimension
    docs = _docs(spark, sf_dir).withColumn(
        "owner", (F.col("doc_id") % 4).cast("bigint")
    )
    snapshot_publish(docs, lake, partition_cols=("split",))
    dim = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma"), (3, "delta")],
        "owner_id long, owner_name string",
    )

    m = LakeMaterializedAggregate(view, ("owner",), "chars")
    start_v = m.bootstrap(spark, lake)

    def enriched_from_view():
        v = m.result(spark)
        return {
            (r.owner_name, r.n_rows, r.val_sum)
            for r in v.join(dim, v["owner"] == dim["owner_id"], "inner")
            .select("owner_name", "n_rows", "val_sum")
            .collect()
        }

    def recompute():
        b = StreamsBuilder()
        left = b.table(
            snapshot_read(spark, lake), key="doc_id", order_by="doc_id"
        )
        d = b.table(dim, key="owner_id", order_by="owner_id")
        ktab = left.join_foreign(d, foreign_key="owner", how="inner")
        return {
            (r.owner_name, r.n_rows, r.val_sum)
            for r in ktab.df.groupBy("owner", "owner_name")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("chars").cast("decimal(18,6)"))
                .cast("decimal(28,6)")
                .alias("val_sum"),
            )
            .select("owner_name", "n_rows", "val_sum")
            .collect()
        }

    assert enriched_from_view() == recompute()  # bootstrap parity

    q = m.attach(spark, lake, str(tmp_path / "fk_ckpt"), start_v)
    try:
        # THE FK MOVE: doc 8 changes owner 0 -> 3 (partner swap), plus
        # a value update on doc 9 and an insert/delete pair around it
        src = _docs(spark, sf_dir, 8, 10).withColumn(
            "owner",
            F.when(F.col("doc_id") == 8, F.lit(3)).otherwise(
                F.col("doc_id") % 4
            ).cast("bigint"),
        ).withColumn(
            "chars",
            F.when(F.col("doc_id") == 9, F.col("chars") + 500).otherwise(
                F.col("chars")
            ),
        )
        snapshot_merge(
            spark, lake, src, key_cols=("doc_id",), partition_cols=("split",)
        )
        snapshot_publish(
            _docs(spark, sf_dir, 200, 205).withColumn(
                "owner", (F.col("doc_id") % 4).cast("bigint")
            ),
            lake,
            mode="append",
            partition_cols=("split",),
        )
        snapshot_delete_where(
            spark, lake, "doc_id IN (12, 13)", partition_cols=("split",)
        )
        q.processAllAvailable()
    finally:
        q.stop()

    assert enriched_from_view() == recompute()  # post-move parity
    # and the move really happened: owner 3 gained doc 8's row
    after = {r.owner: r.n_rows for r in m.result(spark).collect()}
    before_counts = {
        r.owner: r.n_rows
        for r in m._aggregate(
            snapshot_read(spark, lake, version=1)
        ).collect()
    }
    assert after[3] == before_counts[3] + 1 + 1  # moved doc 8 + insert 203
    assert after[0] == before_counts[0] - 1 + 2 - 1  # -8, +200+204, -12


def test_enriched_join_view_tracks_all_kip213_transitions(
    spark, tmp_path, sf_dir
):
    """r14 — LakeMaterializedEnrichedJoin (row-level KIP-213 changelog
    form): the maintained enriched view stays row-equal to
    KTable.join_foreign recomputed from the latest snapshot across the
    three FK transitions (partner→partner move, partner→dangling —
    which must REMOVE the row from an inner view — and dangling→partner
    re-insert), plus plain inserts, value updates, deletes, and a
    crash-replay (epoch no-op)."""
    from kstreams_spark.dsl import StreamsBuilder
    from kstreams_spark.streaming.materialized import (
        LakeMaterializedEnrichedJoin,
    )

    lake = str(tmp_path / "ej_lake")
    view = str(tmp_path / "ej_view")
    docs = _docs(spark, sf_dir).withColumn(
        "owner", (F.col("doc_id") % 3).cast("bigint")
    )
    snapshot_publish(docs, lake, partition_cols=("split",))
    dim = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma")],
        "owner_id long, owner_name string",
    )
    m = LakeMaterializedEnrichedJoin(
        view, ("doc_id",), dim, "owner", "owner_id", how="inner"
    )
    start_v = m.bootstrap(spark, lake)

    def view_rows():
        return {
            (r.doc_id, r.owner, r.owner_name, r.chars)
            for r in m.result(spark)
            .select("doc_id", "owner", "owner_name", "chars")
            .collect()
        }

    def recompute():
        b = StreamsBuilder()
        left = b.table(
            snapshot_read(spark, lake), key="doc_id", order_by="doc_id"
        )
        d = b.table(dim, key="owner_id", order_by="owner_id")
        return {
            (r.doc_id, r.owner, r.owner_name, r.chars)
            for r in left.join_foreign(d, foreign_key="owner", how="inner")
            .df.select("doc_id", "owner", "owner_name", "chars")
            .collect()
        }

    assert view_rows() == recompute()  # bootstrap parity
    q = m.attach(spark, lake, str(tmp_path / "ej_ckpt"), start_v)
    try:
        # partner->partner FK move (6: 0->2), partner->DANGLING (9: ->7,
        # must leave the inner view), value update (12), delete (15, 16),
        # inserts (200..204 incl. a dangling one)
        src = _docs(spark, sf_dir, 6, 13).filter(
            F.col("doc_id").isin([6, 9, 12])
        )
        src = src.withColumn(
            "owner",
            F.when(F.col("doc_id") == 6, F.lit(2))
            .when(F.col("doc_id") == 9, F.lit(7))  # dangling
            .otherwise(F.col("doc_id") % 3)
            .cast("bigint"),
        ).withColumn(
            "chars",
            F.when(F.col("doc_id") == 12, F.col("chars") + 777).otherwise(
                F.col("chars")
            ),
        )
        snapshot_merge(
            spark, lake, src, key_cols=("doc_id",), partition_cols=("split",)
        )
        snapshot_publish(
            _docs(spark, sf_dir, 200, 205).withColumn(
                "owner",
                F.when(F.col("doc_id") == 203, F.lit(9))  # dangling insert
                .otherwise(F.col("doc_id") % 3)
                .cast("bigint"),
            ),
            lake,
            mode="append",
            partition_cols=("split",),
        )
        snapshot_delete_where(
            spark, lake, "doc_id IN (15, 16)", partition_cols=("split",)
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert view_rows() == recompute()
    got = {r[0]: r for r in view_rows()}
    assert got[6][2] == "gamma"  # moved to partner 2
    assert 9 not in got  # dangling FK left the inner view
    assert 203 not in got and 200 in got
    assert got[12][3] is not None

    # dangling -> partner re-insert: fix doc 9's FK
    q = m.attach(spark, lake, str(tmp_path / "ej_ckpt"), start_v)
    try:
        fix = (
            _docs(spark, sf_dir, 9, 10)
            .withColumn("owner", F.lit(1).cast("bigint"))
        )
        snapshot_merge(
            spark, lake, fix, key_cols=("doc_id",), partition_cols=("split",)
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert view_rows() == recompute()
    assert {r[0]: r for r in view_rows()}[9][2] == "beta"

    # crash-replay: re-processing a committed epoch is a literal no-op
    n_versions = len(snapshot_versions(view))
    from kstreams_spark.sources.lake_cdf import step_changes  # noqa: F401

    m.process_batch(
        spark.createDataFrame(
            [], "doc_id long, lang string, chars double, split string, "
            "_side int, _commit_version long"
        ),
        epoch_id=max(m.committed_epochs()),
    )
    assert len(snapshot_versions(view)) == n_versions
