"""Incremental view maintenance off the lake's change feed — the
Kafka Streams KTable-aggregation model (a changelog folded into a
continuously-correct table, SURVEY §2.2 groupByKey().aggregate()),
re-expressed with the snapshot lake as the changelog.

`LakeMaterializedAggregate` maintains

    SELECT group_cols..., COUNT(*) AS n_rows, SUM(value_col) AS val_sum
    FROM <lake> GROUP BY group_cols...

as a PERSISTED table updated once per CDF microbatch. The update is
pure delta arithmetic — no rescan of the lake, ever:

- the CDF stream runs with `include_preimages=true` (Delta's two-row
  update form, sources/lake_cdf.py), so each change row carries a sign:
  insert / update_postimage = +1, delete / update_preimage = −1;
- the batch's per-group delta is one aggregation over ONLY the changed
  rows: Σ sign → count delta, Σ sign·value → sum delta;
- the new view = old view ⊔ deltas (full outer on the group keys,
  coalesce-add), groups whose count reaches zero drop out.

Exactness: the sum column is DECIMAL end-to-end (per-row cast to
DECIMAL(18,6), accumulated and STORED as DECIMAL(28,6)), so folding N
batches is bit-equal to one recompute — the repo's aggregated-double
rule, applied to incremental state where float drift would otherwise
accumulate per batch.

Exactly-once: the view itself is a tiny SNAPSHOT LAKE (lake_snapshot's
manifest log) — each applied batch commits ONE new view version with
the stream epoch recorded in the manifest's committed-epoch set, so a
replayed batch after a crash is recognized and skipped, and a reader
always sees a complete view (never mid-update). Crash between the
data write and the commit leaves vacuum-able orphans and the replay
completes — the SnapshotLakeSink argument verbatim. Time travel gives
the view's own history for free.

Parity contract (pinned in tests/test_materialized.py): after any
sequence of lake commits — inserts, deletes, UPDATES that move a row
between groups or change its value, compactions — the maintained view
is row-equal (values AND types) to the aggregate recomputed from the
latest snapshot.

At 100 TB: per-batch cost is O(changed rows) + O(|view|) for the merge
write. A view too large to rewrite per batch shards by group-hash
partitions and rewrites only partitions with nonzero deltas — the same
partition-pruned copy-on-write the lake itself uses; the fold
semantics here are what that swap preserves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SUM_T = "decimal(28,6)"


class LakeMaterializedAggregate:
    def __init__(
        self,
        view_path: str,
        group_cols: tuple[str, ...],
        value_col: str,
        group_exprs: dict[str, str] | None = None,
    ) -> None:
        """`group_exprs` (r13, the KGroupedTable re-keying —
        dsl.KGroupedTable.materialized): name → SQL expression DERIVING
        a group column from the row. Derived groups fold incrementally
        for free because every change row (preimage AND postimage)
        carries the full row: an update that moves a row between
        derived groups subtracts from the old group and adds to the
        new one — exactly Kafka Streams' KGroupedTable
        adder/subtractor contract."""
        self.view_path = view_path
        self.group_cols = tuple(group_cols)
        self.value_col = value_col
        self.group_exprs = dict(group_exprs or {})

    def _with_groups(self, df: DataFrame) -> DataFrame:
        for name, sql in self.group_exprs.items():
            df = df.withColumn(name, F.expr(sql))
        return df

    # -- the aggregate, stated once (bootstrap twin = parity oracle) ----
    def _aggregate(self, df: DataFrame) -> DataFrame:
        return self._with_groups(df).groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(self.value_col).cast("decimal(18,6)"))
            .cast(_SUM_T)
            .alias("val_sum"),
        )

    def bootstrap(
        self, spark: SparkSession, lake_path: str, version: int | None = None
    ) -> int:
        """Materialize the aggregate of one committed lake snapshot as
        view version 1 and return the LAKE version it reflects — the
        stream then starts at that offset."""
        from kstreams_spark.lake_snapshot import (
            snapshot_publish,
            snapshot_read,
            snapshot_versions,
        )

        versions = snapshot_versions(lake_path)
        if not versions:
            raise ValueError(f"no committed snapshots under {lake_path}")
        v = versions[-1] if version is None else version
        snapshot_publish(
            self._aggregate(snapshot_read(spark, lake_path, v)),
            self.view_path,
            partition_cols=(),
        )
        return v

    def committed_epochs(self) -> set[int]:
        from kstreams_spark.lake_snapshot import (
            _read_manifest,
            snapshot_versions,
        )

        versions = snapshot_versions(self.view_path)
        if not versions:
            return set()
        return set(
            _read_manifest(self.view_path, versions[-1]).get("epochs", [])
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Fold one CDF microbatch (include_preimages form) into the
        view — one commit, epoch-keyed exactly-once."""
        from kstreams_spark.lake_snapshot import (
            _commit,
            _write_staged,
            snapshot_read,
            snapshot_versions,
        )

        if int(epoch_id) in self.committed_epochs():
            return  # crash-replay of a committed batch: no-op
        if "_side" in batch_df.columns:
            # the PARTITIONED feed (kstreams_lake_cdf_dist, r13) already
            # emits the sign — its +1/−1 contract IS this fold's input,
            # which is exactly why the signed decomposition works
            sign = F.col("_side")
        else:
            sign = (
                F.when(
                    F.col("_change").isin("insert", "update_postimage"),
                    F.lit(1),
                )
                .when(
                    F.col("_change").isin("delete", "update_preimage"),
                    F.lit(-1),
                )
                .otherwise(F.lit(None))
            )
            unknown = batch_df.filter(sign.isNull())
            if not unknown.isEmpty():
                bad = [
                    r._change
                    for r in unknown.select("_change").limit(3).collect()
                ]
                raise ValueError(
                    "materialized view needs the include_preimages CDF "
                    f"form; got change type(s) {bad} — post-image-only "
                    "'update' rows cannot maintain a SUM"
                )
        deltas = (
            self._with_groups(batch_df)
            .withColumn("_sign", sign)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("_sign").cast("long").alias("_dn"),
                F.sum(
                    F.col("_sign")
                    * F.col(self.value_col).cast("decimal(18,6)")
                )
                .cast(_SUM_T)
                .alias("_dv"),
            )
        )
        if deltas.isEmpty():
            return  # row-less step: view unchanged, no epoch claimed
        spark = batch_df.sparkSession
        keys = list(self.group_cols)
        cur = snapshot_read(spark, self.view_path)
        zero = F.lit(0).cast(_SUM_T)
        merged = (
            cur.join(deltas, keys, "full")
            .select(
                *keys,
                (
                    F.coalesce(F.col("n_rows"), F.lit(0))
                    + F.coalesce(F.col("_dn"), F.lit(0))
                ).alias("n_rows"),
                (
                    F.coalesce(F.col("val_sum"), zero)
                    + F.coalesce(F.col("_dv"), zero)
                )
                .cast(_SUM_T)
                .alias("val_sum"),
            )
            .filter(F.col("n_rows") > 0)
        )
        versions = snapshot_versions(self.view_path)
        new = _write_staged(merged, self.view_path, ())
        # full replacement of the view (files = this write's), committed
        # with the epoch recorded — the exactly-once record a replay hits
        _commit(
            self.view_path,
            new,
            f"view-epoch-{epoch_id}",
            merged.schema.simpleString(),
            new_epoch=int(epoch_id),
            base_version=versions[-1],
            recompute=lambda latest_live: new,
        )

    def attach(
        self,
        spark: SparkSession,
        lake_path: str,
        checkpoint_dir: str,
        start_version: int,
        distributed: bool = False,
    ):
        """Follow the lake from `start_version` (the bootstrap's return
        value) and fold every change batch into the view.
        `distributed=True` (r13) subscribes through the PARTITIONED
        signed feed instead — one task per changed file, the driver
        plans from manifests only; the fold is unchanged because the
        signed rows' +1/−1 are exactly the preimage/postimage signs
        (parity pinned in tests/test_materialized.py)."""
        if distributed:
            from kstreams_spark.sources.lake_cdf import (
                LakeChangeFeedDistDataSource,
            )

            spark.dataSource.register(LakeChangeFeedDistDataSource)
            stream = (
                spark.readStream.format("kstreams_lake_cdf_dist")
                .option("path", lake_path)
                .option("start_version", str(start_version))
                .load()
            )
        else:
            from kstreams_spark.sources.lake_cdf import (
                LakeChangeFeedDataSource,
            )

            spark.dataSource.register(LakeChangeFeedDataSource)
            stream = (
                spark.readStream.format("kstreams_lake_cdf")
                .option("path", lake_path)
                .option("start_version", str(start_version))
                .option("include_preimages", "true")
                .load()
            )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def result(self, spark: SparkSession) -> DataFrame:
        from kstreams_spark.lake_snapshot import snapshot_read

        return snapshot_read(spark, self.view_path)
