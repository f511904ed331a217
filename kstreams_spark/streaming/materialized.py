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
        new, new_stats = _write_staged(merged, self.view_path, ())
        # full replacement of the view (files = this write's), committed
        # with the epoch recorded — the exactly-once record a replay hits
        _commit(
            self.view_path,
            new,
            f"view-epoch-{epoch_id}",
            merged.schema.simpleString(),
            new_epoch=int(epoch_id),
            base_version=versions[-1],
            add_stats=new_stats,
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


class LakeMaterializedEnrichedJoin:
    """ROW-LEVEL maintained FK-join view (r14 — KIP-213's changelog
    form at row grain, completing the aggregated form that
    KGroupedTable.materialized covers): the view is

        SELECT left.*, dim value columns
        FROM <lake> left [INNER|LEFT] JOIN dim
          ON left.<foreign_key> = dim.<dim_key>

    keyed by the LEFT table's primary key and maintained from the
    lake's PARTITIONED signed change feed with ONE merge commit per
    microbatch: upserts and deletes travel in the same
    snapshot_merge(delete_col=...) call (Delta's WHEN MATCHED DELETE),
    so a reader sees each batch entirely or not at all, and the epoch
    recorded by that commit makes crash-replays literal no-ops.

    Per batch (partial recompute — the join IVM rule specialized to a
    static/broadcast dimension): classify the signed rows
    (classify_changes), keep each key's FINAL action across the
    batch's versions (max _commit_version; update preimages dropped),
    re-enrich the surviving post-images against the dimension, and
    MERGE: post-images upsert, deleted keys — plus, under how="inner",
    keys whose new FK dangles (the enrich dropped them) — carry delete
    intents. An FK-value update therefore MOVES the row between join
    partners, an FK update to a dangling value REMOVES it from an
    inner view, and a later fix re-inserts it: the three KIP-213
    transitions, each one merge arm.

    Scope: the dimension is a driver-captured DataFrame re-evaluated
    per batch (broadcast-sized — the common FK-join shape; a CHANGING
    right side needs the bilateral subscription protocol, out of
    scope and stated). Per-batch cost is O(changed keys + their dim
    matches); the view rewrite is partition-grain copy-on-write via
    snapshot_merge."""

    def __init__(
        self,
        view_path: str,
        key_cols: tuple[str, ...],
        dim: DataFrame,
        foreign_key: str,
        dim_key: str,
        how: str = "left",
        partition_cols: tuple[str, ...] = (),
    ) -> None:
        if how not in ("inner", "left"):
            raise ValueError(f"how must be inner/left, got {how!r}")
        overlap = set(dim.columns) & set(key_cols)
        if overlap:
            raise ValueError(
                f"dimension columns {sorted(overlap)} collide with the "
                "view key"
            )
        self.view_path = view_path
        self.key_cols = tuple(key_cols)
        self.dim = dim
        self.foreign_key = foreign_key
        self.dim_key = dim_key
        self.how = how
        self.partition_cols = tuple(partition_cols)

    def _enrich(self, left: DataFrame) -> DataFrame:
        overlap = (set(self.dim.columns) - {self.dim_key}) & set(
            left.columns
        )
        if overlap:
            raise ValueError(
                f"dimension value column(s) {sorted(overlap)} collide "
                "with left columns — rename a side"
            )
        l_, d_ = left.alias("_ej_l"), self.dim.alias("_ej_d")
        joined = l_.join(
            d_,
            F.col(f"_ej_l.{self.foreign_key}")
            == F.col(f"_ej_d.{self.dim_key}"),
            self.how,
        )
        return joined.select(
            *[F.col(f"_ej_l.{c}") for c in left.columns],
            *[
                F.col(f"_ej_d.{c}")
                for c in self.dim.columns
                if c != self.dim_key
            ],
        )

    def bootstrap(
        self, spark: SparkSession, lake_path: str, version: int | None = None
    ) -> int:
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
            self._enrich(snapshot_read(spark, lake_path, v)),
            self.view_path,
            partition_cols=self.partition_cols,
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
        from pyspark.sql import Window

        from kstreams_spark.lake_snapshot import snapshot_merge
        from kstreams_spark.sources.lake_cdf import classify_changes

        if int(epoch_id) in self.committed_epochs():
            return  # crash-replay of a committed batch: no-op
        keys = list(self.key_cols)
        classified = classify_changes(batch_df, self.key_cols).filter(
            F.col("_change") != "update_preimage"
        )
        w = Window.partitionBy(*keys).orderBy(
            F.col("_commit_version").desc()
        )
        finals = (
            classified.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_commit_version")
        )
        states = finals.filter(F.col("_change") != "delete").drop("_change")
        enriched = self._enrich(states).withColumn("_rm", F.lit(False))
        # deletes: explicit deletes, plus (inner) keys whose new FK
        # dangles — the enrich dropped them but they may be in the view
        del_keys = finals.filter(F.col("_change") == "delete").select(*keys)
        if self.how == "inner":
            del_keys = del_keys.unionByName(
                states.select(*keys).exceptAll(
                    enriched.select(*keys)
                )
            )
        dels = del_keys
        for c in enriched.columns:
            if c not in keys and c != "_rm":
                dels = dels.withColumn(
                    c, F.lit(None).cast(dict(enriched.dtypes)[c])
                )
        dels = dels.withColumn("_rm", F.lit(True)).select(enriched.columns)
        src = enriched.unionByName(dels)
        if src.isEmpty():
            return  # a version with no net changes (e.g. compaction)
        snapshot_merge(
            batch_df.sparkSession,
            self.view_path,
            src,
            key_cols=self.key_cols,
            partition_cols=self.partition_cols,
            delete_col="_rm",
            new_epoch=int(epoch_id),
        )

    def attach(
        self,
        spark: SparkSession,
        lake_path: str,
        checkpoint_dir: str,
        start_version: int,
    ):
        """Follow the lake's PARTITIONED signed feed from
        `start_version` (the bootstrap's return value)."""
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
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def result(self, spark: SparkSession) -> DataFrame:
        from kstreams_spark.lake_snapshot import snapshot_read

        return snapshot_read(spark, self.view_path)
