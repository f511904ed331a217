"""Lake change-data-feed STREAMING source — `spark.readStream.format(
"kstreams_lake_cdf")` over a snapshot lake (lake_snapshot.py), the
Delta `readChangeFeed` shape re-expressed as a Spark 4 streaming Python
DataSource.

Why it exists: r12's batch pipe (HybridIngestMaintainer.
apply_snapshot_changes) derives the serving indexes from the lake's
change feed one explicit version range at a time; this source makes the
same feed a first-class STREAM — offsets are manifest versions, each
microbatch carries the row-level changes of the versions it covers, and
checkpoint recovery replays them bit-for-bit — so ANY downstream (not
just the maintainer) can subscribe to the lake the way Delta consumers
subscribe to a change feed.

Output schema: the lake's own columns (the manifest's recorded schema,
partition columns included) plus
  _change         'insert' | 'delete' | 'update'
  _commit_version the lake version that committed the change
Update rows carry the POST-image (delete rows the old row) — the same
contract as lake_snapshot.snapshot_diff, and tests pin byte-parity with
it per version step.

How a step is computed (and why it is cheap): a delta manifest already
IS the file-level change set (`adds`/`removes` — lake_snapshot.py r12),
so version v's row changes come from reading ONLY the changed files
(pyarrow, partition values parsed off the directory names) and keying
old vs new rows: only-new = insert, only-old = delete, both-but-
different = update, both-and-equal = nothing (a compaction rewrite
moves every row between files and must emit ZERO changes). Work per
batch is O(changed rows), never O(table). Legacy full-list manifests
diff against the previous version's resolved live set.

Exactly-once: offsets are committed lake versions; changes are a pure
function of the immutable manifest chain, so `readBetweenOffsets`
regenerates any committed slice deterministically. Retention contract
(Delta's): vacuum() must keep every version a lagging checkpoint might
replay — grace_seconds below the maximum consumer recovery lag breaks
replay, loudly (FileNotFoundError on the folded manifest).

Scale posture: TWO readers. `kstreams_lake_cdf` (this Simple reader)
reads changed files on the DRIVER and emits classified rows — right
for CDC volumes (changed rows per commit), a cap on large commits.
`kstreams_lake_cdf_dist` (r13, the partitioned DataSourceStreamReader
below) plans ONE InputPartition per changed file and emits SIGNED
rows (+1/−1) — reads scale with executors, the driver touches only
manifests; classification is either folded away by sign arithmetic
(SUM-shaped consumers) or done batch-side by `classify_changes` (the
shuffle a DataSource task cannot express). A full re-derivation still
goes through bootstrap_from_lake's distributed snapshot read. Keys
must be unique per snapshot (the snapshot_diff contract). Partition
columns must be scalar-typed; the letter-prefix string convention
(CLAUDE.md) is what the fixtures use.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    SimpleDataSourceStreamReader,
)

from kstreams_spark.lake_snapshot import (
    _live_files,
    _read_manifest,
    _schema_fields as _parse_fields,
    _unescape_partition_value,
    snapshot_versions,
    table_column_map,
    table_dvs,
)

_META_COLS = ("_change", "_commit_version")


def _schema_fields(schema_str: str) -> list[tuple[str, str]]:
    """(name, simple-type) pairs of the manifest's recorded schema —
    parsed WITHOUT a SparkSession (DataSource.schema() and the stream
    reader both run in session-less Python processes, so
    _parse_datatype_string is unavailable; the string parser lives in
    lake_snapshot). Nested structs/maps are rejected by name — the
    lakes this source serves are flat tables (scalars + arrays)."""
    fields = _parse_fields(schema_str)
    for _name, typ in fields:
        if typ.startswith(("struct<", "map<")):
            raise ValueError(
                f"nested type {typ[:20]!r} unsupported; the change feed "
                "serves flat lake tables"
            )
    return fields


def _spark_type(simple: str):
    """simpleString type → pyspark type object (no session needed)."""
    from pyspark.sql import types as T

    scalars = {
        "string": T.StringType,
        "bigint": T.LongType,
        "int": T.IntegerType,
        "smallint": T.ShortType,
        "tinyint": T.ByteType,
        "double": T.DoubleType,
        "float": T.FloatType,
        "boolean": T.BooleanType,
        "date": T.DateType,
        "timestamp": T.TimestampType,
        "timestamp_ntz": T.TimestampNTZType,
        "binary": T.BinaryType,
    }
    if simple in scalars:
        return scalars[simple]()
    if simple.startswith("array<") and simple.endswith(">"):
        return T.ArrayType(_spark_type(simple[len("array<") : -1]))
    if simple.startswith("decimal(") and simple.endswith(")"):
        p, s = simple[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(s))
    raise ValueError(f"unsupported lake column type {simple!r}")


def _coerce(value: str | None, simple_type: str):
    """Directory-parsed partition value → the declared column type."""
    if value is None:
        return None
    if simple_type in ("tinyint", "smallint", "int", "bigint"):
        return int(value)
    if simple_type in ("float", "double"):
        return float(value)
    if simple_type == "boolean":
        return value == "true"
    return value


def _part_vals(rel: str, types: dict[str, str]) -> dict:
    out = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            if k in types:
                out[k] = _coerce(_unescape_partition_value(v), types[k])
    return out


def _read_rows(
    lake_path: str,
    rel_files: set[str],
    fields: list[tuple[str, str]],
    skip_positions: dict[str, list[int]] | None = None,
) -> list[dict]:
    """Rows of the given data files as dicts, partition columns parsed
    from the `key=value` directory segments (pyarrow — no Spark session
    exists where a stream reader runs). `skip_positions` excludes a
    file's deletion-vector rows (already logically deleted — and
    already REPORTED deleted by the commit that grew the DV)."""
    import pyarrow.parquet as pq

    types = dict(fields)
    rows: list[dict] = []
    for rel in sorted(rel_files):
        part_vals = _part_vals(rel, types)
        skip = set((skip_positions or {}).get(rel, []))
        for i, rec in enumerate(
            pq.read_table(os.path.join(lake_path, rel)).to_pylist()
        ):
            if i in skip:
                continue
            rec.update(part_vals)
            rows.append(rec)
    return rows


def _read_rows_at(
    lake_path: str,
    rel_file: str,
    positions: list[int],
    fields: list[tuple[str, str]],
) -> list[dict]:
    """The rows at exact positions of one file (a DV delta's row
    addresses) — pyarrow take, partition columns re-attached."""
    import pyarrow.parquet as pq

    types = dict(fields)
    part_vals = _part_vals(rel_file, types)
    tbl = pq.read_table(os.path.join(lake_path, rel_file))
    rows = tbl.take(sorted(positions)).to_pylist()
    for rec in rows:
        rec.update(part_vals)
    return rows


def _eq(a, b) -> bool:
    """Value equality with NaN==NaN and element-wise arrays — a
    compaction rewrite of a NaN-bearing row must NOT classify as an
    update."""
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float) and a != a and b != b:
        return True
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


def step_changes(
    lake_path: str,
    version: int,
    key_cols: tuple[str, ...],
    names: list[str] | None = None,
    include_preimages: bool = False,
) -> list[tuple]:
    """Row-level changes version-1 → version, as output tuples (data
    cols in manifest-schema order, then _change, _commit_version).
    `names` overrides the output column list — the STREAM's schema is
    fixed at its latest version, so steps committed before a schema
    evolve emit None for the later-added columns (row comparison still
    uses the step's OWN schema).

    `include_preimages` switches an update from ONE post-image row
    (_change='update') to Delta's two-row form — 'update_preimage' (the
    old row) followed by 'update_postimage' (the new) — which is what
    incremental view maintenance needs: a SUM cannot be maintained
    through an update without subtracting the old value."""
    m = _read_manifest(lake_path, version)
    if "files" in m:  # legacy full-list manifest
        prev = _live_files(lake_path, version - 1) if version > 1 else set()
        cur = set(m["files"])
        adds, removes = cur - prev, prev - cur
    else:
        adds, removes = set(m["adds"]), set(m["removes"])
    # COLUMN MAPPING (r13): everything below runs in PHYSICAL name
    # space — the stable identity data files store. A rename is a
    # metadata-only commit (no adds/removes → zero change rows) and the
    # stream spans it transparently: plan-time logical names translate
    # through the LATEST map (falling back to this step's map, then
    # identity), which resolves to the same physical column for every
    # step on either side of the rename.
    cmap = m.get("column_map", {})
    latest_cmap = table_column_map(lake_path)

    def _phys(n: str) -> str:
        return latest_cmap.get(n, cmap.get(n, n))

    fields = [
        (cmap.get(n, n), t) for n, t in _schema_fields(m["schema"])
    ]
    step_names = [n for n, _ in fields]
    key_cols = tuple(_phys(k) for k in key_cols)
    if names is not None:
        names = [_phys(n) for n in names]
    if names is not None:
        # The stream's column list was fixed at plan time from the
        # then-latest manifest. A schema evolve committed AFTER the plan
        # would silently DROP the new columns from every subsequent
        # change row (zeroing e.g. a downstream materialized view's new
        # value column) — fail loudly instead, like Delta does on a
        # streaming schema change: restart the stream to pick it up.
        extra = [n for n in step_names if n not in names]
        if extra:
            raise ValueError(
                f"lake CDF: version {version} evolved the schema with "
                f"column(s) {extra} not in the stream's plan-time "
                f"columns {names} — restart the stream to pick up the "
                "evolved schema"
            )
    keys = list(key_cols)
    dv_prev = table_dvs(lake_path, version - 1) if version > 1 else {}
    dv_cur = table_dvs(lake_path, version)

    def key_of(r: dict):
        return tuple(r[k] for k in keys)

    # a removed file's already-DV'd rows were reported deleted by the
    # commit that grew the DV — exclude them here (and a new file's DV,
    # which only a restore can produce, masks its rows from insert)
    old_by = {
        key_of(r): r
        for r in _read_rows(lake_path, removes, fields, skip_positions=dv_prev)
    }
    new_by = {
        key_of(r): r
        for r in _read_rows(lake_path, adds, fields, skip_positions=dv_cur)
    }
    # DELETION-VECTOR deltas on files live across the step join the
    # SAME key classification (r13): positions grown at `version` are
    # pre-images (a pure DV delete stays a delete; paired with a
    # same-key appended row — the merge-on-read MERGE — it classifies
    # as an UPDATE, exactly like a rewrite would); positions removed
    # are post-images (a restore re-animating rows = insert).
    for f in sorted(set(dv_cur) | set(dv_prev)):
        if f in adds or f in removes:
            continue
        was, now = set(dv_prev.get(f, [])), set(dv_cur.get(f, []))
        if now - was:
            for r in _read_rows_at(lake_path, f, sorted(now - was), fields):
                old_by[key_of(r)] = r
        if was - now:
            for r in _read_rows_at(lake_path, f, sorted(was - now), fields):
                new_by[key_of(r)] = r
    out_names = names if names is not None else step_names

    def out(r: dict, change: str) -> tuple:
        return tuple(r.get(n) for n in out_names) + (change, version)

    rows: list[tuple] = []
    for k, r in new_by.items():
        if k not in old_by:
            rows.append(out(r, "insert"))
        elif not all(_eq(r.get(n), old_by[k].get(n)) for n in step_names):
            if include_preimages:
                rows.append(out(old_by[k], "update_preimage"))
                rows.append(out(r, "update_postimage"))
            else:
                rows.append(out(r, "update"))  # post-image
        # equal rows: pure re-layout (compaction) — no change emitted
    for k, r in old_by.items():
        if k not in new_by:
            rows.append(out(r, "delete"))
    return rows


class LakeChangeFeedStreamReader(SimpleDataSourceStreamReader):
    def __init__(
        self, options: dict[str, str], names: list[str] | None = None
    ) -> None:
        # the stream's data columns, fixed at plan time — steps from
        # before a schema evolve emit None for later-added columns
        self.names = names
        self.path = options["path"]
        self.key_cols = tuple(
            k.strip() for k in options.get("key_cols", "doc_id").split(",")
        )
        # offset semantics: "changes through version N are emitted";
        # start_version=0 streams the full committed history
        self.start_version = int(options.get("start_version", "0"))
        self.max_versions_per_batch = int(
            options.get("max_versions_per_batch", "100")
        )
        self.include_preimages = (
            options.get("include_preimages", "false").lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        v0 = start["version"]
        versions = snapshot_versions(self.path)
        latest = versions[-1] if versions else 0
        v1 = min(latest, v0 + self.max_versions_per_batch)
        if v1 <= v0:
            return iter([]), start
        return self.readBetweenOffsets(start, {"version": v1}), {"version": v1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows: list[tuple] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            rows.extend(
                step_changes(
                    self.path,
                    v,
                    self.key_cols,
                    names=self.names,
                    include_preimages=self.include_preimages,
                )
            )
        return iter(rows)


class LakeChangeFeedDataSource(DataSource):
    """`spark.dataSource.register(LakeChangeFeedDataSource)` then
    `spark.readStream.format("kstreams_lake_cdf")
         .option("path", lake).load()`."""

    @classmethod
    def name(cls) -> str:
        return "kstreams_lake_cdf"

    def schema(self):
        from pyspark.sql import types as T

        versions = snapshot_versions(self.options["path"])
        if not versions:
            raise ValueError(
                f"no committed snapshots under {self.options['path']}"
            )
        fields = _schema_fields(
            _read_manifest(self.options["path"], versions[-1])["schema"]
        )
        return T.StructType(
            [T.StructField(n, _spark_type(t), True) for n, t in fields]
            + [
                T.StructField("_change", T.StringType(), False),
                T.StructField("_commit_version", T.IntegerType(), False),
            ]
        )

    def simpleStreamReader(self, schema) -> LakeChangeFeedStreamReader:
        names = [f.name for f in schema.fields if f.name not in _META_COLS]
        return LakeChangeFeedStreamReader(dict(self.options), names=names)


# --- partitioned (distributed) change feed ---------------------------------
# VERDICT r12 task 5: the Simple reader above reads every changed file
# on the DRIVER — right for CDC volumes, a cap on large commits. The
# partitioned reader below plans ONE InputPartition per changed file
# (plus one per DV delta), so reads scale with executors and the
# driver touches only manifests. The constraint it designs around: a
# Python DataSource task cannot shuffle, so per-file tasks cannot
# match old vs new rows BY KEY (update classification is a cross-file
# operation). The decomposition:
#
# - the stream emits SIGNED rows — `_side` +1 for rows a version adds,
#   −1 for rows it removes (DV growth = −1, DV shrink = +1) — which is
#   file-local and therefore perfectly partitionable;
# - SUM-shaped consumers (LakeMaterializedAggregate) fold `_side`
#   directly: an update's −old/+new pair IS the subtractor/adder, and
#   a compaction's equal-row ± pairs cancel exactly — no
#   classification needed, bit-equal results;
# - consumers that want Delta's classified form call
#   `classify_changes` on each microbatch (a distributed groupBy over
#   the batch — the shuffle the source could not express), parity-
#   pinned against step_changes per version.

SIGNED_META_COLS = ("_side", "_commit_version")


from pyspark.sql.datasource import InputPartition


class _ChangePartition(InputPartition):
    """One task's work: one data file (whole, minus skip positions) or
    one DV delta (exact positions) of one version, with a sign."""

    def __init__(
        self,
        version: int,
        rel_file: str,
        side: int,
        skip: list[int] | None,
        take: list[int] | None,
    ) -> None:
        self.version = version
        self.rel_file = rel_file
        self.side = side
        self.skip = skip or []
        self.take = take


def _signed_partitions(lake_path: str, v0: int, v1: int) -> list:
    """Plan the (version, file, side) work items for versions (v0, v1]
    — manifests only, no data reads, O(changed files) driver work."""
    parts: list[_ChangePartition] = []
    for v in range(v0 + 1, v1 + 1):
        m = _read_manifest(lake_path, v)
        if "files" in m:  # legacy full-list manifest
            prev = _live_files(lake_path, v - 1) if v > 1 else set()
            cur = set(m["files"])
            adds, removes = cur - prev, prev - cur
        else:
            adds, removes = set(m["adds"]), set(m["removes"])
        dv_prev = table_dvs(lake_path, v - 1) if v > 1 else {}
        dv_cur = table_dvs(lake_path, v)
        for f in sorted(adds):
            parts.append(
                _ChangePartition(v, f, +1, dv_cur.get(f), None)
            )
        for f in sorted(removes):
            parts.append(
                _ChangePartition(v, f, -1, dv_prev.get(f), None)
            )
        for f in sorted(set(dv_cur) | set(dv_prev)):
            if f in adds or f in removes:
                continue
            was, now = set(dv_prev.get(f, [])), set(dv_cur.get(f, []))
            if now - was:
                parts.append(
                    _ChangePartition(v, f, -1, None, sorted(now - was))
                )
            if was - now:
                parts.append(
                    _ChangePartition(v, f, +1, None, sorted(was - now))
                )
    return parts


class LakeChangeFeedPartitionedReader(DataSourceStreamReader):
    def __init__(
        self, options: dict[str, str], names: list[str] | None = None
    ) -> None:
        self.names = names
        self.path = options["path"]
        self.start_version = int(options.get("start_version", "0"))
        self.max_versions_per_batch = int(
            options.get("max_versions_per_batch", "100")
        )
        # last end offset observed in THIS run (latestOffset has no
        # start-offset argument in the Python API) — seeds the
        # per-microbatch version cap below
        self._last_end: int | None = None

    def initialOffset(self) -> dict:
        # A FRESH start calls this before any latestOffset, so the
        # start version IS a known clamp base — seed it so batch 0
        # honors max_versions_per_batch too (ADVICE r14). A RESTART
        # skips initialOffset (the checkpoint has the offset), leaving
        # _last_end None: its first batch spans the full outstanding
        # backlog by design (clamping against an unknown checkpoint
        # offset risks an offset regression = re-emitted signed rows).
        self._last_end = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        versions = snapshot_versions(self.path)
        latest = versions[-1] if versions else 0
        latest = max(self.start_version, latest)
        # Advance at most max_versions_per_batch per microbatch. The
        # Python API hands latestOffset no start offset, so the clamp
        # base is the last end offset seen this run; the FIRST batch of
        # a (re)started query spans the full outstanding backlog — we
        # cannot clamp it against an unknown checkpoint offset without
        # risking an offset regression (re-emission of signed rows).
        if self._last_end is not None:
            latest = min(latest, self._last_end + self.max_versions_per_batch)
            latest = max(latest, self._last_end)  # never regress
        self._last_end = latest
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        # learn the true progress (covers the restart-from-checkpoint
        # case where latestOffset ran before we saw any start offset)
        self._last_end = max(self._last_end or 0, end["version"])
        if self.names is not None:
            # Same plan-time-schema guard as step_changes: a schema
            # evolve committed after the stream planned its column list
            # would silently drop the new columns from every signed row
            # — fail loudly; restart the stream to pick it up.
            latest_cmap = table_column_map(self.path)
            for v in range(start["version"] + 1, end["version"] + 1):
                m = _read_manifest(self.path, v)
                cmap = m.get("column_map", {})
                # physical name space, like step_changes' guard: a
                # rename is metadata-only and spans transparently
                step_names = [
                    cmap.get(n, n) for n, _ in _schema_fields(m["schema"])
                ]
                plan_names = [
                    latest_cmap.get(n, cmap.get(n, n)) for n in self.names
                ]
                extra = [n for n in step_names if n not in plan_names]
                if extra:
                    raise ValueError(
                        f"lake CDF: version {v} evolved the schema with "
                        f"column(s) {extra} not in the stream's "
                        f"plan-time columns {self.names} — restart the "
                        "stream to pick up the evolved schema"
                    )
        parts = _signed_partitions(
            self.path, start["version"], end["version"]
        )
        # Spark requires >= 1 partition; an empty step plans one no-op
        return parts or [_ChangePartition(0, "", 0, None, None)]

    def read(self, partition) -> Iterator[tuple]:
        if partition.side == 0:  # the empty-step no-op partition
            return iter([])
        m = _read_manifest(self.path, partition.version)
        cmap = m.get("column_map", {})
        latest_cmap = table_column_map(self.path)
        fields = [
            (cmap.get(n, n), t) for n, t in _schema_fields(m["schema"])
        ]
        out_names = (
            [latest_cmap.get(n, cmap.get(n, n)) for n in self.names]
            if self.names is not None
            else [n for n, _ in fields]
        )
        if partition.take is not None:
            rows = _read_rows_at(
                self.path, partition.rel_file, partition.take, fields
            )
        else:
            rows = _read_rows(
                self.path,
                {partition.rel_file},
                fields,
                skip_positions={partition.rel_file: partition.skip},
            )
        side, version = partition.side, partition.version
        return iter(
            tuple(r.get(n) for n in out_names) + (side, version)
            for r in rows
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are manifest versions; nothing to clean up


class LakeChangeFeedDistDataSource(DataSource):
    """`spark.dataSource.register(LakeChangeFeedDistDataSource)` then
    `spark.readStream.format("kstreams_lake_cdf_dist")
         .option("path", lake).load()` — the PARTITIONED change feed:
    signed rows, one task per changed file (see module section above
    for the signed-row contract and classify_changes for Delta's
    classified form)."""

    @classmethod
    def name(cls) -> str:
        return "kstreams_lake_cdf_dist"

    def schema(self):
        from pyspark.sql import types as T

        versions = snapshot_versions(self.options["path"])
        if not versions:
            raise ValueError(
                f"no committed snapshots under {self.options['path']}"
            )
        fields = _schema_fields(
            _read_manifest(self.options["path"], versions[-1])["schema"]
        )
        return T.StructType(
            [T.StructField(n, _spark_type(t), True) for n, t in fields]
            + [
                T.StructField("_side", T.IntegerType(), False),
                T.StructField("_commit_version", T.IntegerType(), False),
            ]
        )

    def streamReader(self, schema) -> LakeChangeFeedPartitionedReader:
        names = [
            f.name for f in schema.fields if f.name not in SIGNED_META_COLS
        ]
        return LakeChangeFeedPartitionedReader(
            dict(self.options), names=names
        )


def classify_changes(signed_df, key_cols: tuple[str, ...]):
    """Signed rows (one or more whole versions) → Delta's classified
    form — the distributed shuffle the partitioned SOURCE cannot
    express, as a plain batch transformation for foreachBatch
    consumers: per (version, key), a −1-only group is a delete, a
    +1-only group an insert, both-sides-with-different-payload an
    update (update_preimage + update_postimage rows), both-equal
    nothing (a compaction rewrite cancels). Requires whole versions in
    `signed_df` (the stream's batches are version-aligned) and unique
    keys per snapshot — the step_changes contract; parity per version
    is pinned in tests/test_lake_cdf_dist.py."""
    from pyspark.sql import functions as F

    keys = list(key_cols)
    data_cols = [
        c
        for c in signed_df.columns
        if c not in keys and c not in SIGNED_META_COLS
    ]
    row = F.struct(*data_cols)
    g = (
        signed_df.groupBy("_commit_version", *keys)
        .agg(
            F.sum("_side").alias("_net"),
            F.max(F.when(F.col("_side") == 1, row)).alias("_new"),
            F.max(F.when(F.col("_side") == -1, row)).alias("_old"),
            F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).alias("_n_add"),
            F.sum(F.when(F.col("_side") == -1, 1).otherwise(0)).alias(
                "_n_rm"
            ),
        )
    )
    ins = g.filter("_n_add > 0 AND _n_rm = 0").select(
        *keys, "_new.*", F.lit("insert").alias("_change"), "_commit_version"
    )
    dele = g.filter("_n_rm > 0 AND _n_add = 0").select(
        *keys, "_old.*", F.lit("delete").alias("_change"), "_commit_version"
    )
    upd = g.filter(
        "_n_add > 0 AND _n_rm > 0 AND NOT (_new <=> _old)"
    )
    pre = upd.select(
        *keys,
        "_old.*",
        F.lit("update_preimage").alias("_change"),
        "_commit_version",
    )
    post = upd.select(
        *keys,
        "_new.*",
        F.lit("update_postimage").alias("_change"),
        "_commit_version",
    )
    return ins.unionByName(dele).unionByName(pre).unionByName(post)
