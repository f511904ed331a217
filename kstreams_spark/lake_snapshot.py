"""Snapshot lake: cross-partition atomic commits + time travel over
plain partitioned parquet (VERDICT r10 task 2).

io.delete_where / io.compact_lake heal to all-old-or-all-new PER
PARTITION DIRECTORY — a reader overlapping a multi-partition delete can
see partition A rewritten and partition B not (the torn cross-directory
state test_lake_snapshot.py demonstrates red-before). This module ports
the r10 hybrid group-marker idea (streaming/hybrid.py: one commit point
covering N indexes) to the lake, as a FILE-LEVEL MANIFEST log — the
Delta/Iceberg commit protocol re-expressed over plain parquet:

- data files are IMMUTABLE and append-only: every writer lands new
  uniquely-named part files into the normal `split=…/lang=…` layout
  (Spark's task-UUID file names cannot collide) and never touches an
  existing file;
- a SNAPSHOT is a JSON manifest in `_log/` listing exactly the live
  files; the commit point is one atomic rename of the manifest — a
  reader pins the highest committed version once and sees every
  partition at that version, all-or-nothing;
- old snapshots stay readable (time travel) until vacuum() folds them;
  a crash anywhere before the manifest rename leaves only orphan files
  no snapshot references — recovery is "run the op again", and vacuum
  sweeps the orphans.

Log scaling (r12 — the caveat this paragraph used to state, closed):
manifests are DELTAS — each commit records only `adds`/`removes`
against the previous version, so commit cost is O(files changed), not
O(files in the table). Full state lives in CHECKPOINT sidecars
(`v{N}.checkpoint.json`), written every CHECKPOINT_INTERVAL commits
and for the oldest retained version at vacuum time; a reader resolves
version v by loading the nearest checkpoint ≤ v and replaying ≤
CHECKPOINT_INTERVAL deltas — exactly Delta's `_delta_log` shape
(JSON actions + parquet checkpoints). Checkpoints are DERIVED data,
recomputable from the delta chain, so they sit outside the commit's
atomicity: they're written create-exclusive after the commit lands,
and a lost checkpoint race or a crash before the checkpoint write
costs nothing (the next reader replays a longer chain; a later vacuum
or commit re-attempts). Legacy full-list manifests (pre-r12 `files`
key) act as self-checkpoints, so old logs read unchanged. Partition
values must keep the letter-prefix convention (CLAUDE.md: directory
values are type-inferred on read).

Concurrency contract (r12 — optimistic, the Delta/Iceberg model):
concurrent READERS are always safe (they pin a committed manifest).
WRITERS race on the commit point, which is an atomic CREATE-exclusive
link of the next manifest version (os.link fails EEXIST; a plain
rename silently replaces on POSIX, so two racers could both "win").
On losing the race a writer re-validates against the new latest:

- blind APPENDS (snapshot_publish mode="append", SnapshotLakeSink)
  merge their new files into the new live set and retry onto the next
  version — no coordination needed because appended data files are
  unique-named and never conflict;
- REPLACEMENTS (snapshot_publish mode="replace") retry with their own
  file set — last replacement wins, which is what "replace" means;
- MAINTENANCE (snapshot_delete_where / snapshot_compact) computed its
  rewrite from a base snapshot; a conflicting commit invalidates that
  rewrite, so it aborts loudly — re-run against the new latest (its
  orphaned rewrite files are vacuum-swept).

Schema contract (r12): every manifest records its version's schema and
snapshot_read scans with it EXPLICITLY (schema from metadata, never
from file footers — so old files NULL-fill later-added columns, time
travel sees each version's own schema, and partition values take the
declared type instead of directory-name inference). Append paths
(snapshot_publish mode="append", SnapshotLakeSink) ENFORCE the
committed schema and re-validate it inside the commit-retry loop (a
racing evolve cannot be silently overwritten); `evolve=True` permits
ADD-COLUMN appends; mode="replace" may take any schema (a full
rewrite — Delta's overwriteSchema).

Deletion vectors (r12): snapshot_delete_where_dv is the MERGE-ON-READ
delete — matching rows' (file, row-position) addresses land in an
immutable uuid-named `_log/dv-*.json` sidecar and the manifest's `dvs`
map points each file at its current vector; data files never move.
snapshot_read anti-joins the vectors (so every verb built on it sees
the deleted-world), rewrites MATERIALIZE them (compact treats a DV'd
file as always over budget; a retired file's entry drops with the
file), restore restores the old vector state, the change feed reports
DV growth as deletes and DV shrink (restore) as inserts, and vacuum
sweeps sidecars no retained manifest references. Delta's DV model over
JSON sidecars — production swaps roaring bitmaps into the same
addressing and lifecycle.

Consumers: snapshot_diff (batch CDC between two versions, below) and
sources/lake_cdf.py (the same feed as a STREAMING source — offsets are
manifest versions; Delta readChangeFeed's shape; spans schema
evolution by NULL-filling pre-evolve steps).

Reference: the lake surface extends the reference's declared
persistence growth path (BME680.java:41-44 — Avro/storage),
re-expressed as Spark-native table maintenance.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil as _shutil
import threading as _threading
import time
import uuid as _uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark import lake_stats as _lstats

_LOG = "_log"

# Full-state checkpoint cadence (Delta's checkpointInterval default):
# a reader replays at most this many delta manifests past a checkpoint.
CHECKPOINT_INTERVAL = 10

# Deletion vectors live on the driver (sidecar JSON) and ride into every
# scan as a broadcast (file, row-position) list — the same bounded-
# driver-state class as dedup.DRIVER_CC_MAX_EDGES, and sized the same
# way (collect() Rows cost ~100-150 B each, ~10× the raw field bytes).
# Above this many TOTAL positions, snapshot_delete_where_dv refuses
# (use the CoW delete) and snapshot_read refuses (compact first to
# materialize the vectors) — a silent driver OOM is the alternative.
DRIVER_DV_MAX_POSITIONS = 500_000

# snapshot_merge broadcasts the distinct source-key frame into its
# matched join only while the key count (known for free from the
# uniqueness-check agg) stays broadcast-sized; a wider merge keeps the
# join hint-free and lets AQE pick the strategy — the documented
# "use copy-on-write for wide merges" path must not itself collect
# every source key to the driver (ADVICE r14).
DRIVER_MERGE_BROADCAST_MAX_KEYS = 500_000


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"v{version:010d}.json")


def _checkpoint_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"v{version:010d}.checkpoint.json")


# Checkpoints above this many file entries shard into fixed-size parts
# (Delta's multi-part checkpoint): bounded part sizes for write/read,
# and a crash mid-write can never produce a readable-but-wrong state —
# the completeness rule below falls back to the delta chain.
CHECKPOINT_SHARD_FILES = 100_000


def _checkpoint_part_path(path: str, version: int, i: int, n: int) -> str:
    return os.path.join(
        _log_dir(path),
        f"v{version:010d}.checkpoint.part-{i:05d}-of-{n:05d}.json",
    )


def _read_checkpoint_full(
    path: str, version: int
) -> tuple[set[str], dict] | None:
    """The checkpointed (live set, per-file stats) for `version`, or
    None when absent or INCOMPLETE (a sharded write that crashed
    mid-way: fewer parts on disk than the names declare — fall back to
    the delta chain; the slices are a deterministic function of the
    version's immutable live set, so a later writer completes the same
    torn set in place). Pre-r15 checkpoints carry no `stats` key —
    their files resolve with empty stats (never skipped)."""
    cp = _checkpoint_path(path, version)
    if os.path.exists(cp):
        with open(cp) as fh:
            body = json.load(fh)
        return set(body["files"]), body.get("stats", {})
    parts = sorted(
        _glob.glob(
            os.path.join(
                _log_dir(path), f"v{version:010d}.checkpoint.part-*.json"
            )
        )
    )
    if not parts:
        return None
    n = int(parts[0].rsplit("-of-", 1)[1].split(".")[0])
    if len(parts) != n:
        return None
    out: set[str] = set()
    stats: dict = {}
    for p in parts:
        with open(p) as fh:
            body = json.load(fh)
        out |= set(body["files"])
        stats.update(body.get("stats", {}))
    return out, stats


def _read_checkpoint(path: str, version: int) -> set[str] | None:
    full = _read_checkpoint_full(path, version)
    return None if full is None else full[0]


def snapshot_versions(path: str) -> list[int]:
    """Committed snapshot versions, ascending."""
    if not os.path.isdir(_log_dir(path)):
        return []
    return sorted(
        int(n[1:-5])
        for n in os.listdir(_log_dir(path))
        if n.startswith("v")
        and n.endswith(".json")
        and ".checkpoint" not in n
    )


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def _split_top_level(body: str) -> list[str]:
    """Split a simpleString struct body on commas OUTSIDE <> / () —
    `a:bigint,b:array<double>,c:decimal(18,6)` → three parts. (Shared
    with sources/lake_cdf.py, which parses manifests in session-less
    stream-reader processes.)"""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _schema_fields(schema_str: str) -> list[tuple[str, str]]:
    """(name, simple-type) pairs of a manifest's recorded schema —
    plain string parsing, no SparkSession required."""
    s = schema_str.strip()
    if not (s.startswith("struct<") and s.endswith(">")):
        raise ValueError(f"expected struct<...> schema, got {s[:40]!r}")
    return [
        tuple(part.split(":", 1))
        for part in _split_top_level(s[len("struct<") : -1])
    ]


def _check_append_schema(
    new_schema: str, committed: str, evolve: bool, op: str
) -> str:
    """Schema ENFORCEMENT on append paths (the Delta contract): an
    appended batch must match the committed schema exactly; with
    `evolve=True` it may ADD columns at the end (same leading fields,
    same types — ADD COLUMN semantics; renames/drops/type changes go
    through mode="replace", which is a full rewrite and may take any
    schema). Returns the schema the new manifest should record."""
    if new_schema == committed:
        return committed
    if not evolve:
        raise ValueError(
            f"{op}: schema drift — committed {committed} but the batch "
            f"writes {new_schema}; pass evolve=True to ADD columns, or "
            "mode='replace' to rewrite under a new schema"
        )
    old_f, new_f = _schema_fields(committed), _schema_fields(new_schema)
    if new_f[: len(old_f)] != old_f or len(new_f) <= len(old_f):
        raise ValueError(
            f"{op}: evolve=True only APPENDS columns — committed fields "
            f"{old_f} must be an exact prefix of {new_f} (rename/drop/"
            "type-change requires mode='replace')"
        )
    return new_schema


def table_column_map(path: str, version: int | None = None) -> dict[str, str]:
    """COLUMN MAPPING (r13, Delta's rename-without-rewrite class):
    logical column name → PHYSICAL name (the name data files actually
    store). Absent entries mean physical == logical; the map is empty
    until the first snapshot_rename_column. Physical names are STABLE —
    a rename changes only the logical side, so files written before it
    resolve through the map with zero rewrites, and the map is the
    identity carried across versions for CDF/diff alignment."""
    versions = snapshot_versions(path)
    if not versions:
        return {}
    v = versions[-1] if version is None else version
    return dict(_read_manifest(path, v).get("column_map", {}))


def _physical_fields(
    fields: list[tuple[str, str]], cmap: dict[str, str]
) -> list[tuple[str, str]]:
    return [(cmap.get(n, n), t) for n, t in fields]


def _to_physical_df(df: DataFrame, cmap: dict[str, str]) -> DataFrame:
    """Rename a LOGICAL-named batch to physical names for writing."""
    for logical, physical in cmap.items():
        if logical != physical and logical in df.columns:
            df = df.withColumnRenamed(logical, physical)
    return df


def _live_files(path: str, version: int) -> set[str]:
    """The live file set at `version`: nearest checkpoint at or below it
    (a checkpoint sidecar, or a legacy manifest carrying a full `files`
    list) plus a replay of the delta manifests above — O(files) for the
    checkpoint read + O(changes) per replayed delta, never O(table)
    per commit."""
    deltas: list[dict] = []
    v = version
    state: set[str] = set()
    while v >= 1:
        cp_files = _read_checkpoint(path, v)
        if cp_files is not None:
            state = cp_files
            break
        m = _read_manifest(path, v)
        if "files" in m:  # legacy full-list manifest: self-checkpoint
            state = set(m["files"])
            break
        deltas.append(m)
        v -= 1
    for m in reversed(deltas):
        state = (state - set(m["removes"])) | set(m["adds"])
    return state


def table_stats(path: str, version: int) -> dict[str, dict]:
    """Per-file column stats for `version`'s live files (r15 — Delta
    data skipping's log-resident stats): nearest checkpoint's `stats`
    plus a replay of the delta manifests' `add_stats` above it — the
    same O(checkpoint + changes) resolution as _live_files, and the
    same key space as the data files (PHYSICAL column names, so a
    rename is metadata-only here too). Files with no recorded stats
    (pre-r15 commits, unreadable footers, unsupported types) are simply
    absent — they are scanned, never skipped."""
    deltas: list[dict] = []
    v = version
    state: dict[str, dict] = {}
    live: set[str] | None = None
    while v >= 1:
        full = _read_checkpoint_full(path, v)
        if full is not None:
            live, state = set(full[0]), dict(full[1])
            break
        m = _read_manifest(path, v)
        if "files" in m:  # legacy full-list manifest: no stats
            live = set(m["files"])
            break
        deltas.append(m)
        v -= 1
    if live is None:
        live = set()
    for m in reversed(deltas):
        for f in m["removes"]:
            state.pop(f, None)
            live.discard(f)
        live |= set(m["adds"])
        state.update(m.get("add_stats", {}))
    return {f: s for f, s in state.items() if f in live}


def _write_checkpoint(
    path: str, version: int, files: set[str], stats: dict | None = None
) -> None:
    """Write the full-state sidecar for `version` — DERIVED data outside
    the commit's atomicity: create-exclusive, and a lost race (another
    actor checkpointed the same version) or a crash costs nothing
    (readers replay the delta chain; the next vacuum/commit retries,
    completing any torn shard set in place — the slices are a pure
    function of the version's immutable live set). Above
    CHECKPOINT_SHARD_FILES entries the checkpoint shards into
    fixed-size parts named `part-{i}-of-{n}` — a reader requires all n
    (see _read_checkpoint). Production formats store the parts as
    parquet for predicate-pruned checkpoint scans; the layout and
    completeness protocol are what this re-expresses."""
    if _read_checkpoint(path, version) is not None:
        return

    def _link(body: dict, final: str) -> None:
        tmp = os.path.join(
            _log_dir(path),
            f".tmp-cp{version}-{os.getpid()}-{_uuid.uuid4().hex[:8]}",
        )
        with open(tmp, "w") as fh:
            json.dump(body, fh)
        try:
            os.link(tmp, final)
        except FileExistsError:
            pass  # concurrent checkpointer won; content is identical
        os.remove(tmp)

    stats = stats or {}

    def _slice_stats(part: list[str]) -> dict:
        return {f: stats[f] for f in part if f in stats}

    ordered = sorted(files)
    if len(ordered) <= CHECKPOINT_SHARD_FILES:
        _link(
            {
                "version": version,
                "files": ordered,
                "stats": _slice_stats(ordered),
            },
            _checkpoint_path(path, version),
        )
        return
    n = -(-len(ordered) // CHECKPOINT_SHARD_FILES)
    for i in range(n):
        part = ordered[
            i * CHECKPOINT_SHARD_FILES : (i + 1) * CHECKPOINT_SHARD_FILES
        ]
        _link(
            {
                "version": version,
                "part": i,
                "n_parts": n,
                "files": part,
                "stats": _slice_stats(part),
            },
            _checkpoint_part_path(path, version, i, n),
        )


def _dv_sidecar_path(path: str, name: str) -> str:
    return os.path.join(_log_dir(path), name)


def table_dvs(path: str, version: int) -> dict[str, list[int]]:
    """DELETION VECTORS in force at `version`: rel_file → sorted row
    positions logically deleted from that file (merge-on-read; the
    Delta DV model over JSON sidecars — production uses roaring
    bitmaps, the addressing and lifecycle are what this re-expresses).
    The manifest's `dvs` map points each file at the content-addressed
    sidecar holding its CURRENT positions."""
    m = _read_manifest(path, version)
    out: dict[str, list[int]] = {}
    by_sidecar: dict[str, dict] = {}
    for rel_file, sidecar in m.get("dvs", {}).items():
        if sidecar not in by_sidecar:
            with open(_dv_sidecar_path(path, sidecar)) as fh:
                by_sidecar[sidecar] = json.load(fh)["dvs"]
        out[rel_file] = by_sidecar[sidecar][rel_file]
    return out


def _write_dv_sidecar(path: str, dvs: dict[str, list[int]]) -> str:
    """Write one immutable, uuid-named sidecar holding the FULL merged
    position lists for every file it covers; returns its name. Written
    BEFORE the commit that references it — an unreferenced sidecar
    (commit lost/crashed) is vacuum-swept like an orphan data file."""
    name = f"dv-{_uuid.uuid4().hex}.json"
    # `.tmp-` prefix: vacuum's age-guarded tmp sweep globs `.tmp-*`, so
    # a crash between staging and rename cannot leak the file forever
    tmp = _dv_sidecar_path(path, ".tmp-" + name)
    os.makedirs(_log_dir(path), exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump({"dvs": {f: sorted(p) for f, p in dvs.items()}}, fh)
    os.rename(tmp, _dv_sidecar_path(path, name))
    return name


def _norm_file_uri(col):
    """_metadata.file_path renders a file: URI; normalize to a plain
    absolute path for joining against os.path-built addresses."""
    return F.regexp_replace(col, "^file:/+", "/")


def _list_files(path: str) -> set[str]:
    """Data files currently on disk, path-relative (the `_log` dir is
    outside the glob: partition dirs are `key=value`; dot-dirs —
    .staging-* included — are skipped by glob's hidden rule). Only
    vacuum() walks the table this way (it must see orphans); every
    writer learns its own file set from _write_staged, O(that write)."""
    out = set()
    for f in _glob.glob(
        os.path.join(path, "**", "*.parquet"), recursive=True
    ):
        rel = os.path.relpath(f, path)
        if not rel.startswith(_LOG + os.sep):
            out.add(rel)
    return out


def _constraint_observer(df: DataFrame, constraints: dict[str, str], op: str):
    """Attach CHECK-violation metrics to a (logical-named) batch about
    to be written; returns (df, check) — `check()` runs after the write
    action and raises the standard violation error. Attach BEFORE
    _to_physical_df: predicates reference logical column names."""
    if not constraints:
        return df, None
    from pyspark.sql import Observation

    obs = Observation()
    names = sorted(constraints)
    df = df.observe(
        obs,
        *[
            _violation_metric(constraints[n]).alias(f"_c{i}")
            for i, n in enumerate(names)
        ],
    )

    def check() -> None:
        got = obs.get
        bad = {
            n: (constraints[n], got[f"_c{i}"])
            for i, n in enumerate(names)
            if got.get(f"_c{i}")
        }
        if bad:
            _raise_violation(op, bad)

    return df, check


_TS_KEY = "spark.sql.parquet.outputTimestampType"
_TS_LOCK = _threading.Lock()
_TS_DEPTH = 0
_TS_PREV: str | None = None


def _ts_conf_enter(spark: SparkSession) -> None:
    """First concurrent staged writer captures the session's timestamp
    encoding and pins TIMESTAMP_MICROS; nested/overlapping writers just
    bump the refcount (every writer pins the SAME value)."""
    global _TS_DEPTH, _TS_PREV
    with _TS_LOCK:
        if _TS_DEPTH == 0:
            try:
                _TS_PREV = spark.conf.get(_TS_KEY)
            except Exception:  # noqa: BLE001 - unset conf
                _TS_PREV = None
            spark.conf.set(_TS_KEY, "TIMESTAMP_MICROS")
        _TS_DEPTH += 1


def _ts_conf_exit(spark: SparkSession) -> None:
    """Last writer out restores the captured encoding (or unsets)."""
    global _TS_DEPTH, _TS_PREV
    with _TS_LOCK:
        _TS_DEPTH -= 1
        if _TS_DEPTH == 0:
            if _TS_PREV is None:
                spark.conf.unset(_TS_KEY)
            else:
                spark.conf.set(_TS_KEY, _TS_PREV)


def _write_staged(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    check=None,
) -> tuple[set[str], dict[str, dict]]:
    """Write a batch into the table THROUGH a unique staging directory
    and move the files into the final layout; returns (exactly this
    write's path-relative files, their per-file column stats — r15,
    read from each staged footer ONCE at write time so every later
    selective scan prunes files driver-side without opening them;
    lake_stats module docstring). Replaces the r13 before/after
    directory diff, which (a) cost one extra distinct job per write
    just to scope the listing (_touched_dirs re-scanned the batch
    source — measured ~0.2 s per verb at sf0.1, the r13 lake-chain
    regression) and (b) could fold a CONCURRENT writer's in-flight
    files into this commit's file set (two racing appends to the same
    partition would each diff in the other's files → duplicate rows
    once both commit). The staging listing is O(this write's files);
    each move is a same-filesystem os.rename (staging lives INSIDE the
    table dir). At object-store scale the equivalent is direct-to-final
    task writes with the commit protocol's written-file manifest — the
    snapshot manifest, not the directory layout, is the source of truth
    either way. Crash surface: an orphan .staging-* dir (invisible to
    readers — manifests reference only committed files, and _list_files'
    glob skips dot-dirs) is age-guard-swept by vacuum().

    `check` (from _constraint_observer, attached to the LOGICAL-named
    batch before any physical rename) folds CHECK enforcement INTO the
    write job via observe() metrics (Delta's model: invariants are
    checked by the write itself, not by a pre-pass scan — one source
    scan saved per constrained write). A violation removes the staging
    dir and raises before any file enters the table layout: "nothing
    was written" still holds at the only visibility boundary readers
    have (the manifest plus the final layout)."""
    stage = os.path.join(path, f".staging-{_uuid.uuid4().hex}")
    # Spark's default parquet timestamp encoding is INT96, which the
    # format deprecates and which carries NO column statistics — every
    # timestamp column would silently lose data skipping (r15; found
    # via the temporal-pruning test). Scope-set TIMESTAMP_MICROS (the
    # encoding Delta requires) for the staged write and restore after
    # (probe-then-set: spark.conf.get(key, default) VALIDATES the
    # default — CLAUDE.md — so probe with the no-default form).
    # Refcounted (r15): session confs are process-global, so CONCURRENT
    # staged writes (snapshot_compact overlaps independent per-partition
    # rewrites, guide §2.6) must not race the capture/restore — the
    # first writer in captures, the last one out restores.
    spark = df.sparkSession
    _ts_conf_enter(spark)
    try:
        w = df.write.mode("append")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(stage)
    finally:
        _ts_conf_exit(spark)
    if check is not None:
        try:
            check()
        except Exception:
            _shutil.rmtree(stage, ignore_errors=True)
            raise
    new: set[str] = set()
    stats: dict[str, dict] = {}
    for f in _glob.glob(
        os.path.join(stage, "**", "*.parquet"), recursive=True
    ):
        rel = os.path.relpath(f, stage)
        fs = _lstats.collect_file_stats(f)
        if fs is not None:
            stats[rel] = fs
        dest = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(f, dest)
        new.add(rel)
    _shutil.rmtree(stage, ignore_errors=True)
    return new, stats


def _commit(
    path: str,
    files: set[str],
    op: str,
    schema_ddl: str,
    new_epoch: int | None = None,
    base_version: int | None = None,
    recompute: Callable[[set[str]], set[str]] | None = None,
    recheck_schema: Callable[[str], str] | None = None,
    set_constraints: dict[str, str] | None = None,
    set_dvs: dict[str, str] | None = None,
    set_column_map: dict[str, str] | None = None,
    set_dropped_physical: list[str] | None = None,
    set_epochs: list[int] | None = None,
    set_properties: dict[str, str] | None = None,
    add_stats: dict[str, dict] | None = None,
) -> int:
    """Write manifest version = last + 1. The commit point is an atomic
    CREATE-exclusive os.link of the fully-written temp manifest onto the
    version path — link fails EEXIST when a concurrent writer already
    committed that version (rename would silently replace it on POSIX,
    letting two racers both believe they won).

    Optimistic concurrency: `base_version` is the committed version the
    caller computed `files` against (None = the files are independent of
    prior state). On a conflict — the latest version moved past
    base_version, detected before the first attempt or via EEXIST on the
    link — the commit re-validates: with `recompute` (called with the
    NEW latest live-file set, returns the files to commit) it retries
    onto the next version; without it, it aborts loudly (maintenance
    rewrites are invalid once their base moved — re-run them).

    The committed-epoch set (SnapshotLakeSink's exactly-once record) is
    CARRIED FORWARD into every manifest, so vacuum() retiring old
    versions can never turn a checkpoint-lagged epoch replay into a
    duplicate commit — the newest manifest always knows every epoch.

    Log scaling (r12): the manifest body records only the DELTA against
    the previous version (`adds`/`removes` — O(files changed)); full
    state lives in checkpoint sidecars written every
    CHECKPOINT_INTERVAL commits (module docstring)."""
    while True:
        versions = snapshot_versions(path)
        latest = versions[-1] if versions else 0
        prev_live = _live_files(path, latest) if versions else set()
        if recheck_schema is not None and versions:
            # schema enforcement holds even when a racing commit (e.g. a
            # concurrent evolve) lands between the caller's check and
            # this attempt — re-validate against what is NOW committed
            schema_ddl = recheck_schema(
                _read_manifest(path, latest)["schema"]
            )
        if base_version is not None and latest != base_version:
            if recompute is None:
                raise ValueError(
                    f"snapshot commit conflict: {op} computed against "
                    f"v{base_version} but v{latest} is now committed — "
                    "re-run the operation against the new snapshot"
                )
            files = recompute(prev_live)
            base_version = latest
        version = latest + 1
        prev_m = _read_manifest(path, latest) if versions else {}
        # set_epochs seeds a FRESH table's carried-forward epoch set
        # (snapshot_clone); on an existing table the previous manifest
        # is authoritative
        epochs = (
            prev_m.get("epochs", [])
            if set_epochs is None or versions
            else sorted(set(set_epochs))
        )
        if new_epoch is not None:
            epochs = sorted(set(epochs) | {int(new_epoch)})
        # CHECK constraints carry forward like epochs; set/drop verbs
        # pass the replacement map
        constraints = (
            prev_m.get("constraints", {})
            if set_constraints is None
            else set_constraints
        )
        # TBLPROPERTIES (r14) carry forward identically
        properties = (
            prev_m.get("properties", {})
            if set_properties is None
            else set_properties
        )
        # deletion vectors carry forward per surviving file — a rewrite
        # that retires a file MATERIALIZES its DV (the entry drops with
        # the file); set_dvs overrides (the DV-delete and restore verbs)
        dvs = (
            {
                f: sc
                for f, sc in prev_m.get("dvs", {}).items()
                if f in files
            }
            if set_dvs is None
            else set_dvs
        )
        # the logical→physical column map carries forward like the
        # constraint set; rename commits pass the replacement
        column_map = (
            prev_m.get("column_map", {})
            if set_column_map is None
            else set_column_map
        )
        # physical names retired by DROP COLUMN stay reserved forever
        # (data files still store them — reuse would bind new reads to
        # old data); replace passes [] to reset with its fresh world
        dropped_physical = (
            prev_m.get("dropped_physical", [])
            if set_dropped_physical is None
            else set_dropped_physical
        )
        os.makedirs(_log_dir(path), exist_ok=True)
        adds = files - prev_live
        body = {
            "version": version,
            "op": op,
            "adds": sorted(adds),
            "removes": sorted(prev_live - files),
            # per-file column stats ride the ADD action (Delta's shape):
            # O(files changed) per manifest; checkpoints fold full state
            "add_stats": {
                f: s for f, s in (add_stats or {}).items() if f in adds
            },
            "schema": schema_ddl,
            "epochs": epochs,
            "constraints": constraints,
            "dvs": dvs,
            "column_map": column_map,
            "dropped_physical": dropped_physical,
            "properties": properties,
        }
        # unique temp name: concurrent committers must not share one
        tmp = os.path.join(
            _log_dir(path), f".tmp-v{version}-{os.getpid()}-{_uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "w") as fh:
            json.dump(body, fh)
        final = _manifest_path(path, version)
        try:
            os.link(tmp, final)  # the commit point: atomic, create-exclusive
        except FileExistsError:
            os.remove(tmp)
            if recompute is None:
                raise ValueError(
                    f"snapshot commit conflict: {op} lost the v{version} "
                    "commit race — re-run the operation against the new "
                    "snapshot"
                )
            if base_version is None:
                # files independent of prior state (replace): same files,
                # next version — flag staleness so the loop re-reads
                base_version = -1
            continue
        os.remove(tmp)
        # checkpoint cadence is property-tunable per table (r14:
        # TBLPROPERTIES `kstreams.checkpoint.interval` — Delta's
        # delta.checkpointInterval analog); malformed values fall back
        try:
            interval = int(
                properties.get(
                    "kstreams.checkpoint.interval", CHECKPOINT_INTERVAL
                )
            )
        except (TypeError, ValueError):
            interval = CHECKPOINT_INTERVAL
        if interval > 0 and version % interval == 0:
            _write_checkpoint(
                path, version, files, stats=table_stats(path, version)
            )
        return version


def snapshot_publish(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("split", "lang"),
    mode: str = "replace",
    evolve: bool = False,
) -> int:
    """Publish a corpus as a snapshot. mode="replace" (default): the new
    snapshot lists exactly this write's files — a full replacement; old
    versions stay readable until vacuum. mode="append": the new snapshot
    is the latest live set PLUS this write's files — a blind append,
    which under a commit race auto-retries onto the next version (its
    data files are unique-named and never conflict).

    Schema contract (r12, the Delta model): appends ENFORCE the
    committed schema — a drifted batch raises before writing anything;
    `evolve=True` permits ADD-COLUMN appends (the committed fields stay
    an exact prefix; earlier files surface the new columns as NULL via
    snapshot_read's explicit-schema scan, and each version keeps ITS
    schema for time travel). mode="replace" is a full rewrite and may
    take any schema (Delta's overwriteSchema)."""
    if mode not in ("replace", "append"):
        raise ValueError(f"mode must be 'replace' or 'append', got {mode!r}")
    schema_ddl = df.schema.simpleString()
    recheck = lambda committed: _check_append_schema(  # noqa: E731
        df.schema.simpleString(), committed, evolve, "snapshot_publish(append)"
    )
    # CHECK constraints survive replace (the Delta rule); enforcement
    # rides the write job itself (observe metrics, r14)
    df, check = _constraint_observer(
        df, table_constraints(path), f"snapshot_publish({mode})"
    )
    if mode == "append":
        versions = snapshot_versions(path)
        if versions:  # enforce BEFORE writing any data file
            base_m = _read_manifest(path, versions[-1])
            schema_ddl = recheck(base_m["schema"])
            _check_added_names(
                df.schema.simpleString(), base_m, "snapshot_publish(append)"
            )
            _check_partition_cols(
                _live_files(path, versions[-1]),
                partition_cols,
                "snapshot_publish(append)",
            )
    # appends write under the PHYSICAL names (column mapping, r13);
    # replace defines a fresh schema and resets the map to identity
    out_df = (
        _to_physical_df(df, table_column_map(path))
        if mode == "append"
        else df
    )
    new, new_stats = _write_staged(out_df, path, partition_cols, check=check)
    if mode == "append":
        base = versions[-1] if versions else 0
        live = _live_files(path, base) if versions else set()
        return _commit(
            path,
            live | new,
            "append",
            schema_ddl,
            base_version=base,
            recompute=lambda latest_live: latest_live | new,
            recheck_schema=recheck,
            add_stats=new_stats,
        )
    return _commit(
        path,
        new,
        "publish",
        schema_ddl,
        recompute=lambda latest_live: new,
        set_column_map={},
        set_dropped_physical=[],
        add_stats=new_stats,
    )


def version_at_timestamp(path: str, ts: float) -> int:
    """TIMESTAMP AS OF: the newest version committed at or before `ts`
    (epoch seconds) — by manifest mtime, the commit point's own clock.
    Raises when the earliest retained version is younger than `ts`
    (vacuum already folded the history that would have answered)."""
    versions = snapshot_versions(path)
    eligible = [
        v
        for v in versions
        if os.path.getmtime(_manifest_path(path, v)) <= ts
    ]
    if not eligible:
        raise ValueError(
            f"no snapshot committed at or before ts={ts} under {path} "
            f"(earliest retained version is newer — vacuumed history?)"
        )
    return eligible[-1]


def snapshot_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    at_timestamp: float | None = None,
    where: str | None = None,
    _apply_dv_cap: bool = True,
    _files: set[str] | None = None,
) -> DataFrame:
    """Read one committed snapshot — the latest, a VERSION AS OF pin,
    or a TIMESTAMP AS OF pin (`at_timestamp`, epoch seconds — resolved
    against manifest commit times; mutually exclusive with `version`).
    One manifest read = one consistent cross-partition view; files a
    later (or in-flight) commit added are invisible, files it removed
    are still here.

    The scan takes THE MANIFEST'S schema explicitly (r12) — the
    table-format read: schema from metadata, never from file footers.
    Files written before an evolve surface the later-added columns as
    NULL, a time-travel pin sees ITS version's schema, column order is
    the logical schema's regardless of file listing, and partition
    values take the declared type instead of directory-name inference.

    `where` (r15 — Delta data skipping): a SQL predicate applied to the
    result AND used to prune the live-file set DRIVER-SIDE against the
    manifest-resident per-file stats (lake_stats): files whose recorded
    [min, max]/null-count prove no row can match are never opened — at
    100 TB / millions of files this turns a selective read's plan step
    from open-every-footer into a listing-sized metadata walk. Only
    AND-of-simple-comparison conjuncts prune (module doctrine:
    conservative subset; exactness always comes from the real filter).
    `_files` (internal) restricts the scan to a caller-pruned subset —
    the merge verbs' key-range pruning enters here."""
    from pyspark.sql.types import _parse_datatype_string

    # DV addressing joins against absolute paths built from
    # _metadata.file_path — a relative `path` would make the anti-join
    # match nothing (deleted rows silently reappear), so normalize first
    path = os.path.abspath(path)
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    if at_timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR at_timestamp, not both")
        version = version_at_timestamp(path, at_timestamp)
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"snapshot v{v} not in committed versions {versions}")
    m = _read_manifest(path, v)
    files = _live_files(path, v)
    if _files is not None:
        files = files & _files
    if where is not None and files:
        files, _ = _prune_live(path, v, m, files, where)
    if not files:
        out = spark.createDataFrame([], m["schema"])
        return out.filter(where) if where is not None else out
    # basePath keeps the partition columns parsed from the dir names;
    # the trailing select restores the logical order (a partitioned scan
    # appends partition columns at the end regardless of user schema).
    # COLUMN MAPPING (r13): data files store PHYSICAL names — scan with
    # the physical schema, alias back to this version's logical names.
    st = _parse_datatype_string(m["schema"])
    cmap = m.get("column_map", {})
    phys_st = _parse_datatype_string(
        "struct<"
        + ",".join(
            f"{pn}:{t}"
            for pn, t in _physical_fields(_schema_fields(m["schema"]), cmap)
        )
        + ">"
    )
    scan = (
        spark.read.schema(phys_st)
        .option("basePath", path)
        .parquet(*[os.path.join(path, f) for f in sorted(files)])
    )
    dvs = table_dvs(path, v)
    if dvs:
        # merge-on-read: anti-join the deletion vectors on the row
        # address (file path, row index). Pair volume = deletes since
        # the last materializing rewrite — broadcast-sized by design,
        # and ENFORCED: past the cap the broadcast itself is the OOM
        n_pos = sum(len(p) for p in dvs.values())
        if _apply_dv_cap and n_pos > DRIVER_DV_MAX_POSITIONS:
            raise ValueError(
                f"snapshot_read: {n_pos} accumulated deletion-vector "
                f"positions exceed DRIVER_DV_MAX_POSITIONS="
                f"{DRIVER_DV_MAX_POSITIONS} (broadcast scale) — run "
                "snapshot_compact to materialize the vectors first"
            )
        pairs = [
            (os.path.join(path, f), int(pos))
            for f, positions in dvs.items()
            for pos in positions
        ]
        dv_df = spark.createDataFrame(pairs, "_dv_fp string, _dv_ri long")
        scan = (
            scan.withColumn(
                "_fp", _norm_file_uri(F.col("_metadata.file_path"))
            )
            .withColumn("_ri", F.col("_metadata.row_index"))
            .join(
                F.broadcast(dv_df),
                (F.col("_fp") == F.col("_dv_fp"))
                & (F.col("_ri") == F.col("_dv_ri")),
                "left_anti",
            )
        )
    out = scan.select(
        *[
            F.col(cmap.get(f.name, f.name)).alias(f.name)
            for f in st.fields
        ]
    )
    # the REAL predicate always applies — pruning only removed files
    # that provably hold no matching row
    return out.filter(where) if where is not None else out


def _prune_live(
    path: str,
    version: int,
    m: dict,
    files: set[str],
    where: str,
) -> tuple[set[str], int]:
    """Driver-side file skipping (r15): keep only the live files that
    MAY hold a row matching `where`, using (a) the manifest-resident
    per-file column stats (lake_stats.file_may_match) and (b) the
    partition values encoded in each file's directory path — both pure
    metadata, zero file opens. Returns (kept files, n skipped)."""
    conj = _lstats.parse_skip_conjuncts(where)
    return _prune_with_conjuncts(path, version, m, files, conj)


def _prune_with_conjuncts(
    path: str,
    version: int,
    m: dict,
    files: set[str],
    conj: list[tuple],
) -> tuple[set[str], int]:
    if not conj:
        return files, 0
    col_types = dict(_schema_fields(m["schema"]))
    cmap = m.get("column_map", {})
    stats = table_stats(path, version)
    kept: set[str] = set()
    for f in files:
        # partition-dir values: `col=value` path segments
        pvals: dict[str, str | None] = {}
        for seg in os.path.dirname(f).split(os.sep):
            if "=" in seg:
                k, raw = seg.split("=", 1)
                try:
                    val = _unescape_partition_value(raw)
                except ValueError:
                    continue  # not a Hive-escaped segment — no pruning
                pvals[k] = None if val is None else str(val)
        if not _partition_may_match(pvals, conj, col_types):
            continue
        if not _lstats.file_may_match(stats.get(f), conj, cmap, col_types):
            continue
        kept.add(f)
    return kept, len(files) - len(kept)


def _partition_may_match(
    pvals: dict[str, str | None], conjuncts: list[tuple], col_types: dict
) -> bool:
    """Partition pruning at the manifest layer: every row of the file
    carries exactly these partition values, so a conjunct on a
    partition column decides the whole file."""
    for col, op, lit in conjuncts:
        if col not in pvals:
            continue
        raw = pvals[col]
        if op == "isnull":
            if raw is not None:
                return False
            continue
        if op == "isnotnull":
            if raw is None:
                return False
            continue
        if raw is None:
            return False  # NULL satisfies no comparison/IN
        ctype = col_types.get(col)
        if ctype is None:
            continue
        pv = _lstats._coerce(ctype, "stat", raw)
        if pv is None:
            continue
        if op == "in":
            vs = [_lstats._coerce(ctype, k, r) for k, r in lit]
            if all(v is not None and v != pv for v in vs):
                return False
            continue
        kind, rawlit = lit
        v = _lstats._coerce(ctype, kind, rawlit)
        if v is None:
            continue
        ok = {
            "=": pv == v, "==": pv == v,
            "!=": pv != v, "<>": pv != v,
            "<": pv < v, "<=": pv <= v,
            ">": pv > v, ">=": pv >= v,
        }[op]
        if not ok:
            return False
    return True


def snapshot_scan_stats(
    path: str, where: str, version: int | None = None
) -> dict:
    """Observability for data skipping (and the test pin surface):
    {"total": live files, "scanned": files a snapshot_read(where=...)
    would open, "skipped": the rest} — computed purely from manifests
    and stats, no Spark session, no file opens."""
    path = os.path.abspath(path)
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    v = versions[-1] if version is None else version
    m = _read_manifest(path, v)
    files = _live_files(path, v)
    kept, skipped = _prune_live(path, v, m, files, where)
    return {"total": len(files), "scanned": len(kept), "skipped": skipped}


def snapshot_min_max(
    path: str, cols: list[str], version: int | None = None
) -> dict[str, tuple] | None:
    """Metadata-only MIN/MAX (r15 — Delta/Spark's
    OptimizeMetadataOnlyQuery class): answer `SELECT MIN(c), MAX(c)`
    per requested column purely from the manifest stats — zero file
    opens, zero Spark jobs — or return None when the answer cannot be
    PROVEN exact:

    - any live file missing stats for a column (legacy commit,
      unsupported type) → unknown;
    - any deletion vector in force → the extreme row might be
      logically deleted (stats cover all physical rows) → unknown;
    - a truncated string bound (length ≥ STATS_MAX_STRING_LEN, or the
      U+10FFFF max pad) → the stored bound is valid but not attained →
      unknown.

    SQL MIN/MAX ignore NULLs: all-null files contribute nothing, and a
    column null in EVERY row of every file answers (None, None) — the
    SQL result. Columns are LOGICAL names (the column map applies).
    One-directional like every stats consumer: this can only decline,
    never return a wrong extreme."""
    path = os.path.abspath(path)
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    v = versions[-1] if version is None else version
    m = _read_manifest(path, v)
    cmap = m.get("column_map", {})
    col_types = dict(_schema_fields(m["schema"]))
    for c in cols:  # a bad column is a caller error, never "unknown"
        if c not in col_types:
            raise ValueError(f"unknown column {c!r}")
    if table_dvs(path, v):
        return None
    stats = table_stats(path, v)
    live = _live_files(path, v)
    out: dict[str, tuple] = {}
    for c in cols:
        phys = cmap.get(c, c)
        ctype = col_types[c]
        mn = mx = None
        for f in live:
            e = stats.get(f)
            if e is None:
                return None
            ce = e.get("cols", {}).get(phys)
            if ce is None:
                return None
            if "min" not in ce:  # all-null file: contributes nothing
                continue
            if isinstance(ce["min"], str) and (
                len(ce["min"]) >= _lstats.STATS_MAX_STRING_LEN
                or ce["max"].endswith("\U0010ffff")
            ):
                return None  # truncated bound: valid, not attained
            fmn = _lstats._coerce(ctype, "stat", ce["min"])
            fmx = _lstats._coerce(ctype, "stat", ce["max"])
            if fmn is None or fmx is None:
                return None
            mn = fmn if mn is None else min(mn, fmn)
            mx = fmx if mx is None else max(mx, fmx)
        out[c] = (mn, mx)
    return out


def snapshot_detail(path: str, version: int | None = None) -> dict:
    """DESCRIBE DETAIL (r15 — the Delta verb): one dict of table-level
    operational metadata from manifests + the local filesystem —
    {version, num_files, size_bytes, partition_columns, num_dv_files,
    num_dv_positions, n_constraints, n_properties, stats_files (files
    carrying column stats — the data-skipping coverage ratio's
    numerator), schema}. size_bytes is an O(files) os.stat walk
    (driver-side; at object-store scale the listing service answers
    it), everything else is manifest-resident."""
    path = os.path.abspath(path)
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    v = versions[-1] if version is None else version
    m = _read_manifest(path, v)
    live = _live_files(path, v)
    dvs = table_dvs(path, v)
    stats = table_stats(path, v)
    size = 0
    for f in live:
        try:
            size += os.path.getsize(os.path.join(path, f))
        except OSError:
            pass  # raced a vacuum of an older-version file set
    return {
        "version": v,
        "num_files": len(live),
        "size_bytes": size,
        "partition_columns": list(_layout_partition_cols(live) or ()),
        "num_dv_files": len(dvs),
        "num_dv_positions": sum(len(p) for p in dvs.values()),
        "n_constraints": len(m.get("constraints", {})),
        "n_properties": len(m.get("properties", {})),
        "stats_files": sum(1 for f in live if f in stats),
        "schema": m["schema"],
    }


def _partition_values(
    df: DataFrame, condition: str, partition_cols: tuple[str, ...]
) -> list:
    return df.filter(condition).select(*partition_cols).distinct().collect()


def _partition_filter(row, partition_cols: tuple[str, ...]):
    # eqNullSafe: a NULL partition value must select its own partition
    # (plain == drops every row and the rewrite silently no-ops)
    cond = F.lit(True)
    for c in partition_cols:
        cond = cond & F.col(c).eqNullSafe(F.lit(row[c]))
    return cond


# Hive's escapePathName char set (Spark writes partition dirs with it):
# ASCII control chars plus these. Verified against what this Spark
# version writes: 'a=b'→'a%3Db', 'c%d'→'c%25d', 'e/f'→'e%2Ff',
# 'g:h'→'g%3Ah', space unescaped, NULL→__HIVE_DEFAULT_PARTITION__.
_HIVE_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^') | {chr(i) for i in range(0x20)}
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _escape_partition_value(v) -> str:
    """Render a partition VALUE the way Spark names its directory —
    comparing raw values to dir names instead silently misses escaped
    or NULL partitions (rows then duplicate after a rewrite because the
    old files never leave the manifest)."""
    if v is None:
        return _HIVE_NULL
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE else ch for ch in str(v)
    )


def _unescape_partition_value(seg: str):
    """Directory segment value → raw value (None for the Hive NULL
    marker); inverse of _escape_partition_value."""
    if seg == _HIVE_NULL:
        return None
    out, i = [], 0
    while i < len(seg):
        if seg[i] == "%" and i + 3 <= len(seg):
            out.append(chr(int(seg[i + 1 : i + 3], 16)))
            i += 3
        else:
            out.append(seg[i])
            i += 1
    return "".join(out)


def _in_partition(rel_file: str, row, partition_cols: tuple[str, ...]) -> bool:
    parts = rel_file.split(os.sep)
    want = {
        f"{c}={_escape_partition_value(row[c])}" for c in partition_cols
    }
    return want.issubset(set(parts[:-1]))


def _layout_partition_cols(files: set[str]) -> tuple[str, ...] | None:
    """The partition columns the lake's ON-DISK layout actually uses,
    parsed from any live file's `key=value` directory segments (None
    for an empty lake)."""
    for f in files:
        segs = f.split(os.sep)[:-1]
        return tuple(seg.split("=", 1)[0] for seg in segs if "=" in seg)
    return None


def _check_partition_cols(
    live: set[str], partition_cols: tuple[str, ...], op: str
) -> None:
    """Refuse a write whose partition_cols disagree with the layout the
    live files already use — appending or rewriting under a different
    partitioning writes MIXED-DEPTH directories into one tree, which
    corrupts every later scan (Spark raises
    CONFLICTING_PARTITION_COLUMN_NAMES, or worse, infers a wrong
    layout). Found the hard way: a delete_where called with the default
    ("split", "lang") against a ("split",)-layout lake. mode="replace"
    is exempt (a full rewrite may define a new layout; old versions pin
    their own files)."""
    lay = _layout_partition_cols(live)
    if lay is not None and tuple(partition_cols) != lay:
        raise ValueError(
            f"{op}: partition_cols {tuple(partition_cols)} do not match "
            f"the lake's on-disk layout {lay} — pass the layout's columns"
        )


def snapshot_delete_where(
    spark: SparkSession,
    path: str,
    condition: str,
    partition_cols: tuple[str, ...] = ("split", "lang"),
) -> int:
    """Copy-on-write delete with ONE cross-partition commit: rewrite the
    live rows of every affected partition (minus the matches) as new
    appended files, then swap the manifest — a concurrent reader sees
    the delete nowhere or everywhere, never the io.delete_where torn
    state. Same SQL DELETE NULL semantics (rows where the predicate is
    NULL are kept). Rewrite cost ∝ affected partitions, as before.
    Crash anywhere before the commit = all-old (plus vacuum-able
    orphans); a commit losing a concurrency race aborts loudly (the
    rewrite was computed against a snapshot that moved — re-run; the
    orphaned rewrite files are vacuum-swept). Returns rows deleted."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    base_version = versions[-1]
    m = _read_manifest(path, versions[-1])
    live = _live_files(path, versions[-1])
    _check_partition_cols(live, partition_cols, "snapshot_delete_where")
    snap = snapshot_read(spark, path)
    # affected-partition DETECTION runs over the stats-pruned scan
    # (r15 data skipping: files whose bounds prove no match are never
    # opened); the per-partition REWRITE below stays on the full scan —
    # survivors must all be rewritten
    match_scan = snapshot_read(spark, path, where=condition)
    affected = _partition_values(match_scan, condition, partition_cols)
    if not affected:
        return 0
    deleted = 0
    removed: set[str] = set()
    added: set[str] = set()
    add_stats: dict[str, dict] = {}
    for row in affected:
        part = snap.filter(_partition_filter(row, partition_cols))
        keep = part.filter(~F.coalesce(F.expr(condition), F.lit(False)))
        n_before, n_after = part.count(), keep.count()
        if n_after == n_before:
            continue
        deleted += n_before - n_after
        # partition columns are re-derived from the written dirs;
        # rewrites land under the physical names (column mapping)
        new, new_stats = _write_staged(
            _to_physical_df(keep, m.get("column_map", {})),
            path,
            partition_cols,
        )
        added |= new
        add_stats.update(new_stats)
        removed |= {f for f in live if _in_partition(f, row, partition_cols)}
    if not removed and not added:
        return 0
    _commit(
        path,
        (live - removed) | added,
        "delete_where",
        m["schema"],
        base_version=base_version,
        add_stats=add_stats,
    )
    return deleted


def snapshot_delete_where_dv(
    spark: SparkSession, path: str, condition: str
) -> int:
    """MERGE-ON-READ delete (Delta deletion vectors): instead of
    rewriting every affected partition, record the matching rows'
    (file, row-position) addresses in a DV sidecar and commit a
    manifest whose `dvs` map points at it — the data files never move.
    Reads (snapshot_read, and therefore every verb built on it)
    anti-join the DV; a later rewrite of a file (compact, CoW delete,
    merge) MATERIALIZES its DV and drops the entry. Same NULL-keeps
    semantics as snapshot_delete_where; repeated deletes on one file
    merge positions. Cost: one filtered scan + one manifest commit —
    O(matches), not O(affected partitions); the CoW verb remains the
    right call when a large fraction of a partition dies — and stays
    the erasure path: a DV delete is LOGICAL until a rewrite
    materializes it, so GDPR erasure (erasure.py) keeps copy-on-write +
    vacuum for physical removal. Returns rows deleted (already-deleted
    rows never re-match: the scan applies the existing DVs first)."""
    path = os.path.abspath(path)  # DV addresses key on absolute paths
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    base_version = versions[-1]
    m = _read_manifest(path, base_version)
    from pyspark.sql.types import _parse_datatype_string

    cmap = m.get("column_map", {})
    phys_st = _parse_datatype_string(
        "struct<"
        + ",".join(
            f"{pn}:{t}"
            for pn, t in _physical_fields(_schema_fields(m["schema"]), cmap)
        )
        + ">"
    )
    files = _live_files(path, base_version)
    # r15 data skipping: files whose stats prove no row matches the
    # predicate can take no DV positions — drop them from the SCAN
    # (the commit below still records the FULL live set)
    scan_files, _ = _prune_live(path, base_version, m, files, condition)
    if not scan_files:
        return 0
    prev_dvs = table_dvs(path, base_version)
    scan = (
        spark.read.schema(phys_st)
        .option("basePath", path)
        .parquet(*[os.path.join(path, f) for f in sorted(scan_files)])
        .withColumn("_fp", _norm_file_uri(F.col("_metadata.file_path")))
        .withColumn("_ri", F.col("_metadata.row_index"))
    )
    # the predicate speaks LOGICAL names — alias the mapped columns
    for logical, physical in cmap.items():
        if logical != physical:
            scan = scan.withColumnRenamed(physical, logical)
    if prev_dvs:
        pairs = [
            (os.path.join(path, f), int(pos))
            for f, positions in prev_dvs.items()
            for pos in positions
        ]
        dv_df = spark.createDataFrame(pairs, "_dv_fp string, _dv_ri long")
        scan = scan.join(
            F.broadcast(dv_df),
            (F.col("_fp") == F.col("_dv_fp"))
            & (F.col("_ri") == F.col("_dv_ri")),
            "left_anti",
        )
    # bounded driver collect (the DRIVER_CC_MAX_EDGES pattern): the cap
    # also bounds what later scans must broadcast. limit(cap+1) keeps
    # the overflow check itself O(cap) on the driver.
    prev_pos = sum(len(p) for p in prev_dvs.values())
    budget = DRIVER_DV_MAX_POSITIONS - prev_pos
    hits = (
        scan.filter(F.coalesce(F.expr(condition), F.lit(False)))
        .select("_fp", "_ri")
        .limit(max(budget, 0) + 1)
        .collect()
    )
    if not hits:
        return 0
    if len(hits) > max(budget, 0):
        raise ValueError(
            "snapshot_delete_where_dv: the delete matches more rows "
            f"than the deletion-vector budget ({prev_pos} existing + "
            f">{max(budget, 0)} new > DRIVER_DV_MAX_POSITIONS="
            f"{DRIVER_DV_MAX_POSITIONS}) — use snapshot_delete_where "
            "(copy-on-write) for wide deletes, or snapshot_compact to "
            "materialize the accumulated vectors first"
        )
    merged: dict[str, set[int]] = {
        f: set(p) for f, p in prev_dvs.items()
    }
    for r in hits:
        rel = os.path.relpath(r._fp, path)
        merged.setdefault(rel, set()).add(int(r._ri))
    changed = {
        f for f in merged if set(prev_dvs.get(f, [])) != merged[f]
    }
    sidecar = _write_dv_sidecar(
        path, {f: sorted(merged[f]) for f in changed}
    )
    new_map = dict(m.get("dvs", {}))
    for f in changed:
        new_map[f] = sidecar
    _commit(
        path,
        files,
        "delete_where_dv",
        m["schema"],
        base_version=base_version,
        set_dvs=new_map,
    )
    return len(hits)


def snapshot_merge(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id",),
    partition_cols: tuple[str, ...] = ("split", "lang"),
    evolve: bool = False,
    merge_on_read: bool = False,
    delete_col: str | None = None,
    new_epoch: int | None = None,
) -> dict:
    """MERGE INTO (the Delta verb this lake was missing — tests used to
    hand-roll upserts with _commit): source rows whose keys exist in
    the latest snapshot REPLACE those rows (post-image = the source
    row); the rest INSERT. Copy-on-write at partition grain with ONE
    cross-partition commit — a reader sees the whole merge or none of
    it. Returns {"updated", "inserted", "version"}.

    `merge_on_read=True` (r13, VERDICT r12 task 7 — Delta's DV-backed
    MERGE) composes the DV delete with the append instead of rewriting
    partitions: matched rows become deletion-vector TOMBSTONES (their
    (file, row-position) addresses — prior data files stay
    byte-untouched), post-images and inserts append as new files, ONE
    commit publishes both. Cost: O(matches + source), not O(affected
    partitions) — the right mode when matches are sparse across many
    partitions. The change feed classifies a tombstone+same-key-append
    pair as an UPDATE (sources/lake_cdf.py r13), compaction
    materializes the tombstones, restore re-animates, and the
    DRIVER_DV_MAX_POSITIONS budget applies (wide merges → the CoW
    mode, which is also still the GDPR-erasure path: a DV merge's old
    rows are logically deleted only).

    Shape: one semi-join finds the matched target rows; only the
    partitions CONTAINING matches rewrite (their survivors = target
    anti-join source keys); all source rows append (an update whose
    source row carries a NEW partition value lands there while the old
    partition's rewrite drops the key — cross-partition moves are
    correct by construction). Source keys must be unique — multiple
    source rows for one key raise, the Delta MERGE error. `evolve=True`
    applies the ADD-COLUMN contract: survivors NULL-fill the new
    columns (unionByName allowMissingColumns) and the commit records
    the evolved schema. A concurrent commit aborts loudly
    (maintenance semantics — re-run against the new snapshot). Crash
    anywhere before the commit = all-old plus vacuum-able orphans.

    `delete_col` (r14 — Delta's WHEN MATCHED THEN DELETE arm): a
    boolean column on the source marking DELETE intents; flagged rows
    contribute their keys to the match set but write NOTHING — in CoW
    the rewritten partitions simply drop them, in merge-on-read they
    become DV tombstones with no paired append. A delete intent whose
    key matches nothing is a no-op (Delta's rule). Flagged rows need
    only their key columns (the rest may be NULL) and are exempt from
    CHECK enforcement — they write no data. Returns a "deleted" count
    alongside updated/inserted. `new_epoch` records a stream epoch in
    the commit (the exactly-once hook for merge-based view
    maintainers — LakeMaterializedEnrichedJoin)."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    base_version = versions[-1]
    m = _read_manifest(path, base_version)
    keys = list(key_cols)
    is_del = (
        F.coalesce(F.col(delete_col), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )
    src_data = (
        source.filter(~is_del).drop(delete_col)
        if delete_col is not None
        else source
    )
    schema_ddl = _check_append_schema(
        src_data.schema.simpleString(), m["schema"], evolve, "snapshot_merge"
    )
    _check_added_names(src_data.schema.simpleString(), m, "snapshot_merge")
    live = _live_files(path, base_version)
    _check_partition_cols(live, partition_cols, "snapshot_merge")
    cons = table_constraints(path)
    if cons:  # delete intents write nothing — data rows only
        _enforce_constraints(src_data, cons, "snapshot_merge")
    # ONE job answers "any duplicate source keys?", "how many source
    # rows?" and "how many are delete intents?" (r14; was a
    # limit(1).count() plus a source.count())
    src_stats = (
        source.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.max(is_del.cast("int")).alias("_d"),
        )
        .select(
            F.max("_n").alias("_mx"),
            F.sum("_n").alias("_total"),
            F.sum("_d").alias("_dels"),
            # source key ranges ride the SAME job (r15 data skipping:
            # target files outside [min, max] on any key can hold no
            # match — prune them from the matched scan driver-side)
            *[
                agg
                for i, k in enumerate(keys)
                for agg in (
                    F.min(k).alias(f"_kmin{i}"),
                    F.max(k).alias(f"_kmax{i}"),
                )
            ],
        )
        .first()
    )
    if (src_stats["_mx"] or 0) > 1:
        raise ValueError(
            "snapshot_merge: multiple source rows share a key — one "
            "intent per key (the Delta MERGE contract); pre-aggregate "
            "the source"
        )
    n_source = int(src_stats["_total"] or 0) - int(src_stats["_dels"] or 0)
    # keys are unique (enforced above), so total source rows == distinct
    # source keys: the broadcast gate costs no extra job
    n_keys = int(src_stats["_total"] or 0)
    # source-key-range file skipping: the matched scan only needs files
    # whose stats ranges intersect the source's [min, max] on every key
    key_conj = _merge_key_conjuncts(keys, src_stats)
    match_files, _ = _prune_with_conjuncts(
        path, base_version, m, live, key_conj
    )
    if merge_on_read:
        return _merge_mor(
            spark, path, source, keys, partition_cols, m,
            base_version, live, schema_ddl, n_source, is_del, src_data,
            new_epoch, n_keys, match_files,
        )
    target = snapshot_read(spark, path, base_version)
    src_keys = source.select(*keys, is_del.alias("_del")).distinct()
    if n_keys <= DRIVER_MERGE_BROADCAST_MAX_KEYS:
        # the hint rides the plan node, so the survivors' anti-join
        # (which projects this frame) inherits it too
        src_keys = F.broadcast(src_keys)
    match_target = (
        snapshot_read(spark, path, base_version, _files=match_files)
        if match_files != live
        else target
    )
    matched = match_target.join(src_keys, keys, "inner")
    # ONE job answers "which partitions hold matches?" (bounded driver
    # state: distinct partition values), "how many rows update?" and
    # "how many delete?" (r14; was a count() plus a
    # distinct().collect())
    affected = [
        r
        for r in matched.groupBy(*partition_cols)
        .agg(
            F.sum(F.when(~F.col("_del"), 1).otherwise(0)).alias("_n_rows"),
            F.sum(F.when(F.col("_del"), 1).otherwise(0)).alias("_n_dels"),
        )
        .collect()
        # an UNPARTITIONED layout's global agg returns one all-NULL row
        # over an empty match set — that is "no affected partitions"
        if (r["_n_rows"] or 0) + (r["_n_dels"] or 0) > 0
    ]
    updated = sum(int(r["_n_rows"] or 0) for r in affected)
    deleted = sum(int(r["_n_dels"] or 0) for r in affected)
    inserted = n_source - updated
    removed: set[str] = set()
    for row in affected:
        removed |= {f for f in live if _in_partition(f, row, partition_cols)}
    survivors = (
        _merge_survivors(
            spark, target, affected, src_keys.select(*keys), keys,
            partition_cols,
        )
        if affected
        else None
    )
    to_write = (
        src_data
        if survivors is None
        else survivors.unionByName(src_data, allowMissingColumns=evolve)
    )
    added, added_stats = _write_staged(
        _to_physical_df(to_write, m.get("column_map", {})),
        path,
        partition_cols,
    )
    version = _commit(
        path,
        (live - removed) | added,
        "merge",
        schema_ddl,
        base_version=base_version,
        new_epoch=new_epoch,
        add_stats=added_stats,
    )
    return {
        "updated": updated,
        "inserted": inserted,
        "deleted": deleted,
        "version": version,
    }


def _merge_key_conjuncts(keys: list[str], src_stats) -> list[tuple]:
    """Synthesize skip-conjuncts `k >= src_min AND k <= src_max` per
    merge key from the source-stats row — a target file whose stats
    range is disjoint from the source's on ANY equi-join key can hold
    no match. Keys whose range is unknown (empty source, NULL-only
    keys) or of non-skippable Python types contribute nothing."""
    import datetime as _dtm
    from decimal import Decimal as _Dec

    def kind_of(v):
        if isinstance(v, bool):
            return ("bool", v)
        if isinstance(v, (int, float, _Dec)):
            return ("num", v)
        if isinstance(v, str):
            return ("str", v)
        if isinstance(v, _dtm.datetime):
            return ("ts", v.isoformat(sep=" "))
        if isinstance(v, _dtm.date):
            return ("date", v.isoformat())
        return (None, None)

    out: list[tuple] = []
    for i, k in enumerate(keys):
        lo, hi = src_stats[f"_kmin{i}"], src_stats[f"_kmax{i}"]
        if lo is None or hi is None:
            continue
        klo, khi = kind_of(lo), kind_of(hi)
        if klo[0] is None or khi[0] is None or klo[0] == "bool":
            continue
        out.append((k, ">=", klo))
        out.append((k, "<=", khi))
    return out


def _merge_mor(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    partition_cols: tuple[str, ...],
    m: dict,
    base_version: int,
    live: set[str],
    schema_ddl: str,
    n_source: int,
    is_del,
    src_data: DataFrame,
    new_epoch: int | None,
    n_keys: int,
    match_files: set[str],
) -> dict:
    """The merge-on-read MERGE body (snapshot_merge merge_on_read=True):
    matched rows' addresses → DV tombstones, all source rows → appended
    files, one commit. Shares the DV-delete scan shape (explicit
    physical schema + _metadata addressing + existing-DV anti-join +
    the position budget)."""
    from pyspark.sql.types import _parse_datatype_string

    path = os.path.abspath(path)  # DV addressing keys on absolute paths
    cmap = m.get("column_map", {})
    phys_st = _parse_datatype_string(
        "struct<"
        + ",".join(
            f"{pn}:{t}"
            for pn, t in _physical_fields(_schema_fields(m["schema"]), cmap)
        )
        + ">"
    )
    prev_dvs = table_dvs(path, base_version)
    # r15 data skipping: only files whose stats intersect the source
    # key ranges can contribute DV tombstones
    scan = None
    if match_files:
        scan = (
            spark.read.schema(phys_st)
            .option("basePath", path)
            .parquet(*[os.path.join(path, f) for f in sorted(match_files)])
            .withColumn(
                "_fp", _norm_file_uri(F.col("_metadata.file_path"))
            )
            .withColumn("_ri", F.col("_metadata.row_index"))
        )
        for logical, physical in cmap.items():
            if logical != physical:
                scan = scan.withColumnRenamed(physical, logical)
    if prev_dvs and scan is not None:
        pairs = [
            (os.path.join(path, f), int(pos))
            for f, positions in prev_dvs.items()
            for pos in positions
        ]
        dv_df = spark.createDataFrame(pairs, "_dv_fp string, _dv_ri long")
        scan = scan.join(
            F.broadcast(dv_df),
            (F.col("_fp") == F.col("_dv_fp"))
            & (F.col("_ri") == F.col("_dv_ri")),
            "left_anti",
        )
    src_keys = source.select(*keys, is_del.alias("_del")).distinct()
    if n_keys <= DRIVER_MERGE_BROADCAST_MAX_KEYS:
        src_keys = F.broadcast(src_keys)
    prev_pos = sum(len(p) for p in prev_dvs.values())
    budget = DRIVER_DV_MAX_POSITIONS - prev_pos
    hits = (
        scan.join(src_keys, keys, "inner")
        .select("_fp", "_ri", "_del")
        .limit(max(budget, 0) + 1)
        .collect()
        if scan is not None
        else []
    )
    if len(hits) > max(budget, 0):
        raise ValueError(
            "snapshot_merge(merge_on_read=True): the merge matches more "
            f"rows than the deletion-vector budget ({prev_pos} existing "
            f"+ >{max(budget, 0)} new > DRIVER_DV_MAX_POSITIONS="
            f"{DRIVER_DV_MAX_POSITIONS}) — use the copy-on-write mode "
            "for wide merges, or snapshot_compact first"
        )
    deleted = sum(1 for r in hits if r._del)
    updated = len(hits) - deleted
    inserted = n_source - updated
    new_map = dict(m.get("dvs", {}))
    if hits:
        merged: dict[str, set[int]] = {f: set(p) for f, p in prev_dvs.items()}
        for r in hits:
            merged.setdefault(os.path.relpath(r._fp, path), set()).add(
                int(r._ri)
            )
        changed = {
            f for f in merged if set(prev_dvs.get(f, [])) != merged[f]
        }
        sidecar = _write_dv_sidecar(
            path, {f: sorted(merged[f]) for f in changed}
        )
        for f in changed:
            new_map[f] = sidecar
    added, added_stats = _write_staged(
        _to_physical_df(src_data, cmap), path, partition_cols
    )
    version = _commit(
        path,
        live | added,
        "merge-mor",
        schema_ddl,
        base_version=base_version,
        set_dvs=new_map,
        new_epoch=new_epoch,
        add_stats=added_stats,
    )
    return {
        "updated": updated,
        "inserted": inserted,
        "deleted": deleted,
        "version": version,
    }


def _merge_survivors(
    spark: SparkSession,
    target: DataFrame,
    affected: list,
    src_keys: DataFrame,
    keys: list[str],
    partition_cols: tuple[str, ...],
) -> DataFrame:
    """The rows of the affected partitions that survive a merge, as ONE
    plan (VERDICT r12 task 2): a broadcast null-safe semi-join against
    the affected-partition set restricts target to those partitions,
    one anti-join against the source keys drops the matched rows. The
    prior shape — a Python loop building filter+anti-join+unionByName
    PER affected partition — re-scanned target K times and grew K plan
    branches; a merge touching hundreds of partitions choked the
    optimizer. `affected` is already-collected driver rows (bounded:
    distinct affected partition values), rebuilt into a lineage-free
    broadcast frame so the semi-join condition never self-references
    target. Plan shape pinned by tests/test_plans.py (no Union, one
    target scan regardless of K)."""
    aff = spark.createDataFrame(
        [tuple(row[c] for c in partition_cols) for row in affected],
        target.select(*partition_cols).schema,
    )
    # eqNullSafe: a NULL partition value must select its own partition
    cond = None
    for c in partition_cols:
        e = target[c].eqNullSafe(aff[c])
        cond = e if cond is None else (cond & e)
    return target.join(F.broadcast(aff), cond, "left_semi").join(
        src_keys, keys, "anti"
    )


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY: one row per committed version — (version, op,
    ts from the manifest's mtime i.e. the commit point's clock, n_adds,
    n_removes, n_live, n_constraints). Live counts SEED from the oldest
    retained version's RESOLVED state (after a vacuum folds history,
    the first retained manifest is a delta against versions that no
    longer exist — accumulating from 0 would understate, or go
    negative, for every row), then replay the delta chain ascending
    (legacy full-list manifests reset the count). Timestamps come from
    the filesystem, so the column is operational metadata, not
    oracle-comparable."""
    rows = []
    live = 0
    for i, v in enumerate(snapshot_versions(path)):
        m = _read_manifest(path, v)
        if "files" in m:  # legacy full-list manifest
            n_adds, n_removes = len(m["files"]), 0
            live = len(m["files"])
        elif i == 0:
            n_adds, n_removes = len(m["adds"]), len(m["removes"])
            live = len(_live_files(path, v))
        else:
            n_adds, n_removes = len(m["adds"]), len(m["removes"])
            live += n_adds - n_removes
        rows.append(
            (
                v,
                m.get("op", ""),
                float(os.path.getmtime(_manifest_path(path, v))),
                n_adds,
                n_removes,
                live,
                len(m.get("constraints", {})),
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, op string, ts double, n_adds int, n_removes int,"
        " n_live int, n_constraints int",
    )


def table_constraints(path: str) -> dict[str, str]:
    """The CHECK constraints in force (name → SQL predicate) — recorded
    in every manifest and carried forward like the epoch set."""
    versions = snapshot_versions(path)
    if not versions:
        return {}
    return _read_manifest(path, versions[-1]).get("constraints", {})


def table_properties(path: str, version: int | None = None) -> dict[str, str]:
    """TBLPROPERTIES (r14, Delta's table-properties class): arbitrary
    string key→value metadata recorded in every manifest and carried
    forward like constraints. Two keys are FUNCTIONAL, not just
    decorative: `kstreams.checkpoint.interval` tunes the delta-log
    checkpoint cadence per table (delta.checkpointInterval analog) and
    `kstreams.vacuum.graceSeconds` sets vacuum's default reader-grace
    window (delta.deletedFileRetentionDuration analog — an explicit
    grace_seconds argument still wins, and the 1 h safety floor still
    applies without force)."""
    versions = snapshot_versions(path)
    if not versions:
        return {}
    v = versions[-1] if version is None else version
    return dict(_read_manifest(path, v).get("properties", {}))


def snapshot_set_properties(path: str, props: dict[str, str]) -> int:
    """ALTER TABLE SET TBLPROPERTIES: merge-update the property map in
    a same-files metadata-only commit. Values are stored as strings
    (the Delta convention); returns the new version."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    if not props:
        raise ValueError("snapshot_set_properties: empty property map")
    latest = versions[-1]
    merged = table_properties(path)
    merged.update({str(k): str(v) for k, v in props.items()})
    return _commit(
        path,
        _live_files(path, latest),
        f"set-properties-{','.join(sorted(props))}",
        _read_manifest(path, latest)["schema"],
        base_version=latest,
        set_properties=merged,
    )


def snapshot_unset_properties(path: str, keys) -> int:
    """ALTER TABLE UNSET TBLPROPERTIES: drop the given keys in a
    same-files metadata-only commit. Unknown keys raise (the
    constraint-drop convention; pass only keys you know are set)."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    latest = versions[-1]
    props = table_properties(path)
    missing = [k for k in keys if k not in props]
    if missing:
        raise ValueError(
            f"no table propert{'y' if len(missing) == 1 else 'ies'} "
            f"{sorted(missing)} (have {sorted(props)})"
        )
    for k in keys:
        del props[k]
    return _commit(
        path,
        _live_files(path, latest),
        f"unset-properties-{','.join(sorted(keys))}",
        _read_manifest(path, latest)["schema"],
        base_version=latest,
        set_properties=props,
    )


def _violation_metric(pred: str):
    """Rows violating a CHECK predicate: FALSE violates, NULL passes
    (the SQL-standard CHECK rule)."""
    return F.sum((~F.coalesce(F.expr(pred), F.lit(True))).cast("long"))


def _raise_violation(op: str, bad: dict[str, tuple[str, int]]) -> None:
    name, (pred, n_bad) = sorted(bad.items())[0]
    raise ValueError(
        f"{op}: CHECK constraint {name!r} ({pred}) violated by "
        f"{n_bad} row(s) — nothing was written"
    )


def _enforce_constraints(df: DataFrame, constraints: dict[str, str], op: str) -> None:
    """CHECK enforcement as its OWN aggregation job — ONE source scan
    for ALL constraints (r14; was one count per constraint). Used where
    the data is not about to be written anyway (snapshot_set_constraint
    validating the existing snapshot); writes fold the same metrics
    into the write job itself via _constraint_observer +
    _write_staged(check=...)."""
    if not constraints:
        return
    names = sorted(constraints)
    row = df.select(
        *[
            _violation_metric(constraints[n]).alias(f"_c{i}")
            for i, n in enumerate(names)
        ]
    ).first()
    bad = {
        n: (constraints[n], row[i])
        for i, n in enumerate(names)
        if row[i]
    }
    if bad:
        _raise_violation(op, bad)


def _stats_prove_compliance(path: str, version: int, predicate: str) -> bool:
    """True when every live file's manifest stats prove no row violates
    `predicate` (AND-of-negatable-comparisons; r15 widened from single
    conjuncts — under 3VL each conjunct's violation is independently
    impossible). Any file without stats, or whose bounds leave any
    violation possible, returns False — the caller then runs the real
    validation scan."""
    viols = _lstats.violation_conjuncts(predicate)
    if viols is None:
        return False
    m = _read_manifest(path, version)
    col_types = dict(_schema_fields(m["schema"]))
    cmap = m.get("column_map", {})
    if any(v[0] not in col_types for v in viols):
        return False  # unknown column: let the scan raise its error
    stats = table_stats(path, version)
    live = _live_files(path, version)
    for f in live:
        e = stats.get(f)
        if e is None:
            return False
        # file_may_match returns True ("may hold a violating row") for
        # any missing/unusable stats — exactly the conservative default
        # a compliance proof needs; each conjunct is proven SEPARATELY
        # (they are alternative violation routes, not a conjunction)
        for v in viols:
            if _lstats.file_may_match(e, [v], cmap, col_types):
                return False
    return True


def snapshot_set_constraint(
    spark: SparkSession, path: str, name: str, predicate: str
) -> int:
    """ALTER TABLE ADD CONSTRAINT ... CHECK (predicate): validates the
    CURRENT snapshot first (a constraint the existing data violates is
    refused — Delta's rule), then commits a same-files manifest whose
    constraint map adds the entry; every later append/merge/stream
    batch enforces it before writing. Returns the new version.

    r15 (VERDICT r14 task 2, closing the lake_evolution_roundtrip job
    floor): when the predicate is a single negatable comparison and
    EVERY live file's manifest stats PROVE no row can violate it
    (lake_stats.violation_conjunct + file_may_match), validation needs
    ZERO Spark jobs — the scan runs only when some file's stats leave
    a violation possible (stats include DV'd rows, so the proof is
    conservative: it can only skip the scan, never refuse wrongly)."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    latest = versions[-1]
    if not _stats_prove_compliance(path, latest, predicate):
        _enforce_constraints(
            snapshot_read(spark, path, latest),
            {name: predicate},
            "snapshot_set_constraint(existing data)",
        )
    cons = dict(table_constraints(path))
    cons[name] = predicate
    return _commit(
        path,
        _live_files(path, latest),
        f"set-constraint-{name}",
        _read_manifest(path, latest)["schema"],
        base_version=latest,
        set_constraints=cons,
    )


def snapshot_drop_constraint(path: str, name: str) -> int:
    """ALTER TABLE DROP CONSTRAINT: commits a same-files manifest whose
    constraint map drops the entry. Unknown names raise."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    latest = versions[-1]
    cons = dict(table_constraints(path))
    if name not in cons:
        raise ValueError(f"no CHECK constraint named {name!r} (have {sorted(cons)})")
    del cons[name]
    return _commit(
        path,
        _live_files(path, latest),
        f"drop-constraint-{name}",
        _read_manifest(path, latest)["schema"],
        base_version=latest,
        set_constraints=cons,
    )


def snapshot_rename_column(path: str, old: str, new: str) -> int:
    """ALTER TABLE RENAME COLUMN — Delta's column-mapping evolution
    class (r13, VERDICT r12 task 4): a METADATA-ONLY commit. Data files
    keep the column's stable PHYSICAL name; the manifest's
    `column_map` binds the new logical name to it, `snapshot_read`
    resolves the map, and every append/rewrite path writes under the
    physical names — zero files move. Time travel keeps each version's
    own logical names (the pre-rename manifest has no mapping for the
    new name). Guards, each a loud error:

    - `old` must exist and `new` must not (logically);
    - `new` must not collide with ANY current physical name — the
      forbid-reuse rule: a file already stores a column under that
      name, and a later identity-mapped read or write would bind to
      the wrong data;
    - partition columns refuse (their names are directory structure —
      renaming one is a re-layout, i.e. mode='replace');
    - columns referenced by a CHECK constraint refuse (the predicate
      text would dangle) — drop the constraint first.

    Readers that bypass the manifest (plain spark.read.parquet on the
    lake) see PHYSICAL names by construction; the manifest is the only
    rename authority, exactly Delta's columnMapping.mode=name
    contract."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    latest = versions[-1]
    m = _read_manifest(path, latest)
    fields = _schema_fields(m["schema"])
    names = [n for n, _ in fields]
    if old not in names:
        raise ValueError(f"rename: no column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"rename: column {new!r} already exists")
    cmap = dict(m.get("column_map", {}))
    live = _live_files(path, latest)
    lay = _layout_partition_cols(live)
    if lay and old in lay:
        raise ValueError(
            f"rename: {old!r} is a partition column — its name IS the "
            "directory layout; rewrite via mode='replace' instead"
        )
    physical_in_use = {cmap.get(n, n) for n in names} | set(
        m.get("dropped_physical", [])
    )
    if new in physical_in_use:
        raise ValueError(
            f"rename: {new!r} is a PHYSICAL name already stored in data "
            "files (a live column's, or a dropped column's — the "
            "reservation survives the drop) — reusing it would bind "
            "reads/writes to the wrong column (the forbid-reuse rule)"
        )
    import re as _re

    for cname, pred in m.get("constraints", {}).items():
        if _re.search(rf"\b{_re.escape(old)}\b", pred):
            raise ValueError(
                f"rename: column {old!r} is referenced by CHECK "
                f"constraint {cname!r} ({pred}) — drop the constraint "
                "first"
            )
    cmap[new] = cmap.pop(old, old)  # physical name is stable
    new_schema = (
        "struct<"
        + ",".join(
            f"{new if n == old else n}:{t}" for n, t in fields
        )
        + ">"
    )
    return _commit(
        path,
        live,
        f"rename-{old}-to-{new}",
        new_schema,
        base_version=latest,
        set_column_map=cmap,
    )


def _check_added_names(new_schema: str, m: dict, op: str) -> None:
    """Evolve-adds must not take a name that is someone's PHYSICAL name
    — a current column's (renamed away) or a dropped column's. Data
    files STORE those names: an identity-mapped new column would read
    the old column's bytes out of every pre-existing file instead of
    NULL. Checked against the base manifest (the OCC window between a
    racing rename/drop and this append is the same
    maintenance-conflict window every rewrite has)."""
    committed = {n for n, _ in _schema_fields(m["schema"])}
    added = [
        n for n, _ in _schema_fields(new_schema) if n not in committed
    ]
    cmap = m.get("column_map", {})
    reserved = {cmap.get(n, n) for n in committed} | set(
        m.get("dropped_physical", [])
    )
    for n in added:
        if n in reserved:
            raise ValueError(
                f"{op}: cannot add column {n!r} — that name is a "
                "PHYSICAL name stored in existing data files (renamed "
                "away or dropped); pick another name or rewrite via "
                "mode='replace'"
            )


def snapshot_drop_column(path: str, name: str) -> int:
    """ALTER TABLE DROP COLUMN — the other half of the column-mapping
    evolution class (r13): a METADATA-ONLY commit removing the column
    from the logical schema. Data files keep its bytes (nothing
    rewrites); the column's PHYSICAL name lands in the manifest's
    `dropped_physical` reservation list, and every later evolve-add or
    rename REFUSES that name (an identity mapping would silently read
    the dropped column's old bytes back). Time travel still reads the
    column at pre-drop versions; restore rewinds the drop; replace
    resets the reservation with its fresh world. Guards mirror
    rename's: partition columns and CHECK-referenced columns refuse;
    the last data column refuses (an empty-schema table is
    unreadable)."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    latest = versions[-1]
    m = _read_manifest(path, latest)
    fields = _schema_fields(m["schema"])
    names = [n for n, _ in fields]
    if name not in names:
        raise ValueError(f"drop: no column {name!r} (have {names})")
    if len(fields) <= 1:
        raise ValueError("drop: cannot drop the last column")
    live = _live_files(path, latest)
    lay = _layout_partition_cols(live)
    if lay and name in lay:
        raise ValueError(
            f"drop: {name!r} is a partition column — its name IS the "
            "directory layout; rewrite via mode='replace' instead"
        )
    import re as _re

    for cname, pred in m.get("constraints", {}).items():
        if _re.search(rf"\b{_re.escape(name)}\b", pred):
            raise ValueError(
                f"drop: column {name!r} is referenced by CHECK "
                f"constraint {cname!r} ({pred}) — drop the constraint "
                "first"
            )
    cmap = dict(m.get("column_map", {}))
    physical = cmap.pop(name, name)
    dropped = sorted(set(m.get("dropped_physical", [])) | {physical})
    new_schema = (
        "struct<"
        + ",".join(f"{n}:{t}" for n, t in fields if n != name)
        + ">"
    )
    return _commit(
        path,
        live,
        f"drop-column-{name}",
        new_schema,
        base_version=latest,
        set_column_map=cmap,
        set_dropped_physical=dropped,
    )


def snapshot_restore(path: str, version: int) -> int:
    """RESTORE TO VERSION AS OF: commit `version`'s live file set (and
    schema) as a NEW version — the Delta RESTORE verb. Nothing is
    copied: the restored data files are still on disk (they were
    retained for time travel), so the restore is one manifest commit
    whose delta re-adds what later versions removed and removes what
    they added. History is preserved — the undone versions stay
    readable until vacuum; the change feed reports the restore's
    row-level effect like any other commit. Restoring past vacuumed
    history fails on the version check. Returns the new version."""
    versions = snapshot_versions(path)
    if version not in versions:
        raise ValueError(
            f"snapshot v{version} not in committed versions {versions}"
        )
    restored = _read_manifest(path, version)
    return _commit(
        path,
        _live_files(path, version),
        f"restore-v{version}",
        restored["schema"],
        base_version=versions[-1],
        set_dvs=restored.get("dvs", {}),
        set_column_map=restored.get("column_map", {}),
        set_dropped_physical=restored.get("dropped_physical", []),
        set_properties=restored.get("properties", {}),
        # stats travel with the re-added files (r15): the restore
        # commit's adds re-animate files later versions removed — their
        # stats are still resolvable at the restored version
        add_stats=table_stats(path, version),
    )


def snapshot_clone(
    src: str,
    dst: str,
    version: int | None = None,
    at_timestamp: float | None = None,
    deep: bool = False,
) -> int:
    """SHALLOW CLONE (VERDICT r13 task 5 — Delta's CREATE TABLE ...
    SHALLOW CLONE twin): one metadata commit at `dst` referencing the
    source version's live files with ZERO data copy; afterwards the
    two tables diverge independently (writes to either are invisible
    to the other), and the clone's v1 IS the clone point — history
    does not travel (Delta's rule; time-travel the SOURCE for
    pre-clone versions).

    Local-fs realization: each live data file (and each referenced DV
    sidecar) is HARDLINKED into the clone under its source-relative
    path. The inode link count is the cross-table refcount, MAINTAINED
    BY THE FILESYSTEM — vacuum stays a purely local verb on either
    table (os.remove unlinks one table's NAME; the other table's reads
    are untouched), with no clone registry to keep transactionally
    consistent with the sweep and no crash window between them. Shared
    bytes can never drift because data files are immutable by
    construction (every writer creates new uuid-named files; compaction
    and restore commit new manifests, never rewrite bytes in place).
    At object-store scale (no hardlinks) the swap is Delta's actual
    form — absolute-path file references plus a vacuum-side clone
    registry — behind this same verb; the manifest stays the source of
    truth either way. `deep=True` copies bytes instead (Delta's DEEP
    CLONE): works across filesystems, costs O(data).

    Carries schema, column_map, dropped_physical (physical-name
    reservations MUST travel — the cloned data files store those
    names), CHECK constraints, deletion vectors, and the committed
    stream-epoch set. Refuses a target that already has commits and a
    shallow clone across filesystems (EXDEV → use deep=True)."""
    src, dst = os.path.abspath(src), os.path.abspath(dst)
    if src == dst:
        raise ValueError("snapshot_clone: src and dst are the same table")
    versions = snapshot_versions(src)
    if not versions:
        raise ValueError(f"no committed snapshots under {src}")
    if at_timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR at_timestamp, not both")
        version = version_at_timestamp(src, at_timestamp)
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"snapshot v{v} not in committed versions {versions}")
    if snapshot_versions(dst):
        raise ValueError(
            f"snapshot_clone: {dst} already has commits — clone only "
            "creates fresh tables"
        )
    m = _read_manifest(src, v)
    files = _live_files(src, v)
    def link(s: str, d: str) -> None:
        if deep:
            _shutil.copy2(s, d)
            return
        try:
            os.link(s, d)
        except FileExistsError:
            # a prior CRASHED clone attempt staged this link (no commit
            # yet, or we'd have refused above) — hardlink identity makes
            # the retry idempotent; anything else at the path is an error
            if not os.path.samefile(s, d):
                raise
        except OSError as ex:
            if getattr(ex, "errno", None) == 18:  # EXDEV
                raise ValueError(
                    "snapshot_clone: src and dst are on different "
                    "filesystems — hardlinks cannot cross; pass "
                    "deep=True to copy bytes"
                ) from ex
            raise

    for f in sorted(files):
        dpath = os.path.join(dst, f)
        os.makedirs(os.path.dirname(dpath), exist_ok=True)
        link(os.path.join(src, f), dpath)
    dvs = dict(m.get("dvs", {}))
    if dvs:
        os.makedirs(_log_dir(dst), exist_ok=True)
        for sidecar in sorted(set(dvs.values())):
            link(
                _dv_sidecar_path(src, sidecar), _dv_sidecar_path(dst, sidecar)
            )
    return _commit(
        dst,
        files,
        f"clone-of-v{v}",
        m["schema"],
        set_constraints=dict(m.get("constraints", {})),
        set_dvs=dvs,
        set_column_map=dict(m.get("column_map", {})),
        set_dropped_physical=list(m.get("dropped_physical", [])),
        set_epochs=list(m.get("epochs", [])),
        set_properties=dict(m.get("properties", {})),
        # per-file stats travel with the hardlinked files (r15): the
        # clone's v1 adds are the source's live set
        add_stats=table_stats(src, v),
    )



def snapshot_compact(
    spark: SparkSession,
    path: str,
    n_files: int = 1,
    partition_cols: tuple[str, ...] = ("split", "lang"),
    zorder_by: tuple[str, str] | None = None,
    where: str | None = None,
) -> int:
    """Small-files OPTIMIZE with one cross-partition commit: every
    partition holding more than `n_files` live files is rewritten to
    `n_files` appended files; one manifest swap publishes all of them.
    Answers are identical before/during/after (pure re-layout). Returns
    partitions compacted.

    `zorder_by=(col_a, col_b)` is OPTIMIZE ZORDER BY (r12): each
    rewritten partition's rows are Morton-ordered on the two integer
    keys (operators/layout.py — grid-normalize per partition, interleave
    bits, range-partition into `n_files` z-contiguous files), so parquet
    footer (min, max) stats on BOTH keys stay narrow per file and any
    engine's scan pruning skips files on either key. When set, every
    partition rewrites (re-layout is the point), not just oversized
    ones.

    `where` (r15 — Delta's OPTIMIZE ... WHERE): restrict the rewrite
    to partitions matching a predicate over PARTITION COLUMNS only
    (Delta's rule — a predicate on a data column would force a scan
    just to scope maintenance; it raises by name, as does a predicate
    outside the AND-of-comparisons grammar). Untouched partitions keep
    byte-identical files."""
    versions = snapshot_versions(path)
    if not versions:
        raise ValueError(f"no committed snapshots under {path}")
    base_version = versions[-1]
    m = _read_manifest(path, versions[-1])
    live = _live_files(path, versions[-1])
    _check_partition_cols(live, partition_cols, "snapshot_compact")
    by_dir: dict[str, list[str]] = {}
    for f in live:
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    if where is not None:
        conj = _lstats.parse_skip_conjuncts(where)
        if not conj:
            raise ValueError(
                f"snapshot_compact(where=...): predicate {where!r} is "
                "outside the partition-predicate grammar "
                "(AND of col-vs-literal comparisons / IN / BETWEEN)"
            )
        bad = [c for c, _, _ in conj if c not in partition_cols]
        if bad:
            raise ValueError(
                "snapshot_compact(where=...): column(s) "
                f"{sorted(set(bad))} are not partition columns — "
                "OPTIMIZE WHERE scopes by partition only (Delta's rule)"
            )
        col_types = dict(_schema_fields(m["schema"]))

        def _dir_matches(d: str) -> bool:
            pvals: dict[str, str | None] = {}
            for seg in d.split(os.sep):
                if "=" in seg:
                    k, raw = seg.split("=", 1)
                    val = _unescape_partition_value(raw)
                    pvals[k] = None if val is None else str(val)
            return _partition_may_match(pvals, conj, col_types)

        by_dir = {d: fs for d, fs in by_dir.items() if _dir_matches(d)}
    # cap-exempt read: compaction IS the DV materialization path — it
    # must still work once the accumulated vectors exceed the per-scan
    # broadcast cap (an explicit maintenance action, not a silent scan)
    snap = snapshot_read(spark, path, _apply_dv_cap=False)
    removed: set[str] = set()
    added: set[str] = set()
    add_stats: dict[str, dict] = {}
    compacted = 0
    dv_files = set(m.get("dvs", {}))
    work = [
        (d, files)
        for d, files in sorted(by_dir.items())
        if not (
            zorder_by is None
            and len(files) <= n_files
            and not (set(files) & dv_files)  # materializing DVs is a
            # compaction duty: a DV'd file rewrites even under budget
        )
    ]

    def _rewrite_dir(d_files):
        d, files = d_files
        cond = F.lit(True)
        for seg in d.split(os.sep):
            k, v = seg.split("=", 1)
            # dir segment → raw value (unescape; Hive NULL marker →
            # null-safe match), else escaped/NULL partitions rewrite
            # empty and the compacted manifest drops their rows
            cond = cond & F.col(k).eqNullSafe(
                F.lit(_unescape_partition_value(v))
            )
        part = snap.filter(cond)
        if zorder_by is not None:
            from kstreams_spark.operators.layout import with_zvalue

            part = (
                with_zvalue(part, zorder_by[0], zorder_by[1])
                .repartitionByRange(n_files, "z")
                .sortWithinPartitions("z")
                .drop("z")
            )
        else:
            part = part.coalesce(n_files)
        new, new_stats = _write_staged(
            _to_physical_df(part, m.get("column_map", {})),
            path,
            partition_cols,
        )
        return files, new, new_stats

    # Each partition dir's rewrite is an independent chain of Spark
    # jobs (bounds agg + range sample + staged write); running them
    # from a small thread pool overlaps one dir's tail with the next
    # dir's head (optimization guide §2.6 — actions are sequential only
    # because driver code calls them sequentially). The commit below
    # still happens ONCE, after every rewrite finished, so crash/abort
    # semantics are unchanged (orphan staging dirs are vacuum-swept).
    if work:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(work))) as pool:
            for files, new, new_stats in pool.map(_rewrite_dir, work):
                added |= new
                add_stats.update(new_stats)
                removed |= set(files)
                compacted += 1
    if compacted:
        _commit(
            path,
            (live - removed) | added,
            "compact",
            m["schema"],
            base_version=base_version,
            add_stats=add_stats,
        )
    return compacted


# Reader-grace contract (r12, Delta's retention model): vacuum must not
# delete files under a reader pinned to an old version, and must not
# sweep an IN-FLIGHT writer's not-yet-committed files as "orphans".
# Age is the guard: anything younger than `grace_seconds` survives.
VACUUM_GRACE_FLOOR_S = 3600  # refuse shorter grace unless force=True
DEFAULT_VACUUM_GRACE_S = 24 * 3600


def vacuum(
    path: str,
    keep_versions: int = 1,
    grace_seconds: float | None = None,
    force: bool = False,
    dry_run: bool = False,
) -> int:
    """Physically remove files no retained snapshot references (orphans
    from crashed writers included) and manifests older than the newest
    `keep_versions`. Returns files removed.

    Reader grace (Delta's retention contract): a version whose manifest
    is younger than `grace_seconds` is RETAINED even beyond
    `keep_versions` — a long-running reader pinned at an old version
    keeps its files for at least the grace window after that version
    was superseded. The same age guard protects unreferenced data files
    and temp manifests, so an in-flight concurrent commit's staged
    files are never swept mid-commit. `grace_seconds=None` (default)
    resolves the per-table TBLPROPERTIES key
    `kstreams.vacuum.graceSeconds`, falling back to 24 h (r14; an
    explicit argument always wins). `grace_seconds` below
    VACUUM_GRACE_FLOOR_S (1 h) is refused unless `force=True` — the
    escape hatch for tests and truly quiesced lakes; after vacuum,
    time travel reaches only the retained versions.

    `dry_run=True` (the Delta VACUUM DRY RUN) returns the count of data
    files a real run would delete right now and touches NOTHING — no
    checkpoint write, no manifest folding, no sweep."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    if grace_seconds is None:
        # per-table default via TBLPROPERTIES (r14); the explicit
        # argument wins, the safety floor below applies either way
        try:
            grace_seconds = float(
                table_properties(path).get(
                    "kstreams.vacuum.graceSeconds", DEFAULT_VACUUM_GRACE_S
                )
            )
        except (TypeError, ValueError):
            grace_seconds = DEFAULT_VACUUM_GRACE_S
    if grace_seconds < VACUUM_GRACE_FLOOR_S and not force:
        raise ValueError(
            f"grace_seconds={grace_seconds} is below the "
            f"{VACUUM_GRACE_FLOOR_S}s floor: a reader pinned at an old "
            "version could have files deleted underneath it — pass "
            "force=True only when no concurrent readers/writers exist"
        )
    versions = snapshot_versions(path)
    if not versions:
        return 0
    now = time.time()

    def _young(p: str) -> bool:
        try:
            return now - os.path.getmtime(p) < grace_seconds
        except OSError:
            return True  # raced with another actor: keep, never sweep
    retained = set(versions[-keep_versions:]) | {
        v for v in versions if _young(_manifest_path(path, v))
    }
    referenced: set[str] = set()
    for v in retained:
        referenced |= _live_files(path, v)
    if dry_run:
        return sum(
            1
            for f in _list_files(path) - referenced
            if not _young(os.path.join(path, f))
        )
    # the oldest retained version's delta chain may reach below the
    # manifests about to be dropped — checkpoint it FIRST so every
    # retained version stays resolvable (retained is a suffix of
    # `versions`, so the rest replay forward from this one)
    oldest = min(retained)
    _write_checkpoint(
        path,
        oldest,
        _live_files(path, oldest),
        stats=table_stats(path, oldest),
    )
    removed = 0
    for f in sorted(_list_files(path) - referenced):
        full = os.path.join(path, f)
        if _young(full):
            continue  # possibly an in-flight writer's staged file
        os.remove(full)
        removed += 1
    referenced_dvs = set()
    for v in retained:
        referenced_dvs |= set(_read_manifest(path, v).get("dvs", {}).values())
    for v in versions:
        if v not in retained:
            os.remove(_manifest_path(path, v))
            for cp in _glob.glob(
                os.path.join(_log_dir(path), f"v{v:010d}.checkpoint*")
            ):
                os.remove(cp)
    for dv in _glob.glob(os.path.join(_log_dir(path), "dv-*.json")):
        if os.path.basename(dv) not in referenced_dvs and not _young(dv):
            os.remove(dv)
    # sweep stale tmp manifests/checkpoints/DV sidecars (age-guarded: a
    # live committer's tmp must survive until its os.link/rename) and
    # now-empty partition dirs
    for tmp in _glob.glob(os.path.join(_log_dir(path), ".tmp-*")):
        if not _young(tmp):
            os.remove(tmp)
    # orphan staging dirs (a writer that crashed between staging its
    # files and moving them into the layout). Age-guard on the NEWEST
    # mtime anywhere under the dir, not the top-level dir's own mtime —
    # files landing in nested partition subdirs don't bump the root, so
    # a write job outliving the grace window would otherwise have its
    # LIVE staging dir swept mid-write (ADVICE r14).
    for stage in _glob.glob(os.path.join(path, ".staging-*")):
        newest = [stage]
        for sroot, _sdirs, sfiles in os.walk(stage):
            newest.append(sroot)
            newest.extend(os.path.join(sroot, f) for f in sfiles)
        try:
            if all(not _young(p) for p in newest):
                _shutil.rmtree(stage, ignore_errors=True)
        except FileNotFoundError:
            pass  # the writer finished (moved files away) mid-walk
    for root, dirs, files in os.walk(path, topdown=False):
        if root != path and not os.listdir(root):
            os.rmdir(root)
    return removed


class SnapshotLakeSink:
    """foreachBatch sink publishing each microbatch as ONE snapshot
    commit — the streaming half of the snapshot lake, and the manifest
    answer to the epoch-directory answer in
    streaming/exactly_once.ExactlyOnceParquetSink:

    - exactly-once: the committed-epoch set rides every manifest
      (carried forward by _commit, so it survives vacuum); a replayed
      epoch already in the set is a no-op. A crash between the data
      append and the manifest rename leaves only orphan files no
      snapshot references — the replay appends again and commits once,
      and vacuum() sweeps the orphans.
    - atomic batch visibility: a reader pinning the latest version sees
      every partition the batch touched at once (the hybrid
      group-marker guarantee, now for arbitrary partitioned lake
      output), and time travel reaches any prior batch boundary.
    - the same lake then takes snapshot_delete_where / snapshot_compact
      / vacuum maintenance with no translation layer — streaming ingest
      and batch maintenance share one commit protocol, which is the
      Delta/Iceberg operational story this module re-expresses.

    One STREAM per path (epoch ids are per-query — two streams would
    collide on the same epoch namespace). Batch maintenance may overlap
    the stream under the r12 optimistic-commit protocol: the sink's
    blind append auto-retries onto the next version if maintenance
    commits first, and maintenance aborts loudly if the sink commits
    first (re-run it) — no torn state either way.

    Cost note (r13 — the caveat this paragraph used to state, closed):
    discovering the batch's new files is a before/after listing SCOPED
    to the partitions the batch touches (one small distinct job tells
    us which) — O(files in touched partitions) per microbatch, not
    O(total lake files). A production table format goes one further
    (its task commit protocol TELLS the driver which files each batch
    wrote, no listing at all); the commit/visibility/replay semantics
    here are unchanged by that swap."""

    def __init__(
        self, path: str, partition_cols: tuple[str, ...] = ("split", "lang")
    ) -> None:
        self.path = path
        self.partition_cols = tuple(partition_cols)

    def committed_epochs(self) -> set[int]:
        versions = snapshot_versions(self.path)
        if not versions:
            return set()
        return set(_read_manifest(self.path, versions[-1]).get("epochs", []))

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if int(epoch_id) in self.committed_epochs():
            return  # replay of a committed epoch: exactly-once no-op
        versions = snapshot_versions(self.path)
        base = versions[-1] if versions else 0
        if versions:  # schema enforcement, like every append path (r12)
            _check_append_schema(
                batch_df.schema.simpleString(),
                _read_manifest(self.path, base)["schema"],
                False,
                "SnapshotLakeSink",
            )
            _check_partition_cols(
                _live_files(self.path, base),
                self.partition_cols,
                "SnapshotLakeSink",
            )
        live = _live_files(self.path, base) if versions else set()
        # staged write (r14): the microbatch's file set comes from the
        # staging listing — O(this batch's files), no directory diff,
        # no extra distinct job per microbatch; CHECK enforcement rides
        # the same write job (observe metrics on the logical names)
        batch_df, check = _constraint_observer(
            batch_df,
            table_constraints(self.path) if versions else {},
            "SnapshotLakeSink",
        )
        new, new_stats = _write_staged(
            _to_physical_df(batch_df, table_column_map(self.path)),
            self.path,
            self.partition_cols,
            check=check,
        )
        # blind append: losing a commit race to a concurrent maintenance
        # commit re-merges onto the new live set and retries (the
        # appended files are unique-named — they never conflict)
        _commit(
            self.path,
            live | new,
            f"stream-epoch-{epoch_id}",
            batch_df.schema.simpleString(),
            new_epoch=int(epoch_id),
            base_version=base,
            add_stats=new_stats,
            recompute=lambda latest_live: latest_live | new,
            recheck_schema=lambda committed: _check_append_schema(
                batch_df.schema.simpleString(),
                committed,
                False,
                "SnapshotLakeSink",
            ),
        )

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def result(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        return snapshot_read(spark, self.path, version)


def snapshot_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Change feed between two committed snapshots — CDC read off the
    manifest log (the operators/cdc_text hash-diff, powered by time
    travel instead of two materialized table copies): rows present only
    in `to` are 'insert', only in `from` are 'delete', same key with
    different non-key content are 'update'. Returns the `to` side's
    row (the `from` side's for deletes) plus a `_change` column.

    Cost model: at fixture scale this diffs the two snapshot reads;
    the file-level manifests make the obvious 100 TB optimization
    available (diff only files that CHANGED between the manifests —
    unchanged files cannot contribute changes since data files are
    immutable), which is how table formats serve change feeds without
    rescanning the table. The semantic contract is what this function
    pins; `key_cols` must be unique per snapshot."""
    old = snapshot_read(spark, path, from_version)
    new = snapshot_read(spark, path, to_version)
    # immutable-file pruning: rows living in files BOTH manifests list
    # cannot have changed — at scale this is the whole point, and it is
    # expressible here because a parquet row's file is addressable
    versions = snapshot_versions(path)
    to_v = versions[-1] if to_version is None else to_version
    f_old = _live_files(path, from_version)
    f_new = _live_files(path, to_v)
    dv_old, dv_new = table_dvs(path, from_version), table_dvs(path, to_v)
    shared = [
        os.path.join(path, f)
        for f in sorted(f_old & f_new)
        # a file both versions list can still differ ROW-wise when its
        # deletion vector moved — keep it in the diff
        if dv_old.get(f, []) == dv_new.get(f, [])
    ]
    if shared:
        fname = F.input_file_name()
        # input_file_name() renders file: URIs; a path whose URI form
        # differs (e.g. %-encoded partition chars) simply misses the
        # prune — harmless: its rows appear identical on both sides and
        # classify as no-change below. Pruning is best-effort, the
        # classification is what's load-bearing.
        keep = ~F.col("_f").isin([f"file://{p}" for p in shared] + [f"file:{p}" for p in shared] + shared)
        old = old.withColumn("_f", fname).filter(keep).drop("_f")
        new = new.withColumn("_f", fname).filter(keep).drop("_f")
    keys = list(key_cols)
    # COLUMN MAPPING (r13): a renamed column is the SAME data under a
    # new logical name — align the old side to the new side's logical
    # name wherever the physical names match, so a rename commits ZERO
    # spurious updates (without this, the rename reads as drop+add and
    # every row classifies as changed)
    cm_old = table_column_map(path, from_version)
    cm_new = table_column_map(path, to_v)
    phys_to_new = {cm_new.get(c, c): c for c in new.columns}
    for c in list(old.columns):
        tgt = phys_to_new.get(cm_old.get(c, c))
        if tgt is not None and tgt != c:
            old = old.withColumnRenamed(c, tgt)
    # schema evolution: align both sides on the UNION of columns — the
    # pre-evolve side NULL-fills added columns (matching what its rows
    # read as today), a replace-dropped column still participates (its
    # values changing to absent IS a row change)
    for c in [c for c in new.columns if c not in old.columns]:
        old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
    for c in [c for c in old.columns if c not in new.columns]:
        new = new.withColumn(c, F.lit(None).cast(old.schema[c].dataType))
    data_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*data_cols).alias("_old"))
    n = new.select(*keys, F.struct(*data_cols).alias("_new"))
    j = o.join(n, keys, "full")
    return (
        j.select(
            *keys,
            F.when(F.col("_old").isNull(), F.lit("insert"))
            .when(F.col("_new").isNull(), F.lit("delete"))
            .when(F.col("_old") != F.col("_new"), F.lit("update"))
            .alias("_change"),
            F.coalesce(F.col("_new"), F.col("_old")).alias("_row"),
        )
        .filter(F.col("_change").isNotNull())
        .select(*keys, "_change", "_row.*")
    )
