"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — the
newest extension seam on the scan side, demonstrated end-to-end with a
JSONL reader: one InputPartition PER FILE (so a directory of N files
scans N-wide with no driver involvement beyond the listing), lazy
line-by-line parse in each task, schema either user-provided or inferred
from the first record.

Where this seam matters at 100 TB: a format Spark has no native reader
for (proprietary ticks, scientific formats, an internal RPC) plugs into
the DataFrame API at full parallelism — partitions define the split,
Catalyst still prunes columns above it, and everything downstream
(joins, aggs, the oracle-checked operators) is unchanged. The built-in
`spark.read.json` remains the right call for actual JSON (JVM-side,
pushdown-capable); this module is the worked example of the API, pinned
against it in tests/test_jsonl_source.py.

Reference parity note: the reference's source is a Kafka topic of JSON
strings (BME680.java:152); this is the same payload shape arriving as
files through a user-defined scan.

Concurrency contract (write side): appends from concurrent jobs are safe
as long as every writer publishes within `staleGraceSeconds` (writer
option, default 3600) of staging its last part file — the orphan sweep
treats older foreign `_staged-*` files as crashed-job debris and removes
them, which would fail a slower concurrent writer's commit rename. If
writers can stall longer between staging and commit, raise the option or
fall back to single-writer per directory.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_TYPE_MAP = [
    (bool, "boolean"),
    (int, "bigint"),
    (float, "double"),
    (str, "string"),
]


def _infer_field(v: object) -> str:
    for py_t, sql_t in _TYPE_MAP:
        if isinstance(v, py_t):
            return sql_t
    return "string"  # null / nested → stringly-typed fallback


def _list_files(path: str, ext: str = ".jsonl") -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(ext) and not n.startswith((".", "_"))
    )


class JsonlFilePartition(InputPartition):
    def __init__(self, file_path: str) -> None:
        self.file_path = file_path


class JsonlReader(DataSourceReader):
    def __init__(self, schema, options: dict[str, str]) -> None:
        self.field_names = schema.fieldNames()
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        # one split per file: the scan parallelism IS the file layout
        return [JsonlFilePartition(f) for f in _list_files(self.path)]

    def read(self, partition: JsonlFilePartition) -> Iterator[tuple]:
        with open(partition.file_path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(name) for name in self.field_names)


class JsonlDataSource(DataSource):
    """`spark.dataSource.register(JsonlDataSource)` then
    `spark.read.format("kstreams_jsonl").load(path)`."""

    @classmethod
    def name(cls) -> str:
        return "kstreams_jsonl"

    def schema(self) -> str:
        """Called only when the user gave no schema: infer field names
        and types from the first record of the first file (sorted-key
        order for determinism)."""
        files = _list_files(self.options["path"])
        if not files:
            raise ValueError(f"no .jsonl files under {self.options['path']}")
        for f in files:  # skip empty files (an empty task's part)
            with open(f, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        first = json.loads(line)
                        return ", ".join(
                            f"{k} {_infer_field(v)}"
                            for k, v in sorted(first.items())
                        )
        raise ValueError(
            f"all .jsonl files under {self.options['path']} are empty; "
            "provide an explicit schema"
        )

    def reader(self, schema) -> JsonlReader:
        return JsonlReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(schema, self.options, overwrite)


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, tmp_path: str, count: int) -> None:
        self.tmp_path = tmp_path
        self.count = count


class JsonlWriter(DataSourceWriter):
    """Two-phase commit, the same shape every exactly-once sink in this
    repo uses (streaming/exactly_once.py): each task stages its
    partition to an underscore-prefixed temp file (invisible to the
    reader's listing) and reports it in a commit message; only the
    driver's commit() publishes — all-or-nothing, a failed task's
    partial file is swept by abort() and never becomes visible."""

    # A foreign staged file (another writer's commit_id) is swept only if
    # it has sat unpublished this long past our own job start — a crashed
    # past job's debris, not a concurrent append's in-flight staging.
    # Assumption documented: a concurrent writer publishes within this
    # grace of staging its last file; if writers can stall longer between
    # staging and commit, raise the grace via the `staleGraceSeconds`
    # writer option (sized to the slowest stage→commit gap in the fleet)
    # or run single-writer per directory (ADVICE r9).
    STALE_GRACE_S = 3600.0
    # subclass points (the Avro OCF sink reuses this two-phase commit
    # verbatim): published/staged file extension + partition serializer
    EXT = ".jsonl"

    def __init__(self, schema, options: dict[str, str], overwrite: bool) -> None:
        import time
        import uuid

        self.field_names = schema.fieldNames()
        self.path = options["path"]
        self.overwrite = overwrite
        self.stale_grace_s = float(
            options.get("stalegraceseconds", self.STALE_GRACE_S)
        )
        # per-commit token in BOTH the published and the staged names:
        # append-mode commits must not collide with an earlier commit's
        # part files (a bare part-00000 from commit 2 would silently
        # os.rename over commit 1's rows — ADVICE r7), and the orphan
        # sweep must not delete a CONCURRENT writer's in-flight staged
        # files out from under its commit (ADVICE r8)
        self.commit_id = uuid.uuid4().hex[:12]
        self.started_at = time.time()

    def write(self, iterator) -> JsonlCommitMessage:
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path,
            f"_staged-{self.commit_id}-{uuid.uuid4().hex}{self.EXT}",
        )
        n = self._serialize_partition(iterator, tmp)
        return JsonlCommitMessage(tmp_path=tmp, count=n)

    def _serialize_partition(self, iterator, tmp_path: str) -> int:
        """Write one task's rows to tmp_path; returns the row count.
        The subclass hook — everything around it (staging, commit
        rename, orphan sweep) is format-agnostic."""
        n = 0
        with open(tmp_path, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(dict(zip(self.field_names, row))) + "\n"
                )
                n += 1
        return n

    def _sweep_orphans(self, keep: set[str]) -> None:
        """Remove staged files no surviving commit message references —
        a failed/speculative task attempt stages a file but its message
        never reaches the driver, so abort()'s message loop alone leaks
        it forever (invisible to readers, but accumulating — ADVICE r7).

        Scope (ADVICE r8): unconditionally sweep only THIS writer's
        staging (`_staged-<commit_id>-*`); a concurrent append job's
        staged files must survive our commit or its own os.rename fails.
        Foreign staged files are swept only when stale — older than
        STALE_GRACE_S before our own start — i.e. debris from a crashed
        job, never a live one. Residual (documented, not fixable from
        the driver): a speculative attempt of THIS job still running
        after our commit restages one orphan; it ages into a later
        writer's stale sweep."""
        import glob as _glob

        cutoff = self.started_at - self.stale_grace_s
        mine = os.path.join(self.path, f"_staged-{self.commit_id}-*{self.EXT}")
        for f in _glob.glob(mine):
            if f not in keep:
                os.remove(f)
        for f in _glob.glob(os.path.join(self.path, f"_staged-*{self.EXT}")):
            if f in keep or f"_staged-{self.commit_id}-" in os.path.basename(f):
                continue
            try:
                if os.path.getmtime(f) < cutoff:
                    os.remove(f)
            except OSError:
                pass  # raced with its owner's commit/abort — theirs

    def commit(self, messages) -> None:
        if self.overwrite:
            for old in _list_files(self.path, self.EXT):
                os.remove(old)
        live = [m for m in messages if m is not None and m.count > 0]
        for i, m in enumerate(live):
            os.rename(
                m.tmp_path,
                os.path.join(
                    self.path, f"part-{self.commit_id}-{i:05d}{self.EXT}"
                ),
            )
        # empty tasks' staged files and orphaned attempts of THIS job
        # fall to the sweep — nothing of ours unpublished survives a
        # commit; foreign in-flight staging does
        self._sweep_orphans(keep=set())

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        self._sweep_orphans(keep=set())
