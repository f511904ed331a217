"""Oracle-gated queries over the snapshot lake's verb surface
(lake_snapshot.py) — MERGE INTO, RESTORE, OPTIMIZE ZORDER, and
time travel, value-checked by the driver's DuckDB hash gate.

The r12 lake verbs were test-pinned but not oracle-checked; this module
closes that: the query builds a REAL lake (temp dir), drives the full
verb chain — publish v1 → merge v2 (updates + inserts) → restore v3
(back to v1) → z-order compact v4 (pure re-layout of v3) — then reads
EVERY version back through time travel and aggregates a per-(version,
split) fingerprint. The DuckDB oracle replays the chain's SEMANTICS
logically (v1 = base, v2 = merged world, v3 = v1 again, v4 = v1 again)
with no filesystem at all, so a hash match certifies the merge's
upsert semantics, restore's rewind, compaction's answer-stability, and
per-version reads — not just "some rows came back".

The fingerprint is the repo's portable md5→int pattern (CLAUDE.md: md5
is the only Spark↔DuckDB-portable hash): the first four hex digits of
md5(text) as a 16-bit integer, summed per group. A merge that writes
the wrong post-image, a restore that leaks v2 rows, or a compaction
that drops/duplicates a row all move the sum.

Reference: extends the reference's declared persistence growth path
(BME680.java:41-44) the same way lake_snapshot.py does; the verbs are
Delta/Iceberg re-expressions.

Shuffle budget: the lake writes are the op under test (partition-grain
copy-on-write); the final read is 4 manifest-pinned scans + one 2-key
aggregation. Each invocation builds its lake in a fresh temp dir
(fixture-scale; the driver and the drift gate re-run queries, so no
shared mutable state)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query

# 16-bit integer from md5(text)'s first four hex digits — the same
# instr-based digit decode both engines evaluate identically.
_FP = " + ".join(
    f"(instr('0123456789abcdef', substr(md5(text), {i + 1}, 1)) - 1)"
    f" * {16 ** (3 - i)}"
    for i in range(4)
)

_BASE_N = 400  # corpus prefix published as v1
_INS_N = 450  # doc_ids [400, 450) arrive as merge inserts


def _oracle() -> str:
    return f"""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END AS split
      FROM documents WHERE doc_id < {_BASE_N}
    ),
    merged AS (  -- v2: post-images for doc_id%7=0, survivors, inserts
      SELECT doc_id, reverse(text) AS text, split
      FROM base WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id, text, split FROM base WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id, text,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END
      FROM documents WHERE doc_id >= {_BASE_N} AND doc_id < {_INS_N}
    ),
    u AS (  -- v1 = base, v2 = merged, v3 = restore(v1), v4 = compact(v3)
      SELECT 1 AS version, * FROM base
      UNION ALL SELECT 2, * FROM merged
      UNION ALL SELECT 3, * FROM base
      UNION ALL SELECT 4, * FROM base
    )
    SELECT version, split,
           COUNT(*) AS n_docs,
           SUM({_FP})::BIGINT AS fp_sum,
           SUM(length(text))::BIGINT AS len_sum
    FROM u GROUP BY version, split
    """


@query("lake_merge_restore_timetravel", oracle=_oracle())
def lake_merge_restore_timetravel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The snapshot lake's verb chain, value-checked end-to-end (module
    docstring): publish → MERGE (update every doc_id%7=0 to its
    reversed text, insert [400,450)) → RESTORE to v1 → OPTIMIZE ZORDER
    compact → read all four versions via time travel and fingerprint
    per (version, split)."""
    from kstreams_spark.lake_snapshot import (
        snapshot_compact,
        snapshot_merge,
        snapshot_publish,
        snapshot_read,
        snapshot_restore,
    )

    lake = tempfile.mkdtemp(prefix="kstreams_lake_q_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 2 == 0, "train")
        .otherwise("val")
        .alias("split"),
    )
    base = docs.filter(F.col("doc_id") < _BASE_N)
    snapshot_publish(base, lake, partition_cols=("split",))  # v1
    src = (
        base.filter(F.col("doc_id") % 7 == 0)
        .withColumn("text", F.reverse(F.col("text")))
        .unionByName(
            docs.filter(
                (F.col("doc_id") >= _BASE_N) & (F.col("doc_id") < _INS_N)
            )
        )
    )
    snapshot_merge(
        spark, lake, src, key_cols=("doc_id",), partition_cols=("split",)
    )  # v2
    snapshot_restore(lake, 1)  # v3: rewind the merge
    snapshot_compact(
        spark,
        lake,
        n_files=2,
        partition_cols=("split",),
        zorder_by=("doc_id", "doc_id"),
    )  # v4: pure re-layout of v3
    reads = [
        snapshot_read(spark, lake, version=v).withColumn(
            "version", F.lit(v)
        )
        for v in (1, 2, 3, 4)
    ]
    from functools import reduce

    u = reduce(DataFrame.unionByName, reads)
    return u.groupBy("version", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"SUM({_FP})").cast("bigint").alias("fp_sum"),
        F.sum(F.length("text")).cast("bigint").alias("len_sum"),
    )


@query(
    "lake_evolution_roundtrip",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END AS split
      FROM documents WHERE doc_id < {_BASE_N}
    ),
    v1 AS (SELECT 1 AS version, doc_id, split,
                  CAST(NULL AS DOUBLE) AS quality FROM base),
    v2 AS (  -- post-evolve world: old rows NULL-fill, newcomers carry it
      SELECT 2 AS version, doc_id, split, CAST(NULL AS DOUBLE) AS quality
      FROM base
      UNION ALL
      SELECT 2, doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END,
             CAST(doc_id AS DOUBLE) / 1000
      FROM documents WHERE doc_id >= {_BASE_N} AND doc_id < {_INS_N}
    ),
    u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT version, split,
           COUNT(*) AS n_docs,
           COUNT(quality) AS n_quality,
           CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) AS q_sum
    FROM u GROUP BY version, split
    """,
)
def lake_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution under the driver's value hash: publish v1 (no
    `quality` column, a CHECK constraint set on it), evolve-append v2
    with `quality = doc_id/1000`, then read BOTH versions back — v1
    through its own pre-evolve schema (no quality column; the query
    re-attaches a typed NULL to union), v2 through the evolved schema
    where the v1-era files NULL-fill. The oracle replays the two worlds
    logically; COUNT(quality) pins exactly which rows carry values (a
    read that backfills old files wrongly, or drops newcomers' values,
    hash-mismatches). The CHECK constraint (`doc_id < {_INS_N}`) is set
    before the append and must admit it — enforcement wiring is
    value-visible because a refused append would empty version 2's
    newcomer rows."""
    from kstreams_spark.lake_snapshot import (
        snapshot_publish,
        snapshot_read,
        snapshot_set_constraint,
    )

    lake = tempfile.mkdtemp(prefix="kstreams_lake_evo_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "train")
        .otherwise("val")
        .alias("split"),
    )
    base = docs.filter(F.col("doc_id") < _BASE_N)
    snapshot_publish(base, lake, partition_cols=("split",))  # v1
    snapshot_set_constraint(spark, lake, "ids_bounded", f"doc_id < {_INS_N}")
    newcomers = docs.filter(
        (F.col("doc_id") >= _BASE_N) & (F.col("doc_id") < _INS_N)
    ).withColumn("quality", F.col("doc_id").cast("double") / 1000)
    snapshot_publish(
        newcomers, lake, partition_cols=("split",), mode="append", evolve=True
    )  # v3 (v2 was the constraint commit)
    v1 = snapshot_read(spark, lake, version=1).withColumns(
        {
            "version": F.lit(1),
            "quality": F.lit(None).cast("double"),
        }
    )
    v2 = snapshot_read(spark, lake).withColumn("version", F.lit(2))
    u = v1.unionByName(v2)
    from kstreams_spark.operators._util import dsum

    return u.groupBy("version", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("quality").alias("n_quality"),
        dsum("quality").alias("q_sum"),
    )


def _fp_on(col: str) -> str:
    """The 16-bit md5 fingerprint expression over an arbitrary column."""
    return " + ".join(
        f"(instr('0123456789abcdef', substr(md5({col}), {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )


@query(
    "lake_rename_roundtrip",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END AS split
      FROM documents WHERE doc_id < {_BASE_N}
    ),
    added AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END AS split
      FROM documents WHERE doc_id >= {_BASE_N} AND doc_id < {_INS_N}
    ),
    u AS (  -- v1 = base under the old name; v3 = base+appended under
            -- the new name (same DATA either way: rename moves no rows)
      SELECT 1 AS version, * FROM base
      UNION ALL SELECT 3, * FROM base
      UNION ALL SELECT 3, * FROM added
    )
    SELECT version, split,
           COUNT(*) AS n_docs,
           SUM({_fp_on("text")})::BIGINT AS fp_sum,
           SUM(length(text))::BIGINT AS len_sum
    FROM u GROUP BY version, split
    """,
)
def lake_rename_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN MAPPING under the driver's value hash (r13, VERDICT r12
    task 4): publish v1 → RENAME text→body (v2, metadata-only — zero
    data files move) → append [400,450) UNDER THE NEW NAME (v3, files
    store the stable physical name `text`) → read v1 through its own
    pre-rename schema (column `text`) and v3 through the mapped schema
    (column `body`, old files resolving through the map), fingerprint
    both. The oracle replays the data logically — a read that loses the
    mapping (NULL column), misorders it, or rewrites files
    hash-mismatches; len_sum pins that v3's old-file rows carry REAL
    text through the physical-name resolution, not NULL-fill."""
    from kstreams_spark.lake_snapshot import (
        snapshot_publish,
        snapshot_read,
        snapshot_rename_column,
    )

    lake = tempfile.mkdtemp(prefix="kstreams_lake_ren_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 2 == 0, "train")
        .otherwise("val")
        .alias("split"),
    )
    base = docs.filter(F.col("doc_id") < _BASE_N)
    snapshot_publish(base, lake, partition_cols=("split",))  # v1
    snapshot_rename_column(lake, "text", "body")  # v2: metadata-only
    appended = docs.filter(
        (F.col("doc_id") >= _BASE_N) & (F.col("doc_id") < _INS_N)
    ).withColumnRenamed("text", "body")
    snapshot_publish(
        appended, lake, mode="append", partition_cols=("split",)
    )  # v3
    v1 = snapshot_read(spark, lake, version=1).select(
        F.lit(1).alias("version"), "doc_id", "text", "split"
    )
    v3 = snapshot_read(spark, lake, version=3).select(
        F.lit(3).alias("version"),
        "doc_id",
        F.col("body").alias("text"),
        "split",
    )
    u = v1.unionByName(v3)
    return u.groupBy("version", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"SUM({_fp_on('text')})").cast("bigint").alias("fp_sum"),
        F.sum(F.length("text")).cast("bigint").alias("len_sum"),
    )


@query(
    "lake_clone_diverge",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END AS split
      FROM documents WHERE doc_id < {_BASE_N}
    ),
    added AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END AS split
      FROM documents WHERE doc_id >= {_BASE_N} AND doc_id < {_INS_N}
    ),
    u AS (  -- both tables' v1 = the clone point; then they diverge:
            -- source latest = base+appended, clone latest = base minus
            -- the deleted prefix — a clone that shares state with its
            -- source after the fork moves some group's sum
      SELECT 'src' AS tbl, 1 AS version, * FROM base
      UNION ALL SELECT 'src', 2, * FROM base
      UNION ALL SELECT 'src', 2, * FROM added
      UNION ALL SELECT 'clone', 1, * FROM base
      UNION ALL SELECT 'clone', 2, * FROM base WHERE doc_id >= 50
    )
    SELECT tbl, version, split,
           COUNT(*) AS n_docs,
           SUM({_fp_on("text")})::BIGINT AS fp_sum
    FROM u GROUP BY tbl, version, split
    """,
)
def lake_clone_diverge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE under the driver's value hash (r14, VERDICT r13
    task 5): publish v1 → snapshot_clone (zero-copy: hardlinked data
    files, one metadata commit) → diverge BOTH — append [400,450) to
    the source, delete doc_id<50 from the clone — then time-travel all
    four states (each table's v1 + latest) and fingerprint per
    (table, version, split). The oracle replays the fork logically: a
    clone that leaks post-fork source writes, loses pre-fork rows, or
    whose delete bleeds back into the source moves a group's sum.
    Divergence safety under vacuum is pinned separately in
    tests/test_lake_clone.py (the filesystem link-count refcount).

    Shuffle budget: the lake verbs are the op under test; the final
    read is 4 manifest-pinned scans + one 3-key aggregation."""
    from kstreams_spark.lake_snapshot import (
        snapshot_clone,
        snapshot_delete_where,
        snapshot_publish,
        snapshot_read,
    )

    src = tempfile.mkdtemp(prefix="kstreams_lake_clsrc_")
    clone = src + "_clone"  # fresh path; snapshot_clone refuses reuse
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 2 == 0, "train")
        .otherwise("val")
        .alias("split"),
    )
    base = docs.filter(F.col("doc_id") < _BASE_N)
    snapshot_publish(base, src, partition_cols=("split",))  # src v1
    snapshot_clone(src, clone)  # clone v1 == the fork point
    snapshot_publish(
        docs.filter(
            (F.col("doc_id") >= _BASE_N) & (F.col("doc_id") < _INS_N)
        ),
        src,
        mode="append",
        partition_cols=("split",),
    )  # src v2
    snapshot_delete_where(
        spark, clone, "doc_id < 50", partition_cols=("split",)
    )  # clone v2
    parts = []
    for tbl, path in (("src", src), ("clone", clone)):
        for v in (1, 2):
            parts.append(
                snapshot_read(spark, path, version=v).select(
                    F.lit(tbl).alias("tbl"),
                    F.lit(v).alias("version"),
                    "doc_id",
                    "text",
                    "split",
                )
            )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("tbl", "version", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"SUM({_fp_on('text')})").cast("bigint").alias("fp_sum"),
    )


@query(
    "lake_stats_skipping",
    oracle=f"""
    WITH hit AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'val' END AS split
      FROM documents
      WHERE doc_id >= 25 AND doc_id < 50
        AND doc_id % 2 = 0  -- split = 'train'
    )
    SELECT 'train' AS split,
           COUNT(*) AS n_docs,
           SUM({_fp_on("text")})::BIGINT AS fp_sum,
           1 AS files_scanned,
           7 AS files_skipped
    FROM hit
    """,
)
def lake_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-side data skipping under the driver's value hash (r15,
    VERDICT r14 task 1 — the Delta data-skipping twin): publish four
    appends of doc_id ranges [0,25) [25,50) [50,75) [75,100), each
    coalesced to ONE file per (append, split) partition dir — eight
    live files whose manifest-resident per-file stats carry disjoint
    doc_id ranges — then run a selective
    `snapshot_read(where="doc_id >= 25 AND doc_id < 50 AND
    split = 'train'")`. The layout is fully deterministic, so the
    SKIPPING ITSELF is value-checked: the result carries
    (files_scanned, files_skipped) from snapshot_scan_stats — (1, 7),
    partition pruning killing the four `val` files and the stats
    ranges killing the other three `train` files — and the oracle
    states those constants arithmetically alongside the surviving
    rows' fingerprint (a wrong bound that dropped a live row would
    move n_docs/fp_sum; a prune that stopped skipping would move
    files_scanned).

    100 TB posture: the prune is pure driver-side metadata
    (O(live files) dict walks over the manifest/checkpoint stats) —
    no file footer is opened; the scan then receives only the
    surviving file list (tests/test_lake_stats.py pins
    inputFiles() == 1).

    Shuffle budget: four 1-file staged writes + one pruned single-file
    scan + a 1-group aggregation."""
    from kstreams_spark.lake_snapshot import (
        snapshot_publish,
        snapshot_read,
        snapshot_scan_stats,
    )

    lake = tempfile.mkdtemp(prefix="kstreams_lake_skip_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 2 == 0, "train")
        .otherwise("val")
        .alias("split"),
    )
    for lo in range(0, 100, 25):
        snapshot_publish(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 25)
            ).coalesce(1),
            lake,
            mode="append" if lo else "replace",
            partition_cols=("split",),
        )
    where = "doc_id >= 25 AND doc_id < 50 AND split = 'train'"
    plan = snapshot_scan_stats(lake, where)
    hit = snapshot_read(spark, lake, where=where)
    return hit.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"SUM({_fp_on('text')})").cast("bigint").alias("fp_sum"),
        F.lit(plan["scanned"]).alias("files_scanned"),
        F.lit(plan["skipped"]).alias("files_skipped"),
    )


@query(
    "lake_metadata_min_max",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc,
           CAST(MIN(length(text)) AS BIGINT) AS min_chars,
           CAST(MAX(length(text)) AS BIGINT) AS max_chars,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents WHERE doc_id < 100
    """,
)
def lake_metadata_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only MIN/MAX under the driver's value hash (r15 —
    Delta/Spark's OptimizeMetadataOnlyQuery class over the manifest
    stats): publish four ranged appends, then answer
    `SELECT MIN(doc_id), MAX(doc_id), MIN(chars), MAX(chars)` WITHOUT
    opening a single data file or running a scan job —
    `snapshot_min_max` folds the per-file manifest bounds driver-side
    (declining, never guessing, when stats are missing / truncated /
    DV'd — the one-directional doctrine). The oracle computes the same
    extremes from the raw table, so a stats bound that ever went wrong
    (collection, checkpoint fold, replay, coercion) is value-visible
    here. n_rows rides from the same manifest stats (per-file row
    counts)."""
    from kstreams_spark.lake_snapshot import (
        snapshot_min_max,
        snapshot_publish,
        table_stats,
        snapshot_versions,
    )

    lake = tempfile.mkdtemp(prefix="kstreams_lake_mm_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("long").alias("chars"),
        F.when(F.col("doc_id") % 2 == 0, "train")
        .otherwise("val")
        .alias("split"),
    )
    for lo in range(0, 100, 25):
        snapshot_publish(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 25)
            ).coalesce(1),
            lake,
            mode="append" if lo else "replace",
            partition_cols=("split",),
        )
    mm = snapshot_min_max(lake, ["doc_id", "chars"])
    assert mm is not None, "every file was just written with stats"
    st = table_stats(lake, snapshot_versions(lake)[-1])
    n_rows = sum(e["rows"] for e in st.values())
    return spark.createDataFrame(
        [
            (
                int(mm["doc_id"][0]),
                int(mm["doc_id"][1]),
                int(mm["chars"][0]),
                int(mm["chars"][1]),
                int(n_rows),
            )
        ],
        "min_doc bigint, max_doc bigint, min_chars bigint, "
        "max_chars bigint, n_rows bigint",
    )
