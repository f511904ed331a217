"""Lake maintenance: schema-evolution reads and the copy-on-write
partition-pruned delete (io.read_evolved / io.delete_where) — the ops a
long-lived curated lake needs that SQL oracles can't express (they are
sinks/maintenance, not queries)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kstreams_spark.io import (
    _lake_recover,
    delete_where,
    load_table,
    read_evolved,
    write_curated_lake,
)

SF = "/root/testdata/sf0.001"


def _docs_lake(spark, path: str) -> None:
    d = load_table(spark, SF, "documents").withColumn(
        "split",
        F.when(F.col("doc_id") % 10 < 8, "train").otherwise("test"),
    )
    write_curated_lake(d, path, partition_cols=("split", "lang"))


def _files(path: str) -> dict[str, int]:
    return {
        f: os.path.getsize(f)
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
    }


def test_delete_where_rewrites_only_affected_partitions(spark, tmp_path):
    path = str(tmp_path / "lake")
    _docs_lake(spark, path)
    before = spark.read.parquet(path)
    total = before.count()

    # victims live in exactly one (split, lang) partition
    victim_part = before.filter("split = 'train' AND lang = 'en'")
    victims = [r.doc_id for r in victim_part.limit(5).collect()]
    assert victims
    cond = f"doc_id IN ({','.join(map(str, victims))})"
    # the same doc_ids may also exist under other partitions — scope the
    # victim set to ids unique to the target partition for the
    # file-preservation assertion to be exact
    other = before.filter(f"NOT (split = 'train' AND lang = 'en')")
    other_ids = {r.doc_id for r in other.filter(cond).collect()}
    victims = [v for v in victims if v not in other_ids]
    assert victims, "fixture gave no partition-unique victims"
    cond = f"doc_id IN ({','.join(map(str, victims))})"

    files_before = _files(path)
    n_deleted = delete_where(spark, path, cond)
    assert n_deleted == len(victims)

    after = spark.read.parquet(path)
    assert after.count() == total - len(victims)
    assert after.filter(cond).count() == 0

    # untouched partitions keep their exact files
    files_after = _files(path)
    changed_roots = {
        os.path.relpath(f, path).split("/")[0] + "/"
        + os.path.relpath(f, path).split("/")[1]
        for f in set(files_before) ^ set(files_after)
    }
    assert changed_roots == {"split=train/lang=en"}, changed_roots
    for f, size in files_before.items():
        if "split=train/lang=en" not in f:
            assert files_after.get(f) == size, f


def test_delete_where_recovers_from_crash_points(spark, tmp_path):
    path = str(tmp_path / "lake")
    _docs_lake(spark, path)
    total = spark.read.parquet(path).count()

    # crash point A: staged dir written, swap not begun → recover drops it
    part = os.path.join(path, "split=test", "lang=en")
    staged = part + ".new-del"
    spark.read.parquet(part).limit(1).write.parquet(staged)
    _lake_recover(path)
    assert not os.path.isdir(staged)
    assert spark.read.parquet(path).count() == total

    # crash point B: live dir displaced, new not moved in → recover restores
    old = part + ".old-del"
    os.rename(part, old)
    _lake_recover(path)
    assert os.path.isdir(part) and not os.path.isdir(old)
    assert spark.read.parquet(path).count() == total


def test_delete_where_keeps_null_evaluating_rows(spark, tmp_path):
    """SQL DELETE semantics: remove only where the predicate is TRUE —
    rows where it evaluates NULL stay, and the returned count excludes
    them (ADVICE r7: NOT(cond) dropped NULL rows, but only in rewritten
    partitions)."""
    path = str(tmp_path / "lake")
    d = load_table(spark, SF, "documents").withColumn(
        "split",
        F.when(F.col("doc_id") % 10 < 8, "train").otherwise("test"),
    ).withColumn(
        "flag", F.when(F.col("doc_id") % 3 == 0, F.col("doc_id") % 2)
    )  # flag is NULL for 2/3 of rows, 0/1 otherwise
    write_curated_lake(d, path, partition_cols=("split", "lang"))
    before = spark.read.parquet(path)
    n_true = before.filter("flag = 1").count()
    n_null = before.filter("flag IS NULL").count()
    assert n_true and n_null

    n_deleted = delete_where(spark, path, "flag = 1")
    assert n_deleted == n_true
    after = spark.read.parquet(path)
    assert after.filter("flag = 1").count() == 0
    assert after.filter("flag IS NULL").count() == n_null


def test_delete_where_noop_when_no_match(spark, tmp_path):
    path = str(tmp_path / "lake")
    _docs_lake(spark, path)
    files_before = _files(path)
    assert delete_where(spark, path, "doc_id = -1") == 0
    assert _files(path) == files_before


def test_read_evolved_merges_schemas(spark, tmp_path):
    path = str(tmp_path / "evolved")
    d = load_table(spark, SF, "documents")
    # v1 writer: no quality column; v2 writer adds it
    d.filter("doc_id % 2 = 0").select("doc_id", "lang").write.parquet(
        f"{path}/batch=0"
    )
    d.filter("doc_id % 2 = 1").select(
        "doc_id", "lang", F.lit(7).alias("quality")
    ).write.parquet(f"{path}/batch=1")

    merged = read_evolved(spark, path)
    assert set(merged.columns) == {"doc_id", "lang", "quality", "batch"}
    assert merged.count() == d.count()
    # old files surface the new column as NULL, new files keep values
    assert merged.filter("batch = 0 AND quality IS NULL").count() == (
        merged.filter("batch = 0").count()
    )
    assert merged.filter("batch = 1 AND quality = 7").count() == (
        merged.filter("batch = 1").count()
    )


def test_compact_lake_merges_small_files(spark, tmp_path):
    from kstreams_spark.io import compact_lake

    path = str(tmp_path / "lake")
    d = load_table(spark, SF, "documents").withColumn(
        "split",
        F.when(F.col("doc_id") % 10 < 8, "train").otherwise("test"),
    )
    # force a small-files layout: many tasks per partition dir
    write_curated_lake(d.repartition(8), path)
    before = spark.read.parquet(path)
    rows_before = sorted(r.doc_id for r in before.select("doc_id").collect())
    multi = [
        p
        for p in glob.glob(f"{path}/*/*")
        if os.path.isdir(p)
        and len(glob.glob(os.path.join(p, "*.parquet"))) > 1
    ]
    assert multi, "fixture should produce multi-file partitions"

    n = compact_lake(spark, path, n_files=1)
    assert n == len(multi)
    for p in glob.glob(f"{path}/*/*"):
        if os.path.isdir(p):
            assert len(glob.glob(os.path.join(p, "*.parquet"))) == 1
    after = spark.read.parquet(path)
    assert sorted(r.doc_id for r in after.select("doc_id").collect()) == (
        rows_before
    )
    # idempotent: second run is a no-op
    assert compact_lake(spark, path, n_files=1) == 0


def test_compact_lake_reader_parity_across_swap_window(spark, tmp_path):
    """OPTIMIZE inherits delete_where's read-availability contract
    (VERDICT r7 task 7): at every crash/interleave point of the
    displace-swap, a reader that first runs `_lake_recover` sees the
    complete row set — either the old layout or the compacted one,
    never a partial partition."""
    from kstreams_spark.io import compact_lake

    path = str(tmp_path / "lake")
    d = load_table(spark, SF, "documents").withColumn(
        "split",
        F.when(F.col("doc_id") % 10 < 8, "train").otherwise("test"),
    )
    write_curated_lake(d.repartition(8), path)
    rows = sorted(
        r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()
    )
    part = next(
        p
        for p in sorted(glob.glob(f"{path}/*/*"))
        if os.path.isdir(p)
        and len(glob.glob(os.path.join(p, "*.parquet"))) > 1
    )

    # window A: staged compacted copy exists, swap not begun. A reader
    # must not double-count: raw recursive read would see both copies,
    # the recover step drops the uncommitted stage.
    staged = part + ".new-del"
    spark.read.parquet(part).coalesce(1).write.parquet(staged)
    _lake_recover(path)
    assert not os.path.isdir(staged)
    got = sorted(
        r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()
    )
    assert got == rows

    # window B: live dir displaced, compacted copy not yet moved in —
    # recover restores the displaced original.
    spark.read.parquet(part).coalesce(1).write.parquet(staged)
    os.rename(part, part + ".old-del")
    _lake_recover(path)
    assert os.path.isdir(part) and not os.path.isdir(part + ".old-del")
    got = sorted(
        r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()
    )
    assert got == rows

    # window C: swap committed, displaced original not yet removed —
    # recover drops the stale copy; rows unchanged, layout compacted.
    spark.read.parquet(part).coalesce(1).write.parquet(staged)
    os.rename(part, part + ".old-del")
    os.rename(staged, part)
    _lake_recover(path)
    assert not os.path.isdir(part + ".old-del")
    assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1
    got = sorted(
        r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()
    )
    assert got == rows
