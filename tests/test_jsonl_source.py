"""Custom Python DataSource (sources/jsonl.py): values must match the
built-in JSON reader on the same files, the scan must split one
partition per file, and user-provided schemas must override inference."""

from __future__ import annotations

import json

from kstreams_spark.sources.jsonl import JsonlDataSource


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _fixture(tmp_path, n_files=3, rows_per=10):
    d = tmp_path / "jsonl"
    d.mkdir()
    for i in range(n_files):
        _write_jsonl(
            d / f"part-{i}.jsonl",
            [
                {"doc_id": i * 100 + j, "lang": f"l{j % 3}", "score": j / 2}
                for j in range(rows_per)
            ],
        )
    return str(d)


def test_matches_builtin_json_reader(spark, tmp_path):
    path = _fixture(tmp_path)
    spark.dataSource.register(JsonlDataSource)
    got = spark.read.format("kstreams_jsonl").load(path)
    want = spark.read.json(path)
    assert sorted(got.columns) == sorted(want.columns)
    g = {tuple(r) for r in got.select("doc_id", "lang", "score").collect()}
    w = {tuple(r) for r in want.select("doc_id", "lang", "score").collect()}
    assert g == w and len(g) == 30


def test_one_partition_per_file(spark, tmp_path):
    path = _fixture(tmp_path, n_files=4)
    spark.dataSource.register(JsonlDataSource)
    df = spark.read.format("kstreams_jsonl").load(path)
    assert df.rdd.getNumPartitions() == 4


def test_user_schema_overrides_inference(spark, tmp_path):
    path = _fixture(tmp_path, n_files=1)
    spark.dataSource.register(JsonlDataSource)
    df = (
        spark.read.format("kstreams_jsonl")
        .schema("doc_id bigint, lang string")
        .load(path)
    )
    assert df.columns == ["doc_id", "lang"]  # score pruned by the schema
    assert df.count() == 10


def test_feeds_registered_operators(spark, tmp_path):
    """The point of the seam: a custom scan drops into the same
    DataFrame pipeline the engine's operators run on."""
    from pyspark.sql import functions as F

    path = _fixture(tmp_path)
    spark.dataSource.register(JsonlDataSource)
    df = spark.read.format("kstreams_jsonl").load(path)
    agg = (
        df.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
        .collect()
    )
    assert [(r.lang, r.n) for r in agg] == [("l0", 12), ("l1", 9), ("l2", 9)]


def test_writer_round_trip_and_overwrite(spark, tmp_path):
    """The writer half of the seam: two-phase commit (staged temp files
    → driver publish), overwrite semantics, and read-your-writes."""
    from pyspark.sql import functions as F

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "out_jsonl")
    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"),
    ).repartition(4)
    df.write.format("kstreams_jsonl").mode("overwrite").save(out)

    back = spark.read.format("kstreams_jsonl").load(out)
    assert back.rdd.getNumPartitions() == 4  # one part file per task
    assert {(r.doc_id, r.lang) for r in back.collect()} == {
        (r.doc_id, r.lang) for r in df.collect()
    }

    # overwrite replaces, never appends
    df.limit(5).repartition(1).write.format("kstreams_jsonl").mode(
        "overwrite"
    ).save(out)
    assert spark.read.format("kstreams_jsonl").load(out).count() == 5
    import glob as _glob

    assert not _glob.glob(f"{out}/_staged-*")  # nothing left staged


def test_writer_append_mode_accumulates(spark, tmp_path):
    """Append-mode commits must not collide on published names: each
    commit's files carry a per-commit token, so a second append never
    renames over the first commit's rows (ADVICE r7)."""
    from pyspark.sql import functions as F

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "out_jsonl")
    df = spark.range(10).select(F.col("id").alias("doc_id")).repartition(2)
    df.write.format("kstreams_jsonl").mode("append").save(out)
    df.selectExpr("doc_id + 100 AS doc_id").repartition(2).write.format(
        "kstreams_jsonl"
    ).mode("append").save(out)

    back = spark.read.format("kstreams_jsonl").load(out)
    assert back.count() == 20
    assert {r.doc_id for r in back.collect()} == set(range(10)) | {
        i + 100 for i in range(10)
    }


def test_writer_sweeps_stale_orphaned_staged_files(spark, tmp_path):
    """A staged file whose commit message never reached the driver (a
    failed/speculative task attempt) must not accumulate forever: the
    sweep removes this writer's own staging plus any FOREIGN staged file
    stale past the grace window (ADVICE r7 + r8)."""
    import glob as _glob
    import os
    import time

    from pyspark.sql import functions as F

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "out_jsonl")
    os.makedirs(out)
    orphan = os.path.join(out, "_staged-deadbeefdead-feed.jsonl")
    with open(orphan, "w", encoding="utf-8") as fh:
        fh.write('{"doc_id": 999}\n')
    stale = time.time() - 2 * 3600  # older than STALE_GRACE_S
    os.utime(orphan, (stale, stale))

    spark.range(5).select(F.col("id").alias("doc_id")).write.format(
        "kstreams_jsonl"
    ).mode("append").save(out)
    assert not _glob.glob(f"{out}/_staged-*")
    assert spark.read.format("kstreams_jsonl").load(out).count() == 5


def test_writer_sweep_spares_concurrent_staging(spark, tmp_path):
    """ADVICE r8: the sweep must NOT delete a concurrent append job's
    in-flight staged files — a recent foreign `_staged-<other-commit>-*`
    survives our commit (its own commit publishes it later)."""
    import glob as _glob
    import os

    from pyspark.sql import functions as F

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "out_jsonl")
    os.makedirs(out)
    inflight = os.path.join(out, "_staged-aaaabbbbcccc-0001.jsonl")
    with open(inflight, "w", encoding="utf-8") as fh:
        fh.write('{"doc_id": 123}\n')  # fresh mtime = a live writer

    spark.range(5).select(F.col("id").alias("doc_id")).write.format(
        "kstreams_jsonl"
    ).mode("append").save(out)
    assert _glob.glob(f"{out}/_staged-aaaabbbbcccc-*")  # survived
    # invisible to readers until its owner publishes it
    assert spark.read.format("kstreams_jsonl").load(out).count() == 5
