"""Incremental postings-index maintenance (VERDICT r8 task 3): the
bit-twin contract — an index maintained by upsert_postings_delta probes
byte-equal to one rebuilt from scratch on the current corpus, before,
during (mid-swap windows), and after compact_postings_index; a replayed
(crash-rerun) delta changes nothing."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark import serving
from kstreams_spark.io import load_table
from kstreams_spark.serving import (
    compact_postings_index,
    probe_postings_index,
    upsert_postings_delta,
    write_postings_index,
    _postings_recover,
)

SF = "/root/testdata/sf0.001"
TERMS = ("the", "data", "model")
K = 15


def _probe_rows(spark, path):
    return [
        (r.doc_id, r.score, r.n_terms_hit)
        for r in probe_postings_index(spark, path, TERMS, k=K).collect()
    ]


def _corpus(spark):
    """Base = docs with doc_id%5 != 4; delta = the %5==4 newcomers PLUS
    re-ingested revisions of the %7==0 docs (text changed, so some old
    tokens vanish — the stale-posting case the tombstones exist for)."""
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 5 != 4)
    delta = d.filter(F.col("doc_id") % 5 == 4).unionByName(
        d.filter((F.col("doc_id") % 5 != 4) & (F.col("doc_id") % 7 == 0))
        .select("doc_id", F.concat(F.lit("revised copy "), "text").alias("text"))
    )
    current = d.filter((F.col("doc_id") % 5 == 4) | (F.col("doc_id") % 7 != 0)).unionByName(
        d.filter((F.col("doc_id") % 5 != 4) & (F.col("doc_id") % 7 == 0))
        .select("doc_id", F.concat(F.lit("revised copy "), "text").alias("text"))
    )
    return base, delta, current


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("postings_inc")
    inc, rebuilt = str(root / "inc"), str(root / "rebuilt")
    base, delta, current = _corpus(spark)
    write_postings_index(base, inc)
    upsert_postings_delta(delta, inc, epoch=1)
    write_postings_index(current, rebuilt)
    return inc, rebuilt


def test_upserted_probes_equal_rebuilt(spark, idx):
    inc, rebuilt = idx
    assert _probe_rows(spark, inc) == _probe_rows(spark, rebuilt)
    n = lambda p: spark.read.parquet(p + "_meta").first().n_docs  # noqa: E731
    assert n(inc) == n(rebuilt)


def test_replayed_delta_is_invisible(spark, idx, tmp_path):
    """Crash contract: re-running the SAME (delta, epoch) to completion
    must not change any probe answer (duplicates dedupe everywhere)."""
    inc, rebuilt = idx
    _, delta, _ = _corpus(spark)
    before = _probe_rows(spark, inc)
    upsert_postings_delta(delta, inc, epoch=1)
    assert _probe_rows(spark, inc) == before == _probe_rows(spark, rebuilt)


def test_compaction_restores_fresh_build_form_and_answers(spark, idx):
    inc, rebuilt = idx
    before = _probe_rows(spark, inc)
    n = compact_postings_index(spark, inc)
    assert n > 0
    assert _probe_rows(spark, inc) == before == _probe_rows(spark, rebuilt)
    # physical form: no tombstones, one epoch per doc, one file per bucket
    raw = spark.read.parquet(inc)
    assert raw.filter(F.col("tok").isNull()).count() == 0
    multi = (
        raw.groupBy("doc_id")
        .agg(F.count_distinct("epoch").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi == 0
    for sub in glob.glob(os.path.join(inc, "part=*")):
        assert len(glob.glob(os.path.join(sub, "*.parquet"))) == 1, sub
    # idempotent: a second compaction rewrites nothing
    assert compact_postings_index(spark, inc) == 0
    assert _probe_rows(spark, inc) == before


def test_mid_swap_reader_parity(spark, tmp_path):
    """At every crash/interleave window of the compaction displace-swap
    a reader that first runs _postings_recover probes the SAME answers
    (the compact_lake reader contract, on the index)."""
    inc = str(tmp_path / "inc")
    base, delta, _ = _corpus(spark)
    write_postings_index(base, inc)
    upsert_postings_delta(delta, inc, epoch=1)
    want = _probe_rows(spark, inc)
    part = os.path.join(inc, f"part=p{serving.tok_bucket_py(TERMS[0])}")

    # window A: staged compacted copy exists, swap not begun — recover
    # drops the uncommitted stage, answers unchanged
    staged = part + ".new-del"
    spark.read.parquet(part).coalesce(1).write.parquet(staged)
    _postings_recover(inc)
    assert not os.path.isdir(staged)
    assert _probe_rows(spark, inc) == want

    # window B: live bucket displaced, new copy not yet moved in —
    # recover restores the displaced original
    spark.read.parquet(part).coalesce(1).write.parquet(staged)
    os.rename(part, part + ".old-del")
    _postings_recover(inc)
    assert os.path.isdir(part) and not os.path.isdir(part + ".old-del")
    assert _probe_rows(spark, inc) == want

    # window C: a genuine half-done compaction — some buckets swapped,
    # others still carrying tombstones — must probe identically with no
    # recovery at all (uncompacted dirs resolve themselves)
    live = (
        spark.read.parquet(inc + "_docs")
        .groupBy("doc_id")
        .agg(F.max("epoch").alias("_live_e"))
    )
    resolved = (
        spark.read.parquet(part)
        .dropDuplicates(["tok", "doc_id", "epoch"])
        .join(live, "doc_id")
        .filter((F.col("epoch") == F.col("_live_e")) & F.col("tok").isNotNull())
        .select("tok", "doc_id", "tf", "epoch")
    )
    resolved.coalesce(1).write.parquet(staged)
    os.rename(part, part + ".old-del")
    os.rename(staged, part)
    import shutil

    shutil.rmtree(part + ".old-del")
    assert _probe_rows(spark, inc) == want
