"""StreamingPostingsMaintainer: stream/batch probe parity (an index
maintained batch-by-batch serves the SAME top-k, byte-equal integer
scores, as one built in a single shot on the final corpus), replay
no-op, crash-window re-run invisibility, and compaction neutrality
(VERDICT r8 task 6)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.serving import write_postings_index
from kstreams_spark.streaming.postings import StreamingPostingsMaintainer

SF = "/root/testdata/sf0.001"
TERMS = ("the", "data", "model")
K = 15


def _rows(df):
    return [(r.doc_id, r.score, r.n_terms_hit) for r in df.collect()]


def _batches(spark):
    """Base corpus + two stream batches; batch 1 re-ingests revisions of
    some base docs, so the stream path exercises supersession too."""
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 3 == 0)
    b0 = d.filter(F.col("doc_id") % 3 == 1)
    b1 = d.filter(F.col("doc_id") % 3 == 2).unionByName(
        base.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id", F.concat(F.lit("revised stream copy "), "text").alias("text")
        )
    )
    current = (
        d.filter(~((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 5 == 0)))
        .unionByName(
            base.filter(F.col("doc_id") % 5 == 0).select(
                "doc_id",
                F.concat(F.lit("revised stream copy "), "text").alias("text"),
            )
        )
    )
    return base, b0, b1, current


@pytest.fixture(scope="module")
def maintained(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_postings")
    inc, rebuilt = str(root / "inc"), str(root / "rebuilt")
    base, b0, b1, current = _batches(spark)
    m = StreamingPostingsMaintainer(inc)
    m.bootstrap(base)
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    write_postings_index(current, rebuilt)
    return m, rebuilt


def test_stream_probe_equals_batch_built(spark, maintained):
    m, rebuilt = maintained
    from kstreams_spark.serving import probe_postings_index

    assert _rows(m.probe(spark, TERMS, k=K)) == _rows(
        probe_postings_index(spark, rebuilt, TERMS, k=K)
    )


def test_replay_of_committed_epoch_is_noop(spark, maintained):
    m, _ = maintained
    _, b0, _, _ = _batches(spark)
    files_before = sorted(glob.glob(os.path.join(m.index_dir, "**", "*"),
                                    recursive=True))
    want = _rows(m.probe(spark, TERMS, k=K))
    m.process_batch(b0, 0)  # replay: marker short-circuits, zero writes
    files_after = sorted(glob.glob(os.path.join(m.index_dir, "**", "*"),
                                   recursive=True))
    assert files_after == files_before
    assert _rows(m.probe(spark, TERMS, k=K)) == want


def test_crash_window_rerun_is_invisible_and_compaction_neutral(
    spark, maintained
):
    """Crash between the delta append and the marker commit: the marker
    is missing, so the replay re-runs the SAME (delta, epoch) — probes
    must not change (duplicates resolve away), and compaction restores
    the clean physical form with the same answers."""
    m, rebuilt = maintained
    _, _, b1, _ = _batches(spark)
    want = _rows(m.probe(spark, TERMS, k=K))
    shutil.rmtree(m._marker(1))  # simulate crash before the commit point
    assert not m.is_committed(1)
    m.process_batch(b1, 1)  # re-appends the same epoch-2 delta
    assert m.is_committed(1)
    assert _rows(m.probe(spark, TERMS, k=K)) == want

    assert m.compact(spark) > 0
    assert _rows(m.probe(spark, TERMS, k=K)) == want
    raw = spark.read.parquet(m.index_dir)
    assert raw.filter(F.col("tok").isNull()).count() == 0
    # markers survive compaction: pre-compaction epochs stay no-ops
    assert m.is_committed(0) and m.is_committed(1)
    m.process_batch(b1, 1)
    assert _rows(m.probe(spark, TERMS, k=K)) == want


def test_empty_batch_commits_marker_only(spark, tmp_path):
    m = StreamingPostingsMaintainer(str(tmp_path / "idx"))
    base, _, _, _ = _batches(spark)
    m.bootstrap(base)
    empty = base.filter(F.lit(False))
    m.process_batch(empty, 0)
    assert m.is_committed(0)
