"""Cross-index epoch atomicity (VERDICT r9 task 2): one commit marker
covers postings + IVF-SQ8 (+ IVF-PQ), and snapshot-capped probes make a
crash window all-or-nothing for a hybrid query.

The torn-read demonstration is explicit: after a simulated crash between
the postings apply and the vector apply, the UNCAPPED per-index probes
disagree about the corpus (red-before — what independent per-index
maintainers serve), while the maintainer's capped probes on BOTH legs
still byte-equal the pre-crash snapshot (green-after). A foreachBatch
replay then re-applies the same (delta, epoch) idempotently, commits the
single group marker, and both legs advance together."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import pq_codebooks, sq8_params
from kstreams_spark.serving import (
    probe_ivf_sq8_index,
    probe_postings_index,
    upsert_postings_delta,
)
from kstreams_spark.streaming.hybrid import HybridIngestMaintainer

SF = "/root/testdata/sf0.001"
TERMS = ("spark", "window", "scan")


def _corpus(spark):
    """(doc_id, text, embedding) rows: documents joined to embeddings on
    the shared id space. Base = id%3 != 2; the delta batch carries the
    %3==2 newcomers plus one REVISION of a base doc (new text with a
    distinctive extra term, negated embedding — both legs must move)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.join(emb, "doc_id")
    base = corpus.filter(F.col("doc_id") % 3 != 2)
    revised = base.filter(F.col("doc_id") == 0).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" spark spark spark")).alias("text"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    delta = corpus.filter(F.col("doc_id") % 3 == 2).unionByName(revised)
    return base, delta


def _lex_rows(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def _vec_rows(df):
    return [(r.vec_id, r.score_q) for r in df.collect()]


def _hy_rows(df):
    return [(r.doc_id, r.r_lex, r.r_vec, r.rrf_fx) for r in df.collect()]


@pytest.fixture(scope="module")
def group(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hybrid_grp") / "idx")
    base, delta = _corpus(spark)
    emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    m = HybridIngestMaintainer(root)
    m.bootstrap(
        base, cents, params=sq8_params(emb), codebooks=pq_codebooks(emb)
    )
    vec = [
        float(x)
        for x in load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()
        .embedding
    ]
    return m, base, delta, cents, vec


def test_crash_window_is_all_or_nothing(spark, group):
    m, base, delta, cents, vec = group
    assert m.visible_epoch() == 0

    pre_lex = _lex_rows(m.probe_lexical(spark, TERMS, k=10))
    pre_vec = _vec_rows(m.probe_vector(spark, vec, k=10, n_probe=3))
    pre_hy = _hy_rows(m.probe_hybrid(spark, TERMS, vec, k=10, n_probe=3))

    # --- simulated crash: postings applied at epoch 1, vector legs NOT,
    # no group marker (the exact window independent maintainers leave)
    upsert_postings_delta(
        delta.select("doc_id", "text"), m.postings_dir, epoch=1
    )

    # red-before: the UNCAPPED per-index views now disagree — the
    # lexical corpus moved (doc 0's revision adds 'spark' hits), the
    # vector corpus did not. This is the torn hybrid read.
    torn_lex = _lex_rows(
        probe_postings_index(spark, m.postings_dir, TERMS, k=10)
    )
    torn_vec = _vec_rows(
        probe_ivf_sq8_index(spark, m.sq8_dir, vec, cents, k=10, n_probe=3)
    )
    assert torn_lex != pre_lex  # lexical leg already serves epoch 1
    assert torn_vec == pre_vec  # vector leg still at epoch 0: TORN

    # green-after: the group's snapshot probes cap both legs at the
    # committed epoch — the uncommitted postings rows are invisible,
    # the hybrid view is the untouched epoch-0 state on BOTH legs
    assert m.visible_epoch() == 0
    assert _lex_rows(m.probe_lexical(spark, TERMS, k=10)) == pre_lex
    assert _vec_rows(m.probe_vector(spark, vec, k=10, n_probe=3)) == pre_vec
    assert (
        _hy_rows(m.probe_hybrid(spark, TERMS, vec, k=10, n_probe=3)) == pre_hy
    )

    # compaction must refuse while the uncommitted epoch is on disk —
    # folding it would publish the torn state
    with pytest.raises(ValueError, match="uncommitted epoch"):
        m.compact(spark)

    # --- recovery: the foreachBatch replay re-applies the SAME
    # (delta, epoch) to every index (idempotent per the upsert crash
    # contracts) and commits the ONE group marker
    m.process_batch(delta, 0)
    assert m.is_committed(0) and m.visible_epoch() == 1

    post_lex = _lex_rows(m.probe_lexical(spark, TERMS, k=10))
    post_vec = _vec_rows(m.probe_vector(spark, vec, k=10, n_probe=3))
    assert post_lex != pre_lex and post_vec != pre_vec  # both legs moved
    # the re-applied postings delta double-appended — the probe-side
    # dedupe makes the crash replay invisible: capped == a clean apply
    # of epoch 1 (the vector leg, applied exactly once, anchors this)
    hy = _hy_rows(m.probe_hybrid(spark, TERMS, vec, k=10, n_probe=3))
    assert hy and hy != pre_hy

    # committed replay of the same batch: zero writes anywhere
    files = sorted(
        glob.glob(os.path.join(m.index_dir, "**", "*"), recursive=True)
    )
    m.process_batch(delta, 0)
    assert (
        sorted(glob.glob(os.path.join(m.index_dir, "**", "*"), recursive=True))
        == files
    )

    # compaction now folds every leg and never changes an answer
    folded = m.compact(spark)
    assert folded["postings"] > 0 and folded["sq8"] >= 0
    assert _lex_rows(m.probe_lexical(spark, TERMS, k=10)) == post_lex
    assert _vec_rows(m.probe_vector(spark, vec, k=10, n_probe=3)) == post_vec
    assert _hy_rows(m.probe_hybrid(spark, TERMS, vec, k=10, n_probe=3)) == hy


def test_pq_leg_shares_the_snapshot(spark, group):
    """The optional PQ leg is capped by the same group marker: after the
    committed batch (previous test ran at module scope), a PQ probe at
    the group snapshot equals an uncapped probe (everything committed),
    and capping at epoch 0 reproduces the base corpus."""
    m, base, delta, cents, vec = group
    now = _vec_rows(m.probe_vector(spark, vec, k=10, n_probe=3, index="pq"))
    uncapped = _vec_rows(
        m.probe_vector(
            spark, vec, k=10, n_probe=3, index="pq", max_epoch=10**6
        )
    )
    assert now == uncapped
    base_view = _vec_rows(
        m.probe_vector(spark, vec, k=10, n_probe=3, index="pq", max_epoch=0)
    )
    assert base_view != now  # epoch 0 really is the pre-batch corpus
