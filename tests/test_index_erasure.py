"""Index-side erasure (VERDICT r9 task 5 — the GDPR twin of
io.delete_where on the serving side): delete_postings_docs /
delete_ivf_sq8_vecs / delete_ivf_pq_vecs hide every trace immediately
(probes byte-equal an index built without the docs) and compaction
physically removes rows, tombstones, and manifest entries."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark import serving
from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import pq_codebooks, sq8_params
from kstreams_spark.serving import (
    compact_ivf_pq_index,
    compact_ivf_sq8_index,
    compact_postings_index,
    delete_ivf_pq_vecs,
    delete_ivf_sq8_vecs,
    delete_postings_docs,
    probe_ivf_pq_index,
    probe_ivf_sq8_index,
    probe_postings_index,
    upsert_ivf_sq8_delta,
    upsert_postings_delta,
    write_ivf_pq_index,
    write_ivf_sq8_index,
    write_postings_index,
    _postings_recover,
)

SF = "/root/testdata/sf0.001"
TERMS = ("spark", "window", "scan")
K = 10


def _lex(spark, path, max_epoch=None):
    return [
        (r.doc_id, r.score)
        for r in probe_postings_index(
            spark, path, TERMS, k=K, max_epoch=max_epoch
        ).collect()
    ]


def _sq8(spark, path, vec, cents, n_probe=3):
    return [
        (r.vec_id, r.score_q)
        for r in probe_ivf_sq8_index(
            spark, path, vec, cents, k=K, n_probe=n_probe
        ).collect()
    ]


def _pq(spark, path, vec, cents, n_probe=3):
    return [
        (r.vec_id, r.score_q)
        for r in probe_ivf_pq_index(
            spark, path, vec, cents, k=K, n_probe=n_probe
        ).collect()
    ]


class TestPostingsErasure:
    @pytest.fixture(scope="class")
    def idx(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("post_del")
        live_p, twin_p = str(root / "live"), str(root / "twin")
        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        base = docs.filter(F.col("doc_id") % 3 != 2)
        delta = docs.filter(F.col("doc_id") % 3 == 2)
        # delete a set guaranteed to hold SEARCH_TERMS hits: the top
        # lexical doc of the pre-delete index, plus spread-out ids
        doomed = docs.filter(F.col("doc_id").isin(0, 7, 50, 201)).select(
            "doc_id"
        )
        write_postings_index(base, live_p)
        upsert_postings_delta(delta, live_p, epoch=1)
        delete_postings_docs(doomed, live_p, epoch=2)
        # the erased-world twin: built fresh from the corpus minus the
        # deleted docs — the no-trace reference
        write_postings_index(
            docs.join(doomed, "doc_id", "left_anti"), twin_p
        )
        return live_p, twin_p, doomed, docs

    def test_deleted_docs_leave_no_probe_trace(self, spark, idx):
        live_p, twin_p, doomed, _ = idx
        got = _lex(spark, live_p)
        assert got == _lex(spark, twin_p)  # byte-equal incl. idf (n_docs)
        gone = {r.doc_id for r in doomed.collect()}
        assert not gone & {d for d, _ in got}

    def test_compaction_removes_rows_and_truncates_dels(self, spark, idx):
        live_p, twin_p, doomed, _ = idx
        want = _lex(spark, live_p)
        assert compact_postings_index(spark, live_p) > 0
        assert _lex(spark, live_p) == want
        raw = spark.read.parquet(live_p)
        gone = {r.doc_id for r in doomed.collect()}
        assert raw.filter(F.col("doc_id").isin(*gone)).count() == 0
        assert raw.filter(F.col("tok").isNull()).count() == 0
        assert spark.read.parquet(live_p + "_dels").count() == 0
        # manifest carries no trace either
        assert (
            spark.read.parquet(live_p + "_docs")
            .filter(F.col("doc_id").isin(*gone))
            .count()
            == 0
        )

    def test_mid_swap_reader_parity_with_deletes(self, spark, idx):
        """The displace-swap windows of a delete-then-compact sequence
        probe identically after _postings_recover (the compact_lake
        reader contract, now including the _dels sidecar)."""
        live_p, _, _, _ = idx
        want = _lex(spark, live_p)
        part = os.path.join(
            live_p, f"part=p{serving.tok_bucket_py(TERMS[0])}"
        )
        staged = part + ".new-del"
        spark.read.parquet(part).coalesce(1).write.parquet(staged)
        os.rename(part, part + ".old-del")
        _postings_recover(live_p)
        assert os.path.isdir(part) and not os.path.isdir(part + ".old-del")
        assert _lex(spark, live_p) == want

    def test_reingest_after_delete_resurrects(self, spark, idx):
        live_p, _, doomed, docs = idx
        revived = docs.join(doomed, "doc_id", "left_semi")
        upsert_postings_delta(revived, live_p, epoch=3)
        back = {d for d, _ in _lex(spark, live_p)}
        # doc 0 scores on 'spark' again (it is a fixture doc containing
        # search terms); at minimum the probe result changed and the
        # resurrected ids are eligible again
        n_docs = spark.read.parquet(live_p + "_meta").first().n_docs
        assert n_docs == docs.count()  # everyone live again
        assert back  # probe still serves


class TestIvfErasure:
    @pytest.fixture(scope="class")
    def idx(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("ivf_del")
        emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
        cents = [
            [float(x) for x in r.embedding]
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        vec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 3).first().embedding
        ]
        # doom the probe vector's own id plus neighbors that certainly
        # rank in its top list, so erasure visibly changes the answer
        doomed_ids = [3, 6, 9, 100]
        doomed = emb.filter(F.col("vec_id").isin(doomed_ids)).select("vec_id")
        kept = emb.filter(~F.col("vec_id").isin(doomed_ids))
        return root, emb, kept, doomed, cents, vec

    def test_sq8_erasure_no_trace_then_physical(self, spark, idx):
        root, emb, kept, doomed, cents, vec = idx
        live_p, twin_p = str(root / "sq8"), str(root / "sq8_twin")
        frozen = sq8_params(emb)
        write_ivf_sq8_index(emb, live_p, cents, params=frozen)
        before = _sq8(spark, live_p, vec, cents)
        delete_ivf_sq8_vecs(doomed, live_p, epoch=1)
        write_ivf_sq8_index(kept, twin_p, cents, params=frozen)
        got = _sq8(spark, live_p, vec, cents)
        assert got != before and got == _sq8(spark, twin_p, vec, cents)
        assert compact_ivf_sq8_index(spark, live_p) > 0
        assert _sq8(spark, live_p, vec, cents) == got
        raw = spark.read.parquet(live_p + "/cells")
        gone = [r.vec_id for r in doomed.collect()]
        assert raw.filter(F.col("vec_id").isin(gone)).count() == 0
        assert raw.filter(F.col("q").isNull()).count() == 0
        assert (
            spark.read.parquet(live_p + "/_vecs")
            .filter(F.col("vec_id").isin(gone))
            .count()
            == 0
        )

    def test_sq8_reingest_after_delete(self, spark, idx):
        """Resurrection: an upsert of an erased vector must not aim a
        tombstone at the deletion marker's cen_id=-1 (the prev-cell
        filter) and must serve the vector again."""
        root, emb, kept, doomed, cents, vec = idx
        live_p = str(root / "sq8")  # compacted by the previous test
        revived = emb.join(doomed, "vec_id", "left_semi")
        upsert_ivf_sq8_delta(revived, live_p, epoch=2)
        import glob

        assert not glob.glob(os.path.join(live_p, "cells", "cen_id=-1"))
        got = _sq8(spark, live_p, vec, cents)
        assert 3 in {v for v, _ in got}  # the probe vector's own id is back

    def test_pq_erasure_no_trace_then_physical(self, spark, idx):
        root, emb, kept, doomed, cents, vec = idx
        live_p, twin_p = str(root / "pq"), str(root / "pq_twin")
        cb = pq_codebooks(emb)
        write_ivf_pq_index(emb, live_p, cents, cb)
        delete_ivf_pq_vecs(doomed, live_p, epoch=1)
        write_ivf_pq_index(kept, twin_p, cents, cb)
        got = _pq(spark, live_p, vec, cents)
        assert got == _pq(spark, twin_p, vec, cents)
        assert compact_ivf_pq_index(spark, live_p) > 0
        assert _pq(spark, live_p, vec, cents) == got
        raw = spark.read.parquet(live_p + "/cells")
        gone = [r.vec_id for r in doomed.collect()]
        assert raw.filter(F.col("vec_id").isin(gone)).count() == 0
        assert raw.filter(F.col("codes").isNull()).count() == 0


class TestIndexStats:
    """The OBSERVE verb: stats reflect upsert/delete volume before
    compaction and read clean after it."""

    def test_postings_stats_lifecycle(self, spark, tmp_path):
        from kstreams_spark.serving import postings_index_stats

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        p = str(tmp_path / "idx")
        write_postings_index(docs.filter(F.col("doc_id") % 3 != 2), p)
        s0 = postings_index_stats(spark, p)
        assert s0["tombstone_rows"] == 0 and s0["pending_deletes"] == 0
        assert s0["foldable_rows"] == 0 and not s0["compact_recommended"]
        upsert_postings_delta(docs.filter(F.col("doc_id") % 3 == 2), p, 1)
        delete_postings_docs(
            docs.filter(F.col("doc_id").isin(0, 7)).select("doc_id"), p, 2
        )
        s1 = postings_index_stats(spark, p)
        assert s1["pending_deletes"] == 2 and s1["tombstone_rows"] > 0
        assert s1["foldable_rows"] > 0 and s1["max_epoch"] == 2
        assert s1["live_docs"] == docs.count() - 2
        assert s1["compact_recommended"]
        compact_postings_index(spark, p)
        s2 = postings_index_stats(spark, p)
        assert s2["tombstone_rows"] == 0 and s2["pending_deletes"] == 0
        assert s2["foldable_rows"] == 0 and not s2["compact_recommended"]
        assert s2["live_docs"] == s1["live_docs"]

    def test_quantized_stats_lifecycle(self, spark, tmp_path):
        from kstreams_spark.serving import quantized_index_stats

        emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
        cents = [
            [float(x) for x in r.embedding]
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        p = str(tmp_path / "sq8")
        write_ivf_sq8_index(emb, p, cents, params=sq8_params(emb))
        upsert_ivf_sq8_delta(emb.filter(F.col("vec_id") < 5), p, 1)
        delete_ivf_sq8_vecs(
            emb.filter(F.col("vec_id").isin(9, 10)).select("vec_id"), p, 2
        )
        s1 = quantized_index_stats(spark, p, "q")
        assert s1["pending_deletes"] == 2 and s1["tombstone_rows"] > 0
        assert s1["live_vecs"] == emb.count() - 2
        assert s1["compact_recommended"] and s1["max_epoch"] == 2
        compact_ivf_sq8_index(spark, p)
        s2 = quantized_index_stats(spark, p, "q")
        assert s2["tombstone_rows"] == 0 and s2["pending_deletes"] == 0
        assert not s2["compact_recommended"]
        assert s2["live_vecs"] == s1["live_vecs"]


def test_stats_count_replay_duplicates_as_foldable(spark, tmp_path):
    """A crash-replayed delta leaves duplicate rows on disk; the health
    card must report them foldable (compaction dropDuplicates and WOULD
    rewrite) — not hide them behind a duplicate-inflated kept count."""
    from kstreams_spark.serving import postings_index_stats

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    p = str(tmp_path / "idx")
    write_postings_index(docs.filter(F.col("doc_id") % 3 != 2), p)
    delta = docs.filter(F.col("doc_id") % 3 == 2)
    upsert_postings_delta(delta, p, epoch=1)
    upsert_postings_delta(delta, p, epoch=1)  # crash replay
    s = postings_index_stats(spark, p)
    assert s["foldable_rows"] > 0 and s["compact_recommended"]
    assert compact_postings_index(spark, p) > 0
    s2 = postings_index_stats(spark, p)
    assert s2["foldable_rows"] == 0 and not s2["compact_recommended"]
