"""The erase_document() orchestrator (r11 task 1) and the hybrid
maintainer's out-of-band erase — the epoch-offset commit protocol:

- erase() hides the doc from BOTH hybrid legs atomically (probes
  byte-equal an erased-world twin, including the postings idf);
- the offset file is the single commit point: a crash before it leaves
  every probe on the pre-erase snapshot (all legs), and the re-run
  completes the same epoch;
- a post-erase stream batch applies ABOVE the erase epoch, so CDC
  last-wins is preserved — re-ingesting the erased doc resurrects it;
- an orphan (uncommitted) stream batch makes erase() refuse loudly;
- the orchestrator spans lake + serving + attribution, ordered
  serving → attribution → lake, and is idempotent under re-run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark.erasure import erase_document
from kstreams_spark.io import load_table, write_curated_lake
from kstreams_spark.operators.quantize import sq8_params
from kstreams_spark.serving import (
    probe_ivf_sq8_index,
    probe_postings_index,
    write_postings_index,
)
from kstreams_spark.streaming.dedup import StreamingMinhashIndex
from kstreams_spark.streaming.hybrid import HybridIngestMaintainer
from kstreams_spark.streaming.substring import StreamingSubstringIndex

TERMS = ("spark", "window", "scan")


def _corpus(spark, sf_dir, hi=120):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    return docs.join(emb, "doc_id").filter(F.col("doc_id") < hi)


def _bootstrap(spark, sf_dir, root, hi=120):
    corpus = _corpus(spark, sf_dir, hi)
    emb = corpus.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    frozen = sq8_params(emb)
    m = HybridIngestMaintainer(root)
    m.bootstrap(corpus, cents, params=frozen)
    return m, corpus, cents, frozen


def _lex(m, spark, k=10):
    return [(r.doc_id, r.score) for r in m.probe_lexical(spark, TERMS, k=k).collect()]


def test_out_of_band_erase_atomic_and_crash_safe(
    spark, tmp_path, sf_dir, monkeypatch
):
    m, corpus, cents, frozen = _bootstrap(spark, sf_dir, str(tmp_path / "idx"))
    doomed = 7
    vec = [
        float(x)
        for x in corpus.filter(F.col("doc_id") == doomed).first().embedding
    ]
    before_lex = _lex(m, spark)
    before_vec = [
        (r.vec_id, r.score_q)
        for r in m.probe_vector(spark, vec, k=10, n_probe=3).collect()
    ]
    assert doomed in {d for d, _ in before_vec}

    # crash injection: the sq8 delete dies on the first attempt — the
    # postings delete already landed, but the offset never committed
    import kstreams_spark.streaming.hybrid as hybrid_mod

    real = hybrid_mod.delete_ivf_sq8_vecs
    calls = {"n": 0}

    def dying(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash mid-erase")
        return real(*a, **k)

    monkeypatch.setattr(hybrid_mod, "delete_ivf_sq8_vecs", dying)
    ids = spark.createDataFrame([(doomed,)], "doc_id bigint")
    with pytest.raises(RuntimeError, match="injected"):
        m.erase(ids)
    # pre-commit: EVERY leg still serves the pre-erase snapshot
    assert _lex(m, spark) == before_lex
    assert [
        (r.vec_id, r.score_q)
        for r in m.probe_vector(spark, vec, k=10, n_probe=3).collect()
    ] == before_vec

    # re-run: the heal step completes the LOGGED erase at its claimed
    # epoch, then the request itself commits at the next one
    epoch = m.erase(ids)
    assert m.visible_epoch() == epoch

    # erased-world twin: fresh postings index without the doc — probes
    # byte-equal including idf (n_docs shrank)
    final = corpus.filter(F.col("doc_id") != doomed)
    twin_post = str(tmp_path / "twin_post")
    write_postings_index(final.select("doc_id", "text"), twin_post)
    assert _lex(m, spark) == [
        (r.doc_id, r.score)
        for r in probe_postings_index(spark, twin_post, TERMS, k=10).collect()
    ]
    served_vec = {
        r.vec_id for r in m.probe_vector(spark, vec, k=10, n_probe=3).collect()
    }
    assert doomed not in served_vec
    hy = {
        r.doc_id
        for r in m.probe_hybrid(spark, TERMS, vec, k=30, pool=30, n_probe=3).collect()
    }
    assert doomed not in hy


def test_post_erase_stream_batch_lands_above_and_resurrects(
    spark, tmp_path, sf_dir
):
    m, corpus, cents, frozen = _bootstrap(spark, sf_dir, str(tmp_path / "idx"))
    doomed = 7
    ids = spark.createDataFrame([(doomed,)], "doc_id bigint")
    epoch = m.erase(ids)
    assert m.visible_epoch() == epoch
    # normal CDC feed re-ingests the doc — the offset shifts this stream
    # batch's data epoch past the erase, so last-wins resurrects it
    batch = corpus.filter(F.col("doc_id") == doomed).select(
        "doc_id", "text", "embedding"
    )
    m.process_batch(batch, 0)
    assert m.visible_epoch() == epoch + 1
    vec = [float(x) for x in batch.first().embedding]
    assert doomed in {
        r.vec_id for r in m.probe_vector(spark, vec, k=5, n_probe=3).collect()
    }
    term = [
        t for t in TERMS
        if t in corpus.filter(F.col("doc_id") == doomed).first().text.lower()
    ] or [TERMS[0]]
    # lexical leg sees it again too (when its text carries a probe term)
    lex_ids = {
        r.doc_id
        for r in m.probe_lexical(spark, tuple(term), k=120).collect()
    }
    got_term = term[0] in corpus.filter(
        F.col("doc_id") == doomed
    ).first().text.lower()
    if got_term:
        assert doomed in lex_ids


def test_erase_refuses_on_orphan_stream_batch(spark, tmp_path, sf_dir):
    m, corpus, cents, frozen = _bootstrap(spark, sf_dir, str(tmp_path / "idx"))
    # simulate a crashed stream batch: rows applied, marker never made
    m._apply(corpus.filter(F.col("doc_id") < 3).select("doc_id", "text", "embedding"), 1)
    ids = spark.createDataFrame([(5,)], "doc_id bigint")
    with pytest.raises(ValueError, match="uncommitted stream epoch"):
        m.erase(ids)


def test_erase_document_orchestrator_end_to_end(spark, tmp_path, sf_dir):
    doomed = 7
    # lake leg: curated layout partitioned by (split, lang)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lake = str(tmp_path / "lake")
    write_curated_lake(
        docs.withColumn(
            "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
        ).withColumn("lang", F.lit("en")),
        lake,
    )
    # serving leg
    m, corpus, cents, frozen = _bootstrap(spark, sf_dir, str(tmp_path / "idx"))
    # attribution legs
    mh = StreamingMinhashIndex(
        str(tmp_path / "mh_idx"), str(tmp_path / "mh_pairs"), threshold=0.5
    )
    mh.process_batch(docs, 0)
    ss = StreamingSubstringIndex(str(tmp_path / "ss_idx"), str(tmp_path / "ss_fl"))
    ss.process_batch(docs.filter(F.col("doc_id") < 150), 0)

    report = erase_document(
        spark,
        [doomed],
        hybrid=m,
        attribution=[mh, ss],
        lake_path=lake,
    )
    assert report["attribution"] == 2
    assert report["lake_rows_deleted"] == 1
    assert report["serving_epoch"] == m.visible_epoch()

    # every surface forgot the doc
    assert spark.read.parquet(lake).filter(F.col("doc_id") == doomed).count() == 0
    assert (
        mh._index_sink.result(spark).filter(F.col("doc_id") == doomed).count()
        == 0
    )
    assert (
        ss.index_sink.result(spark).filter(F.col("doc_id") == doomed).count()
        == 0
    )
    vec = [
        float(x)
        for x in corpus.filter(F.col("doc_id") == doomed).first().embedding
    ]
    assert doomed not in {
        r.vec_id for r in m.probe_vector(spark, vec, k=10, n_probe=3).collect()
    }
    assert doomed not in {d for d, _ in _lex(m, spark, k=120)}

    # idempotent: a re-run with the same ids succeeds and changes nothing
    report2 = erase_document(
        spark, [doomed], hybrid=m, attribution=[mh, ss], lake_path=lake
    )
    assert report2["lake_rows_deleted"] == 0
    assert spark.read.parquet(lake).filter(F.col("doc_id") == doomed).count() == 0


def test_crashed_erase_heals_with_logged_ids_not_new_request(
    spark, tmp_path, sf_dir, monkeypatch
):
    """The id-mismatch hazard: erase([A]) crashes between the postings
    and vector deletes; a LATER erase([B]) must not adopt A's epoch and
    publish A's torn (postings-only) state — it must first complete A's
    logged erasure on every leg, then erase B at the next epoch."""
    m, corpus, cents, frozen = _bootstrap(spark, sf_dir, str(tmp_path / "idx"))
    a_id, b_id = 7, 11
    vec = {
        d: [
            float(x)
            for x in corpus.filter(F.col("doc_id") == d).first().embedding
        ]
        for d in (a_id, b_id)
    }
    import kstreams_spark.streaming.hybrid as hybrid_mod

    real = hybrid_mod.delete_ivf_sq8_vecs
    monkeypatch.setattr(
        hybrid_mod,
        "delete_ivf_sq8_vecs",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash A")),
    )
    with pytest.raises(RuntimeError, match="crash A"):
        m.erase(spark.createDataFrame([(a_id,)], "doc_id bigint"))
    monkeypatch.setattr(hybrid_mod, "delete_ivf_sq8_vecs", real)

    # the second request (different ids) heals A first, then erases B
    e = m.erase(spark.createDataFrame([(b_id,)], "doc_id bigint"))
    assert m.visible_epoch() == e
    for d in (a_id, b_id):
        assert d not in {
            r.vec_id
            for r in m.probe_vector(spark, vec[d], k=10, n_probe=3).collect()
        }, f"doc {d} still on the vector leg"
        assert d not in {d2 for d2, _ in _lex(m, spark, k=120)}, (
            f"doc {d} still on the lexical leg"
        )


def test_sink_without_erase_cols_fails_loudly_on_existing_sidecar(
    spark, tmp_path
):
    """A _dels sidecar written by an erasure-enabled constructor must
    never be silently ignored by a sink built without erase_cols —
    result() would serve erased rows and compact() would fold them back
    in as live while discarding the pending erasure."""
    from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink

    out = str(tmp_path / "sink")
    good = ExactlyOnceParquetSink(out, erase_cols=("doc_id",))
    good.process_batch(
        spark.createDataFrame([(1,), (2,)], "doc_id bigint"), 0
    )
    good.delete_ids(spark, [1])
    assert [r.doc_id for r in good.result(spark).collect()] == [2]
    bad = ExactlyOnceParquetSink(out)  # the pre-r11 one-arg form
    with pytest.raises(ValueError, match="erase_cols"):
        bad.result(spark)
    with pytest.raises(ValueError, match="erase_cols"):
        bad.compact(spark)
