"""Erasure through the atomic multi-index ingest (r10 — the tasks 2+5
capstone): delete ops ride the same single group marker as upserts, so
a GDPR request is all-or-nothing to a hybrid reader.

The strongest assertion is the erased-world twin: after a mixed
upsert+delete CDC batch, every leg of the maintained group probes
byte-equal to indexes built FRESH from the final corpus with the same
frozen quantizer params — including the postings idf (n_docs shrinks).
The torn-delete crash test mirrors test_hybrid_ingest's: a crash
between the postings delete and the vector deletes must be invisible to
capped probes, compaction must refuse (the delete-only epoch is tracked
through the _dels sidecar), and the foreachBatch replay heals it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import sq8_params
from kstreams_spark.serving import (
    delete_postings_docs,
    probe_ivf_sq8_index,
    probe_postings_index,
    write_ivf_sq8_index,
    write_postings_index,
)
from kstreams_spark.streaming.hybrid import HybridIngestMaintainer

SF = "/root/testdata/sf0.001"
TERMS = ("spark", "window", "scan")
DOOMED = [0, 7, 30]  # ingested at epoch 0, erased by the CDC batch
NEW = 2  # doc_id % 3 == 2 newcomers upserted by the CDC batch
FLIP_DEL, FLIP_UP = 4, 10  # same-key conflict pairs resolved by seq


def _corpus(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    return docs.join(emb, "doc_id")


def _cdc_batch(corpus):
    """upserts of the %3==2 newcomers, deletes of DOOMED, plus two
    same-key conflicts: FLIP_DEL is upserted(seq 1) then deleted(seq 2)
    → must end gone; FLIP_UP is deleted(seq 1) then upserted(seq 2)
    with revised text → must end present, revised."""
    ups = corpus.filter(F.col("doc_id") % 3 == NEW).select(
        "doc_id", "text", "embedding", F.lit("upsert").alias("op"),
        F.lit(1).alias("seq"),
    )
    dels = corpus.filter(F.col("doc_id").isin(DOOMED)).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("array<double>").alias("embedding"),
        F.lit("delete").alias("op"),
        F.lit(1).alias("seq"),
    )
    flip_del = corpus.filter(F.col("doc_id") == FLIP_DEL).select(
        "doc_id", "text", "embedding", F.lit("upsert").alias("op"),
        F.lit(1).alias("seq"),
    ).unionByName(
        corpus.filter(F.col("doc_id") == FLIP_DEL).select(
            "doc_id",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("array<double>").alias("embedding"),
            F.lit("delete").alias("op"),
            F.lit(2).alias("seq"),
        )
    )
    flip_up = corpus.filter(F.col("doc_id") == FLIP_UP).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("array<double>").alias("embedding"),
        F.lit("delete").alias("op"),
        F.lit(1).alias("seq"),
    ).unionByName(
        corpus.filter(F.col("doc_id") == FLIP_UP).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" spark zzerasure zzerasure")).alias("text"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
            F.lit("upsert").alias("op"),
            F.lit(2).alias("seq"),
        )
    )
    return ups.unionByName(dels).unionByName(flip_del).unionByName(flip_up)


def _final_corpus(corpus):
    """What the maintained group must be equivalent to after the batch."""
    revised = corpus.filter(F.col("doc_id") == FLIP_UP).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" spark zzerasure zzerasure")).alias("text"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    return (
        corpus.filter(
            ~F.col("doc_id").isin(DOOMED + [FLIP_DEL, FLIP_UP])
        )
        .select("doc_id", "text", "embedding")
        .unionByName(revised)
    )


def _lex(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def _vec(df):
    return [(r.vec_id, r.score_q) for r in df.collect()]


@pytest.fixture(scope="module")
def group(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hybrid_del")
    corpus = _corpus(spark)
    base = corpus.filter(
        (F.col("doc_id") % 3 != NEW) | F.col("doc_id").isin(FLIP_DEL, FLIP_UP)
    )
    emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    frozen = sq8_params(emb)
    m = HybridIngestMaintainer(str(root / "idx"))
    m.bootstrap(base, cents, params=frozen)
    m.process_batch(_cdc_batch(corpus), 0)
    assert m.is_committed(0) and m.visible_epoch() == 1
    # the erased-world twin: built fresh from the final corpus with the
    # SAME frozen centroids/params
    final = _final_corpus(corpus)
    twin_post = str(root / "twin_post")
    twin_sq8 = str(root / "twin_sq8")
    write_postings_index(final.select("doc_id", "text"), twin_post)
    write_ivf_sq8_index(
        final.select(F.col("doc_id").alias("vec_id"), "embedding"),
        twin_sq8,
        cents,
        params=frozen,
    )
    vec = [
        float(x)
        for x in corpus.filter(F.col("doc_id") == 0).first().embedding
    ]
    return m, corpus, cents, vec, twin_post, twin_sq8


def test_cdc_batch_probes_equal_erased_world_twin(spark, group):
    m, corpus, cents, vec, twin_post, twin_sq8 = group
    got_lex = _lex(m.probe_lexical(spark, TERMS, k=10))
    want_lex = _lex(probe_postings_index(spark, twin_post, TERMS, k=10))
    assert got_lex == want_lex  # byte-equal incl. idf (n_docs shrank)
    got_vec = _vec(m.probe_vector(spark, vec, k=10, n_probe=3))
    want_vec = _vec(
        probe_ivf_sq8_index(spark, twin_sq8, vec, cents, k=10, n_probe=3)
    )
    assert got_vec == want_vec
    served = {d for d, _ in got_lex} | {v for v, _ in got_vec}
    assert not served & set(DOOMED + [FLIP_DEL])
    hy = m.probe_hybrid(spark, TERMS, vec, k=30, pool=30, n_probe=3)
    hy_ids = {r.doc_id for r in hy.collect()}
    assert not hy_ids & set(DOOMED + [FLIP_DEL])


def test_seq_conflicts_resolved_last_wins(spark, group):
    m, corpus, cents, vec, *_ = group
    # FLIP_UP's revision must be live on the lexical leg: the revision
    # plants a corpus-unique term, so it is the only possible hit
    got = _lex(m.probe_lexical(spark, ("zzerasure",), k=5))
    assert {d for d, _ in got} == {FLIP_UP}
    # and its negated vector must be live on the vector leg: probing
    # with the negation ranks it among the top hits
    flip_vec = [
        -float(x)
        for x in corpus.filter(F.col("doc_id") == FLIP_UP).first().embedding
    ]
    top = _vec(m.probe_vector(spark, flip_vec, k=3, n_probe=3))
    assert FLIP_UP in {v for v, _ in top}


def test_unknown_op_rejected(spark, group):
    m, corpus, *_ = group
    bad = corpus.limit(1).select(
        "doc_id", "text", "embedding", F.lit("patch").alias("op")
    )
    with pytest.raises(ValueError, match="unknown CDC op"):
        m._apply(bad, epoch=99)


def test_torn_delete_crash_is_all_or_nothing(spark, tmp_path):
    """Crash between the postings delete and the vector deletes: capped
    probes keep serving the pre-crash snapshot on BOTH legs, compaction
    refuses (delete-only epochs are tracked via the _dels sidecar), and
    the replay heals every index under one marker."""
    corpus = _corpus(spark).filter(F.col("doc_id") < 120)
    emb = corpus.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    m = HybridIngestMaintainer(str(tmp_path / "idx"))
    m.bootstrap(corpus, cents, params=sq8_params(emb))
    vec = [
        float(x)
        for x in corpus.filter(F.col("doc_id") == 0).first().embedding
    ]
    pre_lex = _lex(m.probe_lexical(spark, TERMS, k=10))
    pre_vec = _vec(m.probe_vector(spark, vec, k=10, n_probe=3))

    doomed = corpus.filter(F.col("doc_id").isin(0, 7)).select("doc_id")
    # simulated crash: postings erased at epoch 1, vector legs NOT,
    # no group marker
    delete_postings_docs(doomed, m.postings_dir, epoch=1)
    torn = _lex(probe_postings_index(spark, m.postings_dir, TERMS, k=10))
    assert torn != pre_lex  # uncapped lexical leg already dropped them
    assert m.visible_epoch() == 0
    assert _lex(m.probe_lexical(spark, TERMS, k=10)) == pre_lex
    assert _vec(m.probe_vector(spark, vec, k=10, n_probe=3)) == pre_vec
    with pytest.raises(ValueError, match="uncommitted epoch"):
        m.compact(spark)

    # recovery: replay the SAME delete batch through the maintainer
    batch = corpus.filter(F.col("doc_id").isin(0, 7)).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("array<double>").alias("embedding"),
        F.lit("delete").alias("op"),
    )
    m.process_batch(batch, 0)
    assert m.is_committed(0) and m.visible_epoch() == 1
    post_lex = _lex(m.probe_lexical(spark, TERMS, k=10))
    post_vec = _vec(m.probe_vector(spark, vec, k=10, n_probe=3))
    assert not {0, 7} & ({d for d, _ in post_lex} | {v for v, _ in post_vec})
    folded = m.compact(spark)
    assert folded["postings"] > 0
    assert _lex(m.probe_lexical(spark, TERMS, k=10)) == post_lex
    assert _vec(m.probe_vector(spark, vec, k=10, n_probe=3)) == post_vec


def test_no_seq_duplicate_keys_rejected(spark, group):
    """Without seq, a same-key upsert+delete in one batch must fail
    loudly — applied at one epoch it would corrupt the index (probe vs
    compaction disagree about the doc)."""
    m, corpus, *_ = group
    row = corpus.filter(F.col("doc_id") == 1)
    bad = row.select(
        "doc_id", "text", "embedding", F.lit("upsert").alias("op")
    ).unionByName(
        row.select(
            "doc_id",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("array<double>").alias("embedding"),
            F.lit("delete").alias("op"),
        )
    )
    with pytest.raises(ValueError, match="multiple rows for doc_id"):
        m._apply(bad, epoch=99)


def test_unknown_op_rejected_even_when_losing_seq_conflict(spark, group):
    """Op validation runs BEFORE last-wins resolution: a malformed op
    that a higher seq would discard is still a loud error."""
    m, corpus, *_ = group
    row = corpus.filter(F.col("doc_id") == 1)
    bad = row.select(
        "doc_id", "text", "embedding", F.lit("update").alias("op"),
        F.lit(1).alias("seq"),
    ).unionByName(
        row.select(
            "doc_id", "text", "embedding", F.lit("upsert").alias("op"),
            F.lit(2).alias("seq"),
        )
    )
    with pytest.raises(ValueError, match="unknown CDC op"):
        m._apply(bad, epoch=99)
