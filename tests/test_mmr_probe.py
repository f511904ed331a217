"""Serving-side MMR (r11 task 4): probe_vector_mmr re-ranks the IVF
probe's candidate pool through operators/similarity.mmr_select_pool —
the SAME pool→selection stage the batch similarity_mmr_rerank runs, so
the two paths cannot disagree. Pinned here: byte-equal selections on
the same pool (probe output ≡ mmr_select_pool fed the probe's own
pool), end-to-end diversity (a planted exact clone pair never co-occurs
in the MMR top-k while the raw probe serves both), determinism, and
the snapshot contract (an erased doc never enters the pool)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import sq8_params
from kstreams_spark.operators.similarity import (
    _cosine,
    _fx_dot,
    _fx_norm2,
    mmr_select_pool,
)
from kstreams_spark.streaming.hybrid import HybridIngestMaintainer

CLONE_OF, CLONE_ID = 7, 100_007


def _corpus(spark, sf_dir, hi=120):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    base = docs.join(emb, "doc_id").filter(F.col("doc_id") < hi)
    clone = base.filter(F.col("doc_id") == CLONE_OF).select(
        F.lit(CLONE_ID).cast("long").alias("doc_id"), "text", "embedding"
    )
    return base.unionByName(clone)


def _build(spark, sf_dir, root):
    corpus = _corpus(spark, sf_dir)
    emb = corpus.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    m = HybridIngestMaintainer(root)
    m.bootstrap(corpus, cents, params=sq8_params(emb))
    return m, emb


def test_probe_mmr_byte_equal_shared_stage_and_diverse(spark, tmp_path, sf_dir):
    m, emb = _build(spark, sf_dir, str(tmp_path / "idx"))
    vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == CLONE_OF).first().embedding
    ]
    raw = m.probe_vector(spark, vec, k=16, n_probe=3)
    raw_ids = [r.vec_id for r in raw.collect()]
    assert CLONE_OF in raw_ids and CLONE_ID in raw_ids, (
        "the raw probe must serve BOTH clones — that is the problem MMR fixes"
    )

    got = m.probe_vector_mmr(
        spark, vec, emb, k=4, pool=16, n_probe=3
    ).collect()
    assert [r.mmr_rank for r in got] == [1, 2, 3, 4]

    # byte-equal on the same pool: feed the probe's own candidate pool
    # (index recall + exact-cosine rel, the probe's documented scoring
    # split) to the shared stage directly — identical rows prove the
    # probe path adds nothing beyond pool construction
    q_emb = F.array(*[F.lit(float(x)) for x in vec])
    pool = raw.select("vec_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select(
        F.lit(0).cast("long").alias("qid"),
        F.col("vec_id").alias("cid"),
        _cosine(
            _fx_dot(F.col("embedding"), q_emb),
            _fx_norm2(q_emb),
            _fx_norm2("embedding"),
        ).alias("rel"),
        F.col("embedding").alias("c_emb"),
        _fx_norm2("embedding").alias("nc2"),
    )
    want = mmr_select_pool(spark, pool, 4).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # diversity: an exact clone pair (pairwise cosine 1.0) never
    # co-occurs in the MMR top-k
    sel = {r.cid for r in got}
    assert not {CLONE_OF, CLONE_ID}.issubset(sel), got
    assert sel & {CLONE_OF, CLONE_ID}, "the relevant hit itself must survive"

    # deterministic under repeat
    again = m.probe_vector_mmr(spark, vec, emb, k=4, pool=16, n_probe=3).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_probe_mmr_respects_erasure_snapshot(spark, tmp_path, sf_dir):
    m, emb = _build(spark, sf_dir, str(tmp_path / "idx"))
    vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == CLONE_OF).first().embedding
    ]
    ids = spark.createDataFrame([(CLONE_ID,)], "doc_id bigint")
    m.erase(ids)
    got = {
        r.cid
        for r in m.probe_vector_mmr(spark, vec, emb, k=4, pool=16, n_probe=3).collect()
    }
    assert CLONE_ID not in got
    assert CLONE_OF in got  # the original stays served


def test_probe_mmr_degenerate_vectors_never_typeerror(spark, tmp_path, sf_dir):
    """Zero-norm vectors have no cosine: a degenerate CANDIDATE in the
    pool is dropped (not crashed on), and a degenerate QUERY yields an
    empty selection instead of a TypeError inside the driver greedy."""
    m, emb = _build(spark, sf_dir, str(tmp_path / "idx"))
    dim = len(emb.first().embedding)
    # degenerate query: every rel is NULL -> empty selection, no crash
    got = m.probe_vector_mmr(spark, [0.0] * dim, emb, k=4, pool=16, n_probe=3)
    assert got.count() == 0
    # degenerate candidate planted in the embedding store: it may enter
    # the probe pool but must be dropped from the MMR ranking
    emb_bad = emb.unionByName(
        spark.createDataFrame(
            [(99_999, [0.0] * dim)], "vec_id long, embedding array<double>"
        )
    )
    vec = [float(x) for x in emb.filter(F.col("vec_id") == CLONE_OF).first().embedding]
    sel = m.probe_vector_mmr(spark, vec, emb_bad, k=4, pool=16, n_probe=3)
    cids = {r.cid for r in sel.collect()}
    assert 99_999 not in cids and len(cids) == 4


def test_probe_hybrid_mmr_diversifies_fused_pool(spark, tmp_path, sf_dir):
    """MMR over the RRF-fused pool: the raw hybrid serves both planted
    clones (identical text AND identical vector → adjacent RRF ranks);
    the diversified probe keeps one."""
    m, emb = _build(spark, sf_dir, str(tmp_path / "idx"))
    corpus = _corpus(spark, sf_dir)
    doc7 = corpus.filter(F.col("doc_id") == CLONE_OF).first()
    terms = tuple(
        w for w in doc7.text.lower().split() if len(w) > 3
    )[:3] or ("spark",)
    vec = [float(x) for x in doc7.embedding]
    raw = {
        r.doc_id
        for r in m.probe_hybrid(
            spark, terms, vec, k=16, pool=16, n_probe=3
        ).collect()
    }
    assert {CLONE_OF, CLONE_ID}.issubset(raw), (
        "both clones must fuse into the raw hybrid pool"
    )
    got = m.probe_hybrid_mmr(
        spark, terms, vec, emb, k=4, pool=16, n_probe=3
    ).collect()
    sel = {r.cid for r in got}
    assert len(got) == 4 and [r.mmr_rank for r in got] == [1, 2, 3, 4]
    assert not {CLONE_OF, CLONE_ID}.issubset(sel), got
    assert sel & {CLONE_OF, CLONE_ID}
