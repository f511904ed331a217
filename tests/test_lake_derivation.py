"""Lake-derived serving indexes (r12 — VERDICT r11 task 1): the
snapshot lake is the source of truth, the hybrid serving group is
DERIVED state. apply_snapshot_changes() pipes snapshot_diff's CDC feed
onto HybridIngestMaintainer's atomic op='upsert'/'delete' path under
ONE commit per version range (the erase() epoch-offset protocol).

The headline assertions, per the verdict's done-criteria:
- lake commits (inserts + deletes + an update across several versions)
  → one apply → every probe leg byte-equal to indexes built FRESH from
  the latest lake snapshot with the same frozen params (the
  derived-state twin);
- lake snapshot_delete_where (erasure) → apply → probes byte-equal the
  erased-world twin;
- re-apply is a version-keyed no-op;
- crash before the offset bump: probes unchanged (all-old), the re-run
  heals the LOGGED range to completion; crash after the bump but before
  the watermark write: probes already flipped, the re-run finalizes
  with no double-apply.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.lake_snapshot import (
    snapshot_delete_where,
    snapshot_publish,
    snapshot_read,
    snapshot_versions,
)
from kstreams_spark.operators.quantize import sq8_params
from kstreams_spark.serving import (
    probe_ivf_sq8_index,
    probe_postings_index,
    write_ivf_sq8_index,
    write_postings_index,
)
from kstreams_spark.streaming.hybrid import HybridIngestMaintainer

SF = "/root/testdata/sf0.001"
TERMS = ("spark", "window", "scan")
NEW = 2  # doc_id % 3 == 2 arrive in lake v2
DOOMED = [0, 7, 30]  # deleted from the lake in v3
FLIP = 10  # updated (delete + reinsert with revised text) in v3+v4
ERASE_LATER = 13  # erased through the lake in the erasure leg


def _corpus(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    return (
        docs.join(emb, "doc_id")
        .withColumn(
            "split",
            F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val"),
        )
        .withColumn("lang", F.lit("en"))
    )


def _revised(corpus):
    return corpus.filter(F.col("doc_id") == FLIP).withColumn(
        "text", F.concat(F.col("text"), F.lit(" spark zzderive zzderive"))
    )


def _lex(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def _vec(df):
    return [(r.vec_id, r.score_q) for r in df.collect()]


def _twin(spark, root, name, snap, cents, frozen):
    """Indexes built FRESH from a lake snapshot with the same frozen
    params — what a correctly derived group must probe byte-equal to."""
    post, sq8 = str(root / f"{name}_post"), str(root / f"{name}_sq8")
    write_postings_index(snap.select("doc_id", "text"), post)
    write_ivf_sq8_index(
        snap.select(F.col("doc_id").alias("vec_id"), "embedding"),
        sq8,
        cents,
        params=frozen,
    )
    return post, sq8


@pytest.fixture(scope="module")
def derived(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake_derive")
    lake = str(root / "lake")
    corpus = _corpus(spark)
    base = corpus.filter(F.col("doc_id") % 3 != NEW)
    emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    frozen = sq8_params(emb)

    v1 = snapshot_publish(base, lake)
    m = HybridIngestMaintainer(str(root / "idx"))
    assert m.lake_version() is None
    got_v = m.bootstrap_from_lake(spark, lake, cents, params=frozen)
    assert got_v == v1 == m.lake_version()

    # v2: newcomers appended; v3: deletes; v3+v4: FLIP updated
    snapshot_publish(
        corpus.filter(F.col("doc_id") % 3 == NEW), lake, mode="append"
    )
    snapshot_delete_where(
        spark, lake, f"doc_id IN ({', '.join(map(str, DOOMED + [FLIP]))})"
    )
    snapshot_publish(_revised(corpus), lake, mode="append")
    vec = [
        float(x)
        for x in corpus.filter(F.col("doc_id") == 0).first().embedding
    ]
    return m, lake, cents, frozen, vec, root


def test_apply_snapshot_changes_matches_derived_twin(spark, derived):
    m, lake, cents, frozen, vec, root = derived
    v_latest = snapshot_versions(lake)[-1]
    report = m.apply_snapshot_changes(spark, lake)
    assert report["applied"] and report["to_v"] == v_latest
    assert report["epoch"] == 1 and m.visible_epoch() == 1
    assert m.lake_version() == v_latest

    snap = snapshot_read(spark, lake).select("doc_id", "text", "embedding")
    post, sq8 = _twin(spark, root, "t1", snap, cents, frozen)
    got_lex = _lex(m.probe_lexical(spark, TERMS, k=10))
    assert got_lex == _lex(probe_postings_index(spark, post, TERMS, k=10))
    got_vec = _vec(m.probe_vector(spark, vec, k=10, n_probe=3))
    assert got_vec == _vec(
        probe_ivf_sq8_index(spark, sq8, vec, cents, k=10, n_probe=3)
    )
    served = {d for d, _ in got_lex} | {v for v, _ in got_vec}
    assert not served & set(DOOMED)
    # the update is live: its planted unique term is the only hit
    upd = _lex(m.probe_lexical(spark, ("zzderive",), k=5))
    assert {d for d, _ in upd} == {FLIP}

    # re-apply: version-keyed no-op — nothing moves
    again = m.apply_snapshot_changes(spark, lake)
    assert not again["applied"] and again["epoch"] is None
    assert m.visible_epoch() == 1
    assert _lex(m.probe_lexical(spark, TERMS, k=10)) == got_lex


def test_lake_erasure_propagates_to_derived_indexes(spark, derived):
    m, lake, cents, frozen, vec, root = derived
    assert snapshot_delete_where(spark, lake, f"doc_id = {ERASE_LATER}") >= 1
    report = m.apply_snapshot_changes(spark, lake)
    assert report["applied"] and report["epoch"] == m.visible_epoch()

    snap = snapshot_read(spark, lake).select("doc_id", "text", "embedding")
    post, sq8 = _twin(spark, root, "t2", snap, cents, frozen)
    got_lex = _lex(m.probe_lexical(spark, TERMS, k=10))
    assert got_lex == _lex(probe_postings_index(spark, post, TERMS, k=10))
    got_vec = _vec(m.probe_vector(spark, vec, k=10, n_probe=3))
    assert got_vec == _vec(
        probe_ivf_sq8_index(spark, sq8, vec, cents, k=10, n_probe=3)
    )
    assert ERASE_LATER not in (
        {d for d, _ in got_lex} | {v for v, _ in got_vec}
    )


def test_derive_crash_before_commit_is_invisible_then_heals(
    spark, tmp_path, monkeypatch
):
    """Crash between the per-index applies and the offset bump: probes
    stay all-old; the re-run re-applies the LOGGED range at the same
    epoch and commits once."""
    lake = str(tmp_path / "lake")
    corpus = _corpus(spark)
    base = corpus.filter(F.col("doc_id") % 3 != NEW)
    emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    frozen = sq8_params(emb)
    snapshot_publish(base, lake)
    m = HybridIngestMaintainer(str(tmp_path / "idx"))
    m.bootstrap_from_lake(spark, lake, cents, params=frozen)
    snapshot_delete_where(spark, lake, f"doc_id = {DOOMED[0]}")

    before = _lex(m.probe_lexical(spark, TERMS, k=10))

    real_set = HybridIngestMaintainer._set_offset
    armed = {"on": True}

    def dying_set(self, value):
        if armed["on"]:
            armed["on"] = False
            raise OSError("injected crash before the offset bump")
        return real_set(self, value)

    monkeypatch.setattr(HybridIngestMaintainer, "_set_offset", dying_set)
    with pytest.raises(OSError, match="injected"):
        m.apply_snapshot_changes(spark, lake)
    # all-old: the uncommitted epoch is above every probe's cap
    assert m.visible_epoch() == 0
    assert _lex(m.probe_lexical(spark, TERMS, k=10)) == before
    assert m.lake_version() == 1

    # re-run heals the logged range to completion and commits once
    report = m.apply_snapshot_changes(spark, lake)
    assert m.visible_epoch() == 1 and m.lake_version() == 2
    assert not report["applied"]  # the HEAL finished it; this call no-ops
    served = {d for d, _ in _lex(m.probe_lexical(spark, TERMS, k=10))}
    assert DOOMED[0] not in served
    import glob

    assert not glob.glob(str(tmp_path / "idx") + "/_derive_log-*")


def test_derive_crash_after_commit_finalizes_without_double_apply(
    spark, tmp_path, monkeypatch
):
    """Crash between the offset bump and the watermark write: probes
    already flipped; the re-run finalizes (watermark + log removal)
    and applies nothing twice."""
    lake = str(tmp_path / "lake")
    corpus = _corpus(spark)
    base = corpus.filter(F.col("doc_id") % 3 != NEW)
    emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    snapshot_publish(base, lake)
    m = HybridIngestMaintainer(str(tmp_path / "idx"))
    m.bootstrap_from_lake(spark, lake, cents, params=sq8_params(emb))
    snapshot_delete_where(spark, lake, f"doc_id = {DOOMED[0]}")

    real_set = HybridIngestMaintainer._set_lake_version
    armed = {"on": True}

    def dying_set(self, v):
        if armed["on"]:
            armed["on"] = False
            raise OSError("injected crash before the watermark write")
        return real_set(self, v)

    monkeypatch.setattr(HybridIngestMaintainer, "_set_lake_version", dying_set)
    with pytest.raises(OSError, match="injected"):
        m.apply_snapshot_changes(spark, lake)
    # committed: the erasure is already visible on every leg
    assert m.visible_epoch() == 1
    flipped = _lex(m.probe_lexical(spark, TERMS, k=10))
    assert DOOMED[0] not in {d for d, _ in flipped}
    assert m.lake_version() == 1  # watermark lags — the log carries it

    report = m.apply_snapshot_changes(spark, lake)
    assert not report["applied"]  # finalize only, no second epoch
    assert m.visible_epoch() == 1 and m.lake_version() == 2
    assert _lex(m.probe_lexical(spark, TERMS, k=10)) == flipped
    import glob

    assert not glob.glob(str(tmp_path / "idx") + "/_derive_log-*")


def test_apply_refuses_without_bootstrap_watermark(spark, tmp_path):
    lake = str(tmp_path / "lake")
    snapshot_publish(_corpus(spark).limit(5), lake)
    m = HybridIngestMaintainer(str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="not lake-derived"):
        m.apply_snapshot_changes(spark, lake)


def test_follow_lake_derives_continuously(spark, tmp_path):
    """r12: follow_lake attaches the CDF stream and derives once per
    microbatch — commits made while the stream runs reach the probes
    without an explicit apply, and a checkpoint restart replays as a
    version-keyed no-op."""
    lake = str(tmp_path / "lake")
    corpus = _corpus(spark)
    base = corpus.filter(F.col("doc_id") % 3 != NEW)
    emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    frozen = sq8_params(emb)
    v1 = snapshot_publish(base, lake)
    m = HybridIngestMaintainer(str(tmp_path / "idx"))
    m.bootstrap_from_lake(spark, lake, cents, params=frozen)

    q = m.follow_lake(spark, lake, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()  # caught up: nothing to derive
        assert m.lake_version() == v1 and m.visible_epoch() == 0

        snapshot_publish(
            corpus.filter(F.col("doc_id") % 3 == NEW), lake, mode="append"
        )
        snapshot_delete_where(
            spark, lake, f"doc_id IN ({', '.join(map(str, DOOMED))})"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert m.lake_version() == snapshot_versions(lake)[-1]
    assert m.visible_epoch() >= 1
    served = {r.doc_id for r in m.probe_lexical(spark, TERMS, k=20).collect()}
    assert not served & set(DOOMED)
    # a newcomer (doc_id % 3 == NEW) is now probeable
    assert any(d % 3 == NEW for d in served)

    # restart on the same checkpoint: replay is a version-keyed no-op
    visible = m.visible_epoch()
    before = [
        (r.doc_id, r.score)
        for r in m.probe_lexical(spark, TERMS, k=10).collect()
    ]
    q2 = m.follow_lake(spark, lake, str(tmp_path / "ckpt"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert m.visible_epoch() == visible
    assert [
        (r.doc_id, r.score)
        for r in m.probe_lexical(spark, TERMS, k=10).collect()
    ] == before


def test_stream_to_serving_through_the_lake(spark, tmp_path):
    """The full production story in one pipeline: a LIVE stream ingests
    into the snapshot lake (SnapshotLakeSink — one atomic commit per
    microbatch), and follow_lake derives the serving indexes from the
    lake's change feed — so a record travels stream → lake version →
    CDC step → index epoch → probe hit with no batch glue. The lake is
    the single source of truth; both streams checkpoint independently
    and replay idempotently."""
    lake = str(tmp_path / "lake")
    corpus = _corpus(spark)
    base = corpus.filter(F.col("doc_id") % 3 == 0).limit(40)
    emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    frozen = sq8_params(emb)
    snapshot_publish(base, lake)  # v1: the bootstrap corpus
    from kstreams_spark.streaming.hybrid import HybridIngestMaintainer

    m = HybridIngestMaintainer(str(tmp_path / "idx"))
    m.bootstrap_from_lake(spark, lake, cents, params=frozen)

    # live ingest: a rate stream mapped onto the lake's schema; every
    # doc carries a unique planted term so probe hits are attributable
    from kstreams_spark.lake_snapshot import SnapshotLakeSink

    dim = len(cents[0])
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .select(
            (F.col("value") + 100000).alias("doc_id"),
            F.concat(
                F.lit("zzlive spark stream doc "),
                F.col("value").cast("string"),
            ).alias("text"),
            F.array(
                *[
                    (
                        (F.col("value") * (i + 3)) % 17
                    ).cast("double")
                    / 17
                    for i in range(dim)
                ]
            )
            .cast("array<float>")  # the lake's committed element type —
            # the sink's schema enforcement (r12) rejects array<double>
            .alias("embedding"),
            F.lit("train").alias("split"),
            F.lit("en").alias("lang"),
        )
    )
    sink = SnapshotLakeSink(lake)
    base_n = base.count()
    q_ingest = sink.attach(rate, str(tmp_path / "ckpt_ingest"))
    try:
        # wait until a streamed commit WITH ROWS landed (a rate stream's
        # first microbatch is typically empty, committing a row-less
        # lake version)
        import time as _time

        deadline = _time.time() + 60

        def _streamed_rows() -> int:
            return snapshot_read(spark, lake).count() - base_n

        while _streamed_rows() == 0 and _time.time() < deadline:
            _time.sleep(0.5)
        q_ingest.processAllAvailable()
    finally:
        q_ingest.stop()
    assert _streamed_rows() > 0, "no streamed rows landed"
    assert snapshot_versions(lake)[-1] >= 2

    q_derive = m.follow_lake(spark, lake, str(tmp_path / "ckpt_derive"))
    try:
        q_derive.processAllAvailable()
    finally:
        q_derive.stop()
    assert m.lake_version() == snapshot_versions(lake)[-1]
    # the streamed docs are probeable: the planted term hits ONLY them
    hits = m.probe_lexical(spark, ("zzlive",), k=10).collect()
    assert hits and all(r.doc_id >= 100000 for r in hits)
    # and the lake agrees with the index about what exists
    lake_live = {
        r.doc_id
        for r in snapshot_read(spark, lake)
        .filter(F.col("doc_id") >= 100000)
        .collect()
    }
    assert {r.doc_id for r in hits} <= lake_live
