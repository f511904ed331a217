"""Erase-everywhere (r11 task 1): delete verbs for the five curation
attribution indexes + the erase_document() orchestrator.

The load-bearing claim per index is the ERASED-WORLD TWIN: after
delete_docs(X), (a) the accumulated index state equals an index built
from a corpus that never contained X (same batching), (b) a FUTURE
batch processed by both produces identical output — X's fingerprints
can never match again — and (c) compaction physically removes every
trace (raw directory scan: no X rows, no `_dels` sidecar). Historical
output rows about OTHER docs are facts about their own text and stay;
every row NAMING X (as subject or as the matched/canonical endpoint)
goes with X.

The orchestrator test spans lake + serving (hybrid atomic erase via the
epoch-offset commit) + attribution, and pins the offset mechanics: a
post-erase stream batch lands ABOVE the erase epoch (re-ingest
resurrects — CDC last-wins preserved), a crashed erase is invisible
until its re-run commits, and an orphan stream batch makes erase()
refuse loudly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.dedup import ngram_jaccard_pairs
from kstreams_spark.streaming.ahash import StreamingAhashIndex
from kstreams_spark.streaming.boilerplate import StreamingBoilerplateScrubber
from kstreams_spark.streaming.dedup import StreamingMinhashIndex
from kstreams_spark.streaming.similarity import StreamingLshIndex
from kstreams_spark.streaming.substring import StreamingSubstringIndex


def _docs(spark, sf_dir, lo=0, hi=10**9):
    return (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )


def _no_id(df, doomed, cols):
    rows = df.collect()
    for r in rows:
        for c in cols:
            assert r[c] != doomed, (c, r)
    return rows


def _canon_rows(df, drop=("epoch",)):
    """Order-insensitive row set; array columns become frozensets
    (collect_set order is nondeterministic)."""
    df = df.drop(*[c for c in drop if c in df.columns])
    out = set()
    for r in df.collect():
        vals = []
        for c in df.columns:
            v = r[c]
            vals.append(frozenset(v) if isinstance(v, list) else v)
        out.add(tuple(vals))
    return out


def test_minhash_erased_world_parity(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert pairs, "fixture must contain near-dup pairs"
    doomed = min(r.doc_id1 for r in pairs)
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    b0, b1 = docs.filter(F.col("doc_id") <= mid), docs.filter(
        F.col("doc_id") > mid
    )
    full = StreamingMinhashIndex(
        str(tmp_path / "f_idx"), str(tmp_path / "f_pairs"), threshold=0.5
    )
    twin = StreamingMinhashIndex(
        str(tmp_path / "t_idx"), str(tmp_path / "t_pairs"), threshold=0.5
    )
    for e, b in enumerate((b0, b1)):
        full.process_batch(b, e)
        twin.process_batch(b.filter(F.col("doc_id") != doomed), e)
    full.delete_docs(spark, [doomed])

    # (a) index state == never-ingested twin (same epochs, same rows)
    assert _canon_rows(full._index_sink.result(spark), drop=()) == _canon_rows(
        twin._index_sink.result(spark), drop=()
    )
    # pairs between other docs stay; every pair naming doomed is gone
    assert _canon_rows(full.result(spark)) == _canon_rows(twin.result(spark))

    # (b) future batch: a fresh copy of doomed's text must match exactly
    # what it matches in the erased world — never doomed itself
    copy_id = 10_000_000
    b2 = docs.filter(F.col("doc_id") == doomed).select(
        F.lit(copy_id).cast("long").alias("doc_id"), "text"
    )
    full.process_batch(b2, 2)
    twin.process_batch(b2, 2)
    got = _canon_rows(full.result(spark))
    assert got == _canon_rows(twin.result(spark))
    _no_id(full.result(spark), doomed, ("id1", "id2"))

    # (c) compaction removes every physical trace
    full.compact(spark)
    assert _canon_rows(full.result(spark)) == got
    raw_idx = spark.read.parquet(str(tmp_path / "f_idx"))
    assert raw_idx.filter(F.col("doc_id") == doomed).count() == 0
    raw_pairs = spark.read.parquet(str(tmp_path / "f_pairs"))
    assert (
        raw_pairs.filter(
            (F.col("id1") == doomed) | (F.col("id2") == doomed)
        ).count()
        == 0
    )
    assert not os.path.isdir(str(tmp_path / "f_idx" / "_dels"))
    assert not os.path.isdir(str(tmp_path / "f_pairs" / "_dels"))


def test_lsh_erased_world_parity(spark, tmp_path, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    b0, b1 = emb.filter(F.col("vec_id") <= mid), emb.filter(
        F.col("vec_id") > mid
    )
    full = StreamingLshIndex(str(tmp_path / "f_idx"), str(tmp_path / "f_pairs"))
    twin = StreamingLshIndex(str(tmp_path / "t_idx"), str(tmp_path / "t_pairs"))
    for e, b in enumerate((b0, b1)):
        full.process_batch(b, e)
        twin.process_batch(b, e)  # doomed picked AFTER mining below
    mined = full.result(spark).collect()
    assert mined, "fixture must contain near pairs"
    doomed = min(r.id1 for r in mined)

    # rebuild the twin without doomed (cheaper than re-mining: erase it
    # from the twin too, then verify the FULL index against it — this
    # also exercises two independent sinks erasing identically)
    twin.delete_docs(spark, [doomed])
    full.delete_docs(spark, [doomed])
    assert _canon_rows(full._index_sink.result(spark), drop=()) == _canon_rows(
        twin._index_sink.result(spark), drop=()
    )

    # future batch: a copy of doomed's vector pairs with doomed's old
    # neighbors in BOTH worlds, never with doomed
    copy_id = 10_000_000
    b2 = emb.filter(F.col("vec_id") == doomed).select(
        F.lit(copy_id).cast("long").alias("vec_id"), "embedding"
    )
    full.process_batch(b2, 2)
    twin.process_batch(b2, 2)
    assert _canon_rows(full.result(spark)) == _canon_rows(twin.result(spark))
    new_pairs = [r for r in full.result(spark).collect() if copy_id in (r.id1, r.id2)]
    assert new_pairs, "the copy must re-match doomed's old neighborhood"
    _no_id(full.result(spark), doomed, ("id1", "id2"))

    full.compact(spark)
    raw = spark.read.parquet(str(tmp_path / "f_idx"))
    assert raw.filter(F.col("vec_id") == doomed).count() == 0
    assert not os.path.isdir(str(tmp_path / "f_idx" / "_dels"))


def test_ahash_erased_world_parity(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir, hi=200)
    full = StreamingAhashIndex(str(tmp_path / "f_idx"), str(tmp_path / "f_v"))
    twin = StreamingAhashIndex(str(tmp_path / "t_idx"), str(tmp_path / "t_v"))
    b0, b1 = docs.filter(F.col("doc_id") < 100), docs.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
    )
    b2 = docs.filter(F.col("doc_id") >= 150)  # the future batch
    full.process_batch(b0, 0)
    # doomed: a canonical copy other docs point at — the hardest case
    # (its id appears in OTHER docs' match_of)
    v0 = full.verdicts(spark).collect()
    dup_rows = [r for r in v0 if r.is_dup]
    assert dup_rows, "batch 0 must contain hash dups"
    doomed = dup_rows[0].match_of
    full.process_batch(b1, 1)
    for e, b in enumerate((b0.filter(F.col("doc_id") != doomed), b1)):
        twin.process_batch(b, e)
    full.delete_docs(spark, [doomed])

    # index state equals the never-ingested twin
    assert _canon_rows(full.index_sink.result(spark), drop=()) == _canon_rows(
        twin.index_sink.result(spark), drop=()
    )
    # no verdict row names doomed — as subject OR as canonical match
    _no_id(full.verdicts(spark), doomed, ("doc_id", "match_of"))

    # future batch: canon elections equal the erased world's (a doc
    # sharing doomed's hash elects the next-lowest live doc)
    full.process_batch(b2, 2)
    twin.process_batch(b2, 2)
    f2 = {
        r.doc_id: (r.ahash, r.is_dup, r.match_of)
        for r in full.verdicts(spark).filter(F.col("epoch") == 2).collect()
    }
    t2 = {
        r.doc_id: (r.ahash, r.is_dup, r.match_of)
        for r in twin.verdicts(spark).filter(F.col("epoch") == 2).collect()
    }
    assert f2 == t2 and f2

    full.compact(spark)
    assert (
        spark.read.parquet(str(tmp_path / "f_idx"))
        .filter(F.col("doc_id") == doomed)
        .count()
        == 0
    )
    raw_v = spark.read.parquet(str(tmp_path / "f_v"))
    assert (
        raw_v.filter(
            (F.col("doc_id") == doomed) | (F.col("match_of") == doomed)
        ).count()
        == 0
    )
    assert not os.path.isdir(str(tmp_path / "f_idx" / "_dels"))


def test_substring_erased_world_parity(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir, hi=150)
    doomed = int(docs.agg(F.min("doc_id")).first()[0])
    b0, b1 = docs.filter(F.col("doc_id") < 100), docs.filter(
        F.col("doc_id") >= 100
    )
    full = StreamingSubstringIndex(str(tmp_path / "f_idx"), str(tmp_path / "f_fl"))
    twin = StreamingSubstringIndex(str(tmp_path / "t_idx"), str(tmp_path / "t_fl"))
    full.process_batch(b0, 0)
    twin.process_batch(b0.filter(F.col("doc_id") != doomed), 0)
    full.delete_docs(spark, [doomed])

    assert _canon_rows(full.index_sink.result(spark), drop=()) == _canon_rows(
        twin.index_sink.result(spark), drop=()
    )
    _no_id(full.flags(spark), doomed, ("doc_id",))

    # future batch: occurrence counts no longer include doomed's windows
    # — a verbatim copy of doomed's text must score as in the twin world
    copy = docs.filter(F.col("doc_id") == doomed).select(
        F.lit(10_000_000).cast("long").alias("doc_id"), "text"
    )
    b1x = b1.unionByName(copy)
    full.process_batch(b1x, 1)
    twin.process_batch(b1x, 1)
    f1 = _canon_rows(full.flags(spark).filter(F.col("epoch") == 1), drop=())
    t1 = _canon_rows(twin.flags(spark).filter(F.col("epoch") == 1), drop=())
    assert f1 == t1 and f1

    full.compact(spark)
    assert (
        spark.read.parquet(str(tmp_path / "f_idx"))
        .filter(F.col("doc_id") == doomed)
        .count()
        == 0
    )
    assert not os.path.isdir(str(tmp_path / "f_idx" / "_dels"))


def test_boilerplate_erased_world_parity(spark, tmp_path):
    P = "subscribe to our newsletter"
    mk = lambda i, extra: (i, f"unique body {i} aa bb\n\n{extra}")  # noqa: E731
    b0 = spark.createDataFrame(
        [mk(1, P), mk(2, P), (3, "free text three")], "doc_id long, text string"
    )
    doomed = 1
    full = StreamingBoilerplateScrubber(
        str(tmp_path / "f_idx"), str(tmp_path / "f_c"), min_docs=3
    )
    twin = StreamingBoilerplateScrubber(
        str(tmp_path / "t_idx"), str(tmp_path / "t_c"), min_docs=3
    )
    full.process_batch(b0, 0)
    twin.process_batch(b0.filter(F.col("doc_id") != doomed), 0)
    full.delete_docs(spark, [doomed])
    assert _canon_rows(full.index_sink.result(spark), drop=()) == _canon_rows(
        twin.index_sink.result(spark), drop=()
    )
    _no_id(full.clean(spark), doomed, ("doc_id",))

    # future batch: P now has 2 live distinct docs in BOTH worlds — a
    # third doc keeps it below the bar exactly because doomed is erased
    b1 = spark.createDataFrame([mk(4, P)], "doc_id long, text string")
    full.process_batch(b1, 1)
    twin.process_batch(b1, 1)
    f1 = _canon_rows(full.clean(spark).filter(F.col("epoch") == 1), drop=())
    t1 = _canon_rows(twin.clean(spark).filter(F.col("epoch") == 1), drop=())
    assert f1 == t1
    kept = [r for r in full.clean(spark).filter(F.col("epoch") == 1).collect()]
    assert kept[0].n_kept == kept[0].n_paras, (
        "P must NOT be boilerplate: erasing doomed shrank its doc count"
    )

    full.compact(spark)
    assert (
        spark.read.parquet(str(tmp_path / "f_idx"))
        .filter(F.col("doc_id") == doomed)
        .count()
        == 0
    )
    assert not os.path.isdir(str(tmp_path / "f_idx" / "_dels"))
