"""Execute one batch of the training-rehearsal plan
(composite_training_rehearsal): fetch the batch's doc spans from a
doc_id-bucketed store with partition pruning (the serving-layout idiom)
and reassemble full packed sequences — the manifest is executable, not
just counted. The plan itself is oracle-hash-certified; this pins the
read path."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.packing import (
    CTX_LEN,
    REHEARSAL_BATCH,
    pack_sequences,
)
from kstreams_spark.registry import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"
N_BUCKETS = 16


def _bucket(col):
    h = F.md5(col.cast("string"))
    d = F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
    return F.concat(F.lit("d"), d % N_BUCKETS)


@pytest.fixture(scope="module")
def doc_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rehearsal") / "docstore")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    docs.withColumn("bkt", _bucket(F.col("doc_id"))).write.partitionBy(
        "bkt"
    ).parquet(path)
    return path


def _batch_manifest(spark):
    """Manifest rows of (epoch 0, densest shard, batch 0) — the
    operator's own permutation+batching replayed at row grain."""
    m = pack_sequences(load_table(spark, SF, "documents"))
    shard = (
        m.groupBy("shard")
        .count()
        .orderBy(F.col("count").desc(), "shard")
        .first()
        .shard
    )
    chunks = m.filter(F.col("shard") == shard).select("chunk_id").distinct()
    w = Window.orderBy(
        F.md5(F.concat(F.lit("0:"), F.col("chunk_id").cast("string"))),
        "chunk_id",
    )
    batch0 = (
        chunks.withColumn("seq_pos", F.row_number().over(w))
        .filter(F.col("seq_pos") <= REHEARSAL_BATCH)
        .select("chunk_id")
    )
    return shard, m.join(batch0, "chunk_id").filter(F.col("shard") == shard)


def test_batch_read_prunes_and_reassembles(spark, doc_store):
    shard, rows = _batch_manifest(spark)
    manifest = rows.select(
        "chunk_id", "doc_id", "doc_off", "chunk_off", "n_span"
    ).collect()
    assert manifest

    # batched read: ONLY the buckets holding this batch's docs
    doc_ids = sorted({r.doc_id for r in manifest})
    import hashlib

    hexd = "0123456789abcdef"
    buckets = sorted(
        {
            f"d{hexd.index(hashlib.md5(str(i).encode()).hexdigest()[0]) % N_BUCKETS}"
            for i in doc_ids
        }
    )
    fetched = (
        spark.read.parquet(doc_store)
        .filter(F.col("bkt").isin(buckets))
        .filter(F.col("doc_id").isin(doc_ids))
    )
    plan = fetched._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bkt" in plan, plan[:1500]
    toks = {r.doc_id: r.text.split(" ") for r in fetched.collect()}
    assert set(toks) == set(doc_ids)  # the pruned read got every doc

    # reassemble each packed sequence from the fetched spans
    by_chunk: dict[int, list] = {}
    for r in manifest:
        by_chunk.setdefault(r.chunk_id, []).append(r)
    assert len(by_chunk) == REHEARSAL_BATCH
    shard_max = max(by_chunk)
    for cid, spans in by_chunk.items():
        spans.sort(key=lambda r: r.chunk_off)
        seq: list[str] = []
        for s in spans:
            assert s.chunk_off == len(seq), (cid, s)  # contiguous fill
            seq.extend(toks[s.doc_id][s.doc_off : s.doc_off + s.n_span])
            assert len(seq) == s.chunk_off + s.n_span  # span fully present
        # every sequence is exactly CTX_LEN unless it is the shard's
        # final (possibly partial) chunk
        if cid != shard_max:
            assert len(seq) == CTX_LEN, (cid, len(seq))
        else:
            assert 0 < len(seq) <= CTX_LEN


def test_rehearsal_plan_totals_match_manifest(spark):
    """The registered composite's n_tokens per (epoch, shard) sums to
    the shard's packed token total, every epoch — the read plan moves
    each token exactly once per epoch."""
    plan = QUERIES["composite_training_rehearsal"](spark, SF)
    got = {
        (r.epoch, r.shard): r.t
        for r in plan.groupBy("epoch", "shard")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    m = pack_sequences(load_table(spark, SF, "documents"))
    want = {
        r.shard: r.t
        for r in m.groupBy("shard").agg(F.sum("n_span").alias("t")).collect()
    }
    for (epoch, shard), t in got.items():
        assert t == want[shard], (epoch, shard)
    assert len(got) == 2 * len(want)
