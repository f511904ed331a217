"""Sequence packing + chunk windows (operators/packing.py): the manifest
partitions every token exactly once, interior chunks are exactly full,
and windows tile each doc with the declared overlap."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.packing import (
    CTX_LEN,
    WIN_STRIDE,
    WIN_TOKENS,
    chunk_windows,
    pack_sequences,
)

SF = "/root/testdata/sf0.001"


def test_pack_partitions_every_token_once(spark):
    docs = load_table(spark, SF, "documents")
    man = pack_sequences(docs).cache()
    per_doc = {
        r.doc_id: r.s
        for r in man.groupBy("doc_id")
        .agg(F.sum("n_span").alias("s"))
        .collect()
    }
    truth = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert per_doc == truth  # every token placed, none twice

    # spans within a chunk tile it contiguously from 0
    bad = (
        man.groupBy("shard", "chunk_id")
        .agg(
            F.min("chunk_off").alias("mn"),
            F.sum("n_span").alias("filled"),
            F.max(F.col("chunk_off") + F.col("n_span")).alias("end"),
        )
        .filter((F.col("mn") != 0) | (F.col("filled") != F.col("end")))
        .count()
    )
    assert bad == 0

    # interior chunks are exactly CTX_LEN full; only the last chunk of
    # each shard may be partial
    last = {
        r.shard: r.m
        for r in man.groupBy("shard")
        .agg(F.max("chunk_id").alias("m"))
        .collect()
    }
    partial = (
        man.groupBy("shard", "chunk_id")
        .agg(F.sum("n_span").alias("filled"))
        .filter(F.col("filled") != CTX_LEN)
        .collect()
    )
    for r in partial:
        assert r.chunk_id == last[r.shard], (r.shard, r.chunk_id)
    man.unpersist()


def test_pack_doc_split_across_chunks(spark):
    # one 300-token doc in its own shard → chunks 0,1,2 with 128/128/44
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(300)), "xx")],
        ["doc_id", "text", "lang"],
    )
    rows = sorted(
        pack_sequences(docs).collect(), key=lambda r: r.chunk_id
    )
    assert [(r.chunk_id, r.doc_off, r.chunk_off, r.n_span) for r in rows] == [
        (0, 0, 0, CTX_LEN),
        (1, CTX_LEN, 0, CTX_LEN),
        (2, 2 * CTX_LEN, 0, 300 - 2 * CTX_LEN),
    ]


def test_windows_tile_and_overlap(spark):
    docs = load_table(spark, SF, "documents")
    wins = chunk_windows(docs).cache()
    # coverage: consecutive windows' starts advance by stride and the
    # last window ends exactly at n
    agg = (
        wins.groupBy("doc_id")
        .agg(
            F.max(F.col("start_tok") + F.col("n_tok")).alias("end"),
            F.count(F.lit(1)).alias("k"),
            F.max("win_id").alias("mx"),
        )
        .collect()
    )
    truth = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    for r in agg:
        assert r.end == truth[r.doc_id], r.doc_id  # tail covered exactly
        assert r.k == r.mx + 1  # win_ids are dense 0..k-1
    # text slice honesty on one long doc
    r = (
        wins.filter(F.col("n_tok") == WIN_TOKENS)
        .orderBy("doc_id", "win_id")
        .first()
    )
    doc_text = (
        docs.filter(F.col("doc_id") == r.doc_id).first().text.split(" ")
    )
    assert r.chunk_text.split(" ") == doc_text[
        r.start_tok : r.start_tok + WIN_TOKENS
    ]
    assert WIN_TOKENS - WIN_STRIDE > 0  # declared overlap is real
    wins.unpersist()
