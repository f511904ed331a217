"""Streaming perceptual-hash image dedup — the ingest-time twin of
operators/multimodal.py's multimodal_image_ahash_pairs: image docs
arrive as a stream, each batch's aHashes are checked against EVERYTHING
ingested so far (accumulated hash index ∪ the batch itself), and every
doc lands epoch-keyed with its dup verdict before the raw bytes reach
the lake.

The index is an epoch-keyed APPEND-ONLY table of (ahash, doc_id)
attributions (pair_index protocol — no in-place merge; the canonical
first-occurrence of a hash is MIN(doc_id) across epochs at read time,
replay-insensitive). Commit order is verdicts-then-index.

Ingest-time semantics: a doc is a duplicate when its hash was seen on
any EARLIER-ingested doc (or a lower-doc_id member of its own batch —
the same winner rule as the batch operator within one batch). The first
copy lands clean; the batch operator over the accumulated corpus is the
retro-active form.

At 100 TB: partition the index by a hash prefix for bucket pruning;
compact epochs with ExactlyOnceParquetSink.compact(). Per-batch cost ∝
batch hashes × matching index postings, never corpus².
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.multimodal import (
    AHASH_SCHEMA,
    _bmp_ahash,
    _decode_stage,
    _image_payloads,
)
from kstreams_spark.streaming.exactly_once import (
    ErasableIndexMixin,
    ExactlyOnceParquetSink,
)


def _batch_hashes(batch_df: DataFrame) -> DataFrame:
    """(doc_id, text) batch → (doc_id, ahash) via the REAL BMP decode
    path (synth → bytes → parse), identical to the batch operator's."""
    return (
        _image_payloads(batch_df)
        .mapInPandas(_decode_stage(_bmp_ahash, AHASH_SCHEMA), AHASH_SCHEMA)
        .select("doc_id", "ahash")
    )


class StreamingAhashIndex(ErasableIndexMixin):
    """foreachBatch dedup: image-doc stream → `verdicts_dir` rows
    (doc_id, ahash, is_dup, match_of) while `index_dir` accumulates
    (ahash, doc_id) attributions. match_of = the lowest doc_id ever seen
    with the same hash (the canonical copy; itself when clean)."""

    def __init__(self, index_dir: str, verdicts_dir: str) -> None:
        # a verdict row names a doc as subject (doc_id) OR as the
        # canonical copy (match_of) — both are erased-doc identifiers
        self.verdicts_sink = ExactlyOnceParquetSink(
            verdicts_dir, erase_cols=("doc_id", "match_of")
        )
        self.index_sink = ExactlyOnceParquetSink(
            index_dir, erase_cols=("doc_id",)
        )
        self.index_dir = index_dir

    def _has_index(self) -> bool:
        return os.path.isdir(self.index_dir) and any(
            n.startswith("epoch=") for n in os.listdir(self.index_dir)
        )

    def bootstrap(self, df: DataFrame) -> None:
        """Warm start: absorb an existing corpus's hashes WITHOUT
        emitting verdicts (pseudo-epoch -1)."""
        if self._has_index():
            raise ValueError("bootstrap requires an empty index_dir")
        self.index_sink.process_batch(_batch_hashes(df), -1)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.verdicts_sink.is_committed(epoch_id) and self.index_sink.is_committed(
            epoch_id
        ):
            return
        spark = batch_df.sparkSession
        hashes = _batch_hashes(batch_df).localCheckpoint(eager=True)
        if not self.verdicts_sink.is_committed(epoch_id):
            known = hashes
            if self._has_index():
                known = known.unionByName(
                    self.index_sink.result(spark).select("doc_id", "ahash")
                )
            canon = known.groupBy("ahash").agg(
                F.min("doc_id").alias("match_of")
            )
            verdicts = hashes.join(canon, "ahash").select(
                "doc_id",
                "ahash",
                (F.col("doc_id") != F.col("match_of"))
                .cast("long")
                .alias("is_dup"),
                "match_of",
            )
            self.verdicts_sink.process_batch(verdicts, epoch_id)
        if not self.index_sink.is_committed(epoch_id):
            self.index_sink.process_batch(hashes, epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def verdicts(self, spark: SparkSession) -> DataFrame:
        return self.verdicts_sink.result(spark)

    def erasure_sinks(self) -> dict:
        """Erasure semantics (verbs from ErasableIndexMixin): the doc's
        hash attributions leave the index — future canon elections
        behave as if it never ingested (a later doc with the same hash
        elects the next-lowest live doc_id, the erased-world answer) —
        and every verdict row naming it leaves the output, as subject
        OR as another doc's match_of: a row saying 'Y duplicates X'
        identifies X, so it goes with X (Y's verdict history is the
        price of X's erasure, documented)."""
        return {"index": self.index_sink, "verdicts": self.verdicts_sink}
