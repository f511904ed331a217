"""Streaming boilerplate detection — the ingest-time twin of
operators/paragraphs.py's text_boilerplate_rewrite: documents arrive as
a stream, each batch's paragraphs are checked against the distinct-doc
counts of EVERYTHING ingested so far (accumulated index ∪ the batch
itself), and the cleaned per-doc rewrite lands epoch-keyed before the
raw text reaches the lake.

The index is an epoch-keyed APPEND-ONLY table of (h, doc_id) paragraph
attributions — the streaming/pair_index.py protocol shared with the
substring index: no in-place merge; the distinct-document count of a
paragraph hash aggregates across epochs at read time (COUNT(DISTINCT
doc_id) is duplicate-insensitive, so replayed or re-chunked epochs can
never inflate it). Commit order is clean-then-index, so a replayed epoch
whose output is committed skips scoring and a batch never collides with
itself through the index.

Ingest-time semantics, stated plainly: a paragraph becomes boilerplate
the moment its (past ∪ present) distinct-doc count reaches
BOILER_MIN_DOCS — earlier copies already ingested clean stay clean (the
batch operator over the accumulated corpus is the retro-active form,
exactly as with the substring index).

At 100 TB: partition the index by a prefix of h for bucket pruning,
compact epochs with ExactlyOnceParquetSink.compact(); per-batch cost ∝
batch paragraphs × matching index postings, never corpus².
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.paragraphs import (
    BOILER_MIN_DOCS,
    _totals,
    paragraph_rows,
    reassemble,
)
from kstreams_spark.streaming.exactly_once import (
    ErasableIndexMixin,
    ExactlyOnceParquetSink,
)


def _attributions(batch_df: DataFrame) -> DataFrame:
    """(doc_id, text) → distinct (h, doc_id) paragraph attributions."""
    return (
        paragraph_rows(batch_df)
        .select(F.md5("para").alias("h"), "doc_id")
        .distinct()
    )


class StreamingBoilerplateScrubber(ErasableIndexMixin):
    """foreachBatch scrubber: (doc_id, text) stream → `clean_dir` rows
    (doc_id, n_paras, n_kept, text_kept) with boilerplate paragraphs
    removed, while `index_dir` accumulates (h, doc_id) attributions."""

    def __init__(
        self,
        index_dir: str,
        clean_dir: str,
        min_docs: int = BOILER_MIN_DOCS,
    ) -> None:
        self.min_docs = min_docs
        self.clean_sink = ExactlyOnceParquetSink(
            clean_dir, erase_cols=("doc_id",)
        )
        self.index_sink = ExactlyOnceParquetSink(
            index_dir, erase_cols=("doc_id",)
        )
        self.index_dir = index_dir
        self.batches_seen = 0

    def _has_index(self) -> bool:
        return os.path.isdir(self.index_dir) and any(
            n.startswith("epoch=") for n in os.listdir(self.index_dir)
        )

    def bootstrap(self, df: DataFrame) -> None:
        """Warm start: absorb an existing corpus into the index WITHOUT
        emitting cleaned docs (pseudo-epoch -1)."""
        if self._has_index():
            raise ValueError("bootstrap requires an empty index_dir")
        self.index_sink.process_batch(_attributions(df), -1)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        if self.clean_sink.is_committed(epoch_id) and self.index_sink.is_committed(
            epoch_id
        ):
            return
        spark = batch_df.sparkSession
        paras = paragraph_rows(batch_df).localCheckpoint(eager=True)
        if not self.clean_sink.is_committed(epoch_id):
            attr = paras.select(F.md5("para").alias("h"), "doc_id")
            if self._has_index():
                attr = attr.unionByName(
                    self.index_sink.result(spark).select("h", "doc_id")
                )
            ndocs = attr.groupBy("h").agg(
                F.countDistinct("doc_id").alias("n_docs")
            )
            kept = (
                paras.join(ndocs, F.md5(paras.para) == ndocs.h)
                .filter(F.col("n_docs") < self.min_docs)
                .select("doc_id", "pos", "para")
            )
            clean = reassemble(kept, _totals(batch_df))
            self.clean_sink.process_batch(clean, epoch_id)
        if not self.index_sink.is_committed(epoch_id):
            self.index_sink.process_batch(
                paras.select(F.md5("para").alias("h"), "doc_id").distinct(),
                epoch_id,
            )

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def clean(self, spark: SparkSession) -> DataFrame:
        return self.clean_sink.result(spark)

    def erasure_sinks(self) -> dict:
        """Erasure semantics (verbs from ErasableIndexMixin): the doc's
        (h, doc_id) paragraph attributions leave the index —
        COUNT(DISTINCT doc_id) per hash shrinks, so a paragraph
        boilerplate only because of the erased doc stops being
        boilerplate for FUTURE batches (the erased-world contract;
        already-emitted rewrites of other docs stay, they are those
        docs' own text) — and its cleaned rows leave the output."""
        return {"index": self.index_sink, "clean": self.clean_sink}
