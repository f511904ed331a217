"""Streaming similarity: an incremental LSH index via foreachBatch.

New embeddings arrive on a stream; each microbatch is signed with the
SAME deterministic random-hyperplane signatures as the batch operators
(operators/similarity.py), matched against the accumulated corpus by
signature bucket equi-join + exact fixed-point cosine verify, and
absorbed into the index. The union of emissions over a whole stream
equals the batch `lsh_near_pairs` over the full corpus exactly — parity
and crash-replay exactly-once are pinned in
tests/test_streaming_similarity.py.

The bucket/commit choreography (including the exactly-once proof
obligations) lives in streaming/pair_index.py and is shared with the
streaming MinHash near-dup index (streaming/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstreams_spark.operators.similarity import (
    LSH_BITS,
    N_TABLES,
    NEAR_MIN_COSINE,
    _cosine,
    _fx_dot,
    _fx_norm2,
    _sig_expr,
)
from kstreams_spark.streaming.pair_index import StreamingPairIndex


class StreamingLshIndex(StreamingPairIndex):
    """foreachBatch incremental ANN index: match new vectors against the
    accumulated corpus, then absorb them. One stream per index_dir."""

    id_col = "vec_id"
    out_schema = "id1 bigint, id2 bigint, cosine double"

    def __init__(
        self,
        index_dir: str,
        out_dir: str,
        bits: int = LSH_BITS,
        n_tables: int = N_TABLES,
        min_cosine: float = NEAR_MIN_COSINE,
    ) -> None:
        super().__init__(index_dir, out_dir)
        self.bits = bits
        self.n_tables = n_tables
        self.min_cosine = min_cosine
        self.key_cols = tuple(f"sig{t}" for t in range(n_tables))

    def signed(self, df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id",
            "embedding",
            _fx_norm2("embedding").alias("norm2"),
            *[
                _sig_expr(t, self.bits).alias(f"sig{t}")
                for t in range(self.n_tables)
            ],
        )

    def verify(self, cand: DataFrame, vecs: DataFrame) -> DataFrame:
        v1 = vecs.select(
            F.col("vec_id").alias("id1"),
            F.col("embedding").alias("e1"),
            F.col("norm2").alias("n1"),
        )
        v2 = vecs.select(
            F.col("vec_id").alias("id2"),
            F.col("embedding").alias("e2"),
            F.col("norm2").alias("n2"),
        )
        return (
            cand.join(v1, "id1")
            .join(v2, "id2")
            .select(
                "id1",
                "id2",
                _cosine(_fx_dot("e1", "e2"), F.col("n1"), F.col("n2")).alias(
                    "cosine"
                ),
            )
            .filter(F.col("cosine") >= self.min_cosine)
        )
