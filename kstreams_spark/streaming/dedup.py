"""Streaming near-dup detection: an incremental MinHash band index.

Documents arrive on a stream; each microbatch is signed with the SAME
md5-rotation minhash bands as the batch operators (operators/dedup.py)
plus a distinct-shingle sketch, matched against the accumulated corpus
by band bucket collision, exact-Jaccard-verified on the sketches
(array_intersect — identical arithmetic to the batch verifier), and
absorbed. The union of emissions over a whole stream equals the batch
`dedup_minhash_verified` propose→verify pipeline over the full corpus —
parity pinned in tests/test_streaming_dedup.py.

Built on streaming/pair_index.py: bucket keys are the band values
(OR-combined, exactly like multi-table LSH), commits are epoch-keyed
exactly-once, ordered pairs-then-index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstreams_spark.operators.dedup import (
    N_BANDS,
    N_HASHES,
    _shingles,
    minhash_signatures,
)
from kstreams_spark.streaming.pair_index import StreamingPairIndex


class StreamingMinhashIndex(StreamingPairIndex):
    """foreachBatch incremental near-dup index over (doc_id, text)."""

    id_col = "doc_id"
    out_schema = "id1 bigint, id2 bigint, n_common int, jaccard double"

    def __init__(
        self,
        index_dir: str,
        out_dir: str,
        n_hashes: int = N_HASHES,
        n_bands: int = N_BANDS,
        ngram: int = 3,
        threshold: float = 0.5,
    ) -> None:
        super().__init__(index_dir, out_dir)
        if n_hashes % n_bands:
            raise ValueError("n_bands must divide n_hashes")
        self.n_hashes = n_hashes
        self.n_bands = n_bands
        self.ngram = ngram
        self.threshold = threshold
        self.key_cols = tuple(f"band{b}" for b in range(n_bands))

    def signed(self, df: DataFrame) -> DataFrame:
        rows = self.n_hashes // self.n_bands
        sig = minhash_signatures(df, self.n_hashes)
        bands = sig.select(
            "doc_id",
            *[
                F.concat(
                    *[F.col(f"h{rows * b + r}") for r in range(rows)]
                ).alias(f"band{b}")
                for b in range(self.n_bands)
            ],
        )
        sketch = (
            _shingles(df, self.ngram, distinct=False)
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("shs"))
        )
        return bands.join(sketch, "doc_id")

    def verify(self, cand: DataFrame, vecs: DataFrame) -> DataFrame:
        s1 = vecs.select(F.col("doc_id").alias("id1"), F.col("shs").alias("shs1"))
        s2 = vecs.select(F.col("doc_id").alias("id2"), F.col("shs").alias("shs2"))
        scored = (
            cand.join(s1, "id1")
            .join(s2, "id2")
            .select(
                "id1",
                "id2",
                F.size(F.array_intersect("shs1", "shs2")).alias("n_common"),
                F.size("shs1").alias("n1"),
                F.size("shs2").alias("n2"),
            )
        )
        jac = F.col("n_common").cast("double") / (
            F.col("n1") + F.col("n2") - F.col("n_common")
        )
        return (
            scored.withColumn("jaccard", jac)
            .filter((F.col("n_common") > 0) & (jac >= self.threshold))
            .select("id1", "id2", "n_common", "jaccard")
        )
