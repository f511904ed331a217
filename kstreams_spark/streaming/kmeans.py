"""Streaming (mini-batch) k-means — the centroid-refresh path for the
IVF family (Sculley'10 web-scale k-means, Spark-shaped): vectors arrive
as a stream, each microbatch is assigned to the CURRENT centroids with
the same broadcast max-dot assignment the batch fitter uses, and the
centroids move to the running mean of everything ever assigned to them.

State is two-level, and both levels are bounded:
- driver: per-centroid running sums (k×D fixed-point ints) + counts —
  the same O(k·D) class as kmeans_fit's per-round collect;
- lake: per-epoch (cen_id, dim, sum_fx, n) partial aggregates,
  epoch-keyed exactly-once. The driver dict is a CACHE: `bootstrap()`
  re-aggregates the committed epochs (plus the persisted init centroids
  at `_init`), so a crash between commit and dict update loses nothing.

Fixed-point sums make the state replay-stable: merging an epoch's
partials is exact integer addition, in any order. Centroids are
unit-normalized running means; a cell nothing has reached yet keeps its
init centroid (recoverable — init is persisted).

Ingest-order sensitivity is inherent to mini-batch k-means (early
batches steer early centroids) and is the accepted trade for one-pass
fitting; the batch `kmeans_fit` remains the reference optimizer, and
`tests/test_streaming_kmeans.py` pins single-batch equivalence to one
Lloyd round plus planted-cluster recovery across batches.

At 100 TB: assignment is the same broadcast scan as ivf_assign; the
per-epoch state rows are k×D (thousands), trivially small; refreshed
centroids feed serving.write_ivf_index / write_ivf_sq8_index on
whatever cadence the index rebuilds.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.kmeans import _normalize, kmeans_assign
from kstreams_spark.operators.similarity import FX, _fx
from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink


class StreamingKMeans:
    """foreachBatch mini-batch k-means over a (vec_id, embedding) stream."""

    def __init__(self, state_dir: str, k: int) -> None:
        self.k = k
        self.state_dir = state_dir
        self.state_sink = ExactlyOnceParquetSink(os.path.join(state_dir, "epochs"))
        self.centroids: list[list[float]] | None = None
        self._init: list[list[float]] | None = None
        self.sums: dict[int, list[int]] = {}
        self.counts: dict[int, int] = {}
        self.batches_seen = 0

    # ------------------------------------------------------------ lifecycle

    def initialize(self, spark: SparkSession, centroids: list[list[float]]) -> None:
        """Set (and persist) the starting centroids — typically
        kmeans_fit on a warm-up sample, or the first k vectors."""
        if self.centroids is not None:
            raise ValueError("already initialized")
        self._init = [_normalize([float(x) for x in c]) for c in centroids]
        self.centroids = list(self._init)
        rows = [
            (cid, [float(x) for x in c]) for cid, c in enumerate(self._init)
        ]
        spark.createDataFrame(
            rows, "cen_id int, cen array<double>"
        ).write.mode("overwrite").parquet(os.path.join(self.state_dir, "_init"))

    def bootstrap(self, spark: SparkSession) -> None:
        """Restart path: reload init centroids, re-aggregate every
        committed epoch's partials, recompute centroids."""
        init_rows = (
            spark.read.parquet(os.path.join(self.state_dir, "_init"))
            .orderBy("cen_id")
            .collect()
        )
        self._init = [[float(x) for x in r.cen] for r in init_rows]
        committed = self.state_sink.result(spark)
        self.sums, self.counts = {}, {}
        if "cen_id" in committed.columns:
            for r in (
                committed.groupBy("cen_id", "dim")
                .agg(F.sum("sum_fx").alias("s"), F.sum("n").alias("n"))
                .collect()
            ):
                dim = len(self._init[0])
                self.sums.setdefault(r.cen_id, [0] * dim)[r.dim] = r.s
                # n is per (cen_id, dim); every dim carries the same count
                self.counts[r.cen_id] = r.n
        self._recompute()

    def _recompute(self) -> None:
        cur = []
        for cid in range(self.k):
            n = self.counts.get(cid, 0)
            if n:
                mean = [(s / FX) / n for s in self.sums[cid]]
                cur.append(_normalize(mean))
            else:
                cur.append(list(self._init[cid]))
        self.centroids = cur

    # ------------------------------------------------------------ the sink

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        if self.centroids is None:
            raise ValueError("call initialize() (or bootstrap()) first")
        if self.state_sink.is_committed(epoch_id):
            return  # replay: neither state nor centroids advance
        stats = (
            kmeans_assign(batch_df, self.centroids)
            .select("cen_id", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cen_id", "dim")
            .agg(
                F.sum(_fx(F.col("v").cast("double"))).alias("sum_fx"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        # scope the shuffle width to the k×D result (the iterative-loop
        # width rule, CLAUDE.md): a vanilla 200-wide session would pay
        # 200 near-empty tasks per microbatch for a few-hundred-row agg
        spark = batch_df.sparkSession
        saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(2, min(32, self.k * len(self._init[0]) // 256 + 1))),
        )
        try:
            rows = stats.collect()  # k×D rows — bounded driver state
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
        self.state_sink.process_batch(
            batch_df.sparkSession.createDataFrame(
                rows, "cen_id int, dim int, sum_fx long, n long"
            ),
            epoch_id,
        )
        dim = len(self._init[0])
        for r in rows:
            self.sums.setdefault(r.cen_id, [0] * dim)[r.dim] += r.sum_fx
            if r.dim == 0:
                self.counts[r.cen_id] = self.counts.get(r.cen_id, 0) + r.n
        self._recompute()

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
