"""Streaming sketch maintenance — the continuous-aggregate pattern
(streaming/rollup.py) applied to the two registry-admissible sketch
families, completing the merge-law square the repo's invariants draw:

- Count-Min (StreamingCountMin): cells are COUNTS, merge = ADDITION —
  exactly associative/commutative, so epoch-keyed append-only partials
  (≤ d·w rows per epoch) + a read-time SUM serve the corpus sketch with
  no replay/order hazard by construction. Batch twin:
  operators/analytics_extras.py::sketch_countmin_tokens (same md5
  bucketing, same d×w grid).
- HLL distinct (StreamingHllDistinct): registers merge by MAX (Spark's
  datasketches hll_union_agg), also order/partition invariant. Batch
  twin: the same hll_sketch_agg over the un-split input — union of
  per-epoch sketches equals the sketch of the union, pinned in
  tests/test_streaming_sketches.py.

(The banned third family — GK quantiles — has no such merge law, which
is exactly why it stays out of the registry; see CLAUDE.md.)

At 100 TB: sketch state is O(d·w) / O(2^lgK) per key REGARDLESS of
stream length — the reason to maintain a sketch instead of the exact
groupBy whose hash table grows with the vocabulary; old epochs compact
via ExactlyOnceParquetSink.compact().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.operators.analytics_extras import CMS_D, CMS_W
from kstreams_spark.streaming.exactly_once import ExactlyOnceParquetSink


def _cms_bucket(r, tok):
    """The batch operator's md5 bucket, verbatim — one definition in
    spirit; kept expression-identical so stream/batch cells can't drift."""
    h = F.md5(F.concat(r.cast("string"), F.lit(":"), tok))
    return (
        F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
    ) % CMS_W


class StreamingCountMin:
    """foreachBatch maintainer: documents stream → epoch-keyed CMS cell
    partials in `out_dir`; `sketch()` serves the merged d×w grid and
    `estimates()` probes it."""

    def __init__(self, out_dir: str) -> None:
        self.sink = ExactlyOnceParquetSink(out_dir)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.sink.is_committed(epoch_id):
            return
        toks = batch_df.select(
            F.explode(F.split("text", " ")).alias("tok")
        )
        rows = batch_df.sparkSession.range(CMS_D).select(
            F.col("id").cast("int").alias("r")
        )
        cells = toks.crossJoin(F.broadcast(rows)).select(
            "r", _cms_bucket(F.col("r"), F.col("tok")).alias("bucket")
        )
        partial = cells.groupBy("r", "bucket").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        self.sink.process_batch(partial, epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def sketch(self, spark: SparkSession) -> DataFrame:
        """The merged (r, bucket, cnt) grid — SUM over epoch partials."""
        parts = self.sink.result(spark)
        if "r" not in parts.columns:
            return parts
        return parts.groupBy("r", "bucket").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )

    def estimates(self, spark: SparkSession, tokens: list[str]) -> DataFrame:
        """(tok, est) for the given tokens: est = min over the d rows of
        the merged cell counts — the same probe shape as the batch
        operator's, against the incrementally-maintained grid."""
        sk = self.sketch(spark)
        toks = spark.createDataFrame([(t,) for t in tokens], "tok string")
        rows = spark.range(CMS_D).select(F.col("id").cast("int").alias("r"))
        probe = (
            toks.crossJoin(F.broadcast(rows))
            .withColumn("bucket", _cms_bucket(F.col("r"), F.col("tok")))
            .join(F.broadcast(sk), ["r", "bucket"], "left")
            .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        )
        return probe.groupBy("tok").agg(
            F.min("cnt").cast("long").alias("est")
        )


class StreamingHllDistinct:
    """foreachBatch maintainer of per-(event_type, day) DISTINCT-user
    estimates: each epoch appends one HLL sketch per touched key
    (hll_sketch_agg binary), `counts()` serves hll_union_agg →
    hll_sketch_estimate over all epochs. Union-of-sketches =
    sketch-of-union (register max), so any microbatch split serves the
    same estimate as the batch twin."""

    def __init__(self, out_dir: str) -> None:
        self.sink = ExactlyOnceParquetSink(out_dir)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.sink.is_committed(epoch_id):
            return
        partial = (
            batch_df.select(
                "event_type",
                F.date_trunc("day", "ts").alias("day"),
                "user_id",
            )
            .groupBy("event_type", "day")
            .agg(F.hll_sketch_agg("user_id").alias("hll"))
        )
        self.sink.process_batch(partial, epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def counts(self, spark: SparkSession) -> DataFrame:
        parts = self.sink.result(spark)
        if "event_type" not in parts.columns:
            return parts
        return parts.groupBy("event_type", "day").agg(
            F.hll_sketch_estimate(F.hll_union_agg("hll"))
            .cast("long")
            .alias("n_users_est")
        )


class StreamingQuantileHistogram:
    """foreachBatch maintainer of the r15 quantile sketch
    (operators/quantile_sketch.py — the deterministic log-bucket
    histogram that closes the quantile cell GK's layout-dependent
    merge kept out of the registry): each epoch appends per-(group,
    bucket) COUNT partials, so the merge law is ADDITION — exactly the
    StreamingCountMin contract, and therefore replay/order/partition
    invariant by construction. `histogram()` serves the merged cells;
    `quantiles()` runs the cumulative-walk readout against them."""

    def __init__(self, out_dir: str, value_sql: str, group_cols: list[str]) -> None:
        self.sink = ExactlyOnceParquetSink(out_dir)
        self.value_sql = value_sql
        self.group_cols = list(group_cols)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.sink.is_committed(epoch_id):
            return
        from kstreams_spark.operators.quantile_sketch import (
            quantile_histogram,
        )

        partial = quantile_histogram(
            batch_df, self.value_sql, self.group_cols
        )
        self.sink.process_batch(partial, epoch_id)

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def histogram(self, spark: SparkSession) -> DataFrame:
        parts = self.sink.result(spark)
        if "_lb" not in parts.columns:
            return parts
        return parts.groupBy(*self.group_cols, "_lb").agg(
            F.sum("_cnt").cast("long").alias("_cnt")
        )

    def quantiles(self, spark: SparkSession, probs: list[float]) -> DataFrame:
        from kstreams_spark.operators.quantile_sketch import (
            estimate_quantiles,
        )

        return estimate_quantiles(
            self.histogram(spark), self.group_cols, probs
        )
