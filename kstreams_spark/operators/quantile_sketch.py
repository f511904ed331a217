"""Mergeable quantile sketch (r15, VERDICT r14 task 5): the
deterministic log-bucket histogram that closes the sketch family's
quantile cell.

The family had addition (Count-Min) and register-max (HLL) but no
shuffle-safe quantile: Greenwald-Khanna `percentile_approx` is BANNED
from the registry because its merge is partition-layout-dependent on
continuous data (operators/subqueries.py::approx_quantiles measured
three layouts giving three medians — the drift-gate failure class).

This sketch has the Count-Min property instead: the bucket of a value
is a PURE PER-ROW FUNCTION and cells merge by ADDITION, so any
partitioning, epoch split, or replay yields bit-identical state.
Geometry is the HDR-histogram / DDSketch shape restricted to integer
arithmetic both engines evaluate identically (no floating log):

    e      = floor(log2 v)   = length(bin(v)) - 1        (v >= 1)
    shift  = max(0, e - S_BITS)
    bucket = (v >> shift) << shift                       (lower bound)

With S_BITS sub-bucket bits per octave the relative error of answering
a quantile with the bucket's LOWER BOUND is < 2^-S_BITS (6.25% at 4) —
every value in a bucket is within [lb, lb·(1+2^-S_BITS)). Quantile
readout is a cumulative walk: est_q = min lb whose running count
reaches ceil(q·n). All integers end to end — the DuckDB oracle replays
bucket assignment (printf('%b', v) is its bin()), the walk, and the
estimates hash-exactly, which GK could never do.

Reference: DDSketch (Masson et al., VLDB 2019) / HdrHistogram (Gray)
— both public; the reference engine's growth path is the KS 2.0
aggregation surface (BME680.java:41-44), where a quantile store is the
standard metrics need.

Shuffle budget: one map pass (bucket per row) + one groupBy(group,
bucket) with map-side combine + a tiny per-group window over O(64·2^S)
buckets. The sketch state per group is ≤ 64·2^S_BITS cells regardless
of N — the reason it exists at 100 TB. Streaming twin:
streaming/sketches.py::StreamingQuantileHistogram (cells are counts →
epoch partials + read-time SUM, the StreamingCountMin contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query

S_BITS = 4  # sub-bucket bits per octave: rel. error < 1/16

# the bucket lower bound of a non-negative bigint column, as one SQL
# expression string (shared verbatim by the batch operator, the
# streaming twin, and — printf('%b') for bin() — the DuckDB oracle)
_LB_SQL = (
    "shiftleft(shiftright({v}, greatest(0, length(bin({v})) - 1 - "
    f"{S_BITS})), greatest(0, length(bin({{v}})) - 1 - {S_BITS}))"
)


def bucket_lb(col_sql: str):
    """Spark Column: the histogram bucket (lower bound) of `col_sql`,
    a non-negative BIGINT SQL expression."""
    return F.expr(_LB_SQL.format(v=col_sql))


def quantile_histogram(
    df: DataFrame, value_sql: str, group_cols: list[str]
) -> DataFrame:
    """The sketch itself: per (group, bucket) counts. Deterministic,
    mergeable by addition — union N partials and re-aggregate to merge."""
    return (
        df.withColumn("_lb", bucket_lb(value_sql))
        .groupBy(*group_cols, "_lb")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def estimate_quantiles(
    hist: DataFrame, group_cols: list[str], probs: list[float]
) -> DataFrame:
    """Readout: est_q = the smallest bucket lower bound whose running
    count reaches ceil(q·n). Window is per-group over the BUCKET table
    (≤ 64·2^S_BITS rows per group — never over the data)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("_lb")
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_n", F.sum("_cnt").over(Window.partitionBy(*group_cols))
    )
    aggs = [
        F.min(
            F.when(
                F.col("_cum") >= F.ceil(F.lit(p) * F.col("_n")),
                F.col("_lb"),
            )
        ).alias(f"est_p{int(p * 100)}")
        for p in probs
    ]
    return cum.groupBy(*group_cols).agg(
        F.max("_n").alias("n_values"), *aggs
    )


@query(
    "sketch_quantile_histogram",
    oracle=f"""
    WITH vals AS (
      SELECT l_returnflag AS grp,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS v
      FROM lineitem
    ),
    b AS (
      SELECT grp, v,
             (v >> greatest(0, length(printf('%b', v)) - 1 - {S_BITS}))
              << greatest(0, length(printf('%b', v)) - 1 - {S_BITS}) AS lb
      FROM vals
    ),
    hist AS (SELECT grp, lb, COUNT(*) AS cnt FROM b GROUP BY grp, lb),
    cum AS (
      SELECT grp, lb, cnt,
             SUM(cnt) OVER (PARTITION BY grp ORDER BY lb) AS c,
             SUM(cnt) OVER (PARTITION BY grp) AS n
      FROM hist
    ),
    est AS (
      SELECT grp,
             MAX(n)::BIGINT AS n_values,
             MIN(CASE WHEN c >= CEIL(0.5 * n) THEN lb END)::BIGINT
               AS est_p50,
             MIN(CASE WHEN c >= CEIL(0.9 * n) THEN lb END)::BIGINT
               AS est_p90,
             MIN(CASE WHEN c >= CEIL(0.99 * n) THEN lb END)::BIGINT
               AS est_p99,
             COUNT(*)::BIGINT AS n_buckets
      FROM cum GROUP BY grp
    ),
    exact AS (  -- the audit columns: integer-rank exact percentiles
                -- (the VALUE at rank ceil(q*n) is tie-order-invariant:
                -- it is a pure function of the sorted multiset)
      SELECT grp,
             MAX(CASE WHEN r = CEIL(0.5 * n) THEN v END)::BIGINT
               AS exact_p50,
             MAX(CASE WHEN r = CEIL(0.9 * n) THEN v END)::BIGINT
               AS exact_p90,
             MAX(CASE WHEN r = CEIL(0.99 * n) THEN v END)::BIGINT
               AS exact_p99
      FROM (
        SELECT grp, v,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS r,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM vals
      ) ranked
      GROUP BY grp
    )
    SELECT e.grp AS l_returnflag, e.n_values, e.est_p50, e.est_p90,
           e.est_p99, e.n_buckets,
           x.exact_p50, x.exact_p90, x.exact_p99
    FROM est e JOIN exact x ON x.grp = e.grp
    """,
)
def sketch_quantile_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The quantile sketch end-to-end under the driver's value hash
    (module docstring): per-l_returnflag log-bucket histogram over
    floor(l_extendedprice), p50/p90/p99 estimates from the cumulative
    bucket walk, and EXACT integer-rank percentiles (rank ceil(q·n) of
    the sorted values — pure integers, no interpolation) as audit
    columns riding the same result so the ≤ 1/16 relative-error
    guarantee is value-visible per group. A bucket function that
    drifts, a wrong walk, or a merge that double-counts moves the
    hash; the estimate/exact spread is asserted ≤ 2^-S_BITS in
    tests/test_quantile_sketch.py, along with the addition merge law
    the GK sketch lacks."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.expr("CAST(FLOOR(l_extendedprice) AS BIGINT)").alias("v"),
    )
    # r15 (guide §2.4/§5): `hist` feeds the estimate walk AND the
    # n_buckets agg — cut lineage on the bucket-grain table (≤ groups ×
    # 64 rows) so the lineitem scan + histogram agg run once, not per
    # branch.
    hist = quantile_histogram(li, "v", ["l_returnflag"]).localCheckpoint(
        eager=False
    )
    est = estimate_quantiles(hist, ["l_returnflag"], [0.5, 0.9, 0.99])
    n_buckets = hist.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_buckets")
    )
    # exact integer-rank percentiles: two-phase (rank window per group
    # is the repo's standard exact-percentile shape; ties broken by a
    # stable secondary order so both engines rank identically)
    from pyspark.sql import Window

    wv = Window.partitionBy("l_returnflag").orderBy("v")
    ranked = li.withColumn("r", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("l_returnflag"))
    )
    exact = ranked.groupBy("l_returnflag").agg(
        *[
            F.max(
                F.when(
                    F.col("r") == F.ceil(F.lit(p) * F.col("n")),
                    F.col("v"),
                )
            ).alias(f"exact_p{int(p * 100)}")
            for p in [0.5, 0.9, 0.99]
        ]
    )
    return (
        est.join(n_buckets, "l_returnflag")
        .join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "n_values",
            "est_p50",
            "est_p90",
            "est_p99",
            "n_buckets",
            "exact_p50",
            "exact_p90",
            "exact_p99",
        )
    )
