"""Z-order (Morton-curve) data layout — multi-dimensional data skipping.

A 100 TB fact table is usually filtered on MORE than its sort key: sort
lineitem by l_orderkey and a predicate on l_partkey reads every file,
because each file's parquet (min, max) stats for the non-leading column
span the whole domain. Interleaving the bits of the two keys (the Morton
/ Z-curve, the same layout Delta Lake's OPTIMIZE ZORDER BY and
Databricks' liquid clustering build on) makes file locality
two-dimensional: consecutive z-values are close in BOTH dims, so a
range-partitioned, z-sorted write gives every file a narrow (min, max)
box on EACH key and parquet footer stats prune files for predicates on
EITHER — no index structure, just ordering.

All arithmetic is integer (shifts/masks after an integer grid
normalization), so the z-value itself is oracle-checkable:
`layout_zorder_locality` registers the per-bucket bounding boxes and the
DuckDB twin replays them, proving the curve computation engine-portable.
The physical payoff (files actually skipped) can't be expressed in SQL —
`tests/test_zorder.py` writes the same rows z-ordered and linearly
sorted and counts which files a one-dim predicate must touch via the
parquet footers (pyarrow), pinning z-order's skip rate strictly better.

Reference parity note: the reference app (BME680.java) has no storage
layout surface; this is SCALE.md posture made executable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query

Z_BITS = 16  # per-dim grid resolution; z fits in 2*Z_BITS = 32 bits
Z_GRID = 1 << Z_BITS
# locality report: top 10 z-bits → ≤1024 buckets regardless of row count
ZB_SHIFT = 2 * Z_BITS - 10


def grid_norm(v: Column, mn: Column, mx: Column, bits: int = Z_BITS) -> Column:
    """Map an integer key with corpus range [mn, mx] onto the 2^bits
    grid: (v - mn) * 2^bits // (mx - mn + 1). Floor division via double
    arithmetic is exact here (same argument as packing._fdiv): numerator
    ≤ range·2^16 ≈ 2^39 for real keys, so quotient·divisor ≪ 2^52 and
    the correctly-rounded IEEE divide can't cross an integer — matches
    DuckDB's native integer `//` bit-for-bit."""
    num = ((v - mn) * Z_GRID).cast("long")
    den = (mx - mn + F.lit(1)).cast("long")
    return F.floor(num.cast("double") / den.cast("double")).cast("long")


def zorder_expr(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two grid coordinates already in [0, 2^bits):
    bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1. A static sum of
    2·bits shift/mask terms — whole-stage codegen, no UDF, no shuffle."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i)).cast("long")
        )
        terms.append(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1)).cast("long")
        )
    return reduce(lambda x, y: x + y, terms)


def _zorder_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """The DuckDB twin of zorder_expr over grid columns `a`, `b`."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def with_zvalue(
    df: DataFrame, col_a: str, col_b: str, bits: int = Z_BITS
) -> DataFrame:
    """Attach `z`: grid-normalize both integer keys against their
    corpus min/max (one tiny agg, broadcast back as a 1-row cross join —
    the same shape every quantizer in this repo uses), then Morton-
    interleave. Scan-shaped; the only non-map step is the 1-row bounds
    aggregate."""
    bounds = df.agg(
        F.min(col_a).cast("long").alias("_mna"),
        F.max(col_a).cast("long").alias("_mxa"),
        F.min(col_b).cast("long").alias("_mnb"),
        F.max(col_b).cast("long").alias("_mxb"),
    )
    ga = grid_norm(
        F.col(col_a).cast("long"), F.col("_mna"), F.col("_mxa"), bits
    )
    gb = grid_norm(
        F.col(col_b).cast("long"), F.col("_mnb"), F.col("_mxb"), bits
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("z", zorder_expr(ga, gb, bits))
        .drop("_mna", "_mxa", "_mnb", "_mxb")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = Z_BITS,
) -> None:
    """Publish `df` Z-ORDERED on (col_a, col_b): range-partition by the
    z-value into `n_files` tasks and z-sort within each, so every output
    file covers one contiguous z-range — a narrow bounding box in BOTH
    keys, which parquet footer (min, max) stats expose to any engine's
    scan pruning. The write costs ONE range-exchange (same as any sorted
    write); reads on either key skip files forever after — at 100 TB
    that trade is the whole game. The z column is dropped from the
    stored schema (it's layout, not data)."""
    with_zvalue(df, col_a, col_b, bits).repartitionByRange(
        n_files, "z"
    ).sortWithinPartitions("z").drop("z").write.mode("overwrite").parquet(
        path
    )


@query(
    "layout_zorder_locality",
    oracle=f"""
    WITH src AS (
      SELECT l_orderkey AS a, l_partkey AS b FROM lineitem
    ),
    bounds AS (
      SELECT MIN(a)::BIGINT AS mna, MAX(a)::BIGINT AS mxa,
             MIN(b)::BIGINT AS mnb, MAX(b)::BIGINT AS mxb
      FROM src
    ),
    grid AS (
      SELECT a, b,
             ((a - mna) * {Z_GRID}) // (mxa - mna + 1) AS ga,
             ((b - mnb) * {Z_GRID}) // (mxb - mnb + 1) AS gb
      FROM src, bounds
    ),
    z AS (
      SELECT a, b, ({_zorder_sql("ga", "gb")})::BIGINT AS z FROM grid
    )
    SELECT (z >> {ZB_SHIFT})::BIGINT AS zb,
           COUNT(*) AS n,
           MIN(a) AS a_lo, MAX(a) AS a_hi,
           MIN(b) AS b_lo, MAX(b) AS b_hi
    FROM z GROUP BY 1
    """,
)
def layout_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-curve's locality made value-visible (and oracle-checked):
    bucket lineitem by the top 10 z-bits of (l_orderkey, l_partkey) and
    report each bucket's bounding box. Every bucket's (a_hi - a_lo) and
    (b_hi - b_lo) spans are ~2^5/2^16 of the key domains — the property
    the z-ordered writer turns into parquet-stat file skipping
    (physical test: tests/test_zorder.py). One scan + one 1-row bounds
    agg + one ≤1024-group aggregation."""
    src = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("a"), F.col("l_partkey").alias("b")
    )
    z = with_zvalue(src, "a", "b")
    return z.groupBy(
        F.shiftright(F.col("z"), ZB_SHIFT).cast("long").alias("zb")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("a").alias("a_lo"),
        F.max("a").alias("a_hi"),
        F.min("b").alias("b_lo"),
        F.max("b").alias("b_hi"),
    )
