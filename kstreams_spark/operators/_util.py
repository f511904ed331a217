"""Shared helpers for oracle-checked operators.

Determinism-across-engines rules (see registry.py docstring): doubles that
get *aggregated* go through exact DECIMAL(18,6) arithmetic then back to
DOUBLE, because Spark and DuckDB sum floating point in different orders.
Raw column passthrough, IEEE-exact ops (mul of two doubles, sqrt, abs) and
integer math are bit-deterministic and need no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition a SMALL input that feeds a CPU-heavy per-row stage
    (shingling, hashing, array math). The fixture tables are single parquet
    files → one partition → one task; an upfront round-robin shuffle of the
    narrow input costs ~nothing and unlocks full-core parallelism. On a
    real cluster the scan is already split by file/rowgroup and this is a
    no-op decision — keep inputs over maxPartitionBytes instead."""
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(n)

# Exact sum of a double column: DECIMAL(18,6) accumulate, DOUBLE out.
# DuckDB oracle twin: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
#
# Precision 18 keeps Spark on the long-backed Decimal fast path (precision
# > 18 switches to Int128/BigDecimal arithmetic, ~3× slower per row); the
# sum's result type grows to DECIMAL(28,6) which holds ~1e22 — ample for
# 100 TB of money-scale values (fixture magnitudes ≤ 1e6/row, ~1e13 total).


def dsum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,6)")).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum / count, divided in double — deterministic in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


DSUM_SQL = "CAST(SUM(CAST({x} AS DECIMAL(18,6))) AS DOUBLE)"
DAVG_SQL = "CAST(SUM(CAST({x} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({x})"


def fence(df: DataFrame) -> DataFrame:
    """Optimizer fence (LOCAL-ONLY artifact, same class as spread):
    a lazy localCheckpoint that stops predicate pushdown, so a CPU-heavy
    gate filter evaluates AFTER spread()'s exchange (full-width) instead
    of being pushed into the fixture's unsplittable single-row-group
    parquet scan (1 task). Measured on the curation composites at sf0.1:
    the pushed Gopher-repetition gate ran 1-task at ~1.5 s; fenced it
    runs 32-wide. On a real lake the scan splits by file/rowgroup and
    scan-side gate evaluation is exactly what you want — a deployment
    deletes the fence and keeps the filter. Bonus locally: downstream
    iterative consumers (the CC loop's edge checkpoint) re-read the
    fenced rows instead of re-running the scan chain."""
    return df.localCheckpoint(eager=False)
