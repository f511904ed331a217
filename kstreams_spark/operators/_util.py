"""Shared helpers for oracle-checked operators.

Determinism-across-engines rules (see registry.py docstring): doubles that
get *aggregated* go through exact DECIMAL(38,6) arithmetic then back to
DOUBLE, because Spark and DuckDB sum floating point in different orders.
Raw column passthrough, IEEE-exact ops (mul of two doubles, sqrt, abs) and
integer math are bit-deterministic and need no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact sum of a double column: DECIMAL(38,6) accumulate, DOUBLE out.
# DuckDB oracle twin: CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)


def dsum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,6)")).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum / count, divided in double — deterministic in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


DSUM_SQL = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"
DAVG_SQL = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({x})"
