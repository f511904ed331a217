"""Local replica of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet, compare row count + column
names + order-insensitive values EXACTLY (the driver hashes values, so any
difference fails; our operators are engineered for cross-engine bit
determinism — see registry.py docstring)."""

from __future__ import annotations

import math
from datetime import date, datetime
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession


def _canon_cell(v: Any) -> Any:
    # Numeric cells are tagged by dtype CLASS ("i"/"f") so an integer-typed
    # Spark column never matches a float-typed oracle column even when the
    # values coincide (Python's 1992 == 1992.0 would otherwise pass). The
    # grading driver hashes values after engine-side serialization, where
    # bigint 1992 and float64 1992.0 differ — this keeps the replica
    # STRICTLY at-least-as-strict (round-6 red row composite_curation_budget
    # was exactly an uncast DuckDB HUGEINT sum surfacing as float64).
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, rows as canonical tuples, sorted."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def run_pair(
    spark: SparkSession,
    duck: duckdb.DuckDBPyConnection,
    query_fn,
    oracle: str,
    sf_dir: str,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    sdf = query_fn(spark, sf_dir).toPandas()
    odf = duck.execute(oracle).fetchdf()
    return sdf, odf


def assert_parity(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}"
    srows, orows = canon_rows(sdf), canon_rows(odf)
    n_bad = 0
    first_bad = None
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            n_bad += 1
            if first_bad is None:
                first_bad = (i, a, b)
    assert n_bad == 0, (
        f"{name}: {n_bad}/{len(srows)} differing rows; first at {first_bad[0]}:\n"
        f"  spark : {first_bad[1]}\n  oracle: {first_bad[2]}"
    )
