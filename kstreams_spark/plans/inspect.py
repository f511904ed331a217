"""Physical-plan inspection — the feedback loop for the 100 TB design goal.

The reference executes its topology verbatim with zero plan rewrites
(SURVEY.md §4.1); this engine leans on Catalyst, and these helpers make
the resulting plans ASSERTABLE: tests pin that filters reach the parquet
scan (PushedFilters), projections prune columns (ReadSchema), dimension
joins broadcast, aggregations are partial+final, and top-k never sorts
globally (TakeOrderedAndProject). A plan regression fails CI rather than
surfacing as a 100× slowdown on the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain(...) as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def physical_plan(df: DataFrame) -> str:
    return explain_str(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the formatted plan."""
    text = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for every file scan (column pruning check)."""
    text = explain_str(df, "formatted")
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", text)]


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin / SortMergeJoin /
    ShuffledHashJoin / BroadcastNestedLoopJoin / CartesianProduct)."""
    text = physical_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        text,
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (hash/range/single partitioning),
    EXCLUDING BroadcastExchange — the metric to minimize at scale."""
    text = physical_plan(df)
    return len(
        re.findall(
            r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)",
            text,
        )
    )
