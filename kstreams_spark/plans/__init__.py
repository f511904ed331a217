from kstreams_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    join_strategies,
    physical_plan,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "join_strategies",
    "physical_plan",
    "pushed_filters",
    "read_schemas",
]
