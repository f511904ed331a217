"""Operator modules — importing this package registers every query with
kstreams_spark.registry (QUERIES / ORACLES)."""

from kstreams_spark.operators import (  # noqa: F401
    aggregate,
    core,
    joins,
    scalars,
    sort_set,
    window_funcs,
)
