"""Operator modules — importing this package registers every query with
kstreams_spark.registry (QUERIES / ORACLES)."""

from kstreams_spark.operators import (  # noqa: F401
    aggregate,
    avro_ops,
    cdc_text,
    analytics_extras,
    composite,
    core,
    decontam,
    dedup,
    event_windows,
    joins,
    json_funcs,
    kmeans,
    multimodal,
    paragraphs,
    sampling,
    scalar_extras,
    scalars,
    similarity,
    skew,
    sort_set,
    subqueries,
    text,
    udf_surface,
    window_funcs,
)
