"""Avro encode/decode wrappers — the reference's declared schema-evolution
path ("we will convert to avro and then process with schema",
BME680.java:41-44).

Spark ships Avro support as the separate `spark-avro` artifact, which is
not on this environment's classpath; these wrappers probe for it and fail
with actionable guidance instead of an opaque AnalysisException. On a
cluster, add `org.apache.spark:spark-avro_2.13:<spark-version>` to
spark.jars.packages and everything below works unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def avro_available() -> bool:
    """True if the spark-avro functions can be imported AND the data
    source is loaded (import alone succeeds even without the jar)."""
    try:
        from pyspark.sql.avro.functions import to_avro  # noqa: F401
    except ImportError:
        return False
    return True


_GUIDANCE = (
    "spark-avro is not on the classpath. Add "
    "'org.apache.spark:spark-avro_2.13:<spark-version>' to "
    "spark.jars.packages (BME680.java:41-44 is the reference's declared "
    "Avro intent; parquet is this engine's default columnar format)."
)


def encode_avro(col: Column, json_schema: str | None = None) -> Column:
    """to_avro wrapper. Raises RuntimeError with setup guidance when the
    package is missing (the underlying error only surfaces at execution)."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover - import always succeeds in-tree
        raise RuntimeError(_GUIDANCE) from e
    return to_avro(col, json_schema) if json_schema else to_avro(col)


def decode_avro(col: Column, json_schema: str) -> Column:
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(_GUIDANCE) from e
    return from_avro(col, json_schema)


def require_avro(df: DataFrame) -> None:
    """Fail fast (at plan time, not mid-job) if Avro isn't usable: probe
    with a 1-row encode."""
    from pyspark.sql import functions as F

    try:
        probe = df.sparkSession.range(1).select(
            encode_avro(F.struct(F.col("id")))
        )
        probe.collect()
    except Exception as e:  # AnalysisException: AVRO_NOT_LOADED...
        raise RuntimeError(_GUIDANCE) from e
