from kstreams_spark.streaming.topology import ReferenceTopology
from kstreams_spark.streaming.windows import (
    session_agg_stream,
    sliding_agg_stream,
    tumbling_agg_stream,
    watermarked_dedup_stream,
)

__all__ = [
    "ReferenceTopology",
    "session_agg_stream",
    "sliding_agg_stream",
    "tumbling_agg_stream",
    "watermarked_dedup_stream",
]
