from kstreams_spark.streaming.dedup import StreamingMinhashIndex
from kstreams_spark.streaming.similarity import StreamingLshIndex
from kstreams_spark.streaming.topology import ReferenceTopology
from kstreams_spark.streaming.windows import (
    session_agg_stream,
    sliding_agg_stream,
    tumbling_agg_stream,
    watermarked_dedup_stream,
)

__all__ = [
    "ReferenceTopology",
    "StreamingLshIndex",
    "StreamingMinhashIndex",
    "session_agg_stream",
    "sliding_agg_stream",
    "tumbling_agg_stream",
    "watermarked_dedup_stream",
]
