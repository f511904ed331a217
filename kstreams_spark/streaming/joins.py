"""Stream-stream windowed join (SURVEY.md §2.2: KStream⋈KStream with
JoinWindows.of(d)) — the Spark form: watermarks on BOTH sides plus a
time-range join condition. State for each side is bounded by its watermark
+ the join window; Spark drops buffered rows once they can no longer
match — the declarative equivalent of Kafka Streams' window retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Join right-side events occurring within [left_ts - window, left_ts].

    Mirrors JoinWindows.of(window).before() semantics: for each left
    record, matching right records are those of the same key in the
    trailing window. Both sides MUST be watermarked for state cleanup
    (and for outer joins to emit nulls at all).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[f"r_{key}"])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {window}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, join_type)
