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
    before: str | None = None,
    after: str | None = None,
) -> DataFrame:
    """KStream⋈KStream windowed join with Kafka Streams' JoinWindows
    geometry (r15, VERDICT r14 task 3 — the default was trailing-only
    before, which silently diverged from `JoinWindows.of(d)`):

    - default: match right rows with `right_ts` in
      [left_ts - window, left_ts + window] — the SYMMETRIC ±d band
      `JoinWindows.of(d)` means;
    - `before=` / `after=` override each bound independently —
      `JoinWindows.of(d).before(b)` is `before=b` (band
      [ts − b, ts + d]), `.after(a)` is `after=a`; the old trailing
      form is `after="0 seconds"`.

    The band is part of the JOIN CONDITION (Structured Streaming
    requires the time constraint inside an outer join's condition to
    emit null-extended rows, and it is what bounds each side's state).
    Both sides MUST be watermarked for state cleanup — state per side
    is watermark + its reach into the other (KS's window retention).
    """
    before = window if before is None else before
    after = window if after is None else after
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[f"r_{key}"])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {before}"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {after}"))
    )
    return lw.join(rw, cond, join_type)
