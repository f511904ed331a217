"""Accuracy contract for the unregistered approx-quantile path: the GK
sketch's rank error vs the exact percentile must stay within ~1/accuracy
of the group size (why it is not oracle-registered is documented at the
operator — merge results depend on partition layout for continuous
data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.subqueries import approx_quantiles


def test_rank_error_within_sketch_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r.l_returnflag: (r.q_5, r.q_9)
        for r in approx_quantiles(
            li, "l_extendedprice", ["l_returnflag"], [0.5, 0.9], accuracy=1000
        ).collect()
    }
    rows = {
        r.l_returnflag: (r.n, r.vals)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sort_array(F.collect_list("l_extendedprice")).alias("vals"),
        )
        .collect()
    }
    for flag, (n, vals) in rows.items():
        for p, got in zip((0.5, 0.9), approx[flag]):
            # rank of the returned value vs target rank, in fractions of n
            import bisect

            lo = bisect.bisect_left(vals, got) / n
            hi = bisect.bisect_right(vals, got) / n
            err = min(abs(lo - p), abs(hi - p))
            assert err <= 2.0 / 1000 + 1.0 / n, (flag, p, got, err)
