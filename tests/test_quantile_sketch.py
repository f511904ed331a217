"""r15 quantile sketch (operators/quantile_sketch.py +
streaming/sketches.py::StreamingQuantileHistogram): the deterministic
log-bucket histogram whose merge is ADDITION — the property GK
percentile_approx lacks (its layout-dependent merges keep it out of
the registry; this suite is the evidence the replacement has the
Count-Min contract instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantile_sketch import (
    S_BITS,
    bucket_lb,
    estimate_quantiles,
    quantile_histogram,
)
from kstreams_spark.streaming.sketches import StreamingQuantileHistogram

SF = "/root/testdata/sf0.001"


def _vals(spark):
    return load_table(spark, SF, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(FLOOR(l_extendedprice) AS BIGINT)").alias("v"),
    )


def test_bucket_function_golden(spark):
    """The bucket is a pure per-row integer function: lb = the value
    with everything below the top S_BITS+1 significant bits cleared."""
    df = spark.createDataFrame(
        [(0,), (1,), (31,), (32,), (37,), (1024,), (999999,)], "v long"
    )
    got = {r.v: r.lb for r in df.select("v", bucket_lb("v").alias("lb")).collect()}
    assert got == {0: 0, 1: 1, 31: 31, 32: 32, 37: 36, 1024: 1024,
                   999999: 983040}
    # every value sits in [lb, lb * (1 + 2^-S_BITS)) for v >= 2^S_BITS
    for v, lb in got.items():
        assert lb <= v
        if v >= (1 << S_BITS):
            assert v < lb * (1 + 2 ** -S_BITS)


def test_merge_is_addition_any_split(spark):
    """Union N partials + re-aggregate == one-shot histogram, for an
    arbitrary 3-way split — the GK counterexample cannot pass this."""
    vals = _vals(spark)
    whole = {
        (r.l_returnflag, r._lb): r._cnt
        for r in quantile_histogram(vals, "v", ["l_returnflag"]).collect()
    }
    parts = [
        quantile_histogram(
            vals.filter(F.col("v") % 3 == i), "v", ["l_returnflag"]
        )
        for i in range(3)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = {
        (r.l_returnflag, r._lb): r._cnt
        for r in u.groupBy("l_returnflag", "_lb")
        .agg(F.sum("_cnt").alias("_cnt"))
        .collect()
    }
    assert merged == whole


def test_estimates_within_relative_error(spark):
    """est_q is the bucket lower bound: exact_q in [est, est*(1+1/16))
    per group and probability — the sketch's accuracy contract."""
    vals = _vals(spark)
    hist = quantile_histogram(vals, "v", ["l_returnflag"])
    est = {
        r.l_returnflag: (r.est_p50, r.est_p90, r.est_p99)
        for r in estimate_quantiles(
            hist, ["l_returnflag"], [0.5, 0.9, 0.99]
        ).collect()
    }
    # exact integer-rank percentiles, independently via sorted collect
    rows = vals.collect()
    import math
    from collections import defaultdict

    by_g = defaultdict(list)
    for r in rows:
        by_g[r.l_returnflag].append(r.v)
    for g, vs in by_g.items():
        vs.sort()
        for i, p in enumerate([0.5, 0.9, 0.99]):
            exact = vs[math.ceil(p * len(vs)) - 1]
            e = est[g][i]
            assert e <= exact < e * (1 + 2 ** -S_BITS), (g, p, e, exact)


def test_streaming_twin_split_matches_batch(spark, tmp_path):
    """Three epochs + merged read == the one-shot histogram bitwise,
    a replayed epoch is a no-op, and the readout against the
    incrementally-built state equals the batch readout."""
    vals = _vals(spark)
    sq = StreamingQuantileHistogram(
        str(tmp_path / "qh"), "v", ["l_returnflag"]
    )
    for i in range(3):
        sq.process_batch(vals.filter(F.col("v") % 3 == i), i)
    sq.process_batch(vals.filter(F.col("v") % 3 == 0), 0)  # replay: no-op
    got = {
        (r.l_returnflag, r._lb): r._cnt
        for r in sq.histogram(spark).collect()
    }
    whole = {
        (r.l_returnflag, r._lb): r._cnt
        for r in quantile_histogram(vals, "v", ["l_returnflag"]).collect()
    }
    assert got == whole
    sq_est = sorted(
        tuple(r) for r in sq.quantiles(spark, [0.5, 0.9, 0.99]).collect()
    )
    batch_est = sorted(
        tuple(r)
        for r in estimate_quantiles(
            quantile_histogram(vals, "v", ["l_returnflag"]),
            ["l_returnflag"],
            [0.5, 0.9, 0.99],
        ).collect()
    )
    assert sq_est == batch_est


def test_width_invariance_the_gk_killer(spark):
    """The drift-gate class that banned GK: re-partitioning the input
    must not move a single estimate. 1, 7, and 32 partitions give
    bit-identical readouts."""
    vals = _vals(spark)
    outs = []
    for n in (1, 7, 32):
        hist = quantile_histogram(
            vals.repartition(n), "v", ["l_returnflag"]
        )
        outs.append(
            sorted(
                tuple(r)
                for r in estimate_quantiles(
                    hist, ["l_returnflag"], [0.5, 0.9, 0.99]
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
