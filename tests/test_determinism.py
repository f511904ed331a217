"""Partition-count invariance: SCALE.md claims results are reproducible
across partitionings (i.e., across cluster sizes) because float
aggregation goes through exact arithmetic. This pins it: the same query
at 3 vs 32 shuffle partitions must produce IDENTICAL values — which would
be false for raw float sums. Plus the gated-Avro behavior."""

from __future__ import annotations

import pytest

from kstreams_spark import registry

registry.load_all()

from tests.oracle_harness import canon_rows  # noqa: E402

PARTITION_SENSITIVE = [
    "agg_pricing_summary",  # decimal sums
    "similarity_topk_bruteforce",  # fixed-point dots + ranking
    "dedup_minhash_lsh",  # min-hash over shuffled shingles
    "window_running_sum",  # windowed decimal accumulation
]


@pytest.mark.parametrize("name", PARTITION_SENSITIVE)
def test_results_invariant_under_partitioning(spark, sf_dir, name):
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        few = canon_rows(registry.QUERIES[name](spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    many = canon_rows(registry.QUERIES[name](spark, sf_dir).toPandas())
    assert few == many, f"{name}: results depend on partition count"


def test_avro_gated_with_guidance(spark):
    from kstreams_spark.functions.avro_codec import avro_available, require_avro

    if avro_available():
        # functions import in-tree; the jar is what's missing — require_avro
        # must convert the runtime AnalysisException into guidance
        with pytest.raises(RuntimeError, match="spark-avro"):
            require_avro(spark.range(1))
    else:  # pragma: no cover - environment-dependent branch
        with pytest.raises(RuntimeError, match="spark-avro"):
            require_avro(spark.range(1))
