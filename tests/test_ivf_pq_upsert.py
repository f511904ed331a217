"""Incremental IVF-PQ maintenance — proves the 'same seam' claim in
code: with codebooks and centroids frozen at base build, an index
maintained by upsert_ivf_pq_delta probes byte-equal ADC scores to one
rebuilt from scratch; compaction restores fresh-build form without
changing an answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import pq_codebooks
from kstreams_spark.serving import (
    compact_ivf_pq_index,
    probe_ivf_pq_index,
    upsert_ivf_pq_delta,
    write_ivf_pq_index,
)

SF = "/root/testdata/sf0.001"
K = 10


def _probe(spark, path, vec, cents, n_probe):
    return [
        (r.vec_id, r.score_q)
        for r in probe_ivf_pq_index(
            spark, path, vec, cents, k=K, n_probe=n_probe
        ).collect()
    ]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ivf_pq_inc")
    inc, rebuilt = str(root / "inc"), str(root / "rebuilt")
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 4 != 3)
    revised = base.filter(F.col("vec_id") % 9 == 0).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    delta = emb.filter(F.col("vec_id") % 4 == 3).unionByName(revised)
    current = emb.filter(
        (F.col("vec_id") % 4 == 3)
        | ((F.col("vec_id") % 4 != 3) & (F.col("vec_id") % 9 != 0))
    ).unionByName(revised)
    cents = [
        [float(x) for x in r.embedding]
        for r in base.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    cb = pq_codebooks(base)  # frozen: trained on the BASE corpus only
    write_ivf_pq_index(base, inc, cents, cb)
    upsert_ivf_pq_delta(delta, inc, epoch=1)
    write_ivf_pq_index(current, rebuilt, cents, cb)
    vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 3).first().embedding
    ]
    return spark, inc, rebuilt, cents, vec


@pytest.mark.parametrize("n_probe", [1, 3])
def test_upserted_probes_equal_rebuilt(idx, n_probe):
    spark, inc, rebuilt, cents, vec = idx
    got = _probe(spark, inc, vec, cents, n_probe)
    assert got == _probe(spark, rebuilt, vec, cents, n_probe)
    assert len(got) == K


def test_compaction_neutral_and_clean(idx):
    spark, inc, rebuilt, cents, vec = idx
    before = _probe(spark, inc, vec, cents, 3)
    assert compact_ivf_pq_index(spark, inc) > 0
    assert _probe(spark, inc, vec, cents, 3) == before
    raw = spark.read.parquet(inc + "/cells")
    assert raw.filter(F.col("codes").isNull()).count() == 0
    assert (
        raw.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
    )
    assert compact_ivf_pq_index(spark, inc) == 0
