"""StreamingIvfPqMaintainer (VERDICT r9 task 3 — closes the streaming
ingest matrix): stream-built PQ probes byte-equal ADC scores vs a batch
build with the same frozen codebook/centroids; committed-epoch replays
are literal no-ops; compaction never changes an answer."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import pq_codebooks
from kstreams_spark.serving import probe_ivf_pq_index, write_ivf_pq_index
from kstreams_spark.streaming.postings import StreamingIvfPqMaintainer

SF = "/root/testdata/sf0.001"
K = 10


def _rows(df):
    return [(r.vec_id, r.score_q) for r in df.collect()]


def _batches(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 3 == 0)
    b0 = emb.filter(F.col("vec_id") % 3 == 1)
    b1 = emb.filter(F.col("vec_id") % 3 == 2).unionByName(
        base.filter(F.col("vec_id") % 7 == 0).select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        )
    )
    current = emb.filter(
        ~((F.col("vec_id") % 3 == 0) & (F.col("vec_id") % 7 == 0))
    ).unionByName(
        base.filter(F.col("vec_id") % 7 == 0).select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        )
    )
    return base, b0, b1, current


@pytest.fixture(scope="module")
def maintained(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_pq")
    inc, rebuilt = str(root / "inc"), str(root / "rebuilt")
    base, b0, b1, current = _batches(spark)
    cents = [
        [float(x) for x in r.embedding]
        for r in base.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    cb = pq_codebooks(base)  # frozen: trained on the BASE corpus only
    m = StreamingIvfPqMaintainer(inc)
    m.bootstrap(base, cents, cb)
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    write_ivf_pq_index(current, rebuilt, cents, cb)
    vec = [
        float(x)
        for x in load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 3)
        .first()
        .embedding
    ]
    return m, rebuilt, cents, vec


def test_stream_probe_equals_batch_built(spark, maintained):
    m, rebuilt, cents, vec = maintained
    got = _rows(m.probe(spark, vec, k=K, n_probe=3))
    want = _rows(
        probe_ivf_pq_index(spark, rebuilt, vec, cents, k=K, n_probe=3)
    )
    assert got == want and len(got) == K


def test_replay_is_noop_and_compaction_neutral(spark, maintained):
    m, _, _, vec = maintained
    _, b0, _, _ = _batches(spark)
    want = _rows(m.probe(spark, vec, k=K, n_probe=3))
    files_before = sorted(
        glob.glob(os.path.join(m.index_dir, "**", "*"), recursive=True)
    )
    m.process_batch(b0, 0)  # committed replay: zero writes
    assert (
        sorted(glob.glob(os.path.join(m.index_dir, "**", "*"), recursive=True))
        == files_before
    )
    assert m.compact(spark) > 0
    assert _rows(m.probe(spark, vec, k=K, n_probe=3)) == want
    assert m.is_committed(0) and m.is_committed(1)
