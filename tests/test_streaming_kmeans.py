"""Streaming mini-batch k-means (streaming/kmeans.py): one whole-corpus
batch equals one Lloyd round, planted clusters are recovered across
interleaved batches, replay cannot double-count, and bootstrap rebuilds
the driver cache from committed state."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kstreams_spark.io import load_table
from kstreams_spark.operators.kmeans import kmeans_assign, kmeans_fit
from kstreams_spark.streaming.kmeans import StreamingKMeans

SF = "/root/testdata/sf0.001"
EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _first_k(emb, k):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    return [[float(x) for x in r.embedding] for r in rows]


def test_single_batch_equals_one_lloyd_round(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    k = 8
    want = kmeans_fit(emb, k=k, iters=1, init="first")
    skm = StreamingKMeans(str(tmp_path / "km"), k=k)
    skm.initialize(spark, _first_k(emb, k))
    skm.process_batch(emb, epoch_id=0)
    assert skm.centroids == want  # exact: both paths share the
    # fixed-point partials and the same mean/normalize arithmetic


def _planted(spark):
    # 3 clusters hugging orthogonal axes in 4-D
    rows = []
    for i in range(30):
        axis = i % 3
        base = [0.05] * 4
        base[axis] = 1.0
        base[(axis + 1) % 4] += 0.01 * (i % 5)  # slight jitter
        rows.append((i, [float(x) for x in base]))
    return spark.createDataFrame(rows, EMB_SCHEMA)


def test_planted_clusters_recovered_across_batches(spark, tmp_path):
    emb = _planted(spark)
    k = 3
    skm = StreamingKMeans(str(tmp_path / "km"), k=k)
    # seed with one member of each planted cluster
    skm.initialize(spark, _first_k(emb, k))
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)
    skm.process_batch(b0, epoch_id=0)
    skm.process_batch(b1, epoch_id=1)
    assigned = kmeans_assign(emb, skm.centroids).select("vec_id", "cen_id")
    groups: dict[int, set[int]] = {}
    for r in assigned.collect():
        groups.setdefault(r.vec_id % 3, set()).add(r.cen_id)
    # purity: each planted cluster maps to exactly one centroid and the
    # three centroids are distinct
    assert all(len(cids) == 1 for cids in groups.values())
    assert len({next(iter(c)) for c in groups.values()}) == 3


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    skm = StreamingKMeans(str(tmp_path / "km"), k=4)
    skm.initialize(spark, _first_k(emb, 4))
    skm.process_batch(emb, epoch_id=0)
    cen = [list(c) for c in skm.centroids]
    counts = dict(skm.counts)
    skm.process_batch(emb, epoch_id=0)  # at-least-once replay
    assert skm.centroids == cen
    assert skm.counts == counts


def test_bootstrap_rebuilds_driver_cache(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    k = 4
    p1 = StreamingKMeans(str(tmp_path / "km"), k=k)
    p1.initialize(spark, _first_k(emb, k))
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    p1.process_batch(b0, epoch_id=0)
    # crash: fresh instance, state rebuilt from the lake
    p2 = StreamingKMeans(str(tmp_path / "km"), k=k)
    p2.bootstrap(spark)
    assert p2.centroids == p1.centroids
    assert p2.counts == p1.counts
    # and it keeps fitting
    p2.process_batch(emb.filter(F.col("vec_id") % 2 == 1), epoch_id=1)
    assert sum(p2.counts.values()) == emb.count()
