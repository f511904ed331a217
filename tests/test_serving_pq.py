"""PQ serving index (serving.py PQ half): the probe prunes to cell
partitions, its driver-built ADC LUT scores match the batch operator's
integer scores over the same cells, and n_probe is monotone."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import pq_codebooks
from kstreams_spark.serving import probe_ivf_pq_index, write_ivf_pq_index

SF = "/root/testdata/sf0.001"
N_CEN = 8


def _fixture(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    centroids = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < N_CEN)
        .orderBy("vec_id")
        .collect()
    ]
    cb = pq_codebooks(emb)
    path = str(tmp_path / "pqidx")
    write_ivf_pq_index(emb, path, centroids, cb)
    return emb, centroids, cb, path


def test_probe_prunes_and_matches_batch_scores(spark, tmp_path):
    emb, centroids, cb, path = _fixture(spark, tmp_path)
    probe_vec = [
        float(x) for x in emb.filter(F.col("vec_id") == 3).first().embedding
    ]
    df = probe_ivf_pq_index(spark, path, probe_vec, centroids, k=10, n_probe=2)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in text and "cen_id" in text, text

    got = {(r.vec_id, r.score_q) for r in df.collect()}

    # batch twin over the SAME probed cells: encode corpus, LUT for the
    # query via pq_query_lut's arithmetic, restrict to the probe's cells
    from kstreams_spark.operators.kmeans import kmeans_assign
    from kstreams_spark.operators.quantize import pq_encode
    from kstreams_spark.operators.similarity import FX
    from kstreams_spark.serving import _round_half_away

    dots = [
        (
            cid,
            sum(_round_half_away(v * c * FX) for v, c in zip(probe_vec, cen)),
        )
        for cid, cen in enumerate(centroids)
    ]
    cells = [cid for cid, _ in sorted(dots, key=lambda t: (-t[1], t[0]))[:2]]
    codes = pq_encode(emb, cb)
    assigned = kmeans_assign(emb, centroids).select("vec_id", "cen_id")
    cand = codes.join(assigned, "vec_id").filter(F.col("cen_id").isin(cells))
    # driver LUT, same arithmetic as the probe's
    dsub = len(probe_vec) // 4
    lut = {}
    for mi in range(4):
        qs = probe_vec[mi * dsub : (mi + 1) * dsub]
        for j in range(cb.shape[0]):
            cs = cb[j, mi * dsub : (mi + 1) * dsub]
            lut[(mi, j)] = sum(
                _round_half_away(float(v) * float(c) * FX)
                for v, c in zip(qs, cs)
            )
    lut_df = spark.createDataFrame(
        [(m, c, p) for (m, c), p in lut.items()],
        "m long, code long, pdot long",
    )
    batch = (
        cand.join(F.broadcast(lut_df), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.sum("pdot").cast("long").alias("score_q"))
        .orderBy(F.col("score_q").desc(), "vec_id")
        .limit(10)
        .collect()
    )
    assert {(r.vec_id, r.score_q) for r in batch} == got


def test_probe_n_probe_monotone(spark, tmp_path):
    emb, centroids, cb, path = _fixture(spark, tmp_path)
    probe_vec = [
        float(x) for x in emb.filter(F.col("vec_id") == 7).first().embedding
    ]
    s1 = {
        r.vec_id
        for r in probe_ivf_pq_index(
            spark, path, probe_vec, centroids, k=500, n_probe=1
        ).collect()
    }
    s3 = {
        r.vec_id
        for r in probe_ivf_pq_index(
            spark, path, probe_vec, centroids, k=500, n_probe=3
        ).collect()
    }
    assert s1 <= s3
    assert len(s3) > len(s1)
