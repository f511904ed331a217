"""Quantized IVF serving index (serving.py SQ8 half): driver-side query
quantization matches the engine's codes bit-for-bit, the probe prunes to
cell partitions, and probe scores equal the batch operator's integer
scores over the same cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import sq8_params, sq8_quantize, sq8_score
from kstreams_spark.serving import (
    load_sq8_params,
    probe_ivf_sq8_index,
    quantize_query,
    write_ivf_sq8_index,
)

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
    path = str(tmp_path / "sq8idx")
    write_ivf_sq8_index(emb, path, centroids)
    return emb, centroids, path


def test_query_code_matches_indexed_code(spark, tmp_path):
    emb, centroids, path = _fixture(spark, tmp_path)
    params = load_sq8_params(spark, path)
    probe_vec = [float(x) for x in emb.filter(F.col("vec_id") == 3).first().embedding]
    stored = list(
        spark.read.parquet(path + "/cells")
        .filter(F.col("vec_id") == 3)
        .first()
        .q
    )
    assert quantize_query(probe_vec, params) == stored


def test_probe_prunes_to_cells_and_matches_batch_scores(spark, tmp_path):
    emb, centroids, path = _fixture(spark, tmp_path)
    probe_vec = [float(x) for x in emb.filter(F.col("vec_id") == 3).first().embedding]
    df = probe_ivf_sq8_index(
        spark, path, probe_vec, centroids, k=10, n_probe=2
    )
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in text and "cen_id" in text, text

    got = {(r.vec_id, r.score_q) for r in df.collect()}
    # batch twin over the SAME probed cells: quantize corpus, pre-zip the
    # query row, integer-score, take the same top-k
    from kstreams_spark.operators.kmeans import kmeans_assign
    from kstreams_spark.operators.quantize import sq8_prezip

    params_df = sq8_params(emb)
    q8 = sq8_quantize(emb, params_df)
    # the probe's own cell selection: top-2 centroids by fixed-point dot
    from kstreams_spark.operators.similarity import FX
    from kstreams_spark.serving import _round_half_away

    dots = [
        (
            cid,
            sum(
                _round_half_away(v * c * FX)
                for v, c in zip(probe_vec, cen)
            ),
        )
        for cid, cen in enumerate(centroids)
    ]
    cells = {
        cid for cid, _ in sorted(dots, key=lambda t: (-t[1], t[0]))[:2]
    }
    qz = sq8_prezip(q8.filter(F.col("vec_id") == 3), params_df)
    assigned = kmeans_assign(emb, centroids).select("vec_id", "cen_id")
    cand = (
        q8.join(assigned, "vec_id")
        .filter(F.col("cen_id").isin(list(cells)))
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
    )
    batch = (
        cand.crossJoin(F.broadcast(qz))
        .select("cid", sq8_score("qz", "cq").alias("score_q"))
        .orderBy(F.col("score_q").desc(), "cid")
        .limit(10)
        .collect()
    )
    assert {(r.cid, r.score_q) for r in batch} == got


def test_probe_n_probe_monotone(spark, tmp_path):
    emb, centroids, path = _fixture(spark, tmp_path)
    probe_vec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first().embedding]
    s1 = {
        r.vec_id
        for r in probe_ivf_sq8_index(
            spark, path, probe_vec, centroids, k=50, n_probe=1
        ).collect()
    }
    s3 = {
        r.vec_id
        for r in probe_ivf_sq8_index(
            spark, path, probe_vec, centroids, k=50, n_probe=3
        ).collect()
    }
    assert len(s3) >= len(s1)
