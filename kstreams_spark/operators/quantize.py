"""Scalar-quantized (int8) embedding search — the vector-compression
path every 100 TB ANN deployment runs (FAISS SQ8 / ScaNN-style scans):
store 1 byte per dimension instead of 4, scan in the compressed domain,
re-rank survivors exactly.

Spark-first decomposition:

  1. per-dimension corpus min/max: ONE tiny groupBy(idx) over the
     exploded vectors (64 rows out), folded into a single broadcast row
     of per-dim quantizer params — no driver collect, the quantizer
     ships to executors as a broadcast like any dimension table;
  2. quantize: q[d] = clamp(floor((x[d]-mn)·255/(mx-mn))) via one
     zip_with — scan-shaped, codegen, and the materialized q column is
     4× smaller than the float32 source (the thing that matters at
     100 TB: the ANN scan reads 25 TB instead of 100);
  3. compressed-domain scoring: the RECONSTRUCTED dot product. With
     x ≈ mn + q·Δ (Δ = (mx-mn)/255), x1·x2 decomposes into a
     rank-constant Σmn², per-vector bias terms ΣmnΔq, and the cross
     term ΣΔ²q1q2 — dropping the biases (i.e. ranking by Σq1q2 alone)
     collapses recall when mn ≠ 0, so we keep them, as fixed-point
     integers: A_d = round(mn_d·Δ_d·FX), B_d = round(Δ_d²·FX),
     score = Σ A_d·(q1+q2) + B_d·q1·q2 — exact BIGINT arithmetic on
     both engines (same trick as similarity.py's _fx_dot), magnitudes
     ≲ D·FX·range² ≪ 2⁶³ for unit-scale embeddings;
  4. top-k by integer score, ties to the lowest cid.

Scoring is in the max-inner-product domain (as SQ scans are); cosine
users pre-normalize vectors, and the production serving path composes
this with similarity.py exactly like IVF does: coarse cells prune, the
SQ8 scan scores the probed cells, the float re-ranker sees only the
survivors. Quantization recall vs the exact-dot ranking is measured and
pinned in tests/test_quantize.py.

Determinism note: the quantizer's float expressions are written with
identical operation order on both engines — ((v - mn) * 255.0) /
(mx - mn) then floor; round((mn * Δ) * FX) for the constants — and every
op is correctly-rounded IEEE, so codes and constants agree bit-for-bit;
everything after is integer.

Reference parity note: the reference app (BME680.java) has no analytics
surface; this is part of the LLM-training-data extension the brief
mandates (SURVEY.md §2.3 north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.operators.similarity import FX, N_QUERIES, TOP_K
from kstreams_spark.registry import query


def sq8_params(emb: DataFrame) -> DataFrame:
    """One-row broadcastable DataFrame: params = array of per-dim
    struct(mn, mx, a, b) where a/b are the fixed-point scoring constants
    of the module docstring (step 3)."""
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("idx", "v")
    ).select("idx", F.col("v").cast("double").alias("v"))
    stats = ex.groupBy("idx").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    # Δ = (mx - mn) / 255.0;  a = round((mn·Δ)·FX);  b = round((Δ·Δ)·FX)
    enriched = stats.select(
        "idx",
        "mn",
        "mx",
        ((F.col("mx") - F.col("mn")) / F.lit(255.0)).alias("delta"),
    ).select(
        "idx",
        "mn",
        "mx",
        F.round((F.col("mn") * F.col("delta")) * F.lit(float(FX)))
        .cast("long")
        .alias("a"),
        F.round((F.col("delta") * F.col("delta")) * F.lit(float(FX)))
        .cast("long")
        .alias("b"),
    )
    one_row = enriched.agg(
        F.array_sort(
            F.collect_list(F.struct("idx", "mn", "mx", "a", "b"))
        ).alias("s")
    ).select(
        F.expr(
            "transform(s, x -> struct(x.mn AS mn, x.mx AS mx,"
            " x.a AS a, x.b AS b))"
        ).alias("params")
    )
    # materialize the one-row fit ONCE: every consumer (codes, query
    # pre-zip, probes) cross-joins it, and without this the whole
    # stats-scan subtree replans per consumer — 2-3 extra corpus scans
    return one_row.localCheckpoint(eager=True)


def _quant(x, r):
    lvl = F.floor(
        ((x.cast("double") - r["mn"]) * F.lit(255.0)) / (r["mx"] - r["mn"])
    )
    return (
        F.when(r["mx"] == r["mn"], F.lit(0))
        .otherwise(F.least(F.lit(255), F.greatest(F.lit(0), lvl)))
        .cast("long")
    )


def sq8_quantize(emb: DataFrame, params: DataFrame | None = None) -> DataFrame:
    """(vec_id, embedding: array<float>) → (vec_id, q: array<long>).

    Params are fitted on the corpus passed in unless an already-fitted
    one-row params DataFrame is supplied — the same train/serve split
    discipline any quantizer needs."""
    p = params if params is not None else sq8_params(emb)
    return emb.crossJoin(F.broadcast(p)).select(
        "vec_id", F.zip_with("embedding", "params", _quant).alias("q")
    )


def sq8_prezip(q8_queries: DataFrame, params: DataFrame) -> DataFrame:
    """(qid := vec_id, q) → (qid, qz): query codes zipped with the
    scoring constants, so the per-pair scorer is a single zip_with over
    (query-side struct, candidate code)."""
    return q8_queries.select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    ).crossJoin(F.broadcast(params)).select(
        "qid",
        F.zip_with(
            "qq",
            "params",
            lambda q, r: F.struct(
                q.alias("q"), r["a"].alias("a"), r["b"].alias("b")
            ),
        ).alias("qz"),
    )


def sq8_score(qz_col, cq_col):
    """Reconstructed-dot integer score: Σ a·(q1+q2) + b·q1·q2."""
    return F.aggregate(
        F.zip_with(
            qz_col,
            cq_col,
            lambda z, c: z["a"] * (z["q"] + c) + z["b"] * z["q"] * c,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _rank_topk_q(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(
        F.col("score_q").desc(), F.col("cid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "score_q", "rank")
    )


def sq8_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Compressed-domain top-k by the reconstructed-dot integer score.
    The only shuffle is the per-query top-k window; scoring is a
    codegen'd map over candidate × broadcast(queries) pairs reading
    1-byte-scale codes."""
    params = sq8_params(emb)
    q8 = sq8_quantize(emb, params)
    qz = sq8_prezip(q8.filter(F.col("vec_id") < n_queries), params)
    scored = q8.select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    ).crossJoin(F.broadcast(qz)).select(
        "qid", "cid", sq8_score("qz", "cq").alias("score_q")
    )
    return _rank_topk_q(scored, k)


@query(
    "similarity_topk_sq8",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    stats AS (
      SELECT idx, mn, mx,
             CAST(round((mn * delta) * {FX}.0) AS BIGINT) AS a,
             CAST(round((delta * delta) * {FX}.0) AS BIGINT) AS b
      FROM (SELECT idx, MIN(v) AS mn, MAX(v) AS mx,
                   (MAX(v) - MIN(v)) / 255.0 AS delta
            FROM e GROUP BY idx)
    ),
    q8 AS (
      SELECT e.vec_id, e.idx,
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE LEAST(255, GREATEST(0,
                         CAST(floor(((e.v - s.mn) * 255.0) / (s.mx - s.mn))
                              AS BIGINT)))
             END AS qv
      FROM e JOIN stats s USING (idx)
    ),
    dots AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid,
             SUM(s.a * (a.qv + b.qv) + s.b * a.qv * b.qv)::BIGINT AS score_q
      FROM q8 a
      JOIN q8 b USING (idx)
      JOIN stats s USING (idx)
      WHERE a.vec_id < {N_QUERIES}
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT qid, cid, score_q, rank FROM (
      SELECT qid, cid, score_q,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score_q DESC, cid) AS rank
      FROM dots
    ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 compressed-domain top-10 for the query vectors (vec_id < 10)
    over the embeddings corpus. The oracle rebuilds the identical
    quantizer and scoring constants from the same per-dim stats and
    replays the integer scan — the whole pipeline is value-checked,
    not just the shape."""
    return sq8_topk(spread(load_table(spark, sf_dir, "embeddings")))


def ivf_sq8_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    n_centroids: int | None = None,
    n_probe: int | None = None,
    k: int = TOP_K,
) -> DataFrame:
    """The production serving shape this module's docstring promises:
    IVF cells prune (similarity.ivf_assign — exact fixed-point
    assignment, cell id = lake partition key at 100 TB), then the SQ8
    integer scan scores ONLY the n_probe probed cells' codes. Per-query
    work drops from N·D bytes to (n_probe·N/cells)·D quantized bytes —
    both levers (cells, probes) keep their similarity.py sizing rules.

    Shuffle budget: ivf_assign's groupBy(vec_id) + one broadcast join
    attaching the Q·n_probe probe list (with pre-zipped query codes) to
    the cell-keyed candidates + the top-k window. The candidate side is
    never reshuffled — it joins on its own cell id."""
    from kstreams_spark.operators.similarity import (
        N_CENTROIDS,
        N_PROBE,
        ivf_assign,
        query_probe_cells,
    )

    n_centroids = N_CENTROIDS if n_centroids is None else n_centroids
    n_probe = N_PROBE if n_probe is None else n_probe
    cen = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cen_id"), F.col("embedding").alias("cen_emb")
    )
    assigned = ivf_assign(emb, cen).select("vec_id", "cen_id")
    params = sq8_params(emb)
    q8 = sq8_quantize(emb, params)
    # probe selection is the ONE shared definition (similarity.py)
    probes = query_probe_cells(emb, cen, n_queries, n_probe)
    probe_q = probes.join(
        sq8_prezip(q8.filter(F.col("vec_id") < n_queries), params), "qid"
    )
    cand = assigned.join(q8, "vec_id").select(
        F.col("vec_id").alias("cid"), "cen_id", F.col("q").alias("cq")
    )
    scored = cand.join(F.broadcast(probe_q), "cen_id").select(
        "qid", "cid", sq8_score("qz", "cq").alias("score_q")
    )
    return _rank_topk_q(scored, k)


def _ivf_sq8_oracle() -> str:
    from kstreams_spark.operators.similarity import (
        N_PROBE,
        _ivf_assign_sql,
    )

    return f"""
    WITH {_ivf_assign_sql()},
    probes AS (
      SELECT vec_id AS qid, cen_id FROM (
        SELECT vec_id, cen_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cen_id) AS rn
        FROM cdots WHERE vec_id < {N_QUERIES}
      ) WHERE rn <= {N_PROBE}
    ),
    stats AS (
      SELECT idx, mn, mx,
             CAST(round((mn * delta) * {FX}.0) AS BIGINT) AS a,
             CAST(round((delta * delta) * {FX}.0) AS BIGINT) AS b
      FROM (SELECT idx, MIN(v) AS mn, MAX(v) AS mx,
                   (MAX(v) - MIN(v)) / 255.0 AS delta
            FROM allv GROUP BY idx)
    ),
    q8 AS (
      SELECT allv.vec_id, allv.idx,
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE LEAST(255, GREATEST(0,
                         CAST(floor(((allv.v - s.mn) * 255.0) / (s.mx - s.mn))
                              AS BIGINT)))
             END AS qv
      FROM allv JOIN stats s USING (idx)
    ),
    dots AS (
      SELECT p.qid, a.vec_id AS cid,
             SUM(s.a * (qq.qv + cq.qv) + s.b * qq.qv * cq.qv)::BIGINT
               AS score_q
      FROM probes p
      JOIN assigned a ON a.cen_id = p.cen_id
      JOIN q8 qq ON qq.vec_id = p.qid
      JOIN q8 cq ON cq.vec_id = a.vec_id AND cq.idx = qq.idx
      JOIN stats s ON s.idx = qq.idx
      GROUP BY p.qid, a.vec_id
    )
    SELECT qid, cid, score_q, rank FROM (
      SELECT qid, cid, score_q,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score_q DESC, cid) AS rank
      FROM dots
    ) WHERE rank <= {TOP_K}
    """


@query("similarity_topk_ivf_sq8", oracle=_ivf_sq8_oracle())
def similarity_topk_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(n_probe=3) + SQ8: quantized in-cell scan over the probed
    cells only — the composed production serving path. The oracle
    replays cell assignment, probe selection, quantization, and the
    integer reconstructed-dot scan end-to-end."""
    return ivf_sq8_topk(spread(load_table(spark, sf_dir, "embeddings")))


# --- product quantization (PQ / ADC) --------------------------------------
# The other half of the FAISS compression family next to SQ8: split the
# D-dim space into PQ_M subspaces, learn PQ_K codewords per subspace,
# store one byte-ish code per subspace (here M·log2(K) = 16 bits/vector vs
# SQ8's D bytes — 32× smaller than float32), and score queries against
# codes via an M-lookup table (ADC, Jégou et al. TPAMI'11). Fixture
# codebooks are the sub-vectors of the first PQ_K corpus vectors — the
# same deterministic first-k convention the IVF queries use, so the whole
# chain (encode → LUT → scan) is SQL-replayable; a production run swaps
# in per-subspace k-means codebooks through the identical machinery.
PQ_M = 4  # subspaces (D=64 → 16 dims each)
PQ_K = 16  # codewords per subspace


def pq_codebooks(emb: DataFrame, m: int = PQ_M, k: int = PQ_K):
    """Collected (k, D) float64 matrix of the first-k vectors — O(k·D)
    driver state, the kmeans.py bound; sliced per subspace by callers."""
    rows = (
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    import numpy as np

    return np.array([[float(x) for x in r.embedding] for r in rows])


def pq_encode(emb: DataFrame, cb, m: int = PQ_M) -> DataFrame:
    """(vec_id, embedding) → (vec_id, m, code): per-subspace nearest
    codeword by fixed-point squared L2, ties to the lowest code — the
    NumPy twin of the oracle's SUM(round((v-c)*(v-c)*FX)) argmin, using
    the same half-away-from-zero rounding as every quantizer here
    (similarity._np_round_half_up)."""
    import numpy as np
    import pandas as pd

    from kstreams_spark.operators.similarity import _np_round_half_up

    C = np.asarray(cb, dtype=np.float64)
    k, d = C.shape
    dsub = d // m

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "m": [], "code": []})
                continue
            V = np.array(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            out_v, out_m, out_c = [], [], []
            for mi in range(m):
                Vs = V[:, mi * dsub : (mi + 1) * dsub]
                best_d = None
                best_j = None
                for j in range(k):
                    Cs = C[j, mi * dsub : (mi + 1) * dsub]
                    diff = Vs - Cs[None, :]
                    dist = _np_round_half_up(diff * diff * 1e12).sum(axis=1)
                    if best_d is None:
                        best_d = dist
                        best_j = np.zeros(len(dist), dtype=np.int64)
                    else:
                        upd = dist < best_d  # strict: ties keep lowest j
                        best_d = np.where(upd, dist, best_d)
                        best_j = np.where(upd, j, best_j)
                out_v.append(pdf["vec_id"].to_numpy())
                out_m.append(np.full(len(pdf), mi, dtype=np.int64))
                out_c.append(best_j)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_v).astype("int64"),
                    "m": np.concatenate(out_m),
                    "code": np.concatenate(out_c),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, m long, code long"
    )


def _pq_ctes(src: str = "embeddings") -> str:
    """CTE chain sub → cb → dist → codes → lut: the PQ encode + per-query
    LUT replayed in SQL, shared by the flat-scan and IVF-composed oracles.
    `src` must expose (vec_id, embedding)."""
    return f"""sub AS (
      SELECT vec_id, idx, CAST(unnest_v AS DOUBLE) AS v,
             CAST(floor((idx - 1) / {64 // PQ_M}) AS BIGINT) AS m
      FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
                   unnest(embedding) AS unnest_v
            FROM {src})
    ),
    cb AS (SELECT vec_id AS code, m, idx, v FROM sub WHERE vec_id < {PQ_K}),
    dist AS (
      SELECT s.vec_id, s.m, c.code,
             SUM(CAST(round((s.v - c.v) * (s.v - c.v) * {FX}.0)
                      AS BIGINT)) AS d
      FROM sub s JOIN cb c ON c.m = s.m AND c.idx = s.idx
      GROUP BY s.vec_id, s.m, c.code
    ),
    codes AS (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, code) AS rn
        FROM dist) WHERE rn = 1
    ),
    lut AS (
      SELECT q.vec_id AS qid, c.m, c.code,
             SUM(CAST(round(q.v * c.v * {FX}.0) AS BIGINT)) AS pdot
      FROM sub q JOIN cb c ON c.m = q.m AND c.idx = q.idx
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY q.vec_id, c.m, c.code
    )"""


_PQ_RANK_SQL = f"""
    SELECT qid, cid, score_q, rank FROM (
      SELECT qid, cid, score_q,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score_q DESC, cid) AS rank
      FROM dots
    ) WHERE rank <= {TOP_K}
"""


def pq_query_lut(emb: DataFrame, cb, n_queries: int = N_QUERIES) -> DataFrame:
    """Per-query ADC lookup table (qid, m, code, pdot) — Q·M·K fixed-
    point entries computed driver-side from the O(k·D) codebook state
    with the bit-identical NumPy twin of the oracle arithmetic, returned
    as a broadcastable DataFrame."""
    import numpy as np

    from kstreams_spark.operators.similarity import _np_round_half_up

    q_rows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    dsub = cb.shape[1] // PQ_M
    lut_rows = []
    for r in q_rows:
        q = np.asarray([float(x) for x in r.embedding], dtype=np.float64)
        for mi in range(PQ_M):
            qs = q[mi * dsub : (mi + 1) * dsub]
            for j in range(PQ_K):
                cs = cb[j, mi * dsub : (mi + 1) * dsub]
                pdot = int(_np_round_half_up(qs * cs * 1e12).sum())
                lut_rows.append((r.vec_id, mi, j, pdot))
    return emb.sparkSession.createDataFrame(
        lut_rows, "qid long, m long, code long, pdot long"
    )


@query(
    "similarity_topk_pq",
    oracle=f"""
    WITH {_pq_ctes()},
    dots AS (
      SELECT l.qid, x.vec_id AS cid, SUM(l.pdot)::BIGINT AS score_q
      FROM codes x JOIN lut l ON l.m = x.m AND l.code = x.code
      GROUP BY l.qid, x.vec_id
    )
    {_PQ_RANK_SQL}
    """,
)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-10: encode the corpus to {PQ_M} sub-codes (nearest of
    {PQ_K} codewords per subspace by exact squared L2), build each
    query's (m, code) → partial-dot lookup table ONCE (Q·M·K fixed-point
    entries, computed driver-side from the O(k·D) codebook state with
    the bit-identical NumPy twin of the oracle arithmetic), then score =
    M integer lookups per candidate via a broadcast LUT join + one sum.
    score(q,x) = Σ_m dot_fx(q_m, codeword(x_m)) — the asymmetric distance
    computation of Jégou et al., in the max-inner-product domain like the
    SQ8 scan.

    100 TB shape: the code table is M·log2(K) = 16 BITS per vector (32×
    under float32, 16× under SQ8); the scan is a broadcast-LUT equi-join
    + groupBy-sum, no floats; codebook fitting swaps to per-subspace
    k-means (kmeans.py) through the same encode/LUT machinery. Compose
    with IVF cells (similarity_topk_ivf_sq8's pattern) to prune the scan.
    Recall vs the exact ranking is pinned in tests/test_quantize.py."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    lut = pq_query_lut(emb, cb)
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("pdot").cast("long").alias("score_q"))
    )
    return _rank_topk_q(scored, TOP_K)


def _ivf_pq_oracle() -> str:
    from kstreams_spark.operators.similarity import N_PROBE, _ivf_assign_sql

    return f"""
    WITH {_ivf_assign_sql()},
    probes AS (
      SELECT vec_id AS qid, cen_id FROM (
        SELECT vec_id, cen_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cen_id) AS rn
        FROM cdots WHERE vec_id < {N_QUERIES}
      ) WHERE rn <= {N_PROBE}
    ),
    {_pq_ctes()},
    dots AS (
      SELECT p.qid, a.vec_id AS cid, SUM(l.pdot)::BIGINT AS score_q
      FROM probes p
      JOIN assigned a ON a.cen_id = p.cen_id
      JOIN codes x ON x.vec_id = a.vec_id
      JOIN lut l ON l.qid = p.qid AND l.m = x.m AND l.code = x.code
      GROUP BY p.qid, a.vec_id
    )
    {_PQ_RANK_SQL}
    """


@query("similarity_topk_ivf_pq", oracle=_ivf_pq_oracle())
def similarity_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×PQ — the full FAISS IVFPQ serving shape: coarse cells prune
    the corpus (similarity.ivf_assign, n_probe cells per query), the PQ
    code scan scores ONLY the probed cells' candidates via the broadcast
    ADC LUT. Per-query work = (n_probe·N/cells) candidates × M integer
    lookups over 16-BIT codes — the cheapest scan in the family; recall
    recovered by probing more cells and float-re-ranking survivors
    (serving.py's pattern).

    Shuffle budget: ivf_assign groupBy (1) + pq_encode (mapInPandas,
    scan-shaped) + ONE broadcast probe-list join on cen_id + ONE
    broadcast LUT join + the per-(qid,cid) sum and top-k window. The
    candidate side is never reshuffled — it joins on its own cell id,
    which at 100 TB is the lake partition key, so probing prunes
    PARTITIONS, not rows."""
    from kstreams_spark.operators.similarity import (
        N_CENTROIDS,
        N_PROBE,
        ivf_assign,
        query_probe_cells,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    cen = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cen_id"), F.col("embedding").alias("cen_emb")
    )
    assigned = ivf_assign(emb, cen).select("vec_id", "cen_id")
    probes = query_probe_cells(emb, cen, N_QUERIES, N_PROBE).select(
        "qid", "cen_id"
    )
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    lut = pq_query_lut(emb, cb)
    cand = assigned.join(codes, "vec_id")
    scored = (
        cand.join(F.broadcast(probes), "cen_id")
        .join(F.broadcast(lut), ["qid", "m", "code"])
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("pdot").cast("long").alias("score_q"))
    )
    return _rank_topk_q(scored, TOP_K)


PQ_RERANK_POOL = 50  # PQ-scan survivors handed to the exact re-ranker


@query(
    "similarity_topk_pq_rerank",
    oracle=f"""
    WITH {_pq_ctes()},
    pqdots AS (
      SELECT l.qid, x.vec_id AS cid, SUM(l.pdot)::BIGINT AS score_q
      FROM codes x JOIN lut l ON l.m = x.m AND l.code = x.code
      GROUP BY l.qid, x.vec_id
    ),
    pool AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score_q DESC, cid) AS rn
        FROM pqdots) WHERE rn <= {PQ_RERANK_POOL}
    ),
    dots AS (
      SELECT p.qid, p.cid,
             SUM(CAST(round(q.v * c.v * {FX}.0) AS BIGINT)) AS dot_fx
      FROM pool p
      JOIN sub q ON q.vec_id = p.qid
      JOIN sub c ON c.vec_id = p.cid AND c.idx = q.idx
      GROUP BY p.qid, p.cid
    ),
    norms AS (
      SELECT vec_id,
             SUM(CAST(round(v * v * {FX}.0) AS BIGINT)) AS norm2_fx
      FROM sub GROUP BY vec_id
    ),
    cos AS (
      SELECT d.qid, d.cid,
             (CAST(d.dot_fx AS DOUBLE) / {FX})
               / nullif(sqrt(CAST(nq.norm2_fx AS DOUBLE) / {FX})
                        * sqrt(CAST(nc.norm2_fx AS DOUBLE) / {FX}), 0)
               AS cosine
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.qid
      JOIN norms nc ON nc.vec_id = d.cid
    )
    SELECT qid, cid, cosine, rank FROM (
      SELECT qid, cid, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, cid) AS rank
      FROM cos
    ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production TWO-STAGE serving shape materialized as one query:
    the 16-bit PQ/ADC scan proposes a {PQ_RERANK_POOL}-candidate pool
    per query (cheap integer lookups over compressed codes), then the
    EXACT fixed-point cosine re-ranks only those survivors to the final
    top-{TOP_K} — every quantizer docstring's 'float re-ranker fetches
    survivors by id' made concrete. Per-query exact work is
    {PQ_RERANK_POOL}·D instead of N·D; recall is the pool's to lose
    (pinned >= the raw PQ scan's in tests/test_quantize.py).

    Shuffle budget: the PQ scan (broadcast LUT + one agg + pool window)
    + two keyed lookups attaching vectors/norms to pool rows + the final
    top-k window. The re-rank joins on vec_id — at serving scale the id
    lookup against the base table, never a second corpus scan."""
    from kstreams_spark.operators.similarity import (
        _cosine,
        _fx_dot,
        _fx_norm2,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    lut = pq_query_lut(emb, cb)
    pq_scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("pdot").cast("long").alias("score_q"))
    )
    pool = _rank_topk_q(pq_scored, PQ_RERANK_POOL).select("qid", "cid")
    vecs = emb.select(
        "vec_id", "embedding", _fx_norm2("embedding").alias("norm2")
    )
    qv = vecs.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("nq2"),
    )
    cv = vecs.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("norm2").alias("nc2"),
    )
    scored = (
        pool.join(F.broadcast(qv), "qid")
        .join(cv, "cid")
        .select(
            "qid",
            "cid",
            _cosine(
                _fx_dot("q_emb", "c_emb"), F.col("nq2"), F.col("nc2")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "cid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Binary (1-bit sign) quantization — the compression extreme of the
# frontier (float32 → SQ8 4× → PQ 32× → BQ 32× with a pure XOR+popcount
# scan). 64 dims pack into one 64-bit sign code, stored as TWO 32-bit
# words in BIGINTs because DuckDB's `1::BIGINT << 63` overflows (checked)
# — the split costs one extra xor/popcount per pair and removes every
# sign-bit subtlety on both engines. Hamming distance approximates angular
# distance for sign codes (Charikar STOC'02 random-hyperplane duality:
# P[sign bits differ] = θ/π per dim); like PQ, the scan proposes and an
# exact fixed-point re-rank disposes.

BQ_POOL = 50  # Hamming-scan survivors handed to the exact re-ranker


def bq_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, w0, w1): the 64-dim sign pattern (x > 0) packed little-
    endian into two 32-bit words. One transform+aggregate per word —
    scan-shaped, codegen, no shuffle; the materialized code column is
    32× smaller than the float32 source, which is the whole point: the
    ANN scan reads 3 TB where the corpus is 100."""
    def word(lo: int):
        return F.expr(
            f"aggregate(transform(embedding, (x, i) -> "
            f"IF(i >= {lo} AND i < {lo + 32} AND CAST(x AS DOUBLE) > 0.0D, "
            f"shiftleft(CAST(1 AS BIGINT), i - {lo}), CAST(0 AS BIGINT))), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    return emb.select("vec_id", word(0).alias("w0"), word(32).alias("w1"))


def bq_hamming_pool(
    codes: DataFrame, n_queries: int = N_QUERIES, pool: int = BQ_POOL
) -> DataFrame:
    """Per query, the `pool` nearest codes by Hamming distance
    (ties to the lowest cid): candidates × broadcast(query codes) with
    xor+popcount scoring — integer-only, whole-stage codegen — then one
    per-qid top-pool window. The only shuffle is that window."""
    q = codes.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    ham = codes.select(
        F.col("vec_id").alias("cid"), "w0", "w1"
    ).crossJoin(F.broadcast(q)).select(
        "qid",
        "cid",
        (
            F.bit_count(F.col("w0").bitwiseXOR(F.col("qw0")))
            + F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
        ).cast("long").alias("hamming"),
    )
    w = Window.partitionBy("qid").orderBy("hamming", "cid")
    return (
        ham.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= pool)
        .select("qid", "cid")
    )


@query(
    "similarity_topk_bq_rerank",
    oracle=f"""
    WITH sub AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    codes AS (
      SELECT vec_id,
             SUM(CASE WHEN idx <= 32 AND v > 0
                      THEN (CAST(1 AS BIGINT) << (idx - 1)) ELSE 0
                 END)::BIGINT AS w0,
             SUM(CASE WHEN idx > 32 AND v > 0
                      THEN (CAST(1 AS BIGINT) << (idx - 33)) ELSE 0
                 END)::BIGINT AS w1
      FROM sub GROUP BY vec_id
    ),
    ham AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             (bit_count(xor(q.w0, c.w0))
              + bit_count(xor(q.w1, c.w1)))::BIGINT AS hamming
      FROM codes c, codes q WHERE q.vec_id < {N_QUERIES}
    ),
    pool AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY hamming, cid) AS rn
        FROM ham) WHERE rn <= {BQ_POOL}
    ),
    dots AS (
      SELECT p.qid, p.cid,
             SUM(CAST(round(q.v * c.v * {FX}.0) AS BIGINT)) AS dot_fx
      FROM pool p
      JOIN sub q ON q.vec_id = p.qid
      JOIN sub c ON c.vec_id = p.cid AND c.idx = q.idx
      GROUP BY p.qid, p.cid
    ),
    norms AS (
      SELECT vec_id,
             SUM(CAST(round(v * v * {FX}.0) AS BIGINT)) AS norm2_fx
      FROM sub GROUP BY vec_id
    ),
    cos AS (
      SELECT d.qid, d.cid,
             (CAST(d.dot_fx AS DOUBLE) / {FX})
               / nullif(sqrt(CAST(nq.norm2_fx AS DOUBLE) / {FX})
                        * sqrt(CAST(nc.norm2_fx AS DOUBLE) / {FX}), 0)
               AS cosine
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.qid
      JOIN norms nc ON nc.vec_id = d.cid
    )
    SELECT qid, cid, cosine, rank FROM (
      SELECT qid, cid, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, cid) AS rank
      FROM cos
    ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_bq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized two-stage search: the 64-bit sign-code Hamming
    scan (xor+popcount, 32× compressed reads) proposes a {BQ_POOL}-
    candidate pool per query; the exact fixed-point cosine re-ranks only
    those survivors to the final top-{TOP_K}. Module-header rationale;
    recall vs the exact scan is measured and pinned in
    tests/test_quantize.py (sign codes keep more angular information
    than 16-bit PQ at fixture scale).

    Shuffle budget: pool window + re-rank's two keyed vec_id lookups +
    final top-k window — identical shape to similarity_topk_pq_rerank,
    only the proposer changes. At 100 TB the Hamming scan composes with
    IVF cells exactly like sq8/pq (cells prune partitions, codes scan
    within), and the 8-byte codes of a 10⁹-vector corpus fit executor
    page cache (8 GB total) — the scan is CPU-popcount-bound, the ideal
    place to be.

    Reference parity note: BME680.java has no analytics surface; this is
    the SURVEY §2.3 north-star similarity family's compression endpoint.
    """
    from kstreams_spark.operators.similarity import (
        _cosine,
        _fx_dot,
        _fx_norm2,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    pool = bq_hamming_pool(bq_codes(emb))
    vecs = emb.select(
        "vec_id", "embedding", _fx_norm2("embedding").alias("norm2")
    )
    qv = vecs.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("nq2"),
    )
    cv = vecs.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("norm2").alias("nc2"),
    )
    scored = (
        pool.join(F.broadcast(qv), "qid")
        .join(cv, "cid")
        .select(
            "qid",
            "cid",
            _cosine(
                _fx_dot("q_emb", "c_emb"), F.col("nq2"), F.col("nc2")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "cid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "cosine", "rank")
    )


def _recall_report_oracle() -> str:
    """Composes the already-registered bruteforce and BQ oracles as
    derived tables (DuckDB allows nested WITH in a subquery) — the
    report's oracle replays BOTH pipelines and the overlap count."""
    from kstreams_spark.registry import ORACLES

    bf = ORACLES["similarity_topk_bruteforce"]
    bq = ORACLES["similarity_topk_bq_rerank"]
    return f"""
    WITH ex AS (SELECT qid, cid FROM ({bf}) t),
    ap AS (SELECT qid, cid FROM ({bq}) t)
    SELECT ex.qid,
           COUNT(*) AS n_exact,
           SUM(CASE WHEN ap.cid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_hits,
           CAST(SUM(CASE WHEN ap.cid IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS recall
    FROM ex LEFT JOIN ap ON ap.qid = ex.qid AND ap.cid = ex.cid
    GROUP BY ex.qid
    """


@query("similarity_recall_report", oracle=_recall_report_oracle())
def similarity_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-quality self-measurement as a first-class query ("measure,
    don't guess" made operational): per-query recall@{TOP_K} of the
    compressed two-stage scan (similarity_topk_bq_rerank) against the
    exact ranking — the number an ANN deployment alerts on when a
    quantizer refit or corpus drift degrades it. Runs both pipelines
    (each its documented scale shape) and joins two 10-row-per-query
    lists; the recall is one IEEE division of exact counts. The oracle
    replays BOTH pipelines end-to-end, so a hash match certifies the
    report, not just the scan."""
    from kstreams_spark.operators.similarity import (
        similarity_topk_bruteforce,
    )

    ex = similarity_topk_bruteforce(spark, sf_dir).select("qid", "cid")
    ap = similarity_topk_bq_rerank(spark, sf_dir).select(
        "qid", F.col("cid").alias("ap_cid")
    )
    j = ex.join(
        ap,
        (ap.qid == ex.qid) & (ap.ap_cid == ex.cid),
        "left",
    ).select(ex.qid.alias("qid"), "cid", "ap_cid")
    hits = F.sum(
        F.when(F.col("ap_cid").isNotNull(), 1).otherwise(0)
    ).cast("long")
    return j.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_exact"),
        hits.alias("n_hits"),
        (hits.cast("double") / F.count(F.lit(1))).alias("recall"),
    )
