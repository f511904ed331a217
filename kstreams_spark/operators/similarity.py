"""Embedding similarity search (north-star op): cosine top-k over
`embeddings.embedding` (array<float>, dim 64).

Two implementations:
- `similarity_topk_bruteforce` — exact: index equi-join dot products,
  Window-ranked top-k. O(Q·N·D) work but fully distributed; the query-side
  elements and the per-vector norms are broadcast, so the only shuffle is
  the (qid, cid) partial/final aggregation. The correctness baseline and
  the right choice when Q is small.
- `similarity_topk_lsh` — scale path: random-hyperplane LSH. Each vector
  gets a B-bit sign signature from pseudo-random hyperplanes (md5-derived
  ±1 components, deterministic & engine-portable); candidates must share
  the signature (bucket equi-join), then exact cosine re-ranks within the
  bucket. At 100 TB the bucket join replaces the Q·N cross product with
  per-bucket work; recall is tuned by B and multi-probe.

Cross-engine float determinism — fixed-point BIGINT accumulation:
each elementwise product (IEEE-exact double multiply) is scaled by 1e12
and rounded to BIGINT (both engines round half-away-from-zero); the sums
are then exact 64-bit integer arithmetic — order-independent, identical
in Spark and DuckDB, and on Spark's fastest (long hash-agg) path. Sums
stay ≤ ~2^52, so the final cast back to DOUBLE is exact.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.registry import query

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 10
# Default signature width for the REGISTERED fixture queries (and their
# generated oracle SQL). The operators themselves take `bits` / `n_tables`
# as arguments — sizing rule: buckets = 2^bits should grow with corpus
# size N so E[bucket] = N/2^bits stays bounded, i.e. bits ≈ log2(N/B) for
# a target bucket size B; recall lost to extra bits is bought back with
# more OR-amplification tables (SCALE.md §similarity).
LSH_BITS = 8
FX = int(1e12)  # fixed-point scale for exact cross-engine sums


def lsh_bits_for(n: int, target_bucket: int = 25) -> int:
    """The SCALE.md sizing rule as code: bits ≈ log2(N / B) so the
    expected bucket population N / 2^bits stays near the target re-rank
    budget B as the corpus grows. Recall lost to the extra bits is bought
    back with OR-amplification tables (lsh_multi_topk), not by shrinking
    the signature. Tested at 1× and 10× corpus in
    tests/test_dedup_quality.py."""
    return max(1, round(math.log2(max(2.0, n / target_bucket))))


def ivf_cells_for(n: int, scale: float = 4.0) -> int:
    """IVF cell-count sizing, k ≈ scale·√N (the FAISS rule of thumb).

    Sublinear on purpose: the centroid table must stay broadcastable and
    k-means' per-iteration driver collect must stay O(k·D) — at N = 10⁹
    this rule gives k ≈ 1.3×10⁵ (~65 MB of D=64 doubles), where a linear
    k = N/C rule gives 10⁷ centroids (~5 GB): un-broadcastable and
    un-collectable, contradicting the module's own 100 TB story. The
    expected cell population N/k = √N/scale therefore GROWS with the
    corpus; the per-query scan budget is held by probing more cells
    (`ivf_probes_for` → ivf_topk's n_probe), not by multiplying
    centroids. Sublinearity pinned in tests/test_dedup_quality.py."""
    return max(1, round(scale * math.sqrt(n)))


def ivf_probes_for(n: int, cells: int, target_scan: int = 100) -> int:
    """Companion lever to ivf_cells_for: the n_probe that keeps the
    per-query re-rank volume near `target_scan` vectors given the
    expected cell population N/cells. More corpus → bigger cells →
    the SAME n_probe scans more (recall holds, budget grows), so pick
    target_scan first and let this derive n_probe."""
    return max(1, math.ceil(target_scan * cells / n))


def _fx(col: Column) -> Column:
    """double → fixed-point long at scale 1e12 (portable rounding)."""
    return F.round(col * FX).cast("long")


def _fx_dot(a: Column | str, b: Column | str) -> Column:
    """Per-ROW fixed-point dot product: zip_with the two arrays, fold the
    long terms. Long addition is exactly associative, so the fold order
    doesn't matter and the value equals the oracle's SUM-over-unnest —
    no explode, no join on element index, no aggregation shuffle."""
    prods = F.zip_with(
        a, b, lambda x, y: _fx(x.cast("double") * y.cast("double"))
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _fx_norm2(a: Column | str) -> Column:
    sq = F.transform(a, lambda x: _fx(x.cast("double") * x.cast("double")))
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _cosine(dot_fx: Column, nq_fx: Column, nc_fx: Column) -> Column:
    return (dot_fx.cast("double") / FX) / F.nullif(
        F.sqrt(nq_fx.cast("double") / FX) * F.sqrt(nc_fx.cast("double") / FX),
        F.lit(0.0),
    )


_NORMS_SQL = f"""
    SELECT vec_id,
           SUM(CAST(round(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) * {FX}.0)
                    AS BIGINT)) AS norm2_fx
    FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
    GROUP BY vec_id
"""

_COS_SQL = f"""
      SELECT d.qid, d.cid,
             (CAST(d.dot_fx AS DOUBLE) / {FX})
               / nullif(sqrt(CAST(nq.norm2_fx AS DOUBLE) / {FX})
                        * sqrt(CAST(nc.norm2_fx AS DOUBLE) / {FX}), 0) AS cosine
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.qid
      JOIN norms nc ON nc.vec_id = d.cid
"""

_RANK_SQL = f"""
    SELECT qid, cid, cosine, rank FROM (
      SELECT qid, cid, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, cid) AS rank
      FROM cos
    ) WHERE rank <= {TOP_K}
"""


def _rank_topk(cos: DataFrame) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "cosine", "rank")
    )


def brute_force_topk(emb: DataFrame, n_queries: int = N_QUERIES) -> DataFrame:
    """Exact cosine top-k over any (vec_id, embedding) DataFrame.

    Plan: candidates × broadcast(queries) cross join → per-row zip_with
    dot + per-row norms → window top-k. The ONLY shuffle is the top-k
    window on qid; everything else is a codegen'd map over N·Q rows."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        _fx_norm2("embedding").alias("nq2"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        _fx_norm2("embedding").alias("nc2"),
    )
    cos = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "cid",
        _cosine(_fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")).alias(
            "cosine"
        ),
    )
    return _rank_topk(cos)


@query(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL})
    {_RANK_SQL}
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors (vec_id < 10) over the corpus."""
    return brute_force_topk(spread(load_table(spark, sf_dir, "embeddings")))


def _plane_components(p: int) -> list[int]:
    """The ±1 hyperplane components, precomputed driver-side with hashlib —
    md5 is md5, so these literals equal what the oracle computes with
    DuckDB's md5() at runtime (index is 1-based to match
    generate_subscripts). 64·8 md5s happen ONCE at plan build instead of
    per row."""
    import hashlib

    return [
        2 * (int(hashlib.md5(f"plane{p}_{i}".encode()).hexdigest()[0], 16) % 2) - 1
        for i in range(1, 65)
    ]


def _plane_component_sql(p: int) -> str:
    """±1 hyperplane component for plane p at index idx (md5-derived)."""
    return (
        f"(2 * ((instr('0123456789abcdef', "
        f"substring(md5(concat('plane{p}_', CAST(idx AS VARCHAR))), 1, 1)) - 1) % 2) - 1)"
    )


def _lsh_sig_sql() -> str:
    bits = " || ".join(
        f"""CASE WHEN SUM(CAST(round(CAST(v AS DOUBLE) * {_plane_component_sql(p)}
                            * {FX}.0) AS BIGINT)) >= 0
             THEN '1' ELSE '0' END"""
        for p in range(LSH_BITS)
    )
    return f"""
      SELECT vec_id, {bits} AS sig
      FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
                   unnest(embedding) AS v
            FROM embeddings)
      GROUP BY vec_id
    """


def lsh_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    bits: int = LSH_BITS,
    n_flip: int = 0,
) -> DataFrame:
    """ANN top-k over any (vec_id, embedding) DataFrame: `bits`-wide
    random-hyperplane signatures bucket the corpus; exact cosine re-ranks
    only within the query's bucket. Recall depends on DATA STRUCTURE:
    near-duplicate vectors share all sign bits with high probability
    (tested on planted clusters); for isotropic-noise corpora (like the
    fixture embeddings, mean pairwise cosine ≈ 0) no bucketing scheme can
    recover the noise-ranked "top"-k — only the self-match is a real
    neighbor, and LSH always finds it.

    `n_flip` > 0 enables multi-probe on the QUERY side (the serving
    probe's recall lever, distributed): each query also matches the
    n_flip single-bit-flip buckets with the smallest projection
    magnitude. The fan-out multiplies only the broadcast query side —
    the corpus is still signed and bucketed once.

    Plan: signatures are per-row zip_with folds against literal plane
    arrays (no explode/groupBy, no runtime hashing); candidates come from
    the signature join (query side broadcast); re-rank is the same
    per-row dot as the brute-force path, only over bucket-mates."""

    def proj_col(p: int) -> Column:
        plane = F.array(*[F.lit(v) for v in _plane_components(p)])
        return F.aggregate(
            F.zip_with(
                F.col("embedding"), plane, lambda v, pc: _fx(v.cast("double") * pc)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    def sig_bit(p: int) -> Column:
        return F.when(proj_col(p) >= 0, "1").otherwise("0")

    # (r15 note: a vectorized mapInPandas corpus signing was tried here
    # and REGRESSED — this query evaluates each signature expression
    # once per branch after Catalyst pruning, so the interpreted cost is
    # lower than the Arrow round-trip + Python stage. The pass wins only
    # where all n_tables·bits planes are needed per row — lsh_near_pairs.)
    sigs = emb.select(
        F.col("vec_id"),
        F.col("embedding"),
        _fx_norm2("embedding").alias("norm2"),
        F.concat(*[sig_bit(p) for p in range(bits)]).alias("sig"),
    )
    q = sigs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("nq2"),
        "sig",
    )
    if n_flip > 0:
        # rank bit positions by |projection| (smallest margin first) and
        # probe the base signature plus its n_flip lowest-margin flips
        margins = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(proj_col(p)).alias("m"), F.lit(p).alias("p")
                    )
                    for p in range(bits)
                ]
            )
        )
        flip_positions = F.slice(
            F.transform(margins, lambda s: s["p"]), 1, n_flip
        )

        def flipped(pos: Column) -> Column:  # pos is 0-based
            return F.concat(
                F.col("sig").substr(F.lit(1), pos),
                F.when(
                    F.col("sig").substr(pos + 1, F.lit(1)) == "1", F.lit("0")
                ).otherwise(F.lit("1")),
                F.col("sig").substr(pos + 2, F.lit(bits) - pos - 1),
            )

        probe_sigs = F.concat(
            F.array(F.col("sig")), F.transform(flip_positions, flipped)
        )
        # NB: probe_sigs references both `sig` and (via proj_col) the raw
        # `embedding`, so keep both in scope until the explode happens
        q = (
            emb.filter(F.col("vec_id") < n_queries)
            .select(
                F.col("vec_id").alias("qid"),
                "embedding",
                _fx_norm2("embedding").alias("nq2"),
                F.concat(*[sig_bit(p) for p in range(bits)]).alias("sig"),
            )
            .select(
                "qid",
                F.col("embedding").alias("q_emb"),
                "nq2",
                F.explode(probe_sigs).alias("probe_sig"),
            )
            .withColumnRenamed("probe_sig", "sig")
        )
    cos = (
        sigs.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("c_emb"),
            F.col("norm2").alias("nc2"),
            "sig",
        )
        .join(F.broadcast(q), "sig")
        .select(
            "qid",
            "cid",
            _cosine(_fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")).alias(
                "cosine"
            ),
        )
    )
    return _rank_topk(cos)


@query(
    "similarity_topk_lsh",
    oracle=f"""
    WITH sigs AS ({_lsh_sig_sql()}),
    q AS (
      SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    cand AS (
      SELECT sq.vec_id AS qid, sc.vec_id AS cid
      FROM sigs sq JOIN sigs sc ON sq.sig = sc.sig
      WHERE sq.vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings
      WHERE vec_id IN (SELECT DISTINCT cid FROM cand)
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx
      JOIN cand ON cand.qid = q.qid AND cand.cid = c.cid
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL})
    {_RANK_SQL}
    """,
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_topk(spread(load_table(spark, sf_dir, "embeddings")))


N_CENTROIDS = 16  # vec_id < 16 serve as fixed centroids (k-means-lite)


def query_probe_cells(
    emb: DataFrame,
    cen: DataFrame,
    n_queries: int,
    n_probe: int,
    with_embedding: bool = False,
) -> DataFrame:
    """Per query (vec_id < n_queries): the n_probe nearest cells by exact
    fixed-point dot, ties to the lowest cen_id → (qid, cen_id[, q_emb]).
    The ONE definition of probe selection — shared by ivf_topk and the
    quantized scan (quantize.ivf_sq8_topk), so the ranking rule cannot
    drift between consumers or from the oracles' ROW_NUMBER twin."""
    q_scored = (
        emb.filter(F.col("vec_id") < n_queries)
        .crossJoin(F.broadcast(cen))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("q_emb"),
            "cen_id",
            _fx_dot("embedding", "cen_emb").alias("cen_dot"),
        )
    )
    w_probe = Window.partitionBy("qid").orderBy(
        F.col("cen_dot").desc(), F.col("cen_id")
    )
    cols = ["qid", "cen_id"] + (["q_emb"] if with_embedding else [])
    return (
        q_scored.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select(*cols)
    )


def ivf_assign(emb: DataFrame, cen: DataFrame) -> DataFrame:
    """Corpus cell assignment: nearest centroid by fixed-point dot, ties
    to the lower cen_id. ONE partial-aggregating groupBy(vec_id) max_by
    (no window sort over the N×k scored rows); the k×D centroid table is
    broadcast. Returns (vec_id, embedding, cen_id, norm2)."""
    scored = emb.crossJoin(F.broadcast(cen)).select(
        "vec_id",
        "embedding",
        "cen_id",
        _fx_dot("embedding", "cen_emb").alias("cen_dot"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.expr(
                "max_by(cen_id, named_struct('d', cen_dot, 'c', -cen_id))"
            ).alias("cen_id"),
            # embedding is identical on every replicated row of the group
            F.first("embedding").alias("embedding"),
        )
        .select(
            "vec_id", "embedding", "cen_id", _fx_norm2("embedding").alias("norm2")
        )
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    n_centroids: int = N_CENTROIDS,
    centroids: list[list[float]] | None = None,
    n_probe: int = 1,
) -> DataFrame:
    """IVF (inverted-file) ANN: every vector is assigned to its nearest
    centroid by fixed-point dot product (centroids = the first
    n_centroids vectors — a real deployment runs k-means; assignment and
    search are identical); a query searches its `n_probe` nearest cells
    (n_probe > 1 is the standard recall lever for queries near a cell
    boundary — same lever the serving probe exposes, serving.py:187).
    Size n_centroids with ivf_cells_for(N) and n_probe with
    ivf_probes_for(N, cells). Same candidate-generation-then-exact-rerank
    shape as LSH, but the partition is learned from the data rather than
    random hyperplanes — at 100 TB the cell id becomes the lake partition
    key so a query scans n_probe cells' files only.

    Shuffle budget: ONE partial-aggregating groupBy(vec_id) max_by for
    corpus cell assignment (no window sort over the N×k scored rows —
    same shape as kmeans.kmeans_assign), one broadcast join attaching the
    Q·n_probe probe list to candidates, one top-k window on qid. The
    query-side probe ranking IS a window, but over Q×k rows only.

    Assignment ties break on centroid id; all arithmetic is the same
    fixed-point form as the rest of the module, so the DuckDB oracle
    matches bit-for-bit. Pass `centroids` (k×D driver-side lists, e.g.
    from kmeans.kmeans_fit) to search fitted cells instead."""
    if centroids is not None:
        cen = emb.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cen_id long, cen_emb array<double>",
        )
    else:
        cen = emb.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cen_id"), F.col("embedding").alias("cen_emb")
        )
    assigned = ivf_assign(emb, cen)
    # Query-side probe list: rank ALL cells per query, keep the n_probe
    # nearest. Q×k rows — driver-tiny, so the window sort is free; the
    # result broadcasts to the candidate join.
    probes = query_probe_cells(
        emb, cen, n_queries, n_probe, with_embedding=True
    ).select("qid", "q_emb", _fx_norm2("q_emb").alias("nq2"), "cen_id")
    # Each candidate lives in exactly one cell and a query's probe cells
    # are distinct, so the equi-join yields each (qid, cid) at most once.
    cos = (
        assigned.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("c_emb"),
            F.col("norm2").alias("nc2"),
            "cen_id",
        )
        .join(F.broadcast(probes), "cen_id")
        .select(
            "qid",
            "cid",
            _cosine(_fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")).alias(
                "cosine"
            ),
        )
    )
    return _rank_topk(cos)


def _ivf_assign_sql(k_expr: str = str(N_CENTROIDS)) -> str:
    """CTE chain cen/allv/cdots/assigned — `k_expr` is the SQL expression
    for the centroid count (a literal for the fixed-cell queries, a
    corpus-count subquery for the SemDeDup composite's ivf_cells_for
    sizing)."""
    return f"""
    cen AS (
      SELECT vec_id AS cen_id, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings WHERE vec_id < {k_expr}
    ),
    allv AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    cdots AS (
      SELECT allv.vec_id, cen.cen_id,
             SUM(CAST(round(allv.v * cen.cv * {FX}.0) AS BIGINT)) AS d
      FROM allv JOIN cen USING (idx) GROUP BY allv.vec_id, cen.cen_id
    ),
    assigned AS (
      SELECT vec_id, cen_id FROM (
        SELECT vec_id, cen_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cen_id) AS rn
        FROM cdots
      ) WHERE rn = 1
    )
"""


_IVF_ASSIGN_SQL = _ivf_assign_sql()


@query(
    "similarity_topk_ivf",
    oracle=f"""
    WITH {_IVF_ASSIGN_SQL},
    q AS (
      SELECT a.vec_id AS qid, e.idx, e.v AS qv, a.cen_id
      FROM assigned a JOIN allv e USING (vec_id)
      WHERE a.vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT a.vec_id AS cid, e.idx, e.v AS cv, a.cen_id
      FROM assigned a JOIN allv e USING (vec_id)
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx AND q.cen_id = c.cen_id
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL})
    {_RANK_SQL}
    """,
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell ANN top-10 over the fixture embeddings."""
    return ivf_topk(spread(load_table(spark, sf_dir, "embeddings")))


N_PROBE = 3  # fixture probe width for the registered n_probe > 1 query


@query(
    "similarity_topk_ivf_probe",
    oracle=f"""
    WITH {_IVF_ASSIGN_SQL},
    probes AS (
      SELECT vec_id AS qid, cen_id FROM (
        SELECT vec_id, cen_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cen_id) AS rn
        FROM cdots WHERE vec_id < {N_QUERIES}
      ) WHERE rn <= {N_PROBE}
    ),
    q AS (
      SELECT p.qid, e.idx, e.v AS qv, p.cen_id
      FROM probes p JOIN allv e ON e.vec_id = p.qid
    ),
    c AS (
      SELECT a.vec_id AS cid, e.idx, e.v AS cv, a.cen_id
      FROM assigned a JOIN allv e USING (vec_id)
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx AND q.cen_id = c.cen_id
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL})
    {_RANK_SQL}
    """,
)
def similarity_topk_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 searching each query's 3 nearest cells (n_probe=3)
    — the batch form of the recall lever VERDICT r4 flagged as
    serving-only: a boundary-sitting query's true neighbors in the
    adjacent cell are findable here where the n_probe=1 form misses
    them. The oracle replays probe-cell selection (top-3 centroids by
    exact fixed-point dot, ties to the lowest cen_id) and the in-cell
    re-rank end-to-end."""
    return ivf_topk(
        spread(load_table(spark, sf_dir, "embeddings")), n_probe=N_PROBE
    )


N_TABLES = 2  # OR-amplification: candidate if ANY table's signature matches


def _sig_expr(table: int, bits: int = LSH_BITS) -> Column:
    """`bits`-wide signature for one LSH table (planes table*bits ..)."""

    def bit(p: int) -> Column:
        plane = F.array(*[F.lit(v) for v in _plane_components(p)])
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"), plane, lambda v, pc: _fx(v.cast("double") * pc)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, "1").otherwise("0")

    return F.concat(*[bit(table * bits + p) for p in range(bits)])


def _np_lsh_sigs(n_tables: int, bits: int):
    """mapInPandas body computing the LSH signatures of `_sig_expr` in
    one NumPy pass per Arrow batch, emitting one (vec_id, tbl, sig)
    row per table (r15, guide §4.1/§4.2): the interpreted
    zip_with/aggregate fold costs ~40 µs per plane per row
    (n_tables·bits folds over 64 elements each), while this is a fused
    float64 multiply + HALF_UP round + int64 row-sum per plane —
    measured 1.33 s → 0.55 s for the 2-table corpus signing at sf0.1.
    Worth it only where ALL n_tables·bits planes are evaluated per row
    (the near-pair bucket build); the top-k operators keep the column
    form because Catalyst prunes unused signature expressions there and
    the Arrow round-trip outweighs the smaller saving (measured, see
    lsh_topk).

    Bit-identical to the column form by the ivf_cell_ids argument: the
    per-element product replays `_fx(v.cast("double") * pc)` exactly
    (float32→float64 widening is exact, ±1 multiply is a sign flip,
    ×FX then _np_round_half_up is Spark/DuckDB round()), and the plane
    sum is exact int64 addition, so `proj >= 0` decides the same bit."""
    import numpy as np

    P = np.asarray(
        [_plane_components(p) for p in range(n_tables * bits)],
        dtype=np.float64,
    )

    def run(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {
                        "vec_id": pd.Series([], dtype="int64"),
                        "tbl": pd.Series([], dtype="int32"),
                        "sig": pd.Series([], dtype="object"),
                    }
                )
                continue
            V = np.array(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            sig_bits = np.empty((n, n_tables * bits), dtype=bool)
            for p in range(n_tables * bits):
                proj = _np_round_half_up(V * P[p][None, :] * FX).sum(axis=1)
                sig_bits[:, p] = proj >= 0
            chars = np.where(sig_bits, "1", "0")
            sigs_by_table = [
                ["".join(row) for row in chars[:, t * bits : (t + 1) * bits]]
                for t in range(n_tables)
            ]
            yield pd.DataFrame(
                {
                    "vec_id": np.tile(
                        pdf["vec_id"].to_numpy(np.int64), n_tables
                    ),
                    "tbl": np.repeat(np.arange(n_tables, dtype=np.int32), n),
                    "sig": pd.Series(
                        [s for t in sigs_by_table for s in t],
                        dtype="object",
                    ),
                }
            )

    return run


def lsh_multi_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    n_tables: int = N_TABLES,
    bits: int = LSH_BITS,
) -> DataFrame:
    """Multi-table LSH (OR-amplification, the SCALE.md recall lever):
    n_tables independent `bits`-wide signatures; a candidate matches if ANY
    table agrees. Per-pair recall goes from p to 1-(1-p)^T at T× the
    bucketing cost — measured on planted clusters in tests."""
    # (r15 note: two restructurings were tried here and REGRESSED — a
    # vectorized mapInPandas corpus signing (Arrow round-trip outweighs
    # the saving once Catalyst prunes each branch to its one signature)
    # and a single exploded (tbl, sig) equi-join (the explode's
    # array-of-structs inlines all n_tables·bits folds into ONE Generate
    # expression whose first-run codegen costs ~13 s). The per-table
    # broadcast joins stand.)
    sigs = emb.select(
        "vec_id",
        "embedding",
        _fx_norm2("embedding").alias("norm2"),
        *[_sig_expr(t, bits).alias(f"sig{t}") for t in range(n_tables)],
    )
    q = sigs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("nq2"),
        *[F.col(f"sig{t}").alias(f"qsig{t}") for t in range(n_tables)],
    )
    c = sigs.select(
        F.col("vec_id").alias("cid"),
        *[F.col(f"sig{t}") for t in range(n_tables)],
    )
    cand = None
    for t in range(n_tables):
        m = c.join(
            F.broadcast(q.select("qid", f"qsig{t}")),
            c[f"sig{t}"] == F.col(f"qsig{t}"),
        ).select("qid", "cid")
        cand = m if cand is None else cand.unionByName(m)
    cand = cand.distinct()
    c_full = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        _fx_norm2("embedding").alias("nc2"),
    )
    cos = (
        cand.join(c_full, "cid")
        .join(F.broadcast(q.select("qid", "q_emb", "nq2")), "qid")
        .select(
            "qid",
            "cid",
            _cosine(_fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")).alias(
                "cosine"
            ),
        )
    )
    return _rank_topk(cos)


def _multi_sig_sql() -> str:
    def bits(table: int) -> str:
        return " || ".join(
            f"""CASE WHEN SUM(CAST(round(CAST(v AS DOUBLE)
                                * {_plane_component_sql(table * LSH_BITS + p)}
                                * {FX}.0) AS BIGINT)) >= 0
                 THEN '1' ELSE '0' END"""
            for p in range(LSH_BITS)
        )

    sig_cols = ", ".join(f"{bits(t)} AS sig{t}" for t in range(N_TABLES))
    return f"""
      SELECT vec_id, {sig_cols}
      FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
                   unnest(embedding) AS v
            FROM embeddings)
      GROUP BY vec_id
    """


@query(
    "similarity_topk_lsh_multi",
    oracle=f"""
    WITH sigs AS ({_multi_sig_sql()}),
    cand AS (
      {" UNION ".join(
        f'''SELECT sq.vec_id AS qid, sc.vec_id AS cid
            FROM sigs sq JOIN sigs sc ON sq.sig{t} = sc.sig{t}
            WHERE sq.vec_id < {N_QUERIES}'''
        for t in range(N_TABLES)
      )}
    ),
    q AS (
      SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings
      WHERE vec_id IN (SELECT DISTINCT cid FROM cand)
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx
      JOIN cand ON cand.qid = q.qid AND cand.cid = c.cid
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL})
    {_RANK_SQL}
    """,
)
def similarity_topk_lsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-table OR-amplified LSH ANN top-10 over the fixture embeddings."""
    return lsh_multi_topk(spread(load_table(spark, sf_dir, "embeddings")))


NEAR_MIN_COSINE = 0.1  # registered-fixture threshold (isotropic noise corpus)


def lsh_near_pairs(
    emb: DataFrame,
    bits: int = LSH_BITS,
    n_tables: int = N_TABLES,
    min_cosine: float = NEAR_MIN_COSINE,
    max_bucket: int | None = None,
) -> DataFrame:
    """Corpus-wide near-pair mining (the ANN dual of dedup): pairs that
    collide in ANY of n_tables LSH signatures, exact-cosine-verified at
    ≥ min_cosine. Same propose→verify shape as dedup_minhash_verified —
    the pair space is the bucket collisions, never N².

    This is also the batch twin of streaming/similarity.py's incremental
    index: the streamed union of (new × accumulated ∪ within-batch) pairs
    over the same signatures equals this result exactly (tested on
    planted clusters).

    Shuffle budget: signatures are computed ONCE (per-row projection, no
    shuffle), then ONE groupBy on (table, sig) enumerates each bucket's
    pairs in place (sorted collect_list + nested-transform expansion — no
    self-join, so the corpus isn't signed twice) + distinct across
    tables, one lookup join for the verify. Bucket populations are
    bounded by the lsh_bits_for sizing rule, so per-group lists stay
    small by construction."""
    # r15: signatures via the vectorized NumPy pass (bit-identical to
    # the _sig_expr struct-array explode this replaces — see
    # _np_lsh_sigs; measured 1.33 s → 0.55 s for this stage at sf0.1)
    buckets = emb.select("vec_id", "embedding").mapInPandas(
        _np_lsh_sigs(n_tables, bits),
        "vec_id long, tbl int, sig string",
    )
    per_bucket = (
        buckets.groupBy("tbl", "sig")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket is not None:  # hash-flooding skew valve (SCALE.md;
        per_bucket = per_bucket.filter(  # see minhash_band_pairs)
            F.size("ids") <= max_bucket
        )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS id1, y AS id2))))"
    )
    cand = (
        per_bucket.select(F.explode(pair_expr).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )
    return cosine_verified_pairs(emb, cand, min_cosine)


def _np_pair_cosine(it):
    """mapInPandas body: fixed-point cosine over (id1, e1, n1, id2, e2,
    n2) rows, vectorized. Bit-identical to the _cosine(_fx_dot(...))
    column form — float64 multiply order (e1·e2, then ×FX), exact
    HALF_UP rounding, int64 sum, then the same double divisions — but
    one fused NumPy pass per Arrow batch instead of an interpreted
    zip_with/aggregate fold per row (measured ~5× on the near-pair
    verify at sf0.1). Zero-norm rows (NULL cosine in the column form)
    are dropped here; every caller filters on cosine anyway."""
    import numpy as np

    for pdf in it:
        if len(pdf) == 0:
            yield pd.DataFrame({"id1": [], "id2": [], "cosine": []})
            continue
        e1 = np.array([np.asarray(e, dtype=np.float64) for e in pdf["e1"]])
        e2 = np.array([np.asarray(e, dtype=np.float64) for e in pdf["e2"]])
        dot = _np_round_half_up(e1 * e2 * FX).sum(axis=1)
        n1 = pdf["n1"].to_numpy(np.int64).astype(np.float64)
        n2 = pdf["n2"].to_numpy(np.int64).astype(np.float64)
        b = np.sqrt(n1 / FX) * np.sqrt(n2 / FX)
        ok = b != 0.0
        cos = np.divide(dot.astype(np.float64) / FX, b, where=ok)
        yield pd.DataFrame(
            {
                "id1": pdf["id1"][ok],
                "id2": pdf["id2"][ok],
                "cosine": cos[ok],
            }
        )


def cosine_verified_pairs(
    emb: DataFrame,
    cand: DataFrame,
    min_cosine: float,
    vectorized: bool = False,
) -> DataFrame:
    """Exact-cosine VERIFIER over candidate (id1, id2) pairs — the
    embedding-side twin of dedup.ngram_jaccard_pairs' candidate-scoped
    contract: pair space = |cand|, never N². Two keyed lookups attach
    each side's vector + norm.

    vectorized=False (default) computes the cosine as a column
    expression (per-row fixed-point fold); vectorized=True routes the
    joined rows through the bit-identical _np_pair_cosine mapInPandas
    fast path. Crossover is the candidate count: the Arrow round-trip
    costs ~1 s flat, the interpreted fold ~20 µs/pair — measured at
    sf0.1, the 7.7k-pair LSH verify is faster in columns (2.7 vs 3.8 s)
    and the 250k-pair SemDeDup verify is faster vectorized. Callers
    whose pair volume scales quadratically-within-bucket (ivf_cell_pairs)
    pass True."""
    vecs = emb.select(
        "vec_id", "embedding", _fx_norm2("embedding").alias("norm2")
    )
    v1 = vecs.select(
        F.col("vec_id").alias("id1"),
        F.col("embedding").alias("e1"),
        F.col("norm2").alias("n1"),
    )
    v2 = vecs.select(
        F.col("vec_id").alias("id2"),
        F.col("embedding").alias("e2"),
        F.col("norm2").alias("n2"),
    )
    joined = cand.join(v1, "id1").join(v2, "id2")
    if vectorized:
        scored = joined.mapInPandas(
            _np_pair_cosine, "id1 long, id2 long, cosine double"
        )
    else:
        scored = joined.select(
            "id1",
            "id2",
            _cosine(_fx_dot("e1", "e2"), F.col("n1"), F.col("n2")).alias(
                "cosine"
            ),
        )
    return scored.filter(F.col("cosine") >= min_cosine)


def _near_pairs_sql(min_cosine: float | None = None) -> str:
    """Self-contained near-pairs SELECT (used directly as the
    similarity_near_pairs oracle and nested, at a tighter threshold, as
    the `ver` source of the cluster-resolution oracle)."""
    if min_cosine is None:
        min_cosine = NEAR_MIN_COSINE
    return f"""
    WITH sigs AS ({_multi_sig_sql()}),
    cand AS (
      SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
      FROM sigs a JOIN sigs b
        ON a.vec_id < b.vec_id
       AND ({" OR ".join(f"a.sig{t} = b.sig{t}" for t in range(N_TABLES))})
    ),
    v AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    dots AS (
      SELECT c.id1, c.id2,
             SUM(CAST(round(v1.val * v2.val * {FX}.0) AS BIGINT)) AS dot_fx
      FROM cand c
      JOIN v v1 ON v1.vec_id = c.id1
      JOIN v v2 ON v2.vec_id = c.id2 AND v2.idx = v1.idx
      GROUP BY c.id1, c.id2
    ),
    norms AS ({_NORMS_SQL})
    SELECT d.id1, d.id2,
           (CAST(d.dot_fx AS DOUBLE) / {FX})
             / nullif(sqrt(CAST(n1.norm2_fx AS DOUBLE) / {FX})
                      * sqrt(CAST(n2.norm2_fx AS DOUBLE) / {FX}), 0) AS cosine
    FROM dots d
    JOIN norms n1 ON n1.vec_id = d.id1
    JOIN norms n2 ON n2.vec_id = d.id2
    WHERE (CAST(d.dot_fx AS DOUBLE) / {FX})
             / nullif(sqrt(CAST(n1.norm2_fx AS DOUBLE) / {FX})
                      * sqrt(CAST(n2.norm2_fx AS DOUBLE) / {FX}), 0)
          >= {min_cosine}
    """


@query("similarity_near_pairs", oracle=_near_pairs_sql())
def similarity_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-collision near pairs at cosine ≥ 0.1 over fixture embeddings
    (2 tables × 8 bits) — the oracle-checked batch twin of the streaming
    incremental index."""
    return lsh_near_pairs(spread(load_table(spark, sf_dir, "embeddings")))


# Clustering threshold, deliberately TIGHTER than the mining query's 0.1:
# transitive closure amplifies loose pairs (at 0.1 the fixture's noise
# graph collapses into one mega-component — 329 of 427 members at sf0.01
# — and "keep one of 329 random docs" is not a dedup). 0.3 is the noise
# tail on this corpus, giving small interpretable clusters that exercise
# the mechanics; a production embedding near-dup run sets ~0.9.
CLUSTER_MIN_COSINE = 0.3


def _similarity_cluster_sql() -> str:
    from kstreams_spark.operators.dedup import cc_closure_sql

    return f"""
    WITH RECURSIVE ver AS (
      SELECT id1 AS doc_id1, id2 AS doc_id2
      FROM ({_near_pairs_sql(CLUSTER_MIN_COSINE)})
    ),
    {cc_closure_sql()},
    sizes AS (
      SELECT keep_id, COUNT(*) AS n_members FROM labels GROUP BY keep_id
    )
    SELECT l.doc_id AS vec_id, l.keep_id, s.n_members,
           CAST(l.doc_id = l.keep_id AS BOOLEAN) AS is_kept
    FROM labels l JOIN sizes s USING (keep_id)
    """


@query("similarity_cluster_resolution", oracle=_similarity_cluster_sql())
def similarity_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side survivor resolution — the same pairs→clusters→
    canonical-member ending the text dedup family got in round 5, applied
    to the LSH near-pair graph at CLUSTER_MIN_COSINE (see the constant's
    comment for why the clustering threshold is tighter than the mining
    query's): connected components over the verified cosine pairs,
    keep_id = min vec_id per cluster. The oracle nests the full
    near-pairs statement as the `ver` CTE and replays the closure with
    WITH RECURSIVE."""
    from kstreams_spark.operators.dedup import resolve_clusters

    pairs = lsh_near_pairs(
        spread(load_table(spark, sf_dir, "embeddings")),
        min_cosine=CLUSTER_MIN_COSINE,
    ).select(F.col("id1").alias("doc_id1"), F.col("id2").alias("doc_id2"))
    return resolve_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "keep_id", "n_members", "is_kept"
    )


N_FLIP = 2  # registered multi-probe width


def _lsh_multiprobe_sql() -> str:
    margins = ",\n             ".join(
        f"""ABS(SUM(CAST(round(CAST(v AS DOUBLE) * {_plane_component_sql(p)}
                            * {FX}.0) AS BIGINT))) AS m{p}"""
        for p in range(LSH_BITS)
    )
    mrows = "\n      UNION ALL ".join(
        f"SELECT vec_id, {p} AS p, m{p} AS m FROM margins"
        for p in range(LSH_BITS)
    )
    return f"""
    WITH sigs AS ({_lsh_sig_sql()}),
    qunn AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
             unnest(embedding) AS v
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    margins AS (
      SELECT vec_id, {margins}
      FROM qunn GROUP BY vec_id
    ),
    mrows AS (
      {mrows}
    ),
    flips AS (
      SELECT vec_id, p FROM (
        SELECT vec_id, p,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY m, p) AS rn
        FROM mrows
      ) WHERE rn <= {N_FLIP}
    ),
    probes AS (
      SELECT vec_id AS qid, sig AS psig
      FROM sigs WHERE vec_id < {N_QUERIES}
      UNION
      SELECT s.vec_id, substr(s.sig, 1, f.p)
             || (CASE WHEN substr(s.sig, f.p + 1, 1) = '1'
                      THEN '0' ELSE '1' END)
             || substr(s.sig, f.p + 2)
      FROM sigs s JOIN flips f USING (vec_id)
      WHERE s.vec_id < {N_QUERIES}
    ),
    cand AS (
      SELECT DISTINCT pr.qid, sc.vec_id AS cid
      FROM probes pr JOIN sigs sc ON sc.sig = pr.psig
    ),
    q AS (
      SELECT vec_id AS qid, idx, CAST(v AS DOUBLE) AS qv FROM qunn
    ),
    c AS (
      SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings
      WHERE vec_id IN (SELECT DISTINCT cid FROM cand)
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx
      JOIN cand ON cand.qid = q.qid AND cand.cid = c.cid
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL})
    {_RANK_SQL}
    """


@query("similarity_topk_lsh_probe", oracle=_lsh_multiprobe_sql())
def similarity_topk_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN top-10: each query also probes its 2
    lowest-margin single-bit-flip buckets (ranked by |projection|, ties
    to the low bit index — identical ordering in the oracle's window).
    The recall lever that costs probe IO instead of index storage,
    hash-verified end-to-end: margin ranking, bit splice, bucket join,
    and fixed-point re-rank all match DuckDB bit-for-bit."""
    return lsh_topk(
        spread(load_table(spark, sf_dir, "embeddings")), n_flip=N_FLIP
    )


# --- SemDeDup composite (VERDICT r5 next-round #4) -----------------------
# Semantic dedup the SemDeDup way (Abbas et al. 2023): partition the
# embedding space into cells, mine near-pairs WITHIN each cell only,
# resolve clusters, keep one canonical doc per cluster. The registered
# fixture query uses the deterministic first-k IVF cells (the same cells
# similarity_topk_ivf searches, so the whole chain stays oracle-able);
# a production run passes kmeans.kmeans_fit centroids into ivf_assign —
# identical downstream machinery, rows-only check (Lloyd is iterative).
# Threshold: CLUSTER_MIN_COSINE — see that constant's comment for why
# closure needs a tighter threshold than pair mining on this corpus.
SEMDEDUP_MIN_COSINE = CLUSTER_MIN_COSINE


def semdedup_cells_for(n: int) -> int:
    """Cell-count sizing for SemDeDup, k ≈ √(N/2) — NOT ivf_cells_for's
    4·√N: search wants many small cells (per-QUERY scan cost ∝ N/k), but
    SemDeDup pays BOTH the assignment (N·k dots) and the within-cell
    pair verify (N²/2k dots); total dot work N·k + N²/2k is minimized at
    k = √(N/2). At N=5000 the search rule's k=283 costs 1.4M assignment
    dots for 42k verify dots — 3× the balanced total (measured 11.6 s vs
    the balanced form at sf0.1).

    This balances total WORK but lets per-CELL population grow as √(2N)
    — per-cell pair counts grow O(N), and one cell's pairs materialize
    from one collect_list row, so a single task would hold ~10⁹ pairs at
    N=10⁹ (VERDICT r6 "What's wrong" #2). The per-TASK bound comes from
    the companion occupancy cap: split_overcap_cells() sub-splits any
    cell past SEMDEDUP_MAX_CELL members, so this rule only sets the
    assignment/verify work balance, never the task size."""
    return max(1, round(math.sqrt(n / 2)))


# Occupancy cap B for SemDeDup cells: any cell past this population is
# sub-split before pair enumeration (split_overcap_cells), bounding one
# task's pair space at ~B²/2 ≈ 2M pairs regardless of corpus size. Mean
# cell population √(2N) crosses B at N = B²/2 ≈ 2M vectors — below that
# (every fixture sf) the split is a structural no-op and the registered
# query's values are byte-identical to the uncapped form.
SEMDEDUP_MAX_CELL = 2048


def split_overcap_cells(
    emb: DataFrame, assigned: DataFrame, cap: int
) -> DataFrame:
    """Block-split over-cap cells along a 1-D SEMANTIC ordering: members
    of any cell past `cap` are ranked by their fixed-point dot with the
    cell's centroid (ties → vec_id), then cut into contiguous blocks of
    exactly ≤ cap members (sub_id = floor((rank-1)/cap); -1 for cells
    under cap). Pair enumeration groups by (cen_id, sub_id), so one
    task's pair space is HARD-bounded at cap·(cap-1)/2 — no distribution
    (skew, near-identical masses, adversarial clustering) can exceed it;
    a nearest-sub-centroid re-assignment was tried first and measured
    12× over cap on tightly clustered data because identical vectors all
    glue to one sub-centroid.

    Recall inside a split cell degrades only at block BOUNDARIES: the
    centroid-dot ordering places near-duplicates at adjacent ranks, so
    they land in the same block except where a cut crosses them (pinned
    in tests/test_dedup_quality.py::test_overcap_split_bounds_cells). A
    mass of t near-identical vectors yields ~t/cap kept docs instead of
    1 — the residual belongs to EXACT dedup, which every curation
    composite runs first.

    Scale shape: NO driver state — the centroid lookup is a cen_id-equi
    join against the embedding table (centroids ARE the first-k
    vectors), the dot is pop-many folds (cheaper than any re-assignment
    scheme's pop·m), and the rank window partitions by cen_id. Shuffle
    budget: pops agg (1) + centroid join (broadcast pops; the dot join
    shuffles on vec_id) + one cen_id window."""
    from pyspark.sql import Window

    pops = assigned.groupBy("cen_id").agg(F.count(F.lit(1)).alias("pop"))
    over = assigned.join(F.broadcast(pops.filter(F.col("pop") > cap)), "cen_id")
    vecs = emb.select("vec_id", "embedding")
    cen_vecs = vecs.select(
        F.col("vec_id").alias("cen_id"), F.col("embedding").alias("cen_emb")
    )
    cdot = (
        over.select("cen_id", "vec_id")
        .join(vecs, "vec_id")
        .join(cen_vecs, "cen_id")
        .select(
            "cen_id", "vec_id", _fx_dot("embedding", "cen_emb").alias("d")
        )
    )
    ranked = cdot.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cen_id").orderBy(F.col("d").desc(), "vec_id")
        ),
    ).select(
        "vec_id",
        F.floor((F.col("rk") - 1) / F.lit(float(cap)))
        .cast("long")
        .alias("sub_id"),
    )
    return assigned.join(ranked, "vec_id", "left").withColumn(
        "sub_id", F.coalesce("sub_id", F.lit(-1))
    )


def _np_round_half_up(x):
    """NumPy twin of Spark/DuckDB round(): half-AWAY-from-zero. np.rint
    is half-to-EVEN, which differs only at exactly-representable .5
    fractions — fix just those. Needed so the vectorized assignment
    below is bit-identical to the _fx column expression and the oracle's
    SQL round()."""
    import numpy as np

    t = np.trunc(x)
    r = np.where(np.abs(x - t) == 0.5, t + np.sign(x), np.rint(x))
    return r.astype(np.int64)


def ivf_cell_ids(emb: DataFrame, cen_mat: list[list[float]]) -> DataFrame:
    """Vectorized cell assignment: (vec_id, cen_id) via a mapInPandas
    argmax over the broadcast (k, D) centroid matrix. Bit-identical to
    ivf_assign's column-expression form — same float64 multiply order
    (v·c, then ×FX), exact HALF_UP rounding (_np_round_half_up), int64
    sums, ties to the LOWEST cen_id (strict-> update keeps first max) —
    but ~50× faster: the zip_with/aggregate fold is interpreted per
    element, while this is one fused NumPy pass per centroid per Arrow
    batch. Driver state is the O(k·D) centroid matrix, the same bound
    kmeans.py documents. cen_mat[j] must be the embedding of cen_id j
    (contiguous first-k ids, as the fixture queries use)."""
    import numpy as np

    C = np.asarray(cen_mat, dtype=np.float64)

    def run(it: "object"):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "cen_id": []})
                continue
            V = np.array(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            best_d = None
            best_j = None
            for j in range(C.shape[0]):
                d = _np_round_half_up(V * C[j][None, :] * FX).sum(axis=1)
                if best_d is None:
                    best_d = d
                    best_j = np.zeros(len(d), dtype=np.int64)
                else:
                    upd = d > best_d
                    best_d = np.where(upd, d, best_d)
                    best_j = np.where(upd, j, best_j)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].astype("int64"), "cen_id": best_j}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, cen_id long"
    )


def ivf_cell_pairs(
    emb: DataFrame,
    n_centroids: int = N_CENTROIDS,
    min_cosine: float = SEMDEDUP_MIN_COSINE,
    max_cell: int | None = SEMDEDUP_MAX_CELL,
    n_rows: int | None = None,
) -> DataFrame:
    """Within-cell candidate pairs, exact-cosine verified. Pair space is
    quadratic only WITHIN a cell (the published SemDeDup cost model);
    callers size n_centroids with semdedup_cells_for(N) ≈ √(N/2) for the
    work balance, and the `max_cell` occupancy cap sub-splits any cell
    past B members (split_overcap_cells) so one task's pair space stays
    ~B²/2 no matter how the population skews or the corpus grows.
    Same in-bucket sorted-list enumeration as every other candidate
    generator (no self-join). Assignment runs through the vectorized
    ivf_cell_ids fast path (bit-identical to ivf_assign; see its
    docstring).

    `n_rows` (r15): the corpus row count, when the caller already
    measured it. If n_rows ≤ max_cell, NO cell can exceed the cap at
    any distribution (a cell's population is bounded by the corpus),
    so the sub-split is provably the identity (every sub_id would be
    -1) and its pops-agg + centroid-dot join + rank window are skipped
    outright — ~1.1 s of structural no-op at sf0.1 (guide §2.1: remove
    the shuffle, don't tune it). Above the cap, or when n_rows is
    unknown, the split runs exactly as before."""
    cen_rows = (
        emb.filter(F.col("vec_id") < n_centroids)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()  # O(k·D) driver state, the kmeans.py bound
    )
    cen_mat = [[float(x) for x in r.embedding] for r in cen_rows]
    assigned = ivf_cell_ids(emb, cen_mat)
    keys = ["cen_id"]
    if max_cell is not None and (n_rows is None or n_rows > max_cell):
        assigned = split_overcap_cells(emb, assigned, max_cell)
        keys = ["cen_id", "sub_id"]
    per_cell = (
        assigned.groupBy(*keys)
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS id1, y AS id2))))"
    )
    cand = per_cell.select(F.explode(pair_expr).alias("p")).select(
        "p.id1", "p.id2"
    )
    return cosine_verified_pairs(emb, cand, min_cosine, vectorized=True)


def _cell_cand_sql(cap: int) -> str:
    """CTE chain pops → ranked → finalcell → cand: the occupancy-cap
    block-split (split_overcap_cells) replayed in SQL, downstream of the
    `assigned`/`allv` CTEs from _ivf_assign_sql. Bit-identical
    arithmetic: same fixed-point centroid dot, same (d DESC, vec_id)
    rank order, same double-floor block cut, -1 sub_id for cells under
    cap."""
    return f"""
    pops AS (SELECT cen_id, COUNT(*) AS pop FROM assigned GROUP BY cen_id),
    cdot AS (
      SELECT a.vec_id, a.cen_id,
             SUM(CAST(round(v1.v * v2.v * {FX}.0) AS BIGINT)) AS d
      FROM assigned a
      JOIN pops p USING (cen_id)
      JOIN allv v1 ON v1.vec_id = a.vec_id
      JOIN allv v2 ON v2.vec_id = a.cen_id AND v2.idx = v1.idx
      WHERE p.pop > {cap}
      GROUP BY a.vec_id, a.cen_id
    ),
    ranked AS (
      SELECT vec_id,
             CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY cen_id
                                            ORDER BY d DESC, vec_id) - 1)
                        / CAST({cap} AS DOUBLE)) AS BIGINT) AS sub_id
      FROM cdot
    ),
    finalcell AS (
      SELECT a.vec_id, a.cen_id, COALESCE(r.sub_id, -1) AS sub_id
      FROM assigned a LEFT JOIN ranked r USING (vec_id)
    ),
    cand AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM finalcell a JOIN finalcell b
        ON a.cen_id = b.cen_id AND a.sub_id = b.sub_id
       AND a.vec_id < b.vec_id
    )"""


def _semantic_dedup_sql(cap: int | None = None) -> str:
    from kstreams_spark.operators.dedup import cc_closure_sql

    if cap is None:
        cap = SEMDEDUP_MAX_CELL
    cos = (
        f"(CAST(d.dot_fx AS DOUBLE) / {FX})"
        f" / nullif(sqrt(CAST(n1.norm2_fx AS DOUBLE) / {FX})"
        f" * sqrt(CAST(n2.norm2_fx AS DOUBLE) / {FX}), 0)"
    )
    # semdedup_cells_for(N) as SQL: cells = round(√(N/2)) from the
    # measured corpus count, exactly what the Spark side derives.
    # (round() here is half-away-from-zero vs Python's half-to-even;
    # √(N/2) lands on exactly .5 for no integer N.)
    k_expr = (
        "(SELECT CAST(round(sqrt(COUNT(*) / 2.0)) AS BIGINT) FROM embeddings)"
    )
    return f"""
    WITH RECURSIVE {_ivf_assign_sql(k_expr)},
    {_cell_cand_sql(cap)},
    dots AS (
      SELECT c.id1, c.id2,
             SUM(CAST(round(v1.v * v2.v * {FX}.0) AS BIGINT)) AS dot_fx
      FROM cand c
      JOIN allv v1 ON v1.vec_id = c.id1
      JOIN allv v2 ON v2.vec_id = c.id2 AND v2.idx = v1.idx
      GROUP BY c.id1, c.id2
    ),
    norms AS ({_NORMS_SQL}),
    ver AS (
      SELECT d.id1 AS doc_id1, d.id2 AS doc_id2
      FROM dots d
      JOIN norms n1 ON n1.vec_id = d.id1
      JOIN norms n2 ON n2.vec_id = d.id2
      WHERE {cos} >= {SEMDEDUP_MIN_COSINE}
    ),
    {cc_closure_sql()},
    losers AS (SELECT doc_id FROM labels WHERE doc_id <> keep_id)
    SELECT dd.source,
           COUNT(*) AS n_docs,
           COUNT(l.doc_id) AS n_dropped,
           COUNT(*) - COUNT(l.doc_id) AS n_kept
    FROM documents dd LEFT JOIN losers l USING (doc_id)
    GROUP BY dd.source
    """


@query("composite_semantic_dedup", oracle=_semantic_dedup_sql())
def composite_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup composed from three green operators: IVF cell assignment
    (ivf_assign — the similarity_topk_ivf cells) → within-cell exact-
    cosine near-pairs (ivf_cell_pairs) → connected-components survivor
    resolution (dedup.resolve_clusters) → per-source kept/dropped corpus
    stats over `documents` (vec_id ≡ doc_id in the fixture lake).

    Shuffle budget: assignment groupBy (1), per-cell pair enumeration
    groupBy (1), two verify lookups, the CC loop over the PAIR graph
    only, one broadcast left join against the documents scan, final
    1-key agg. The oracle replays the full chain — cell assignment,
    within-cell mining, transitive closure — in one WITH RECURSIVE
    statement. Cell count is derived from the measured corpus
    (semdedup_cells_for ≈ √(N/2), balancing assignment vs verify dot
    work — the parquet count is metadata-cheap); per-TASK pair space is
    bounded separately by the SEMDEDUP_MAX_CELL occupancy cap (any cell
    past B members sub-splits semantically before enumeration — a
    structural no-op below N ≈ B²/2 ≈ 2M, so at fixture scale the values
    are identical to the uncapped form). The oracle computes the
    identical k with a COUNT(*) subquery and replays the sub-split
    (_cell_cand_sql)."""
    from kstreams_spark.operators.dedup import resolve_clusters

    raw = load_table(spark, sf_dir, "embeddings")
    n = raw.count()
    k = semdedup_cells_for(n)
    emb = spread(raw)
    pairs = ivf_cell_pairs(emb, n_centroids=k, n_rows=n).select(
        F.col("id1").alias("doc_id1"), F.col("id2").alias("doc_id2")
    )
    losers = (
        resolve_clusters(pairs).filter(~F.col("is_kept")).select("doc_id")
    )
    d = load_table(spark, sf_dir, "documents")
    joined = d.select("doc_id", "source").join(
        F.broadcast(losers.withColumn("is_drop", F.lit(1))), "doc_id", "left"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("is_drop").alias("n_dropped"),
        (F.count(F.lit(1)) - F.count("is_drop")).alias("n_kept"),
    )


# --- label-aware neighbor ops (contrastive-training data prep) ------------
# The embeddings fixture carries a `label` column; these two queries are
# the standard uses a training pipeline has for it: mining hard negatives
# for contrastive losses (nearest vectors of a DIFFERENT class) and
# scoring embedding quality by kNN label agreement.


@query(
    "similarity_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlab,
             generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cid, label AS clab,
             generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx AND q.qlab <> c.clab
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL})
    {_RANK_SQL}
    """,
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: per query (vec_id < {N_QUERIES}), the top-10
    most-similar vectors of a DIFFERENT label — the contrastive-training
    negatives that actually move the loss. Same broadcast-queries ×
    candidate scan as brute force; the label inequality filters BEFORE
    the dot product is computed, so excluded same-class pairs cost
    nothing. At scale this composes with the ANN index exactly like
    top-k does (probe, filter label, re-rank)."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlab"),
        F.col("embedding").alias("q_emb"),
        _fx_norm2("embedding").alias("nq2"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clab"),
        F.col("embedding").alias("c_emb"),
        _fx_norm2("embedding").alias("nc2"),
    )
    cos = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("clab") != F.col("qlab"))
        .select(
            "qid",
            "cid",
            _cosine(
                _fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")
            ).alias("cosine"),
        )
    )
    return _rank_topk(cos)


KNN_K = 10


@query(
    "similarity_knn_label_vote",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx AND q.qid <> c.cid
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL}),
    topk AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, cid) AS rank
        FROM cos
      ) WHERE rank <= {KNN_K}
    ),
    votes AS (
      SELECT t.qid, e.label, COUNT(*) AS cnt
      FROM topk t JOIN embeddings e ON e.vec_id = t.cid
      GROUP BY t.qid, e.label
    ),
    winner AS (
      SELECT qid, label AS predicted_label, cnt AS n_votes FROM (
        SELECT qid, label, cnt,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cnt DESC, label) AS rk
        FROM votes
      ) WHERE rk = 1
    )
    SELECT w.qid, e.label AS true_label, w.predicted_label,
           w.n_votes::BIGINT AS n_votes,
           (CASE WHEN w.predicted_label = e.label THEN 1 ELSE 0 END)::BIGINT
             AS is_correct
    FROM winner w JOIN embeddings e ON e.vec_id = w.qid
    """,
)
def similarity_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality probe: each query's label predicted by majority
    vote of its {KNN_K} nearest neighbors (self excluded), ties to the
    lowest label — the standard kNN sanity metric a pipeline runs after
    (re)embedding a corpus. Exact top-k; the vote is one extra tiny agg
    + max_by on Q rows."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
        _fx_norm2("embedding").alias("nq2"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clab"),
        F.col("embedding").alias("c_emb"),
        _fx_norm2("embedding").alias("nc2"),
    )
    cos = (
        c.crossJoin(F.broadcast(q.drop("true_label")))
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            "clab",
            _cosine(
                _fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    topk = cos.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= KNN_K
    )
    votes = topk.groupBy("qid", "clab").agg(F.count(F.lit(1)).alias("cnt"))
    winner = votes.groupBy("qid").agg(
        F.expr(
            "max_by(clab, named_struct('c', cnt, 't', -clab))"
        ).alias("predicted_label"),
        F.max("cnt").cast("long").alias("n_votes"),
    )
    return winner.join(
        q.select("qid", "true_label"), "qid"
    ).select(
        "qid",
        "true_label",
        "predicted_label",
        "n_votes",
        F.when(F.col("predicted_label") == F.col("true_label"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_correct"),
    )


@query(
    "similarity_triplets",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlab,
             generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cid, label AS clab,
             generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings
    ),
    dots AS (
      SELECT q.qid, MIN(q.qlab) AS qlab, c.cid, MIN(c.clab) AS clab,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx AND q.qid <> c.cid
      GROUP BY q.qid, c.cid
    ),
    pos AS (
      SELECT qid, cid AS pos_id, dot_fx::BIGINT AS pos_fx FROM (
        SELECT qid, cid, dot_fx,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dot_fx DESC, cid) AS rn
        FROM dots WHERE qlab = clab) WHERE rn = 1
    ),
    neg AS (
      SELECT qid, cid AS neg_id, dot_fx::BIGINT AS neg_fx FROM (
        SELECT qid, cid, dot_fx,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dot_fx DESC, cid) AS rn
        FROM dots WHERE qlab <> clab) WHERE rn = 1
    )
    SELECT p.qid, p.pos_id, p.pos_fx, n.neg_id, n.neg_fx,
           CASE WHEN p.pos_fx > n.neg_fx THEN 1 ELSE 0 END AS margin_ok
    FROM pos p JOIN neg n USING (qid)
    """,
)
def similarity_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining — the artifact contrastive training consumes:
    per anchor (vec_id < {N_QUERIES}), the nearest SAME-label vector
    (positive, self excluded) and the nearest DIFFERENT-label vector
    (the hard negative), with fixed-point scores and a margin_ok flag
    (positive closer than negative — the triplet is already satisfied;
    a training run weights the violated ones). Composes the
    hard-negatives and knn-vote machinery into one output.

    Scale shape: ONE broadcast-queries × corpus scan computes all dots;
    both elections are per-qid windows over the scored rows; at index
    scale the scan is replaced by two ANN probes (label-filtered) over
    the serving index, same downstream shape."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlab"),
        F.col("embedding").alias("q_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clab"),
        F.col("embedding").alias("c_emb"),
    )
    dots = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "qlab",
            "cid",
            "clab",
            _fx_dot("q_emb", "c_emb").alias("dot_fx"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot_fx").desc(), "cid")
    pos = (
        dots.filter(F.col("qlab") == F.col("clab"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("cid").alias("pos_id"), F.col("dot_fx").alias("pos_fx"))
    )
    neg = (
        dots.filter(F.col("qlab") != F.col("clab"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("cid").alias("neg_id"), F.col("dot_fx").alias("neg_fx"))
    )
    return pos.join(neg, "qid").select(
        "qid",
        "pos_id",
        "pos_fx",
        "neg_id",
        "neg_fx",
        F.when(F.col("pos_fx") > F.col("neg_fx"), 1)
        .otherwise(0)
        .cast("long")
        .alias("margin_ok"),
    )


@query(
    "similarity_label_separability",
    oracle=f"""
    WITH el AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    cen AS (
      SELECT label, dim,
             CAST(SUM(CAST(v AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS c
      FROM el GROUP BY label, dim
    ),
    dots AS (
      SELECT el.vec_id, el.label AS vlab, cen.label AS clab,
             SUM(CAST(round(el.v * cen.c * {FX}.0) AS BIGINT)) AS dot_fx
      FROM el JOIN cen ON cen.dim = el.dim
      GROUP BY el.vec_id, el.label, cen.label
    ),
    own AS (SELECT vec_id, vlab, dot_fx AS own_fx FROM dots
            WHERE vlab = clab),
    other AS (
      SELECT vec_id, MAX(dot_fx) AS best_other_fx
      FROM dots WHERE vlab <> clab GROUP BY vec_id
    )
    SELECT o.vlab AS label, COUNT(*) AS n,
           SUM(CASE WHEN o.own_fx > t.best_other_fx THEN 1 ELSE 0 END)::BIGINT
             AS n_separated
    FROM own o JOIN other t USING (vec_id)
    GROUP BY o.vlab
    """,
)
def similarity_label_separability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-space class-separability report — the health card an
    embedding column gets before anyone trains on it: per label, how
    many vectors sit closer (by dot) to their OWN label's centroid than
    to the best other centroid. Labels whose separated fraction is low
    are entangled in embedding space — the signal that kNN features,
    classifier heads, or label-filtered retrieval over this column will
    underperform, measured without training anything.

    Determinism: centroids from exact per-dim DECIMAL(18,12) sums
    divided once (single IEEE op); every vector×centroid dot is the
    fixed-point fold (round(v·c·FX) per term, exact integer sum) — the
    similarity family's standard arithmetic, so the comparison own >
    best_other is engine-identical. The oracle replays centroid fitting
    AND scoring.

    Scale: per-label per-dim partial+final agg (≤ |labels|·D cells)
    builds the centroids; they broadcast as L arrays (L·D doubles —
    ivf_cells_for's broadcastability argument); the scoring pass is one
    scan of N×L zip_with folds, no shuffle beyond the final ≤|labels|
    agg. The oracle's dim-join formulation would shuffle N·D·L rows —
    the broadcast-array fold is the Spark-first shape."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    el = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "v_raw"),
    ).select(
        "vec_id", "label", "dim", F.col("v_raw").cast("double").alias("v")
    )
    cen = el.groupBy("label", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    cen_arr = cen.groupBy(F.col("label").alias("clab")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, c))), x -> x.c)"
        ).alias("cvec")
    )
    dots = emb.crossJoin(F.broadcast(cen_arr)).select(
        "vec_id",
        F.col("label").alias("vlab"),
        "clab",
        _fx_dot("embedding", "cvec").alias("dot_fx"),
    )
    # r15 (guide §2.4): own/other as ONE conditional aggregation — the
    # former own-filter ⨝ other-agg shape put `dots` (the N×L crossJoin
    # of interpreted 64-term folds, the expensive stage) on TWO plan
    # branches, so it executed twice, plus a vec_id join shuffle.
    # own_fx = the unique vlab==clab dot (MAX over a singleton set);
    # best_other_fx = MAX over the rest — identical values, and the
    # isNotNull filter reproduces the old inner join's drop of any
    # vector lacking either side.
    per_vec = (
        dots.groupBy("vec_id", "vlab")
        .agg(
            F.max(
                F.when(F.col("vlab") == F.col("clab"), F.col("dot_fx"))
            ).alias("own_fx"),
            F.max(
                F.when(F.col("vlab") != F.col("clab"), F.col("dot_fx"))
            ).alias("best_other_fx"),
        )
        .filter(
            F.col("own_fx").isNotNull() & F.col("best_other_fx").isNotNull()
        )
    )
    return per_vec.groupBy(F.col("vlab").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("own_fx") > F.col("best_other_fx"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_separated"),
    )


# --- re-embedding drift report (r9) ----------------------------------------
# The QA step before an incremental index upsert or rebuild: when a new
# embedding-model version re-embeds the corpus, per-vector old↔new cosine
# tells you whether the delta is a refresh (high cosine — upsert the
# changed vectors into the live index, serving.upsert_ivf_*_delta) or a
# model change (drift everywhere — retrain quantizer/centroids, i.e. a
# rebuild by the train-once contract).

DRIFT_COS_FLOOR = 0.995  # below this, a vector counts as drifted


@query(
    "similarity_reembed_drift",
    oracle=f"""
    WITH px AS (
      SELECT vec_id, CAST(v AS DOUBLE) AS a,
             CAST(v AS DOUBLE)
               * (1.0 + ((vec_id + idx - 1) % 9 - 4) * (vec_id % 5) / 100.0) AS b
      FROM (SELECT vec_id, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS idx
            FROM embeddings)
    ),
    agg AS (
      SELECT vec_id,
             SUM(CAST(round(a * b * {FX}.0) AS BIGINT)) AS dot_fx,
             SUM(CAST(round(a * a * {FX}.0) AS BIGINT)) AS n1_fx,
             SUM(CAST(round(b * b * {FX}.0) AS BIGINT)) AS n2_fx
      FROM px GROUP BY vec_id
    )
    SELECT vec_id,
           (dot_fx / {FX}.0)
             / NULLIF(sqrt(n1_fx / {FX}.0) * sqrt(n2_fx / {FX}.0), 0.0)
             AS cos_old_new,
           CASE WHEN (dot_fx / {FX}.0)
                     / NULLIF(sqrt(n1_fx / {FX}.0) * sqrt(n2_fx / {FX}.0),
                              0.0) < {DRIFT_COS_FLOOR}
                THEN 1 ELSE 0 END::BIGINT AS drifted
    FROM agg
    """,
)
def similarity_reembed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-embedding drift report — per vector, the cosine between the
    current embedding and its (here: deterministically synthesized)
    re-embedded version, plus a drifted flag at {DRIFT_COS_FLOOR}. The
    v2 synthesis perturbs each element by a vec/dim-keyed factor whose
    AMPLITUDE also varies by vector (0-16%: |((vec_id+i)%9-4)| ≤ 4
    times (vec_id%5) ≤ 4, over 100), so the fixture spans
    exact copies, refresh-grade, and drifted vectors; a real run
    joins the two embedding versions on vec_id instead — same one
    zip_with scan per vector, no shuffle at all (the join is the only
    exchange, and it vanishes when both versions are bucketed on
    vec_id).

    Exactness: fixed-point int64 dot/norms per row (fold order
    irrelevant — long addition is associative), ONE float division
    chain mirrored token-for-token in the oracle; the perturbation
    factor is integer arithmetic scaled by the same literal in both
    engines. Spark's transform index is 0-based, DuckDB's
    generate_subscripts 1-based — aligned by (idx - 1), the standing
    ordinality rule."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    a = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    b = F.expr(
        "transform(embedding, (x, i) -> CAST(x AS DOUBLE) "
        "* (1.0 + ((vec_id + i) % 9 - 4) * (vec_id % 5) / 100.0))"
    )
    withv = emb.select("vec_id", a.alias("a"), b.alias("b"))
    cos = _cosine(
        _fx_dot("a", "b"), _fx_norm2("a"), _fx_norm2("b")
    )
    return withv.select(
        "vec_id",
        cos.alias("cos_old_new"),
        F.when(cos < DRIFT_COS_FLOOR, 1).otherwise(0).cast("long").alias(
            "drifted"
        ),
    )


# --- MMR diversity re-ranking (Carbonell & Goldstein 1998) -----------------
MMR_QUERIES = 6  # vec_id < 6 are the query vectors
MMR_POOL = 16  # relevance pool fed to the greedy selector
MMR_K = 4  # diversified results returned per query

_MMR_POOL_SQL = f"""
      SELECT qid, cid, cosine AS rel FROM (
        SELECT qid, cid, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, cid) AS rn
        FROM cos WHERE qid <> cid
      ) WHERE rn <= {MMR_POOL}
"""


def _mmr_round_sql(r: int) -> str:
    """CTEs for greedy round r (>= 2): score every unselected pool
    candidate rel − max(sim to the selected set), take the per-query
    argmax (mmr DESC, cid)."""
    prev = " UNION ALL ".join(f"SELECT qid, cid FROM s{i}" for i in range(1, r))
    return f"""
    sel{r} AS ({prev}),
    c{r} AS (
      SELECT p.qid, p.cid, p.rel, p.rel - MAX(pr.sim) AS mmr
      FROM pool p
      JOIN pairs pr ON pr.qid = p.qid AND pr.ca = p.cid
      JOIN sel{r} s ON s.qid = pr.qid AND s.cid = pr.cb
      WHERE NOT EXISTS (SELECT 1 FROM sel{r} m
                        WHERE m.qid = p.qid AND m.cid = p.cid)
      GROUP BY p.qid, p.cid, p.rel
    ),
    s{r} AS (
      SELECT qid, cid, rel, mmr FROM (
        SELECT qid, cid, rel, mmr,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY mmr DESC, cid) AS rn
        FROM c{r}
      ) WHERE rn = 1
    )"""


_MMR_SQL = (
    f"""
    WITH q AS (
      SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS qv
      FROM embeddings WHERE vec_id < {MMR_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS cv
      FROM embeddings
    ),
    dots AS (
      SELECT q.qid, c.cid,
             SUM(CAST(round(q.qv * c.cv * {FX}.0) AS BIGINT)) AS dot_fx
      FROM q JOIN c ON q.idx = c.idx
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL}),
    pool AS ({_MMR_POOL_SQL}),
    pdots AS (
      SELECT a.qid, a.cid AS ca, b.cid AS cb,
             SUM(CAST(round(av.v * bv.v * {FX}.0) AS BIGINT)) AS dot_fx
      FROM pool a
      JOIN pool b ON a.qid = b.qid AND a.cid <> b.cid
      JOIN (SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings) av ON av.vec_id = a.cid
      JOIN (SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings) bv ON bv.vec_id = b.cid AND bv.idx = av.idx
      GROUP BY a.qid, a.cid, b.cid
    ),
    pairs AS (
      SELECT d.qid, d.ca, d.cb,
             (CAST(d.dot_fx AS DOUBLE) / {FX})
               / nullif(sqrt(CAST(na.norm2_fx AS DOUBLE) / {FX})
                        * sqrt(CAST(nb.norm2_fx AS DOUBLE) / {FX}), 0) AS sim
      FROM pdots d
      JOIN norms na ON na.vec_id = d.ca
      JOIN norms nb ON nb.vec_id = d.cb
    ),
    s1 AS (
      SELECT qid, cid, rel, rel AS mmr FROM (
        SELECT qid, cid, rel,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, cid) AS rn
        FROM pool
      ) WHERE rn = 1
    ),"""
    + ",".join(_mmr_round_sql(r) for r in range(2, MMR_K + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT qid, cid, {r} AS mmr_rank, rel, mmr AS mmr_score FROM s{r}"
        for r in range(1, MMR_K + 1)
    )
)


@query("similarity_mmr_rerank", oracle=_MMR_SQL)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998, the RAG diversity staple): per query, greedily select
    MMR_K-of-MMR_POOL pool candidates maximizing
    relevance − max-similarity-to-already-selected (λ = 0.5, equal
    weights — the subtraction form), so near-duplicate hits can't crowd
    the context window that composite_rag_context fills.

    Architecture split, stated plainly: the DISTRIBUTED part is one
    brute-force scoring pass (pool = per-query top-MMR_POOL, one window
    shuffle) plus the within-query pool×pool pairwise sims (≤ Q·P² tiny
    rows); the greedy selection itself is INHERENTLY SEQUENTIAL (each
    pick changes the next round's scores), so it runs on the driver over
    the collected P-bounded candidates — Q·P² (≈ 1.5k rows here) of three
    longs and a double, the bounded-driver-state class (kmeans k×D
    sums), NOT a corpus collect. The DuckDB oracle replays the greedy as
    MMR_K unrolled SQL rounds, so the hash PROVES the driver loop and
    the set-based form agree — the rewrite-proof pattern.

    Determinism: rel and sim are the module's exact-fixed-point cosine
    doubles (bit-stable across engines); Python max() and subtraction of
    bit-identical doubles are bit-identical; every argmax carries the
    (score DESC, cid) total order. At scale the pool bound P is the
    knob — MMR cost is P² per query regardless of corpus size."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        _fx_norm2("embedding").alias("nq2"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        _fx_norm2("embedding").alias("nc2"),
    )
    cos = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            "c_emb",
            "nc2",
            _cosine(
                _fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")
            ).alias("rel"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("cid"))
    pool = (
        cos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .select("qid", "cid", "rel", "c_emb", "nc2")
    )
    return mmr_select_pool(spark, pool, MMR_K)


def mmr_select_pool(spark: SparkSession, pool: DataFrame, k: int) -> DataFrame:
    """The pool→selection stage of MMR, shared VERBATIM between the
    batch operator above and the serving-side probe re-rank
    (streaming/hybrid.py::probe_vector_mmr — VERDICT r10 task 4): given
    a P-bounded candidate pool (qid, cid, rel, c_emb, nc2), compute the
    within-pool pairwise fixed-point cosines and run the greedy
    relevance − max-sim-to-selected selection. One function = the two
    call sites cannot disagree; the probe-vs-batch parity test
    (tests/test_mmr_probe.py) pins byte-equal selections on the same
    pool. Cost is P² per query regardless of corpus size (the
    bounded-driver-state class)."""
    # Zero-norm vectors have no cosine (the _cosine nullif guard): a
    # degenerate CANDIDATE is dropped here (it cannot be ranked), and a
    # degenerate QUERY nulls every rel, yielding an empty selection —
    # either way the greedy below never sees a None score (a None would
    # TypeError inside Python max/comparison, killing a serving probe).
    pool = pool.filter(F.col("rel").isNotNull())
    # ONE job: collect the P-bounded pool WITH embeddings (Q·P rows of
    # D=64 doubles — kilobytes), then compute the P² pairwise sims in
    # the DRIVER with NumPy (r15; guide §5 — the previous literal-frame
    # join was a whole extra Spark job + createDataFrame + collect per
    # probe, pure scheduler latency on ≤16 rows). Bit-identical to the
    # _cosine(_fx_dot(...)) column form by the _np_pair_cosine argument:
    # float64 multiply order (a·b, then ×FX), exact HALF_UP rounding
    # (_np_round_half_up), int64 sums, then the same double divisions —
    # binary64 arithmetic is IEEE-identical in NumPy and the JVM. Pool
    # rows all have nc2 > 0 (zero-norm candidates carry NULL rel and
    # were dropped above), so no sim is ever NULL here.
    import numpy as np

    pool_rows = pool.collect()
    by_q_rows: dict[int, list] = {}
    for r in pool_rows:
        by_q_rows.setdefault(r.qid, []).append(r)
    sims: dict[tuple, float] = {}
    for qid, rows in by_q_rows.items():
        V = np.array(
            [np.asarray(r.c_emb, dtype=np.float64) for r in rows]
        )
        dot = _np_round_half_up(V[:, None, :] * V[None, :, :] * FX).sum(
            axis=2
        )
        n = np.array([r.nc2 for r in rows], dtype=np.float64)
        denom = np.sqrt(n / FX)[:, None] * np.sqrt(n / FX)[None, :]
        cos = (dot.astype(np.float64) / FX) / denom
        for i, ra in enumerate(rows):
            for j, rb in enumerate(rows):
                if ra.cid != rb.cid:
                    sims[(qid, ra.cid, rb.cid)] = float(cos[i, j])
    by_q: dict[int, list] = {}
    for r in pool_rows:
        by_q.setdefault(r.qid, []).append((r.cid, r.rel))
    out_rows = []
    for qid in sorted(by_q):
        cands = sorted(by_q[qid])  # cid asc — the tie-break order
        selected: list[int] = []
        for rank in range(1, k + 1):
            best = None
            for cid, rel in cands:
                if cid in selected:
                    continue
                if selected:
                    score = rel - max(
                        sims[(qid, cid, s)] for s in selected
                    )
                else:
                    score = rel
                # strict > keeps the FIRST (lowest cid) on ties
                if best is None or score > best[0]:
                    best = (score, cid, rel)
            if best is None:
                break
            selected.append(best[1])
            out_rows.append((qid, best[1], rank, best[2], best[0]))
    return spark.createDataFrame(
        out_rows,
        "qid long, cid long, mmr_rank int, rel double, mmr_score double",
    )


# --- Matryoshka (truncated-prefix) retrieval funnel — r14 -------------------

MRL_DIMS = 8  # stage-1 prefix width (full D = 64: an 8x cheaper scan)
MRL_SHORTLIST = 40  # stage-1 survivors re-ranked at full precision


@query(
    "similarity_topk_matryoshka",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    dots8 AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             SUM(CAST(round(q.v * c.v * {FX}.0) AS BIGINT)) AS dot_fx
      FROM e q JOIN e c ON q.idx = c.idx
      WHERE q.vec_id < {N_QUERIES}
        AND q.idx <= {MRL_DIMS} AND c.idx <= {MRL_DIMS}
      GROUP BY 1, 2
    ),
    norms8 AS (
      SELECT vec_id,
             SUM(CAST(round(v * v * {FX}.0) AS BIGINT)) AS norm2_fx
      FROM e WHERE idx <= {MRL_DIMS} GROUP BY vec_id
    ),
    shortlist AS (
      SELECT qid, cid FROM (
        SELECT d.qid, d.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY d.qid
                 ORDER BY (CAST(d.dot_fx AS DOUBLE) / {FX})
                          / nullif(sqrt(CAST(nq.norm2_fx AS DOUBLE) / {FX})
                                 * sqrt(CAST(nc.norm2_fx AS DOUBLE) / {FX}),
                                   0) DESC,
                          d.cid
               ) AS pre_rank
        FROM dots8 d
        JOIN norms8 nq ON nq.vec_id = d.qid
        JOIN norms8 nc ON nc.vec_id = d.cid
      ) WHERE pre_rank <= {MRL_SHORTLIST}
    ),
    dots AS (
      SELECT s.qid, s.cid,
             SUM(CAST(round(q.v * c.v * {FX}.0) AS BIGINT)) AS dot_fx
      FROM shortlist s
      JOIN e q ON q.vec_id = s.qid
      JOIN e c ON c.vec_id = s.cid AND c.idx = q.idx
      GROUP BY 1, 2
    ),
    norms AS ({_NORMS_SQL}),
    cos AS ({_COS_SQL})
    {_RANK_SQL}
    """,
)
def similarity_topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA retrieval funnel (r14 — MRL, Kusupati et al. 2022:
    embeddings whose PREFIXES are themselves usable embeddings, the
    production trick behind truncatable embedding APIs): stage 1 scores
    EVERY candidate with only the first MRL_DIMS(=8)-of-64 dims (an 8×
    cheaper scan whose shuffle rows carry a 24-byte (qid, cid, cos)
    triple, never the vector), keeps an MRL_SHORTLIST(=40)-deep
    shortlist per query, and stage 2 re-ranks ONLY the shortlist at full
    precision — the two-stage funnel every large-scale vector system
    runs, complementary to IVF (fewer candidates) and SQ8/PQ (smaller
    codes): MRL shrinks the DIMENSION axis.

    The contract under the driver's hash is the FUNNEL itself — the
    oracle replays both stages (fixed-point dots, cid tie-breaks at
    the shortlist boundary), so a stage-1 scorer that reads full
    vectors, a shortlist off by one, or a re-rank that keeps prefix
    scores all hash-mismatch.

    Shuffle budget: stage 1 is a map-only broadcast cross join (queries
    broadcast; prefix slice per row) + ONE narrow window shuffle for
    the shortlist; stage 2 joins the Q·40-row shortlist BACK to the
    corpus (shortlist broadcast — map-side) and re-ranks in one more
    narrow window. Full vectors never shuffle; at 100 TB the stage-1
    scan reads an 8-dim column slice (columnar formats store the
    prefix contiguously under MRL-aware layouts) and the full-D read
    touches only Q·40 rows."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    pre = emb.select(
        "vec_id",
        F.slice("embedding", 1, MRL_DIMS).alias("prefix"),
    )
    q = pre.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("prefix").alias("q_pre"),
        _fx_norm2("prefix").alias("nq2"),
    )
    c = pre.select(
        F.col("vec_id").alias("cid"),
        F.col("prefix").alias("c_pre"),
        _fx_norm2("prefix").alias("nc2"),
    )
    stage1 = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "cid",
        _cosine(
            _fx_dot("c_pre", "q_pre"), F.col("nq2"), F.col("nc2")
        ).alias("cos_pre"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_pre").desc(), F.col("cid")
    )
    shortlist = (
        stage1.withColumn("pre_rank", F.row_number().over(w))
        .filter(F.col("pre_rank") <= MRL_SHORTLIST)
        .select("qid", "cid")
    )
    qf = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        _fx_norm2("embedding").alias("nq2"),
    )
    cf = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        _fx_norm2("embedding").alias("nc2"),
    )
    cos = (
        cf.join(F.broadcast(shortlist), "cid")
        .join(F.broadcast(qf), "qid")
        .select(
            "qid",
            "cid",
            _cosine(
                _fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")
            ).alias("cosine"),
        )
    )
    return _rank_topk(cos)
