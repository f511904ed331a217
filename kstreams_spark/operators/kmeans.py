"""Distributed spherical k-means (Lloyd iterations) for IVF centroids —
the "real deployment runs k-means" promised by ivf_topk's docstring
(operators/similarity.py), delivered as an iterative DataFrame operator.

Shape per iteration (the canonical iterative-algorithm pattern on Spark):
  1. broadcast the k×D centroid table (tiny) against the corpus;
  2. assignment = one groupBy(vec_id) with max_by over (dot, -cen_id) —
     a single shuffle, no window;
  3. update sums = posexplode to (cen_id, dim) and one groupBy — second
     shuffle; the driver collects only k×D integer sums + counts (O(k·D),
     NOT O(N) — the only driver materialization in the loop);
  4. new centroid = mean, L2-normalized, computed driver-side in Python.

Determinism: assignments use the module's fixed-point dot (exact int64,
ties broken on cen_id); per-dimension sums are exact fixed-point BIGINTs,
so the distributed half of every iteration is bit-reproducible across
partitionings; the driver-side update is plain Python on those exact
integers. tests/test_kmeans.py pins bitwise equality against a NumPy
twin that replays the same arithmetic, plus monotone inertia and
planted-cluster recovery.

At 100 TB: the corpus never moves — each iteration streams it through
two keyed aggregations; k·D stays driver-sized because ivf_cells_for is
sublinear (k ≈ 4·√N, D fixed): at N = 10⁹ that is ~1.3×10⁵ centroids
(~65 MB), not the 10⁷ a linear N/C rule would demand. Empty cells keep
their previous centroid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.operators.similarity import (
    FX,
    N_CENTROIDS,
    _fx,
    _fx_dot,
    ivf_topk,
)
from kstreams_spark.registry import query


def _centroid_df(spark: SparkSession, centroids: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cen_id long, cen_emb array<double>",
    )


def kmeans_assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, embedding) → (vec_id, embedding, cen_id): nearest centroid
    by exact fixed-point dot, ties to the lowest cen_id. One shuffle."""
    cen = _centroid_df(emb.sparkSession, centroids)
    scored = emb.crossJoin(F.broadcast(cen)).select(
        "vec_id",
        "embedding",
        "cen_id",
        _fx_dot("embedding", "cen_emb").alias("dot_fx"),
    )
    return scored.groupBy("vec_id").agg(
        F.expr("max_by(cen_id, named_struct('d', dot_fx, 'c', -cen_id))").alias(
            "cen_id"
        ),
        # embedding is identical on every replicated row of the group
        F.first("embedding").alias("embedding"),
    )


FPI_MAX_ROWS = 100_000  # sample-contract threshold, see farthest_point_init


def farthest_point_init(
    emb: DataFrame,
    k: int,
    sampled: bool = False,
    max_rows: int = FPI_MAX_ROWS,
) -> list[list[float]]:
    """Deterministic k-center seeding (Gonzalez): start from the lowest
    vec_id, then repeatedly add the vector LEAST similar to the chosen
    set (smallest max fixed-point dot; ties to the lowest vec_id). One
    distributed aggregation per round — k rounds over the corpus, so at
    100 TB run it on a systematic sample (sampling.py) and hand the
    result to kmeans_fit; the seeds only need to straddle the clusters.
    Immune to ingest order: cluster-sorted data seeds one centroid per
    cluster where first-k seeding collapses (measured in
    tests/test_kmeans.py).

    The run-on-a-sample contract is API-ENFORCED, not prose (the same
    pattern as the topology's small_alerts flag and the Jaccard
    verifier's candidate scoping): inputs over ``max_rows`` are refused
    unless the caller passes ``sampled=True``, asserting the input IS
    already a sample (or accepting k full passes knowingly). The size
    probe is a bounded limit(max_rows+1).count(), not a full count."""
    if not sampled:
        probe = emb.limit(max_rows + 1).count()
        if probe > max_rows:
            raise ValueError(
                f"farthest_point_init runs k sequential corpus passes; "
                f"input exceeds {max_rows} rows. Seed from a sample "
                f"(operators/sampling.py systematic_sample) and pass "
                f"sampled=True, or raise max_rows deliberately."
            )
    first = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(1).collect()
    )
    if not first:
        raise ValueError("farthest_point_init: empty input")
    chosen = [_normalize([float(x) for x in first[0].embedding])]
    for _ in range(k - 1):
        cen = _centroid_df(emb.sparkSession, chosen)
        closeness = (
            emb.crossJoin(F.broadcast(cen))
            .select(
                "vec_id",
                "embedding",
                _fx_dot("embedding", "cen_emb").alias("dot_fx"),
            )
            .groupBy("vec_id")
            .agg(
                F.max("dot_fx").alias("closest_fx"),
                F.first("embedding").alias("embedding"),
            )
        )
        nxt = closeness.select(
            F.expr(
                "min_by(struct(vec_id, embedding), "
                "named_struct('d', closest_fx, 'v', vec_id))"
            ).alias("pick")
        ).collect()[0].pick
        chosen.append(_normalize([float(x) for x in nxt.embedding]))
    return chosen


def kmeans_fit(
    emb: DataFrame,
    k: int = N_CENTROIDS,
    iters: int = 3,
    init: str = "first",
    sampled: bool = False,
) -> list[list[float]]:
    """Fit k spherical centroids. init='first' seeds from the first k
    vectors by vec_id (cheapest, order-sensitive); init='farthest' runs
    the deterministic Gonzalez sweep (order-immune, k extra passes —
    subject to farthest_point_init's run-on-a-sample contract, which
    ``sampled`` forwards to). Returns unit-norm centroid lists
    (driver-sized: k×D)."""
    if init == "farthest":
        cur = farthest_point_init(emb, k, sampled=sampled)
        k = len(cur)
    elif init == "first":
        init_rows = (
            emb.select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(k)
            .collect()
        )
        if not init_rows:
            raise ValueError("kmeans_fit: empty input")
        k = min(k, len(init_rows))  # fewer vectors than requested cells
        cur = [_normalize([float(x) for x in r.embedding]) for r in init_rows]
    else:
        raise ValueError(f"unknown init {init!r}; use 'first' or 'farthest'")
    dim = len(cur[0])
    for _ in range(iters):
        assigned = kmeans_assign(emb, cur)
        sums = (
            assigned.select(
                "cen_id", F.posexplode("embedding").alias("dim", "v")
            )
            .groupBy("cen_id", "dim")
            .agg(
                F.sum(_fx(F.col("v").cast("double"))).alias("sum_fx"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        acc: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cen_id, [0] * dim)[r.dim] = r.sum_fx
            counts[r.cen_id] = r.n
        nxt = []
        for cid in range(k):
            if counts.get(cid):
                mean = [(s / FX) / counts[cid] for s in acc[cid]]
                nxt.append(_normalize(mean))
            else:
                nxt.append(cur[cid])  # empty cell keeps its centroid
        cur = nxt
    return cur


def _normalize(v: list[float]) -> list[float]:
    n = math.sqrt(math.fsum(x * x for x in v))
    return [x / n for x in v] if n else v


def kmeans_inertia(emb: DataFrame, centroids: list[list[float]]) -> float:
    """Σ (1 - cosine-to-assigned-centroid·||v||⁻¹-free dot): the spherical
    objective as Σ dot to OWN centroid, maximized — returned as the exact
    fixed-point sum / FX so it is comparable across runs."""
    cen = _centroid_df(emb.sparkSession, centroids)
    scored = emb.crossJoin(F.broadcast(cen)).select(
        "vec_id", _fx_dot("embedding", "cen_emb").alias("dot_fx")
    )
    best = scored.groupBy("vec_id").agg(F.max("dot_fx").alias("best_fx"))
    total = best.agg(F.sum("best_fx").alias("t")).collect()[0].t
    return (total or 0) / FX


@query("similarity_topk_ivf_kmeans")  # no oracle: iterative fit is not
# SQL-expressible — driver records the rows-only check; determinism is
# pinned instead by the bitwise NumPy-twin test (tests/test_kmeans.py)
def similarity_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 over fitted (2-iteration) k-means centroids instead
    of the first-N 'k-means-lite' seeds similarity_topk_ivf uses."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    cens = kmeans_fit(emb, k=N_CENTROIDS, iters=2)
    return ivf_topk(emb, centroids=cens)
