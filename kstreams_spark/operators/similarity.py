"""Embedding similarity search (north-star op): cosine top-k over
`embeddings.embedding` (array<float>, dim 64).

Two implementations:
- `similarity_topk_bruteforce` — exact: explode + index equi-join +
  decimal-exact dot products, Window-ranked top-k. O(Q·N·D) work but
  fully distributed (the join/groupBy shuffles on (qid, cid)); this is
  the correctness baseline and the right choice when Q is small.
- `similarity_topk_lsh` — scale path: random-hyperplane LSH. Each vector
  gets a B-bit sign signature from pseudo-random hyperplanes (md5-derived
  ±1 components, deterministic & engine-portable); candidates must share
  the signature (bucket equi-join), then exact cosine re-ranks within the
  bucket. At 100 TB the bucket join replaces the Q·N cross product with
  per-bucket work; recall is tuned by B and multi-probe.

Determinism: products of two doubles are IEEE-exact; sums go through
DECIMAL(38,12); sqrt/div are IEEE — so Spark and DuckDB produce
bit-identical cosines and identical rankings (ties broken by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 10
LSH_BITS = 8


def _elems(df: DataFrame, id_alias: str, val_alias: str) -> DataFrame:
    """(vec_id, idx, value_as_double) — posexplode of the embedding array."""
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.posexplode("embedding").alias("idx", "_v"),
    ).select(id_alias, "idx", F.col("_v").cast("double").alias(val_alias))


_NORMS_SQL = """
    SELECT vec_id,
           SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(38,12)))
             AS norm2
    FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
    GROUP BY vec_id
"""


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
      SELECT q.qid, c.cid, SUM(CAST(q.qv * c.cv AS DECIMAL(38,12))) AS dot
      FROM q JOIN c ON q.idx = c.idx
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS (
      SELECT d.qid, d.cid,
             CAST(d.dot AS DOUBLE)
               / nullif(sqrt(CAST(nq.norm2 AS DOUBLE))
                        * sqrt(CAST(nc.norm2 AS DOUBLE)), 0) AS cosine
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
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors (vec_id < 10) over the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _elems(emb.filter(F.col("vec_id") < N_QUERIES), "qid", "qv")
    c = _elems(emb, "cid", "cv")
    dots = (
        q.join(c, "idx")
        .groupBy("qid", "cid")
        .agg(
            F.sum((F.col("qv") * F.col("cv")).cast("decimal(38,12)")).alias("dot")
        )
    )
    norms = (
        _elems(emb, "vec_id", "v")
        .groupBy("vec_id")
        .agg(F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).alias("norm2"))
    )
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("norm2").alias("nq2"))
    nc = norms.select(F.col("vec_id").alias("cid"), F.col("norm2").alias("nc2"))
    cos = (
        dots.join(nq, "qid")
        .join(nc, "cid")
        .select(
            "qid",
            "cid",
            (
                F.col("dot").cast("double")
                / F.nullif(
                    F.sqrt(F.col("nq2").cast("double"))
                    * F.sqrt(F.col("nc2").cast("double")),
                    F.lit(0.0),
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "cosine", "rank")
    )


def _plane_component_sql(p: int) -> str:
    """±1 hyperplane component for plane p at index idx (md5-derived)."""
    return (
        f"(2 * ((instr('0123456789abcdef', "
        f"substring(md5(concat('plane{p}_', CAST(idx AS VARCHAR))), 1, 1)) - 1) % 2) - 1)"
    )


def _lsh_sig_sql() -> str:
    # decimal-exact projection sums so the sign (the signature bit) is
    # order-independent and engine-portable
    bits = " || ".join(
        f"""CASE WHEN SUM(CAST(CAST(v AS DOUBLE) * {_plane_component_sql(p)}
                            AS DECIMAL(38,12))) >= 0
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
      SELECT q.qid, c.cid, SUM(CAST(q.qv * c.cv AS DECIMAL(38,12))) AS dot
      FROM q JOIN c ON q.idx = c.idx
      JOIN cand ON cand.qid = q.qid AND cand.cid = c.cid
      GROUP BY q.qid, c.cid
    ),
    norms AS ({_NORMS_SQL}),
    cos AS (
      SELECT d.qid, d.cid,
             CAST(d.dot AS DOUBLE)
               / nullif(sqrt(CAST(nq.norm2 AS DOUBLE))
                        * sqrt(CAST(nc.norm2 AS DOUBLE)), 0) AS cosine
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
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: 8-bit random-hyperplane signatures bucket the corpus; exact
    cosine re-ranks only within the query's bucket. Approximate by design —
    the oracle implements the SAME approximation, so results still
    hash-match. Recall vs the exact query is measured in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    elems = _elems(emb, "vec_id", "v")

    def plane(p: int) -> F.Column:
        # Spark's posexplode idx is 0-based (DuckDB's generate_subscripts is
        # 1-based) and Spark needs STRING where DuckDB writes VARCHAR
        return F.expr(
            _plane_component_sql(p)
            .replace("idx", "(idx + 1)")
            .replace("VARCHAR", "STRING")
        )

    sigs = elems.groupBy("vec_id").agg(
        *[
            F.when(
                F.sum((F.col("v") * plane(p)).cast("decimal(38,12)")) >= 0, "1"
            )
            .otherwise("0")
            .alias(f"b{p}")
            for p in range(LSH_BITS)
        ]
    )
    sigs = sigs.select(
        "vec_id", F.concat(*[F.col(f"b{p}") for p in range(LSH_BITS)]).alias("sig")
    )
    cand = (
        sigs.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), "sig")
        .join(sigs.select(F.col("vec_id").alias("cid"), "sig"), "sig")
        .select("qid", "cid")
    )
    q = _elems(emb.filter(F.col("vec_id") < N_QUERIES), "qid", "qv")
    c = _elems(emb, "cid", "cv").join(
        cand.select("cid").distinct(), "cid"
    )
    dots = (
        q.join(c, "idx")
        .join(cand, ["qid", "cid"])
        .groupBy("qid", "cid")
        .agg(F.sum((F.col("qv") * F.col("cv")).cast("decimal(38,12)")).alias("dot"))
    )
    norms = elems.groupBy("vec_id").agg(
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).alias("norm2")
    )
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("norm2").alias("nq2"))
    nc = norms.select(F.col("vec_id").alias("cid"), F.col("norm2").alias("nc2"))
    cos = (
        dots.join(nq, "qid")
        .join(nc, "cid")
        .select(
            "qid",
            "cid",
            (
                F.col("dot").cast("double")
                / F.nullif(
                    F.sqrt(F.col("nq2").cast("double"))
                    * F.sqrt(F.col("nc2").cast("double")),
                    F.lit(0.0),
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "cosine", "rank")
    )
