"""Hybrid retrieval — lexical + vector search fused by Reciprocal Rank
Fusion (Cormack et al., SIGIR'09), the production search shape every
RAG/rerank stack runs: a keyword (BM25-family) retriever and an
embedding ANN retriever each propose a candidate list, and the fused
rank order beats either alone because their failure modes are disjoint
(lexical misses paraphrase, vector misses rare exact terms).

Spark-first decomposition (every stage an existing family's shape):
  - lexical leg: distinct (doc, token) postings filtered to the QUERY
    docs' tokens before the first shuffle, integer idf
    (n_docs·1000 DIV df — logs stay out of oracle-checked queries by
    standing rule), per-(query, candidate) Σidf over shared distinct
    tokens, per-query rank window;
  - vector leg: the exact fixed-point cosine of similarity.py
    (candidates × broadcast queries, zip_with dot), per-query rank
    window;
  - fusion: FULL OUTER join of the two top-L lists on (qid, cid),
    RRF score Σ 1/(K + r) computed as exact integer floor divisions
    RRF_SCALE DIV (K + r) — a retriever's missing candidate
    contributes 0 (rank coalesced to 0 in the OUTPUT columns too, so
    no nullable-int → float dtype hazard crosses the oracle).

At 100 TB each leg is independently the family's documented scale path
(posting-list equi-join; ANN via the IVF/BQ proposers instead of the
exact scan — same pool contract), and the fusion joins two ≤ Q·L-row
lists: driver-negligible. K = 60 per the original paper.

Reference parity note: BME680.java has no retrieval surface; this is
the SURVEY §2.3 north-star families composed into their serving shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import fence, spread
from kstreams_spark.operators.similarity import (
    FX,
    N_QUERIES,
    TOP_K,
    _cosine,
    _fx_dot,
    _fx_norm2,
)
from kstreams_spark.registry import query

RRF_K = 60  # the paper's constant
RRF_SCALE = int(1e12)  # fixed-point numerator for 1/(K+r)
POOL_L = 20  # per-retriever candidate-list depth
IDF_SCALE = 1000  # integer idf surrogate: n_docs*1000 DIV df


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
    nd AS (SELECT COUNT(*) AS n FROM documents),
    lex AS (
      SELECT q.doc_id AS qid, c.doc_id AS cid,
             SUM((nd.n * {IDF_SCALE}) // df.df)::BIGINT AS score_lex
      FROM toks q
      JOIN toks c ON c.tok = q.tok AND c.doc_id <> q.doc_id
      JOIN df ON df.tok = q.tok
      CROSS JOIN nd
      WHERE q.doc_id < {N_QUERIES}
      GROUP BY q.doc_id, c.doc_id
    ),
    lexr AS (
      SELECT qid, cid, rl FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score_lex DESC, cid) AS rl
        FROM lex) WHERE rl <= {POOL_L}
    ),
    sub AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    dots AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             SUM(CAST(round(q.v * c.v * {FX}.0) AS BIGINT)) AS dot_fx
      FROM sub q JOIN sub c ON c.idx = q.idx AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY q.vec_id, c.vec_id
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
    ),
    vecr AS (
      SELECT qid, cid, rv FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, cid) AS rv
        FROM cos) WHERE rv <= {POOL_L}
    ),
    fused AS (
      SELECT COALESCE(l.qid, v.qid) AS qid,
             COALESCE(l.cid, v.cid) AS cid,
             COALESCE(l.rl, 0)::BIGINT AS r_lex,
             COALESCE(v.rv, 0)::BIGINT AS r_vec,
             (CASE WHEN l.rl IS NULL THEN 0
                   ELSE {RRF_SCALE} // ({RRF_K} + l.rl) END
              + CASE WHEN v.rv IS NULL THEN 0
                     ELSE {RRF_SCALE} // ({RRF_K} + v.rv) END
             )::BIGINT AS rrf_fx
      FROM lexr l FULL OUTER JOIN vecr v
        ON v.qid = l.qid AND v.cid = l.cid
    )
    SELECT qid, cid, r_lex, r_vec, rrf_fx, rank FROM (
      SELECT qid, cid, r_lex, r_vec, rrf_fx,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY rrf_fx DESC, cid) AS rank
      FROM fused) WHERE rank <= {TOP_K}
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search over the query docs (doc_id < {N_QUERIES}, whose
    embeddings share the id space): lexical top-{POOL_L} (Σ integer-idf
    over shared distinct tokens) ⊕ vector top-{POOL_L} (exact fixed-
    point cosine), fused with integer RRF, final top-{TOP_K} per query.
    Self-matches excluded from both legs. Module header for the shuffle
    budget and the 100 TB substitutions (ANN proposer for the exact
    scan; posting lists pre-filtered to query tokens)."""
    raw = load_table(spark, sf_dir, "documents")
    # r15: count the PRE-spread scan — over the bare parquet scan the
    # count collapses to footer metadata, while counting the spread
    # output executed the full repartition exchange first (guide §2.4:
    # an Exchange you did not expect). Row count is identical.
    n_docs = raw.count()  # metadata-cheap scalar, drives the idf constant
    d = spread(raw)

    # ONE materialization of the distinct postings, shared by the df
    # table, the query-token table, and the candidate side — unfenced,
    # the explode+distinct subtree runs 3× (measured: 3 scans, 0 reused
    # exchanges). Same local-only fence class as the curation composites
    # (_util.fence docstring); a deployment caches the postings table
    # instead.
    toks = fence(
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        ).distinct()
    )
    df_t = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qt = toks.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("qid"), "tok"
    )
    lex = (
        toks.select(F.col("doc_id").alias("cid"), "tok")
        .join(F.broadcast(qt), "tok")
        .filter(F.col("cid") != F.col("qid"))
        .join(F.broadcast(df_t), "tok")
        .groupBy("qid", "cid")
        .agg(
            F.sum(F.expr(f"CAST({n_docs * IDF_SCALE} DIV df AS BIGINT)"))
            .cast("long")
            .alias("score_lex")
        )
    )
    wl = Window.partitionBy("qid").orderBy(F.col("score_lex").desc(), "cid")
    lexr = (
        lex.withColumn("rl", F.row_number().over(wl))
        .filter(F.col("rl") <= POOL_L)
        .select("qid", "cid", "rl")
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
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
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            _cosine(
                _fx_dot("c_emb", "q_emb"), F.col("nq2"), F.col("nc2")
            ).alias("cosine"),
        )
    )
    wv = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "cid")
    vecr = (
        cos.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") <= POOL_L)
        .select("qid", "cid", "rv")
    )

    fused = (
        lexr.join(vecr, ["qid", "cid"], "full")
        .select(
            "qid",
            "cid",
            F.coalesce(F.col("rl"), F.lit(0)).cast("long").alias("r_lex"),
            F.coalesce(F.col("rv"), F.lit(0)).cast("long").alias("r_vec"),
            (
                F.when(
                    F.col("rl").isNull(), F.lit(0).cast("long")
                ).otherwise(F.expr(f"CAST({RRF_SCALE} DIV ({RRF_K} + rl) AS BIGINT)"))
                + F.when(
                    F.col("rv").isNull(), F.lit(0).cast("long")
                ).otherwise(F.expr(f"CAST({RRF_SCALE} DIV ({RRF_K} + rv) AS BIGINT)"))
            ).alias("rrf_fx"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.col("rrf_fx").desc(), "cid")
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "r_lex", "r_vec", "rrf_fx", "rank")
    )


def _hybrid_lift_oracle() -> str:
    """Nested-CTE composition of the registered hybrid and exact-cosine
    oracles (the similarity_recall_report technique)."""
    from kstreams_spark.registry import ORACLES

    hy = ORACLES["search_hybrid_rrf"]
    bf = ORACLES["similarity_topk_bruteforce"]
    return f"""
    WITH hy AS (SELECT qid, cid, r_lex, r_vec FROM ({hy}) t),
    ex AS (SELECT qid, cid FROM ({bf}) t)
    SELECT hy.qid,
           SUM(CASE WHEN ex.cid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_exact_overlap,
           SUM(CASE WHEN hy.r_lex > 0 AND hy.r_vec = 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_lex_only,
           SUM(CASE WHEN hy.r_vec > 0 AND hy.r_lex = 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_vec_only,
           SUM(CASE WHEN hy.r_lex > 0 AND hy.r_vec > 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_both
    FROM hy LEFT JOIN ex ON ex.qid = hy.qid AND ex.cid = hy.cid
    GROUP BY hy.qid
    """


@query("search_hybrid_lift", oracle=_hybrid_lift_oracle())
def search_hybrid_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fusion-quality report: per query, where the hybrid top-{TOP_K}
    came from (lexical-only / vector-only / both legs) and how much of
    the exact semantic top-{TOP_K} it retains — the number that says
    whether adding the lexical leg helps or trades away semantic recall
    on this corpus. Composes two registered pipelines; both replayed by
    the oracle, so the hash certifies the evaluation itself (the
    recall_report contract, applied to fusion)."""
    hy = search_hybrid_rrf(spark, sf_dir).select(
        "qid", "cid", "r_lex", "r_vec"
    )
    from kstreams_spark.operators.similarity import (
        similarity_topk_bruteforce,
    )

    ex = similarity_topk_bruteforce(spark, sf_dir).select(
        F.col("qid").alias("eqid"), F.col("cid").alias("ecid")
    )
    j = hy.join(
        ex,
        (F.col("eqid") == F.col("qid")) & (F.col("ecid") == F.col("cid")),
        "left",
    )
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return j.groupBy("qid").agg(
        flag(F.col("ecid").isNotNull()).alias("n_exact_overlap"),
        flag((F.col("r_lex") > 0) & (F.col("r_vec") == 0)).alias("n_lex_only"),
        flag((F.col("r_vec") > 0) & (F.col("r_lex") == 0)).alias("n_vec_only"),
        flag((F.col("r_lex") > 0) & (F.col("r_vec") > 0)).alias("n_both"),
    )
