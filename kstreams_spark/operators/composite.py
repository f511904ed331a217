"""Composite analytics queries — TPC-H-shaped multi-operator pipelines that
exercise join + filter + aggregate + top-k together (the shapes a user of
this engine actually runs, and the shapes AQE/broadcast/partial-agg have
to get right in combination).

Q-shapes (adapted to the fixture schema, decimal-exact aggregates):
- shipping-priority (Q3-like): revenue of undelivered orders by order,
  top-10 — broadcast dim filter → fact join → agg → TakeOrdered.
- local-supplier-volume (Q5-like): revenue joined across customer/
  supplier/nation with same-nation constraint.
- top-customer-share (Q10-like): revenue per customer with returned items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import dsum, fence, spread
from kstreams_spark.operators.dedup import (
    _cluster_labels_cte,
    ngram_jaccard_pairs,
    resolve_clusters,
)
from kstreams_spark.operators.text import (
    DUP2_GATE,
    c4_quality_expr,
    duck_dup_char_frac,
    duck_ngram_arr,
    spark_dup_char_frac,
    spark_ngram_arr,
)
from kstreams_spark.registry import query

# Gopher repetition gate shared by both curation composites (VERDICT r5
# next-round #3): repeated-2-gram character fraction ≤ DUP2_GATE. Both
# sides are built from the text.py expression builders, so the gate
# definition cannot drift between engine and oracle.
_DUCK_DUP2 = duck_dup_char_frac(duck_ngram_arr(2))
_SPARK_DUP2 = spark_dup_char_frac(spark_ngram_arr(2))


@query(
    "composite_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment-filtered customers (broadcast) ⋈ orders ⋈ lineitem
    → revenue per order → top-10. The customer filter lands before the
    join (Catalyst pushes it), so the broadcast side is pre-shrunk."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "composite_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def composite_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue where customer and supplier share a nation —
    a multi-join with a cross-table residual predicate; all dims broadcast,
    lineitem never shuffles until the final small groupBy."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
    )


@query(
    "composite_returned_revenue_by_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS lost_revenue,
           COUNT(*) AS n_returned_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    HAVING COUNT(*) >= 20
    """,
)
def composite_returned_revenue_by_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, with a HAVING
    floor — join + filtered agg + post-agg filter in one plan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(revenue).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .filter(F.col("n_returned_items") >= 20)
    )


@query(
    "composite_curation_pipeline",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, text, str_split(text, ' ') AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, text,
             0.4 * (CASE WHEN len(toks) > 100 THEN 1.0
                         ELSE CAST(len(toks) AS DOUBLE) / 100 END)
           + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
           + 0.3 * (CASE WHEN list_contains(toks, 'the')
                          OR list_contains(toks, 'a')
                         THEN 1.0 ELSE 0.0 END) AS quality,
             {_DUCK_DUP2} AS dup2
      FROM t
    ),
    filtered AS (SELECT * FROM scored
                 WHERE quality >= 0.5 AND dup2 <= {DUP2_GATE}),
    kept AS (
      SELECT MIN(doc_id) AS doc_id,
             min_by(lang, doc_id) AS lang,
             min_by(quality, doc_id) AS quality
      FROM filtered GROUP BY md5(text)
    ),
    splits AS (
      SELECT lang, quality,
             CASE WHEN bucket < 204 THEN 'train'
                  WHEN bucket < 230 THEN 'validation'
                  ELSE 'test' END AS split
      FROM (SELECT *,
              (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
            + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS bucket
            FROM kept)
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_quality
    FROM splits GROUP BY split, lang
    """,
)
def composite_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation — the north-star families
    composed the way a real corpus build runs them: C4-shaped quality
    score (text.py:text_quality_score semantics) → threshold filter →
    exact dedup keeping the lowest doc_id per md5(text) (dedup.py
    semantics) → hash-stable train/val/test assignment (sampling.py
    semantics) → per-(split, lang) counts and decimal-exact mean quality.

    Shuffle budget: dedup groupBy (1) + final 2-key agg (1); the score,
    filter, and split assignment are all scan-speed row expressions. The
    md5 dedup key and id-hash split key make the whole pipeline
    deterministic and leakage-free (duplicates collapse BEFORE split
    assignment, so a text can never land in two splits). The repetition
    gate (dup_2gram_char_frac ≤ DUP2_GATE, the Gopher rule from
    text.py) runs in the same scan-shaped stage as the quality score."""
    from kstreams_spark.operators.sampling import _bucket_from

    d = fence(spread(load_table(spark, sf_dir, "documents"))).withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    toks = F.col("toks")
    scored = d.select(
        "doc_id",
        "lang",
        "text",
        c4_quality_expr(toks).alias("quality"),
        F.expr(_SPARK_DUP2).alias("dup2"),
    )
    filtered = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("dup2") <= DUP2_GATE)
    )
    kept = filtered.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(lang, doc_id)").alias("lang"),
        F.expr("min_by(quality, doc_id)").alias("quality"),
    )
    bucket = _bucket_from(F.col("doc_id").cast("string"))
    splits = kept.select(
        "lang",
        "quality",
        F.when(bucket < 204, "train")
        .when(bucket < 230, "validation")
        .otherwise("test")
        .alias("split"),
    )
    return splits.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (dsum("quality") / F.count(F.lit(1))).alias("avg_quality"),
    )


def _curation_neardup_sql() -> str:
    """Oracle for the near-dup curation composite: the exact-dedup
    curation CTEs (kept now carries text), then the FULL minhash
    propose→verify→recursive-transitive-closure chain over `kept`, then
    survivors = kept minus non-canonical cluster members."""
    return f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, lang, text, str_split(text, ' ') AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, text,
             0.4 * (CASE WHEN len(toks) > 100 THEN 1.0
                         ELSE CAST(len(toks) AS DOUBLE) / 100 END)
           + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
           + 0.3 * (CASE WHEN list_contains(toks, 'the')
                          OR list_contains(toks, 'a')
                         THEN 1.0 ELSE 0.0 END) AS quality,
             {_DUCK_DUP2} AS dup2
      FROM t
    ),
    filtered AS (SELECT * FROM scored
                 WHERE quality >= 0.5 AND dup2 <= {DUP2_GATE}),
    kept AS (
      SELECT MIN(doc_id) AS doc_id,
             min_by(lang, doc_id) AS lang,
             min_by(quality, doc_id) AS quality,
             MIN(text) AS text
      FROM filtered GROUP BY md5(text)
    ),
    {_cluster_labels_cte("kept")},
    survivors AS (
      SELECT k.doc_id, k.lang, k.quality
      FROM kept k LEFT JOIN labels l USING (doc_id)
      WHERE l.doc_id IS NULL OR l.keep_id = k.doc_id
    ),
    splits AS (
      SELECT lang, quality,
             CASE WHEN bucket < 204 THEN 'train'
                  WHEN bucket < 230 THEN 'validation'
                  ELSE 'test' END AS split
      FROM (SELECT *,
              (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
            + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS bucket
            FROM survivors)
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_quality
    FROM splits GROUP BY split, lang
    """


@query("composite_curation_neardup", oracle=_curation_neardup_sql())
def composite_curation_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline with the round-5 near-dup ending — the full
    corpus-build story every piece of the dedup family now supports:
    quality score → threshold filter → EXACT dedup (md5 groupBy) →
    NEAR-dup clustering (MinHash proposes, Jaccard verifies, connected
    components resolve; resolve_clusters) → keep one canonical doc per
    cluster → hash-stable split assignment → per-(split, lang) stats.
    The scan stage also applies the Gopher repetition gate
    (dup_2gram_char_frac ≤ DUP2_GATE) alongside the quality threshold.
    Near-dup survivors are picked AFTER exact dedup (cheap collapse
    first) and BEFORE split assignment (a near-duplicate can never leak
    across train/test).

    Shuffle budget: exact-dedup groupBy (1), the propose→verify pipeline
    (shingle agg + band buckets + two candidate lookups), the iterative
    CC over the PAIR graph only (batch-sized, not corpus-sized), one
    left-anti survivor join, final 2-key agg. The oracle replays every
    stage, transitive closure included, in one recursive-CTE statement."""
    d = fence(spread(load_table(spark, sf_dir, "documents"))).withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    toks = F.col("toks")
    scored = d.select(
        "doc_id",
        "lang",
        "text",
        c4_quality_expr(toks).alias("quality"),
        F.expr(_SPARK_DUP2).alias("dup2"),
    )
    filtered = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("dup2") <= DUP2_GATE)
    )
    kept = filtered.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(lang, doc_id)").alias("lang"),
        F.expr("min_by(quality, doc_id)").alias("quality"),
        F.min("text").alias("text"),
    )
    pairs = ngram_jaccard_pairs(kept.select("doc_id", "text")).select(
        "doc_id1", "doc_id2"
    )
    losers = resolve_clusters(pairs).filter(~F.col("is_kept")).select("doc_id")
    survivors = kept.join(losers, "doc_id", "left_anti")
    from kstreams_spark.operators.sampling import _bucket_from

    bucket = _bucket_from(F.col("doc_id").cast("string"))
    splits = survivors.select(
        "lang",
        "quality",
        F.when(bucket < 204, "train")
        .when(bucket < 230, "validation")
        .otherwise("test")
        .alias("split"),
    )
    return splits.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (dsum("quality") / F.count(F.lit(1))).alias("avg_quality"),
    )


@query(
    "composite_curation_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, text, str_split(text, ' ') AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, text, len(toks) AS n_tokens,
             0.4 * (CASE WHEN len(toks) > 100 THEN 1.0
                         ELSE CAST(len(toks) AS DOUBLE) / 100 END)
           + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
           + 0.3 * (CASE WHEN list_contains(toks, 'the')
                          OR list_contains(toks, 'a')
                         THEN 1.0 ELSE 0.0 END) AS quality,
             {{_DUCK_DUP2}} AS dup2
      FROM t
    ),
    filtered AS (SELECT * FROM scored
                 WHERE quality >= 0.5 AND dup2 <= {{DUP2_GATE}}),
    kept AS (
      SELECT MIN(doc_id) AS doc_id,
             min_by(lang, doc_id) AS lang,
             MIN(n_tokens) AS n_tokens
      FROM filtered GROUP BY md5(text)
    ),
    running AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum_tokens
      FROM kept
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           SUM(n_tokens)::BIGINT AS total_tokens
    FROM running WHERE cum_tokens <= {{LANG_BUDGET}}
    GROUP BY lang
    """.format(
        _DUCK_DUP2=_DUCK_DUP2,
        DUP2_GATE=DUP2_GATE,
        LANG_BUDGET=2_000,
    ),
)
def composite_curation_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline ending the way a training run actually ends:
    quality + repetition gates → exact dedup → per-LANGUAGE token-budget
    sampling of the survivors → per-lang doc/token totals. The budgeting
    stage is the SHARDED form (sample_token_budget_sharded's
    partitioned running-sum window — VERDICT r5 next-round #7: composites
    consume the 100 TB form, never the global-window demo), so the
    window parallelizes by lang and no stage funnels the corpus through
    one task. Dedup runs BEFORE budgeting, so duplicate text can never
    double-spend the budget."""
    from pyspark.sql import Window

    from kstreams_spark.operators.sampling import LANG_TOKEN_BUDGET

    d = fence(spread(load_table(spark, sf_dir, "documents"))).withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    toks = F.col("toks")
    scored = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).alias("n_tokens"),
        c4_quality_expr(toks).alias("quality"),
        F.expr(_SPARK_DUP2).alias("dup2"),
    )
    filtered = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("dup2") <= DUP2_GATE)
    )
    kept = filtered.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(lang, doc_id)").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sampled = kept.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        F.col("cum_tokens") <= LANG_TOKEN_BUDGET
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def _curation_classified_sql() -> str:
    from kstreams_spark.operators.classify import (
        N_BUCKETS,
        _bucket_sql_duck,
        _weight_sql_duck,
    )
    from kstreams_spark.operators.decontam import (
        _EVAL_CTE,
        DECON_N,
    )
    from kstreams_spark.operators.dedup import shingles_sql
    from kstreams_spark.operators.sampling import LANG_TOKEN_BUDGET

    return f"""
    WITH w AS (
      SELECT i::INT AS bucket, {_weight_sql_duck("i")}::BIGINT AS weight
      FROM generate_series(0, {N_BUCKETS - 1}) t(i)
    ),
    tk AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    bk AS (SELECT doc_id, {_bucket_sql_duck("tok")}::INT AS bucket FROM tk),
    margins AS (
      SELECT bk.doc_id, SUM(w.weight) AS margin
      FROM bk JOIN w USING (bucket) GROUP BY bk.doc_id
    ),
    quality AS (
      SELECT d.doc_id, d.lang, d.text
      FROM documents d JOIN margins m USING (doc_id)
      WHERE m.margin >= 0
    ),
    {_EVAL_CTE},
    ev_sh AS (
      SELECT doc_id AS eval_id, md5(shingle) AS sh
      FROM ({shingles_sql(DECON_N, "eval_docs")})
    ),
    tr_sh AS (
      SELECT doc_id, md5(shingle) AS sh
      FROM ({shingles_sql(DECON_N, "quality")})
    ),
    hits AS (
      SELECT DISTINCT t.doc_id FROM tr_sh t JOIN ev_sh e USING (sh)
    ),
    clean AS (
      SELECT q.doc_id, q.lang,
             len(str_split(q.text, ' '))::BIGINT AS n_tokens, q.text
      FROM quality q LEFT JOIN hits h USING (doc_id)
      WHERE h.doc_id IS NULL
    ),
    kept AS (
      SELECT MIN(doc_id) AS doc_id,
             min_by(lang, doc_id) AS lang,
             MIN(n_tokens) AS n_tokens
      FROM clean GROUP BY md5(text)
    ),
    running AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum_tokens
      FROM kept
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_tokens)::BIGINT AS total_tokens
    FROM running WHERE cum_tokens <= {LANG_TOKEN_BUDGET}
    GROUP BY lang
    """


@query("composite_curation_classified", oracle=_curation_classified_sql())
def composite_curation_classified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone curation chain with the MODEL-BASED stages in the
    loop — what a production corpus build actually runs (CCNet/RefinedWeb
    order): linear-classifier quality gate (classify.py, broadcast
    int-weight model, margin >= 0) → benchmark decontamination drop
    (decontam.py, 8-gram eval-overlap via broadcast shingle-hash probe)
    → exact dedup (lowest doc_id per md5(text)) → per-language SHARDED
    token budget (sampling.py's partitioned window — composites consume
    the 100 TB form) → per-lang doc/token totals.

    Stage order is the cost-correct one at scale: the map-side classifier
    gate shrinks the corpus before the shingle stages; dedup precedes
    budgeting so duplicates can't double-spend. The oracle replays every
    stage (model synthesis included) in one CTE chain.

    Shuffle budget: classifier per-doc agg (1), corpus shingle scan +
    broadcast eval probe + per-doc distinct (1), dedup groupBy (1),
    per-lang window (1), final agg (1). No joins ever carry text except
    the scan-shaped shingle stream."""
    from pyspark.sql import Window

    from kstreams_spark.operators.classify import (
        quality_classifier,
        synthesized_weights,
    )
    from kstreams_spark.operators.decontam import _fixture_eval, decontaminate
    from kstreams_spark.operators.sampling import LANG_TOKEN_BUDGET

    d = fence(spread(load_table(spark, sf_dir, "documents")))
    margins = quality_classifier(
        d.select("doc_id", "text"), synthesized_weights(spark)
    )
    # r15 (guide §2.4/§5): `quality` feeds the decontamination probe AND
    # the clean join — without a cut each branch re-ran the classifier's
    # exploded-token scoring agg. Cut at the doc_id-ONLY gate list (the
    # small side; `d` itself is already fenced, so re-deriving the join
    # from the two checkpoints is cheap).
    gate_ids = (
        margins.filter(F.col("is_quality") == 1)
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    quality = d.join(gate_ids, "doc_id").select("doc_id", "lang", "text")
    flagged = (
        decontaminate(quality.select("doc_id", "text"), _fixture_eval(d))
        .select("doc_id")
        .withColumn("hit", F.lit(1))
    )
    clean = (
        quality.join(F.broadcast(flagged), "doc_id", "left")
        .filter(F.col("hit").isNull())
        .select(
            "doc_id",
            "lang",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            "text",
        )
    )
    kept = clean.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(lang, doc_id)").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sampled = kept.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        F.col("cum_tokens") <= LANG_TOKEN_BUDGET
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def _curation_manifest_sql() -> str:
    from kstreams_spark.operators.packing import CTX_LEN

    return f"""
    WITH t AS (
      SELECT doc_id, lang, text, str_split(text, ' ') AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, text,
             0.4 * (CASE WHEN len(toks) > 100 THEN 1.0
                         ELSE CAST(len(toks) AS DOUBLE) / 100 END)
           + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
           + 0.3 * (CASE WHEN list_contains(toks, 'the')
                          OR list_contains(toks, 'a')
                         THEN 1.0 ELSE 0.0 END) AS quality,
             {_DUCK_DUP2} AS dup2
      FROM t
    ),
    filtered AS (SELECT * FROM scored
                 WHERE quality >= 0.5 AND dup2 <= {DUP2_GATE}),
    kept AS (
      SELECT MIN(doc_id) AS doc_id,
             min_by(lang, doc_id) AS lang,
             min_by(text, doc_id) AS text
      FROM filtered GROUP BY md5(text)
    ),
    splits AS (
      SELECT doc_id, lang, text,
             CASE WHEN bucket < 204 THEN 'train'
                  WHEN bucket < 230 THEN 'validation'
                  ELSE 'test' END AS split
      FROM (SELECT *,
              (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
            + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS bucket
            FROM kept)
    ),
    toks2 AS (
      SELECT split || '/' || lang AS shard, doc_id,
             len(str_split(text, ' '))::BIGINT AS n,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM splits
    ),
    offs AS (
      SELECT shard, doc_id, n,
             COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY h, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0) AS off
      FROM toks2
    ),
    spans AS (
      SELECT shard, doc_id, n, off,
             unnest(generate_series(
               CAST(floor(off / {CTX_LEN}.0) AS BIGINT),
               CAST(floor((off + n - 1) / {CTX_LEN}.0) AS BIGINT)
             )) AS chunk_id
      FROM offs
    )
    SELECT shard, chunk_id, doc_id,
           (GREATEST(off, chunk_id * {CTX_LEN}) - off)::BIGINT AS doc_off,
           (GREATEST(off, chunk_id * {CTX_LEN}) - chunk_id * {CTX_LEN})::BIGINT
             AS chunk_off,
           (LEAST(off + n, chunk_id * {CTX_LEN} + {CTX_LEN})
             - GREATEST(off, chunk_id * {CTX_LEN}))::BIGINT AS n_span
    FROM spans
    """


@query("composite_curation_manifest", oracle=_curation_manifest_sql())
def composite_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From raw corpus to DATALOADER MANIFEST in one plan — the artifact
    a training run actually mounts: quality + repetition gates → exact
    dedup (winner per md5(text)) → hash-stable split assignment →
    concat-and-chunk sequence packing per (split, lang) shard
    (operators/packing.py, CTX_LEN tokens per training sequence). Row =
    one doc span in one training sequence of one shard.

    Dedup precedes splitting (no text in two splits), splitting precedes
    packing (no training sequence mixes splits) — order is the
    leakage-safety argument, stated in plan form. Shuffle budget: dedup
    groupBy (1) + the per-shard packing window (1); gates and split
    assignment are scan-speed expressions."""
    from kstreams_spark.operators.packing import pack_sequences
    from kstreams_spark.operators.sampling import _bucket_from

    d = fence(spread(load_table(spark, sf_dir, "documents"))).withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    toks = F.col("toks")
    filtered = d.select(
        "doc_id",
        "lang",
        "text",
        c4_quality_expr(toks).alias("quality"),
        F.expr(_SPARK_DUP2).alias("dup2"),
    ).filter((F.col("quality") >= 0.5) & (F.col("dup2") <= DUP2_GATE))
    kept = filtered.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(lang, doc_id)").alias("lang"),
        F.expr("min_by(text, doc_id)").alias("text"),
    )
    bucket = _bucket_from(F.col("doc_id").cast("string"))
    sharded = kept.select(
        "doc_id",
        "text",
        F.concat(
            F.when(bucket < 204, "train")
            .when(bucket < 230, "validation")
            .otherwise("test"),
            F.lit("/"),
            F.col("lang"),
        ).alias("shard"),
    )
    return pack_sequences(sharded, shard_col="shard").select(
        "shard", "chunk_id", "doc_id", "doc_off", "chunk_off", "n_span"
    )


def _curation_importance_sql() -> str:
    from kstreams_spark.operators.classify import N_BUCKETS, bucket_sql
    from kstreams_spark.operators.sampling import IMP_SCALE, IMP_TARGET_LANG

    return f"""
    WITH t AS (
      SELECT doc_id, lang, text, str_split(text, ' ') AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, text, len(toks) AS n_tokens,
             0.4 * (CASE WHEN len(toks) > 100 THEN 1.0
                         ELSE CAST(len(toks) AS DOUBLE) / 100 END)
           + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
           + 0.3 * (CASE WHEN list_contains(toks, 'the')
                          OR list_contains(toks, 'a')
                         THEN 1.0 ELSE 0.0 END) AS quality,
             {_DUCK_DUP2} AS dup2
      FROM t
    ),
    filtered AS (SELECT * FROM scored
                 WHERE quality >= 0.5 AND dup2 <= {DUP2_GATE}),
    kept AS (
      SELECT MIN(doc_id) AS doc_id,
             min_by(lang, doc_id) AS lang,
             MIN(text) AS text
      FROM filtered GROUP BY md5(text)
    ),
    ktoks AS (
      SELECT doc_id, lang, {bucket_sql("tok")} AS bucket
      FROM (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS tok
            FROM kept)
    ),
    counts AS (
      SELECT bucket, COUNT(*) AS r,
             SUM(CASE WHEN lang = '{IMP_TARGET_LANG}' THEN 1 ELSE 0 END) AS t
      FROM ktoks GROUP BY bucket
    ),
    tot AS (
      SELECT SUM(r) + {N_BUCKETS} AS r_tot,
             SUM(t) + {N_BUCKETS} AS t_tot FROM counts
    ),
    weights AS (
      SELECT c.bucket,
             ((c.t + 1) * tt.r_tot * {IMP_SCALE})
               // ((c.r + 1) * tt.t_tot) AS w
      FROM counts c CROSS JOIN tot tt
    ),
    dscore AS (
      SELECT tk.doc_id, MIN(tk.lang) AS lang,
             COUNT(*) AS n_tokens, SUM(w.w)::BIGINT AS imp_score
      FROM ktoks tk JOIN weights w USING (bucket)
      GROUP BY tk.doc_id
    ),
    tot2 AS (
      SELECT SUM(imp_score) AS s_tot, SUM(n_tokens) AS n_tot FROM dscore
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_tokens)::BIGINT AS total_tokens
    FROM dscore CROSS JOIN tot2
    WHERE imp_score // n_tokens >= s_tot // n_tot
    GROUP BY lang
    """


@query("composite_curation_importance", oracle=_curation_importance_sql())
def composite_curation_importance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The curation chain ending with MODEL-FREE data selection: quality
    + repetition gates → exact dedup → DSIR-shaped hashed-importance
    selection over the SURVIVORS (weights fitted on the deduped pool —
    fitting on the raw corpus would let duplicate text skew the raw
    distribution the ratio divides by) → per-lang doc/token totals of
    the selected set. The fourth ending in the capstone family next to
    budget (token quota), classified (learned model), and manifest
    (packing); selection here needs NO labels beyond the lang column
    and no trained weights.

    Shuffle budget: gate scan → dedup groupBy (1) → bucket agg (4096
    rows) → broadcast weights join → per-doc agg (1) → broadcast totals
    → final lang agg. Same overflow/baseline arguments as
    sample_importance_hashed (its docstring)."""
    from kstreams_spark.operators.classify import N_BUCKETS, bucket_sql
    from kstreams_spark.operators.sampling import IMP_SCALE, IMP_TARGET_LANG

    d = fence(spread(load_table(spark, sf_dir, "documents"))).withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    toks = F.col("toks")
    scored = d.select(
        "doc_id",
        "lang",
        "text",
        c4_quality_expr(toks).alias("quality"),
        F.expr(_SPARK_DUP2).alias("dup2"),
    )
    filtered = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("dup2") <= DUP2_GATE)
    )
    kept = filtered.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(lang, doc_id)").alias("lang"),
        F.min("text").alias("text"),
    )
    ktoks = kept.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "doc_id",
        "lang",
        F.expr(bucket_sql("tok")).cast("long").alias("bucket"),
    )
    counts = ktoks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("r"),
        F.sum(
            F.when(F.col("lang") == IMP_TARGET_LANG, 1).otherwise(0)
        ).alias("t"),
        # r15 (guide §2.4/§5): `counts` feeds tot AND weights; each
        # broadcast build re-derived gate scan → dedup → explode. 4096
        # rows — the orders_rfm_segmentation lineage-cut class.
    ).localCheckpoint(eager=False)
    tot = counts.agg(
        (F.sum("r") + N_BUCKETS).alias("r_tot"),
        (F.sum("t") + N_BUCKETS).alias("t_tot"),
    )
    weights = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.expr(
            f"CAST(((t + 1) * r_tot * {IMP_SCALE}) DIV ((r + 1) * t_tot) "
            f"AS BIGINT)"
        ).alias("w"),
    )
    dscore = (
        ktoks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").cast("long").alias("imp_score"),
        )
        # r15: `dscore` feeds tot2 AND the selection filter — the cut
        # stops the tot2 broadcast re-running the whole chain. Per-doc,
        # no text column — small.
        .localCheckpoint(eager=False)
    )
    tot2 = dscore.agg(
        F.sum("imp_score").alias("s_tot"), F.sum("n_tokens").alias("n_tot")
    )
    selected = dscore.crossJoin(F.broadcast(tot2)).filter(
        F.expr("imp_score DIV n_tokens") >= F.expr("s_tot DIV n_tot")
    )
    return selected.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


LATE_DAYS = 90
WAIT_TOP_K = 20


@query(
    "composite_waiting_suppliers",
    oracle=f"""
    WITH late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
    ),
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    waiting AS (
      SELECT s.l_suppkey, s.l_orderkey
      FROM late s
      WHERE EXISTS (SELECT 1 FROM pairs a
                    WHERE a.l_orderkey = s.l_orderkey
                      AND a.l_suppkey <> s.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late t
                        WHERE t.l_orderkey = s.l_orderkey
                          AND t.l_suppkey <> s.l_suppkey)
    )
    SELECT suppkey, numwait, rk FROM (
      SELECT l_suppkey AS suppkey, COUNT(*) AS numwait,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_suppkey) AS rk
      FROM waiting GROUP BY l_suppkey
    ) WHERE rk <= {WAIT_TOP_K}
    """,
)
def composite_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape (suppliers who kept waiting multi-supplier
    orders: their line shipped late and NO other supplier's did) —
    the classic double-correlated EXISTS + NOT EXISTS on the same fact
    table, the optimizer stress case. 'Late' adapted to the fixture
    columns: l_shipdate > o_orderdate + {LATE_DAYS} days on finished
    ('F') orders.

    Spark-first rewrite: instead of two correlated subqueries, ONE
    order-grain aggregate (n_supps, n_late_supps per order) joined back
    — s is the blamed supplier iff n_supps > 1 AND n_late_supps = 1.
    THE ORACLE KEEPS THE LITERAL EXISTS/NOT-EXISTS FORM, so the hash
    match proves the aggregate rewrite equivalent — the repo's standard
    rewrite-proof shape. One orders-side broadcast-joined scan, one
    per-order agg, one keyed join; no correlated re-scans anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    joined = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    late = (
        joined.filter(
            F.col("l_shipdate") > F.date_add("o_orderdate", LATE_DAYS)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps")
    )
    late_per_order = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_late")
    )
    waiting = (
        late.join(per_order, "l_orderkey")
        .join(late_per_order, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
    )
    w = Window.orderBy(F.col("numwait").desc(), F.col("suppkey"))
    return (
        waiting.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WAIT_TOP_K)
    )


def _feature_snapshot_oracle() -> str:
    """Composes the session-features and RFM oracles as derived tables
    (nested WITH — the registered-oracle-reuse technique), left-joined
    with COALESCEd scores so the whole training table is one certified
    hash."""
    from kstreams_spark.registry import ORACLES

    sf = ORACLES["events_session_features"]
    rfm = ORACLES["orders_rfm_segmentation"]
    return f"""
    WITH sf AS ({sf}), rfm AS ({rfm})
    SELECT sf.user_id, sf.session_no, sf.start_s, sf.dur_s, sf.n_events,
           sf.n_view, sf.n_click, sf.n_purchase, sf.converted,
           COALESCE(rfm.r_score, 0)::BIGINT AS r_score,
           COALESCE(rfm.f_score, 0)::BIGINT AS f_score,
           COALESCE(rfm.m_score, 0)::BIGINT AS m_score,
           CASE WHEN rfm.custkey IS NULL THEN 0 ELSE 1 END::BIGINT
             AS has_order_history
    FROM sf LEFT JOIN rfm ON rfm.custkey = sf.user_id
    """


@query("composite_feature_snapshot", oracle=_feature_snapshot_oracle())
def composite_feature_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ML TRAINING TABLE — the round-8 feature operators composed
    into the artifact a conversion model trains on: one row per
    (user, session) carrying the behavioral features
    (events_session_features: duration, per-type counts, the converted
    label) enriched with the user's commercial profile
    (orders_rfm_segmentation's R/F/M quartile scores; COALESCEd to 0
    with an explicit has_order_history flag for users with no orders —
    the nullable-int trap stays out of the hash). The oracle nests both
    registered oracles as derived tables, so the hash certifies the
    entire chain: sessionization, feature extraction, RFM ranking, and
    the enrichment join.

    Leakage note (the reason this composite exists): RFM here is a
    CORPUS-WIDE profile, fine for a within-corpus propensity model; a
    deployed per-event-time feature would swap the RFM leg for
    join_scd2_pointintime's as-of form — the docstrings form the
    decision record.

    Scale: session features shuffle once on user_id; RFM is three
    small-table rank passes; the enrichment is an equi-join of
    session-grain rows against the per-customer profile (broadcastable
    at dim scale)."""
    from kstreams_spark.registry import QUERIES

    sf = QUERIES["events_session_features"](spark, sf_dir)
    rfm = QUERIES["orders_rfm_segmentation"](spark, sf_dir).select(
        F.col("custkey"), "r_score", "f_score", "m_score"
    )
    j = sf.join(
        F.broadcast(rfm), sf.user_id == rfm.custkey, "left"
    )
    return j.select(
        "user_id",
        "session_no",
        "start_s",
        "dur_s",
        "n_events",
        "n_view",
        "n_click",
        "n_purchase",
        "converted",
        F.coalesce(F.col("r_score"), F.lit(0)).cast("long").alias("r_score"),
        F.coalesce(F.col("f_score"), F.lit(0)).cast("long").alias("f_score"),
        F.coalesce(F.col("m_score"), F.lit(0)).cast("long").alias("m_score"),
        F.when(F.col("custkey").isNull(), 0)
        .otherwise(1)
        .cast("long")
        .alias("has_order_history"),
    )


@query(
    "composite_promo_revenue_share",
    oracle="""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,6))
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,6))
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE)
             AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY date_trunc('month', l.l_shipdate)
    """,
)
def composite_promo_revenue_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q14 shape — monthly promo-part revenue share: lineitem ⋈
    broadcast(part), conditional DECIMAL sums per ship month, share =
    ONE division of two already-exact doubles (the deterministic float
    class). The fact side never shuffles for the join; the only
    exchange is the ≤months-sized final agg. Both branches of the
    conditional go through DECIMAL(18,6) (raw-float CASE sums are the
    r6 red-row class)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    agg = j.groupBy(
        F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
        .cast("double")
        .alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "month",
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_share"
        ),
    )


LATE_SHIP_DAYS = 30


@query(
    "composite_late_ship_priority",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def composite_late_ship_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q4 shape — orders with at least one line shipped more than
    {LATE_SHIP_DAYS} days after the order date, counted by priority
    (the fixture has no commitdate, so order-date lag stands in for
    Q4's commit/receipt test; the shape is identical). The correlated
    EXISTS is a LEFT-SEMI join on orderkey with the lag predicate as
    the join condition — each order counted once no matter how many
    late lines — then a ≤|priorities| aggregate. Spark plans the semi
    join hash-partitioned on orderkey; no correlated re-scan, the Q21
    rewrite argument at Q4 scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    sem = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAY")
        ),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


_Q19_DISJUNCTS_SQL = """(
      (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 15)
      OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
          AND l.l_quantity BETWEEN 10 AND 25)
      OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
          AND l.l_quantity BETWEEN 20 AND 40)
    )"""


@query(
    "composite_disjunctive_revenue",
    oracle=f"""
    SELECT p.p_brand,
           COUNT(*)::BIGINT AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {_Q19_DISJUNCTS_SQL}
    GROUP BY p.p_brand
    """,
)
def composite_disjunctive_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape — revenue under an OR-of-ANDs predicate mixing
    both tables' columns (brand × size-range × quantity-range
    disjuncts, adapted to the fixture's columns). The optimizer
    exercise Q19 exists for: Catalyst must split the disjunction into
    the single-table conjuncts it implies (every branch constrains
    p_brand/p_size and l_quantity), push those to BOTH scans, and
    evaluate only the residual cross-table OR after the broadcast join
    — `constraint propagation through a disjunction`, asserted in
    tests/test_plans.py (each scan shows pushed filters; the join is
    broadcast, never a nested loop). DECIMAL revenue; one ≤|brands|
    final agg."""
    li = load_table(spark, sf_dir, "lineitem").alias("l")
    p = load_table(spark, sf_dir, "part").alias("p")
    cond = (
        (
            (F.col("p.p_brand") == "Brand#12")
            & F.col("p.p_size").between(1, 15)
            & F.col("l.l_quantity").between(1, 15)
        )
        | (
            (F.col("p.p_brand") == "Brand#23")
            & F.col("p.p_size").between(10, 30)
            & F.col("l.l_quantity").between(10, 25)
        )
        | (
            (F.col("p.p_brand") == "Brand#34")
            & F.col("p.p_size").between(20, 50)
            & F.col("l.l_quantity").between(20, 40)
        )
    )
    j = li.join(
        F.broadcast(p), F.col("p.p_partkey") == F.col("l.l_partkey")
    ).filter(cond)
    return j.groupBy("p.p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l.l_extendedprice") * (1 - F.col("l.l_discount"))).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )


@query(
    "composite_customer_order_distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM co GROUP BY c_count
    """,
)
def composite_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 — the distribution-of-counts shape: how many customers
    placed exactly k orders, INCLUDING k=0 (the left join is the whole
    point — an inner join silently drops the idle customers, usually
    the segment the question is about). Two aggregations: per-customer
    count (shuffle on custkey, partial+final), then the ≤max-k
    histogram. The fact side shuffles once; no window anywhere."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


IDLE_DAYS = 365


@query(
    "composite_idle_balance_audit",
    oracle=f"""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    ),
    mx AS (SELECT MAX(o_orderdate) AS d0 FROM orders)
    SELECT c.c_nationkey,
           COUNT(*)::BIGINT AS n_idle_rich,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS idle_balance
    FROM customer c, avg_bal, mx
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate > mx.d0 - INTERVAL {{IDLE_DAYS}} DAY)
    GROUP BY c.c_nationkey
    """.format(IDLE_DAYS=IDLE_DAYS),
)
def composite_idle_balance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape — the lost-revenue audit: customers whose account
    balance beats the positive-balance average yet placed NO order in
    the timeline's last {IDLE_DAYS} days (every fixture customer has
    SOME order, so Q22's literal no-orders-ever test is structurally
    empty — recency-idle is the same shape with a live answer; nation
    stands in for Q22's phone country code). Plan: both scalars (the
    DECIMAL mean and the max date) are 1-row broadcasts so the
    threshold compares are engine-identical; the NOT EXISTS is a
    LEFT-ANTI join on custkey with the recency predicate on the right
    side BEFORE the join (anti-join against the filtered orders — the
    predicate-inside-EXISTS placement); the final agg is ≤|nations|
    rows. No correlated re-scan, no window."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    mx = o.agg(F.max("o_orderdate").alias("d0"))
    recent = o.crossJoin(F.broadcast(mx)).filter(
        F.col("o_orderdate")
        > F.col("d0") - F.expr(f"INTERVAL {IDLE_DAYS} DAY")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    idle = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_idle_rich"),
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("double")
        .alias("idle_balance"),
    )


Q18_QTY_THRESHOLD = 250  # ~top 1.5% of per-order quantity sums
Q18_TOP_K = 100


@query(
    "composite_large_volume_orders",
    oracle=f"""
    SELECT custkey, orderkey, totalprice, total_qty, rk FROM (
      SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey,
             o.o_totalprice AS totalprice,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               AS total_qty,
             ROW_NUMBER() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey)
               AS rk
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > {Q18_QTY_THRESHOLD}
      )
      GROUP BY o.o_custkey, o.o_orderkey, o.o_totalprice
    ) WHERE rk <= {Q18_TOP_K}
    """,
)
def composite_large_volume_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q18 shape — large-volume orders: the top-{Q18_TOP_K} orders
    (by price, orderkey tie-break) whose total line quantity exceeds
    {Q18_QTY_THRESHOLD}, with that total in the output. The classic
    IN-over-grouped-HAVING whose naive form aggregates lineitem TWICE
    (once inside the membership subquery, again for the output SUM).

    Spark-first: ONE lineitem scan, ONE (orderkey) aggregate — the
    HAVING aggregate IS the output value, so the membership test
    becomes a filter on the agg and the re-join/re-group disappears;
    orders attaches custkey/price by a keyed join against the
    ≤filtered-orders aggregate. THE ORACLE KEEPS THE LITERAL
    IN + re-join + re-group FORM (rewrite-proof). Quantity compare and
    sum are DECIMAL-exact; the top-k is the row_number-rank≤K class
    (WindowGroupLimit pushes the limit below the sort)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_qty")
        )
        .filter(F.col("_qty") > Q18_QTY_THRESHOLD)
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), "o_custkey", "o_totalprice"
    )
    j = o.join(big, o.o_orderkey == big.l_orderkey)
    w = Window.orderBy(F.col("totalprice").desc(), F.col("orderkey"))
    return (
        j.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("_qty").cast("double").alias("total_qty"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= Q18_TOP_K)
    )


Q15_QUARTER = ("1999-01-01", "1999-04-01")


@query(
    "composite_top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,6))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_QUARTER[0]}'
        AND l_shipdate < TIMESTAMP '{Q15_QUARTER[1]}'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev ON rev.suppkey = s.s_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    """,
)
def composite_top_revenue_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q15 shape — the quarter's top supplier(s): the revenue
    view joined against its own scalar MAX (ties all returned, Q15's
    contract). The naive form evaluates the view twice — once for the
    scalar, once for the equality — i.e. scans lineitem twice.

    Spark-first: ONE lineitem scan (plan-pinned) — the quarter filter
    pushes to the scan, ONE (suppkey) DECIMAL aggregate, and the scalar
    MAX rides an unpartitioned window OVER THE AGGREGATE, whose input
    is supplier-grain (≤|suppliers| rows — a dim-bounded
    single-partition pass, the documented exception class; the fact
    table never goes near it). Revenue equality compares in DECIMAL
    (exact in both engines); the output casts to DOUBLE once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_QUARTER[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_QUARTER[1]).cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("r")
    )
    w = Window.partitionBy()  # supplier-grain input: dim-bounded
    top = rev.withColumn("_mx", F.max("r").over(w)).filter(
        F.col("r") == F.col("_mx")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(F.broadcast(top), s.s_suppkey == top.suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("r").cast("double").alias("total_revenue"),
        )
    )


def _feature_snapshot_pit_oracle() -> str:
    """Nested-CTE oracle in the NAIVE form: session features joined to a
    theta LEFT JOIN on (custkey match AND order strictly before session
    start), re-aggregated per session — the per-key BETWEEN shape that
    explodes at scale. The engine's union+LOCF single-shuffle rewrite
    must hash-match it (the rewrite-proof pattern, as in
    join_scd2_pointintime)."""
    from kstreams_spark.registry import ORACLES

    sf = ORACLES["events_session_features"]
    return f"""
    WITH sf AS ({sf}),
    o AS (
      SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec,
             CAST(o_totalprice AS DECIMAL(18,6)) AS price
      FROM orders
    )
    SELECT sf.user_id, sf.session_no, sf.start_s, sf.dur_s, sf.n_events,
           sf.n_view, sf.n_click, sf.n_purchase, sf.converted,
           COALESCE((sf.start_s - MAX(o.osec)) // 86400, 0)::BIGINT
             AS r_days_pit,
           COUNT(o.osec)::BIGINT AS f_orders_pit,
           COALESCE(CAST(round(SUM(o.price) * 100) AS BIGINT), 0)
             AS m_cents_pit,
           CASE WHEN COUNT(o.osec) > 0 THEN 1 ELSE 0 END::BIGINT
             AS has_order_history
    FROM sf LEFT JOIN o
      ON o.o_custkey = sf.user_id AND o.osec < sf.start_s
    GROUP BY sf.user_id, sf.session_no, sf.start_s, sf.dur_s, sf.n_events,
             sf.n_view, sf.n_click, sf.n_purchase, sf.converted
    """


@query("composite_feature_snapshot_pit", oracle=_feature_snapshot_pit_oracle())
def composite_feature_snapshot_pit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The DEPLOY-GRADE training table — composite_feature_snapshot's
    own docstring prescribes this swap: the commercial profile is
    computed PER EVENT TIME, from orders STRICTLY BEFORE each session's
    start (r_days_pit = days since the last prior order at session
    start; f_orders_pit / m_cents_pit = prior order count / exact
    cents), so no feature can derive from anything the model would not
    have seen at inference time. Raw R/F/M values, not corpus quartile
    scores: point-in-time quartiles would rank each session against the
    FULL snapshot population — itself a subtle leak — and a trainer
    normalizes features anyway.

    Spark-first (the join_scd2_pointintime union+LOCF idiom, pointed at
    running aggregates): orders and session rows UNION into one
    per-user timeline, ONE shuffle+sort on (user, sec, kind, id), and
    running SUM/COUNT/LAST(ignorenulls) carry the prior-order profile
    onto every session row. Session rows sort BEFORE same-second orders
    (kind 0 < 1), which IS the strict `<` cut — tie semantics pinned by
    tests/test_feature_pit.py's planted same-second order. The oracle
    keeps the naive theta-join + re-aggregate form. Cost = sort of
    |sessions|+|orders| per user key; the naive form's per-key range
    join explodes at 100 TB."""
    from kstreams_spark.registry import QUERIES

    feat_cols = [
        "session_no",
        "start_s",
        "dur_s",
        "n_events",
        "n_view",
        "n_click",
        "n_purchase",
        "converted",
    ]
    sf = QUERIES["events_session_features"](spark, sf_dir)
    s_rows = sf.select(
        F.col("user_id").alias("k"),
        F.col("start_s").alias("sec"),
        F.lit(0).alias("kind"),
        F.col("session_no").alias("ord"),
        F.lit(None).cast("long").alias("osec"),
        F.lit(None).cast("decimal(18,6)").alias("price"),
        *feat_cols,
    )
    o_rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.unix_timestamp("o_orderdate").alias("sec"),
        F.lit(1).alias("kind"),
        F.col("o_orderkey").alias("ord"),
        F.unix_timestamp("o_orderdate").alias("osec"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("price"),
        *[F.lit(None).cast("long").alias(c) for c in feat_cols],
    )
    w = (
        Window.partitionBy("k")
        .orderBy("sec", "kind", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timeline = s_rows.unionByName(o_rows).select(
        "k",
        "kind",
        "sec",
        *feat_cols,
        F.last("osec", ignorenulls=True).over(w).alias("last_osec"),
        F.count("osec").over(w).alias("f_prior"),
        F.sum("price").over(w).alias("m_prior"),
    )
    out = timeline.filter(F.col("kind") == 0)
    return out.select(
        F.col("k").alias("user_id"),
        *feat_cols,
        F.coalesce(
            F.expr("(sec - last_osec) DIV 86400"), F.lit(0)
        )
        .cast("long")
        .alias("r_days_pit"),
        F.col("f_prior").cast("long").alias("f_orders_pit"),
        F.coalesce(
            F.round(F.col("m_prior") * 100).cast("long"), F.lit(0)
        ).alias("m_cents_pit"),
        F.when(F.col("f_prior") > 0, 1).otherwise(0).cast("long").alias(
            "has_order_history"
        ),
    )


Q17_BRAND = "Brand#12"
Q17_QTY_FRACTION = 0.2  # Q17's "less than 20% of the part's average"


@query(
    "composite_small_qty_revenue",
    oracle=f"""
    SELECT COUNT(*)::BIGINT AS n_small_qty_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{Q17_BRAND}'
      AND l.l_quantity < {Q17_QTY_FRACTION} * (
        SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def composite_small_qty_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 shape — small-quantity-order revenue: lines of one
    brand's parts whose quantity falls under {Q17_QTY_FRACTION}× that
    PART's average quantity (the correlated per-group scalar threshold;
    the fixture has no p_container, so the brand filter alone plays
    Q17's brand+container role). The naive plan re-scans lineitem per
    part for the correlated AVG.

    Spark-first rewrite — ONE scan of lineitem total (plan-pinned in
    tests/test_plans.py): broadcast the brand's partkeys into the scan,
    then compute the per-part average as a PARTITIONED WINDOW over the
    surviving rows (for a given partkey the window partition holds all
    of that part's lines, exactly the correlated subquery's set) — one
    shuffle on partkey, no self-join, no second scan. THE ORACLE KEEPS
    THE LITERAL CORRELATED FORM, so the hash match proves the
    window rewrite (the repo's rewrite-proof pattern). Exactness: the
    threshold average is DECIMAL-sum→DOUBLE / COUNT (both engines
    divide the same two numbers; the {Q17_QTY_FRACTION}× multiply is
    one IEEE op), revenue is DECIMAL-accumulated."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p_sel = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    brand_lines = li.join(
        F.broadcast(p_sel), li.l_partkey == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    small = brand_lines.withColumn("_avg_qty", avg_qty).filter(
        F.col("l_quantity") < Q17_QTY_FRACTION * F.col("_avg_qty")
    )
    return small.agg(
        F.count(F.lit(1)).cast("long").alias("n_small_qty_lines"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                "double"
            )
            / 7.0
        ).alias("avg_yearly"),
    )


Q20_PART_PREFIX = "small"
Q20_NATION_PREFIX = "NATION_1"  # 11 of the 25 fixture nations
Q20_RECENT_CUTOFF = "2001-01-01"  # the timeline's last year (max ship 2001-11)


@query(
    "composite_excess_supply_suppliers",
    oracle=f"""
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name LIKE '{Q20_NATION_PREFIX}%'
      AND s.s_suppkey IN (
        SELECT sp.l_suppkey FROM supply sp
        WHERE sp.l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_name LIKE '{Q20_PART_PREFIX}%')
          AND 2 * (SELECT COALESCE(SUM(CAST(l.l_quantity AS DECIMAL(18,6))),
                                   CAST(0 AS DECIMAL(18,6)))
                   FROM lineitem l
                   WHERE l.l_partkey = sp.l_partkey
                     AND l.l_suppkey = sp.l_suppkey
                     AND l.l_shipdate >= TIMESTAMP '{Q20_RECENT_CUTOFF}')
              > (SELECT SUM(CAST(l.l_quantity AS DECIMAL(18,6)))
                 FROM lineitem l
                 WHERE l.l_partkey = sp.l_partkey
                   AND l.l_suppkey = sp.l_suppkey))
    """,
)
def composite_excess_supply_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape — the nested-semi chain over aggregated facts:
    suppliers (in a nation group) who, for some '{Q20_PART_PREFIX}…'
    part they supply, shipped MORE THAN HALF their lifetime quantity of
    that part in the timeline's final year. The fixture has no partsupp
    table, so the supply relation is the distinct (l_partkey,
    l_suppkey) pairs and Q20's ps_availqty-vs-half-recent-shipments
    test becomes recent-vs-half-lifetime on the same pair — identical
    structure: part-name IN filter → per-(part,supplier) correlated
    aggregate threshold → supplier semi join → nation filter.

    Spark-first: ONE scan of lineitem total (plan-pinned) — broadcast
    the part-prefix keys into the scan, ONE groupBy (l_partkey,
    l_suppkey) computing lifetime and recent DECIMAL quantity sums
    together (the correlated pair of subqueries collapses into two
    aggregates of one pass), filter 2·recent > lifetime exactly in
    DECIMAL, then a left-semi into the nation-filtered suppliers. The
    oracle keeps the literal nested IN + twice-correlated scalar form
    — the hash match proves the collapse."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    p_sel = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_PART_PREFIX))
        .select("p_partkey")
    )
    qty = F.col("l_quantity").cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    pairs = (
        li.join(F.broadcast(p_sel), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty).alias("qty_total"),
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    >= F.lit(Q20_RECENT_CUTOFF).cast("timestamp"),
                    qty,
                ).otherwise(zero)
            ).alias("qty_recent"),
        )
    )
    excess_supps = (
        pairs.filter(2 * F.col("qty_recent") > F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    n_sel = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").startswith(Q20_NATION_PREFIX))
        .select("n_nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n_sel), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return s.join(
        excess_supps, s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


# --- TPC-H Q7/Q8/Q9 shapes (r9 — the multi-dimension join family) -----------

Q7_NATIONS = ("NATION_1", "NATION_2")


@query(
    "composite_nation_trade_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(CAST(ep * (1 - dc) AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS yr,
             l.l_extendedprice AS ep, l.l_discount AS dc
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE (n1.n_name = '{Q7_NATIONS[0]}' AND n2.n_name = '{Q7_NATIONS[1]}')
         OR (n1.n_name = '{Q7_NATIONS[1]}' AND n2.n_name = '{Q7_NATIONS[0]}')
    ) GROUP BY supp_nation, cust_nation, yr
    """,
)
def composite_nation_trade_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume: revenue between two
    named nations in BOTH directions, by (supplier nation, customer
    nation, ship year). The five-table join where join ORDER decides
    everything: supplier/nation and customer/nation legs are broadcast
    dims (each pre-filtered to the two nations, so the fact stream
    thins at the earliest possible join), and lineitem⋈orders is the
    one genuine fact-fact shuffle. DECIMAL revenue, integer year."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*Q7_NATIONS)
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("yr"),
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("revenue")
    )


Q8_MARKET_REGION = "ASIA"
Q8_SHARE_NATION = "NATION_12"  # an ASIA nation (regionkey 2)


@query(
    "composite_market_share",
    oracle=f"""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             n1.n_name AS supp_nation,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,6)) AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = '{Q8_MARKET_REGION}'
    )
    SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = '{Q8_SHARE_NATION}'
                         THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END)
                AS DOUBLE) AS nation_revenue,
           CAST(SUM(rev) AS DOUBLE) AS market_revenue,
           CAST(SUM(CASE WHEN supp_nation = '{Q8_SHARE_NATION}'
                         THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END)
                AS DOUBLE) / CAST(SUM(rev) AS DOUBLE) AS mkt_share
    FROM base GROUP BY yr
    """,
)
def composite_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: within one REGION's
    customer market, the fraction of revenue supplied by one nation,
    per order year. The conditional-share-of-conditional-sum pattern:
    both numerator and denominator are DECIMAL sums in ONE aggregation
    (never two passes), the share is one division of two exact doubles.
    Customer→nation→region is a chained broadcast dim leg that thins
    the fact stream before the orders join; supplier nation is a
    broadcast lookup for the CASE."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_MARKET_REGION
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    )
    agg = j.groupBy(
        F.year("o_orderdate").cast("long").alias("yr")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == Q8_SHARE_NATION, rev).otherwise(
                zero
            )
        )
        .cast("double")
        .alias("nation_revenue"),
        F.sum(rev).cast("double").alias("market_revenue"),
    )
    return agg.select(
        "yr",
        "nation_revenue",
        "market_revenue",
        (F.col("nation_revenue") / F.col("market_revenue")).alias(
            "mkt_share"
        ),
    )


Q9_PART_SUBSTR = "gear"


@query(
    "composite_product_profit",
    oracle=f"""
    SELECT nation, yr,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))
                    - CAST(p.p_retailprice * l.l_quantity
                           AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey,
    LATERAL (SELECT n.n_name AS nation,
                    CAST(year(o.o_orderdate) AS BIGINT) AS yr) x
    WHERE p.p_name LIKE '%{Q9_PART_SUBSTR}%'
    GROUP BY nation, yr
    """,
)
def composite_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and
    order year for parts matching a name substring (the fixture has no
    partsupp supplycost, so cost = p_retailprice × quantity — the same
    revenue-minus-cost DECIMAL arithmetic, sourced from the part dim).
    Join order: the part-name filter broadcasts into the scan FIRST
    (it's the selective predicate), supplier/nation broadcast, and
    lineitem⋈orders is the lone fact shuffle. Each term is cast to
    DECIMAL(18,6) BEFORE the subtraction — a raw-double difference
    would reintroduce the float-sum class the dsum rule exists for."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(Q9_PART_SUBSTR))
        .select("p_partkey", "p_retailprice")
    )
    n = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    amount = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,6)"
        )
        - (F.col("p_retailprice") * F.col("l_quantity")).cast(
            "decimal(18,6)"
        )
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return j.groupBy(
        "nation", F.year("o_orderdate").cast("long").alias("yr")
    ).agg(F.sum(amount).cast("double").alias("profit"))


# --- TPC-H Q2/Q11/Q16 shapes over a SYNTHESIZED supply relation (r9) --------
# The fixture ships no partsupp table; the supply relation is the distinct
# (l_partkey, l_suppkey) pairs with md5-derived integer cost/availability
# (engine-identical arithmetic both sides — the _BUCKET_SQL idiom widened
# to 4 hex digits), which preserves exactly what Q2/Q11/Q16 exercise:
# per-(part, supplier) attributes that are NOT functionally determined by
# either key alone.


def _hex_int_sql(hcol: str, start: int, n: int) -> str:
    """SQL for the integer value of `n` hex digits of md5 column `hcol`
    starting at 1-based `start` — instr/substr arithmetic valid verbatim
    in BOTH Spark SQL and DuckDB."""
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({hcol}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"({terms})"


_COST_EXPR = f"CAST(100 + {_hex_int_sql('h', 1, 4)} % 50000 AS BIGINT)"
_AVAIL_EXPR = f"CAST(1 + {_hex_int_sql('h', 5, 4)} % 9999 AS BIGINT)"

_SUPPLY_SQL = f"""
      SELECT partkey, suppkey, {_COST_EXPR} AS cost_cents,
             {_AVAIL_EXPR} AS availqty
      FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey,
                   md5(CAST(l_partkey AS VARCHAR) || ':'
                       || CAST(l_suppkey AS VARCHAR)) AS h
            FROM lineitem)
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _SUPPLY_SQL (same md5-digit arithmetic)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
        .withColumn(
            "h",
            F.md5(
                F.concat(
                    F.col("partkey").cast("string"),
                    F.lit(":"),
                    F.col("suppkey").cast("string"),
                )
            ),
        )
    )
    # r15: fence `h` so the md5 is computed once and STORED — projection
    # collapse re-inlined it into each of the 8 hex-digit extractions of
    # cost/avail, and the expanded expression's codegen cost ~8 s on
    # first run (the composite_shipmode_priority finding; same-session
    # A/B confirmed ≤ on every rep). Pair-grain rows — the fence class.
    li = fence(li)
    return li.select(
        "partkey",
        "suppkey",
        F.expr(_COST_EXPR).alias("cost_cents"),
        F.expr(_AVAIL_EXPR).alias("availqty"),
    )


Q2_REGION = "EUROPE"
Q2_SIZE_MAX = 10
Q2_TOP_K = 100


@query(
    "composite_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    esup AS (
      SELECT sp.partkey, sp.suppkey, sp.cost_cents, s.s_name, s.s_acctbal
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = '{Q2_REGION}'
    )
    SELECT partkey, suppkey, s_name, cost_cents, s_acctbal, rk FROM (
      SELECT e.*, ROW_NUMBER() OVER (ORDER BY e.s_acctbal DESC,
                                     e.suppkey, e.partkey) AS rk
      FROM esup e
      JOIN part p ON p.p_partkey = e.partkey
      WHERE p.p_size <= {Q2_SIZE_MAX}
        AND e.cost_cents = (SELECT MIN(e2.cost_cents) FROM esup e2
                            WHERE e2.partkey = e.partkey)
    ) WHERE rk <= {Q2_TOP_K}
    """,
)
def composite_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the minimum-cost supplier: for each small part,
    the {Q2_REGION}-region supplier(s) whose supply cost equals that
    part's regional minimum, top-{Q2_TOP_K} by account balance. The
    classic correlated scalar MIN over the same relation being
    selected from.

    Spark-first: the region-filtered supply table is computed ONCE; the
    per-part minimum is a partitioned window over it (supply is
    pair-grain ≪ lineitem), the equality filter replaces the correlated
    re-scan, parts broadcast, and the top-k is the rank≤K class. THE
    ORACLE KEEPS THE LITERAL CORRELATED FORM."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q2_REGION
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    esup = _supply(spark, sf_dir).join(
        F.broadcast(s), F.col("suppkey") == s.s_suppkey
    )
    w_min = Window.partitionBy("partkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= Q2_SIZE_MAX)
        .select("p_partkey")
    )
    best = (
        esup.withColumn("_mn", F.min("cost_cents").over(w_min))
        .filter(F.col("cost_cents") == F.col("_mn"))
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
    )
    w_rk = Window.orderBy(
        F.col("s_acctbal").desc(), F.col("suppkey"), F.col("partkey")
    )
    return (
        best.select("partkey", "suppkey", "s_name", "cost_cents", "s_acctbal")
        .withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= Q2_TOP_K)
    )


Q11_NATION_PREFIX = "NATION_2"  # NATION_2 + NATION_20..24: 6 nations
Q11_SHARE_PPM = 800  # parts holding > 0.08% of the tracked stock value


@query(
    "composite_important_stock",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    nsup AS (
      SELECT sp.partkey, sp.cost_cents * sp.availqty AS value_cents
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name LIKE '{Q11_NATION_PREFIX}%'
    ),
    pv AS (
      SELECT partkey, SUM(value_cents)::BIGINT AS part_value
      FROM nsup GROUP BY partkey
    ),
    tot AS (SELECT SUM(part_value)::BIGINT AS total_value FROM pv)
    SELECT pv.partkey, pv.part_value
    FROM pv, tot
    WHERE pv.part_value::DECIMAL(38,0) * 1000000
          > tot.total_value::DECIMAL(38,0) * {Q11_SHARE_PPM}
    """,
)
def composite_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — important stock: parts whose supply value
    (cost × availability) within a nation group exceeds a fixed share
    of the group's total — the HAVING-against-a-scalar-subquery
    pattern. Spark-first: ONE supply pass feeds both the per-part agg
    and (via a second tiny agg over it) the total; the threshold is an
    exact cross-multiplication (value·10⁶ > total·ppm) in
    DECIMAL(38,0) — BIGINT would overflow once total_value exceeds
    ~1.15e16 (plausible at the 100 TB posture: cost_cents·availqty
    summed over 1e8+ parts; ADVICE r9) — no float share ever computed;
    the 1-row total broadcasts."""
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").startswith(Q11_NATION_PREFIX)
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey")
    )
    pv = (
        _supply(spark, sf_dir)
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .groupBy("partkey")
        .agg(
            F.sum(F.col("cost_cents") * F.col("availqty"))
            .cast("long")
            .alias("part_value")
        )
    )
    tot = pv.agg(F.sum("part_value").cast("long").alias("total_value"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_value").cast("decimal(38,0)") * 1_000_000
            > F.col("total_value").cast("decimal(38,0)") * Q11_SHARE_PPM
        )
        .select("partkey", "part_value")
    )


Q16_EXCLUDED_BRAND = "Brand#3"
Q16_COMPLAINT_MOD = 13  # suppkey % 13 == 0 plays Q16's complaints list


@query(
    "composite_supplier_part_counts",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT sp.suppkey)::BIGINT AS supplier_cnt
    FROM supply sp JOIN part p ON p.p_partkey = sp.partkey
    WHERE p.p_brand <> '{Q16_EXCLUDED_BRAND}'
      AND p.p_type NOT LIKE 'PROMO%'
      AND sp.suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_suppkey % {Q16_COMPLAINT_MOD} = 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def composite_supplier_part_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape — supplier diversity per (brand, type, size)
    excluding one brand, one type family, and a blacklist (suppliers
    with 'complaints' — adapted to a modulus set): the COUNT(DISTINCT)
    + NOT IN combination. The NOT IN is a LEFT-ANTI join against the
    (non-null-key) blacklist — the only correct general translation
    (with nullable keys NOT IN means NOT EXISTS + null-check; the
    docstring records the distinction the fixture doesn't exercise).
    One supply pass, broadcast part dim, one distinct-count agg."""
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % Q16_COMPLAINT_MOD == 0)
        .select("s_suppkey")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != Q16_EXCLUDED_BRAND)
            & ~F.col("p_type").startswith("PROMO")
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        _supply(spark, sf_dir)
        .join(F.broadcast(bad), F.col("suppkey") == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "composite_forecast_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue_delta,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def composite_forecast_revenue_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q6 — the forecast-revenue-change query, verbatim shape:
    one scan, every predicate pushed (year band, discount band,
    quantity cap — all scan-level in PushedFilters), one DECIMAL sum of
    price×discount. The query exists to prove the engine never does
    more than the minimum: no join, no window, one partial+final agg.
    Completes the TPC-H shape family — every one of the 22 queries now
    has a fixture-adapted twin in this registry."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# --- TPC-H Q12 shape over SYNTHESIZED shipping columns (r10) ----------------
# The fixture ships no l_shipmode / l_commitdate / l_receiptdate; they are
# synthesized deterministically from (l_orderkey, l_linenumber) md5 digits —
# the _SUPPLY_SQL idiom (engine-identical arithmetic both sides) — which
# preserves exactly what Q12 exercises: a late-delivery predicate chain over
# three per-line dates plus two-way conditional counts per mode. TPC-H's own
# generator draws commitdate from orderdate+[30,90] and receiptdate from
# shipdate+[1,30]; the synthesis mirrors those distributions, so commitdate
# genuinely depends on the ORDERS side and the predicate cannot collapse to
# a lineitem-only filter (the join is load-bearing, as in real Q12).

Q12_MODES = ("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
Q12_SELECTED = ("MAIL", "SHIP")
Q12_YEAR_START = "1997-01-01"
Q12_YEAR_END = "1998-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")

_Q12_MODE_CASE = (
    f"CASE ({_hex_int_sql('lh', 1, 2)} % {len(Q12_MODES)}) "
    + " ".join(f"WHEN {i} THEN '{m}'" for i, m in enumerate(Q12_MODES))
    + " END"
)
# Spark-side twin of _Q12_MODE_CASE, same values: Catalyst rewrites
# CASE-key-WHEN into CASE WHEN key=v..., duplicating the md5-digit
# scrutinee into all 7 branches (~3 s/600k rows measured, r10); indexing
# a literal array evaluates the digits ONCE. The oracle keeps the CASE
# (DuckDB has no element_at; engine values are identical either way).
_Q12_MODE_SPARK = (
    "element_at(array("
    + ", ".join(f"'{m}'" for m in Q12_MODES)
    + f"), CAST({_hex_int_sql('lh', 1, 2)} % {len(Q12_MODES)} AS INT) + 1)"
)
_Q12_COMMIT_DAYS = f"(30 + {_hex_int_sql('lh', 3, 2)} % 61)"
_Q12_RECEIPT_DAYS = f"(1 + {_hex_int_sql('lh', 5, 2)} % 30)"
_Q12_EPOCH = "DATE '1970-01-01'"


@query(
    "composite_shipmode_priority",
    oracle=f"""
    WITH lx AS (
      SELECT l_orderkey,
             {_Q12_MODE_CASE} AS shipmode,
             ship_day,
             ship_day + {_Q12_RECEIPT_DAYS} AS receipt_day,
             {_Q12_COMMIT_DAYS} AS commit_days
      FROM (SELECT l_orderkey,
                   datediff('day', {_Q12_EPOCH}, CAST(l_shipdate AS DATE))
                     AS ship_day,
                   md5(CAST(l_orderkey AS VARCHAR) || ':'
                       || CAST(l_linenumber AS VARCHAR)) AS lh
            FROM lineitem)
    )
    SELECT shipmode,
           SUM(CASE WHEN o.o_orderpriority IN {Q12_HIGH}
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN {Q12_HIGH}
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lx JOIN orders o ON o.o_orderkey = lx.l_orderkey
    WHERE lx.shipmode IN {Q12_SELECTED}
      AND lx.receipt_day
          >= datediff('day', {_Q12_EPOCH}, DATE '{Q12_YEAR_START}')
      AND lx.receipt_day
          <  datediff('day', {_Q12_EPOCH}, DATE '{Q12_YEAR_END}')
      AND datediff('day', {_Q12_EPOCH}, CAST(o.o_orderdate AS DATE))
          + lx.commit_days < lx.receipt_day
      AND lx.ship_day
          < datediff('day', {_Q12_EPOCH}, CAST(o.o_orderdate AS DATE))
            + lx.commit_days
    GROUP BY shipmode
    """,
)
def composite_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — shipping modes and order priority: for the two
    selected ship modes, count lines delivered late-committed
    (shipdate < commitdate < receiptdate) in the receipt-year window,
    split into high- vs low-priority orders. Closes the TPC-H family at
    22/22 (VERDICT r9 task 6) — Q12 was the one shape the fixture's
    missing columns blocked; see the synthesis note above.

    Spark-first plan (one lineitem scan, one shuffle): every
    lineitem-only predicate — the 2-of-7 mode filter and the
    receipt-year window (receipt_day derives from shipdate alone) —
    thins the fact stream to ~4% BEFORE the single lineitem⋈orders
    exchange; the commitdate predicates need o_orderdate (the synthesis
    keeps Q12's orders-side dependency) and run post-join; map-side
    partial aggregation collapses to ≤2 groups. All date logic is
    integer day arithmetic (datediff vs epoch) — no interval types, no
    TZ sensitivity, identical in both engines. Reference parity: the
    reference's DSL ceiling covers groupBy+aggregate over a filtered
    join (SURVEY §2.2); this is that shape at TPC-H Q12 semantics."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("ship_day"),
        F.md5(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("lh"),
    )
    # r15 (guide §1.2/§2.4): fence `lh` so the md5 is computed ONCE and
    # STORED — projection collapse re-inlined it into every derived use
    # (the filter condition alone expanded md5(concat(...)) 8×), and the
    # resulting kilobyte-scale codegen function cost ~9 s to compile on
    # first run and ~1.3× at steady state (same-session A/B). The fence
    # is the documented local-only artifact class; 600k×(long, long,
    # 32-char) ≈ 35 MB.
    li = fence(li)
    year_lo = F.datediff(
        F.lit(Q12_YEAR_START).cast("date"), F.lit("1970-01-01").cast("date")
    )
    year_hi = F.datediff(
        F.lit(Q12_YEAR_END).cast("date"), F.lit("1970-01-01").cast("date")
    )
    lx = li.select(
        "l_orderkey",
        "ship_day",
        F.expr(_Q12_MODE_SPARK).alias("shipmode"),
        (F.col("ship_day") + F.expr(_Q12_RECEIPT_DAYS)).alias("receipt_day"),
        F.expr(_Q12_COMMIT_DAYS).alias("commit_days"),
    ).filter(
        F.col("shipmode").isin(*Q12_SELECTED)
        & (F.col("receipt_day") >= year_lo)
        & (F.col("receipt_day") < year_hi)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("order_day"),
    )
    commit_day = F.col("order_day") + F.col("commit_days")
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        lx.join(o, lx.l_orderkey == o.o_orderkey)
        .filter((commit_day < F.col("receipt_day")) & (F.col("ship_day") < commit_day))
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
    )
