"""Deterministic sampling & dataset splitting (training-data pipeline
ops): content-hash sampling is reproducible across engines, runs, and
cluster sizes — unlike rng-based sample(), whose seeds don't transfer
between systems. The md5-prefix technique is also how you keep a sample
STABLE as the corpus grows (a document's membership never changes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.registry import query

# first two md5 hex chars → uniform 0..255 bucket, portable to any engine
_BUCKET_SQL = (
    "(instr('0123456789abcdef', substr(md5({key}), 1, 1)) - 1) * 16 + "
    "(instr('0123456789abcdef', substr(md5({key}), 2, 1)) - 1)"
)


def _bucket_from(key: F.Column) -> F.Column:
    h = F.md5(key)
    d1 = F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit("0123456789abcdef"), F.substring(h, 2, 1)) - 1
    return d1 * 16 + d2


@query(
    "sample_systematic_hash",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM (SELECT *, {_BUCKET_SQL.format(key="concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))")} AS bucket
          FROM lineitem)
    WHERE bucket < 16
    """,
)
def sample_systematic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/16 systematic sample by content hash of the row key — identical
    membership in every engine/run/cluster size; at 100 TB the predicate
    runs at scan speed and needs no shuffle or state."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    keyed = li.withColumn("bucket", _bucket_from(key))
    return keyed.filter(F.col("bucket") < 16).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "dataset_split_assignment",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             {_BUCKET_SQL.format(key="CAST(doc_id AS VARCHAR)")} AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 204 THEN 'train'
                WHEN bucket < 230 THEN 'validation'
                ELSE 'test' END AS split
    FROM b
    """,
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/validation/test assignment (~80/10/10) by document-id hash
    bucket — stable as the corpus grows (a doc never migrates between
    splits), leakage-free when the key is the dedup key."""
    d = load_table(spark, sf_dir, "documents")
    bucket = _bucket_from(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        F.when(bucket < 204, "train")
        .when(bucket < 230, "validation")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "sample_stratified_hash",
    oracle=f"""
    WITH b AS (
      SELECT event_id, event_type,
             {_BUCKET_SQL.format(key="CAST(event_id AS VARCHAR)")} AS bucket
      FROM events
    )
    SELECT event_id, event_type
    FROM b
    WHERE bucket < CASE WHEN event_type = 'error' THEN 256
                        WHEN event_type = 'purchase' THEN 128
                        ELSE 32 END
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-class rates (keep all errors, half of
    purchases, 1/8 of the rest) — the class-rebalancing pass of a
    training-data pipeline, still purely deterministic."""
    ev = load_table(spark, sf_dir, "events")
    bucket = _bucket_from(F.col("event_id").cast("string"))
    rate = (
        F.when(F.col("event_type") == "error", 256)
        .when(F.col("event_type") == "purchase", 128)
        .otherwise(32)
    )
    return ev.filter(bucket < rate).select("event_id", "event_type")


TOKEN_BUDGET = 10_000  # fixture budget; bites at every sf (sf0.01 corpus ≈ 27k tokens)


@query(
    "sample_token_budget",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len(str_split(text, ' ')) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    running AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY h, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, n_tokens::BIGINT AS n_tokens, cum_tokens::BIGINT AS cum_tokens
    FROM running WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted subset — the 'give me ~N tokens of corpus' op every
    training run starts with: documents taken in md5(doc_id) order (a
    deterministic shuffle — hash order IS a uniform random permutation,
    reproducible across engines/runs/cluster sizes, and stable under
    corpus growth in the sense that the kept prefix only changes where
    new docs hash into it) until the cumulative whitespace-token count
    reaches the budget. Unlike a rate-based sample, the output size is
    budgeted in TOKENS, which is what an LLM training job actually
    consumes.

    Shuffle budget: the budget semantics are inherently a GLOBAL prefix
    sum, but since r8 that no longer means a single-task window: the
    running total is the two-phase `global_prefix_sum` (range exchange
    + per-range windows + broadcast prefix offsets, operators/_util),
    so the full-corpus order costs one range exchange of (doc_id, n, h)
    triples. The sharded variant (sample_token_budget_sharded) remains
    the form that also shards the BUDGET itself."""
    from kstreams_spark.operators._util import global_prefix_sum

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    run = global_prefix_sum(
        toks, [F.col("h"), F.col("doc_id")], "n_tokens", "cum_tokens"
    )
    return run.filter(F.col("cum_tokens") <= TOKEN_BUDGET).select(
        "doc_id", "n_tokens", "cum_tokens"
    )


LANG_TOKEN_BUDGET = 2_000  # per-language fixture budget


@query(
    "sample_token_budget_sharded",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len(str_split(text, ' ')) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    running AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, lang, n_tokens::BIGINT AS n_tokens, cum_tokens::BIGINT AS cum_tokens
    FROM running WHERE cum_tokens <= {LANG_TOKEN_BUDGET}
    """,
)
def sample_token_budget_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale form of sample_token_budget: budget PER SHARD (here the
    lang column — per-language token quotas are themselves a standard
    multilingual-mix control), so the running-sum window partitions and
    parallelizes instead of funneling the corpus through one ordering
    task. This is exactly the rewrite the global-budget docstring
    prescribes at 100 TB; the two queries share all semantics except the
    window's partitionBy."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= LANG_TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


@query(
    "sample_source_balance",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source,
             {_BUCKET_SQL.format(key="CAST(doc_id AS VARCHAR)")} AS bucket
      FROM documents
    ),
    c AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
    m AS (SELECT MIN(n_total) AS min_cnt FROM c)
    SELECT b.source,
           MAX(c.n_total) AS n_total,
           COUNT(*) AS n_kept
    FROM b JOIN c USING (source), m
    WHERE b.bucket * c.n_total < 256 * m.min_cnt
    GROUP BY b.source
    """,
)
def sample_source_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix rebalancing (the Pile/Dolma-style domain reweighting
    stage): downsample every source to ≈ the smallest source's size, so
    no single crawl dominates the mix. Acceptance is the hash bucket
    test `bucket · n_source < 256 · min_count` — PURE INTEGER arithmetic
    (no float rate, no rounding divergence), deterministic per document,
    and stable under reruns. Two-pass shape: per-source counts (one tiny
    agg, broadcast) → scan-speed filter → per-source kept counts. At
    100 TB the counts table is KB-sized and the filter is a map-side
    broadcast probe; generalizing to arbitrary target weights replaces
    min_count with a weights table on the same inequality."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        "source",
        _bucket_from(F.col("doc_id").cast("string")).alias("bucket"),
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    m = counts.agg(F.min("n_total").alias("min_cnt"))
    kept = (
        b.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(m))
        .filter(
            F.col("bucket") * F.col("n_total") < 256 * F.col("min_cnt")
        )
    )
    return kept.groupBy("source").agg(
        F.max("n_total").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
    )


# Deterministic fixture weights for the weighted-mix query: integer
# "parts" in 1..4 derived from md5('mix' || source) — the model-loader
# seam pattern (classify.py): real usage passes any (source, weight)
# DataFrame; the fixture synthesizes one the oracle can rebuild.
_WT_SQL_SPARK = (
    "1 + (instr('0123456789abcdef',"
    " substr(md5(concat('mix', source)), 1, 1)) - 1) % 4"
)
_WT_SQL_DUCK = (
    "1 + (instr('0123456789abcdef',"
    " substr(md5('mix' || source), 1, 1)) - 1) % 4"
)


@query(
    "sample_source_weighted",
    oracle=f"""
    WITH c AS (SELECT source, COUNT(*) AS n_total FROM documents
               GROUP BY source),
    cw AS (SELECT source, n_total, ({_WT_SQL_DUCK})::BIGINT AS wt FROM c),
    m AS (SELECT n_total AS n_m, wt AS w_m FROM cw
          ORDER BY CAST(n_total AS DOUBLE) / wt, source LIMIT 1),
    b AS (
      SELECT doc_id, source,
             {{bucket}} AS bucket
      FROM documents
    )
    SELECT b.source,
           MAX(cw.n_total)::BIGINT AS n_total,
           MAX(cw.wt)::BIGINT AS weight,
           COUNT(*)::BIGINT AS n_kept
    FROM b JOIN cw USING (source), m
    WHERE b.bucket * m.w_m * cw.n_total < 256 * cw.wt * m.n_m
    GROUP BY b.source
    """.format(
        bucket=_BUCKET_SQL.format(key="CAST(doc_id AS VARCHAR)")
    ),
)
def sample_source_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-target source mixing (the DoReMi/Pile domain-weights
    stage, generalizing sample_source_balance exactly as its docstring
    prescribes): given integer weight PARTS W_s, the achievable mix
    without upsampling is set by the binding source m = argmin n_s/W_s;
    every source keeps rate (W_s·n_m)/(W_m·n_s), i.e. doc accepted iff
    bucket·W_m·n_s < 256·W_s·n_m — still pure integer arithmetic, no
    float rates. The binding source itself keeps everything.

    Two tiny broadcast tables (counts, weights) + a scan-speed filter;
    the argmin row is one ORDER BY ... LIMIT 1 over #sources rows (the
    double ratio compare is deterministic on both engines; ties break on
    source)."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    cw = counts.withColumn("wt", F.expr(_WT_SQL_SPARK).cast("long"))
    m = (
        cw.orderBy(
            (F.col("n_total").cast("double") / F.col("wt")), "source"
        )
        .limit(1)
        .select(
            F.col("n_total").alias("n_m"), F.col("wt").alias("w_m")
        )
    )
    b = d.select(
        "doc_id",
        "source",
        _bucket_from(F.col("doc_id").cast("string")).alias("bucket"),
    )
    kept = (
        b.join(F.broadcast(cw), "source")
        .crossJoin(F.broadcast(m))
        .filter(
            F.col("bucket") * F.col("w_m") * F.col("n_total")
            < 256 * F.col("wt") * F.col("n_m")
        )
    )
    return kept.groupBy("source").agg(
        F.max("n_total").cast("long").alias("n_total"),
        F.max("wt").cast("long").alias("weight"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )


@query(
    "sample_source_temperature",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source,
             {_BUCKET_SQL.format(key="CAST(doc_id AS VARCHAR)")} AS bucket
      FROM documents
    ),
    c AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
    m AS (SELECT MIN(n_total) AS min_cnt FROM c)
    SELECT b.source,
           MAX(c.n_total)::BIGINT AS n_total,
           COUNT(*)::BIGINT AS n_kept
    FROM b JOIN c USING (source), m
    WHERE b.bucket * b.bucket * c.n_total < 65536 * m.min_cnt
    GROUP BY b.source
    """,
)
def sample_source_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling at α = 1/2 (the T5/mT5 multilingual recipe:
    sample source s with probability ∝ n_s^α, softening big-source
    dominance without flattening to uniform): each source keeps rate
    √(n_min/n_s) — between `sample_source_balance`'s full equalization
    (rate n_min/n_s, α→0 behavior) and no rebalancing at all (α=1).

    The fractional power stays EXACT INTEGER arithmetic by squaring the
    acceptance inequality: keep iff bucket² · n_s < 256² · n_min — no
    float rates, no sqrt, deterministic per document (and the bucket²
    trick generalizes: α = p/q needs bucket^q · n_s^p < 256^q ·
    n_min^p). Same two-pass shape as the other mixers: tiny broadcast
    counts + scan-speed filter."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        "source",
        _bucket_from(F.col("doc_id").cast("string")).alias("bucket"),
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    m = counts.agg(F.min("n_total").alias("min_cnt"))
    kept = (
        b.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(m))
        .filter(
            F.col("bucket") * F.col("bucket") * F.col("n_total")
            < 65536 * F.col("min_cnt")
        )
    )
    return kept.groupBy("source").agg(
        F.max("n_total").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )


EXACT_K = 100  # fixture sample size


@query(
    "sample_exact_k",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT {EXACT_K}
    """,
)
def sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k deterministic sample — 'give me exactly 100 docs' (eval
    subsets, spot-check batches), where the rate-based samplers can only
    promise k in expectation: the first k documents in (md5(doc_id),
    doc_id) order. Hash order IS a uniform permutation, so this is a
    uniform sample that is reproducible across engines, runs, and
    cluster sizes, and ~stable under corpus growth (a new doc displaces
    at most one old member). TakeOrderedAndProject keeps it scalable:
    per-partition top-k heaps, driver merges P·k rows — no global
    sort (the same plan shape sort_limit_topk pins)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(EXACT_K)
        .drop("h")
    )


# --- hashed importance selection (DSIR-shaped, Xie et al. 2023) -----------
# Data Selection via Importance Resampling scores raw docs by how
# target-like their hashed n-gram features are. The published form uses
# log-likelihood ratios of bucket probabilities; logs are engine-libm-
# dependent (the standing transcendental rule), so this is the INTEGER-
# RATIO form: per-bucket weight = round-down of
#   SCALE · p_target(b) / p_raw(b)
#   = ((t_b + 1) · (r_tot + B) · SCALE) // ((r_b + 1) · (t_tot + B))
# (add-one smoothing over B buckets), and a doc's importance is the SUM
# of its tokens' weights — selected when its mean per-token importance
# (integer-divided, units of 1/SCALE) meets the CORPUS-MEAN rate, an
# empirical baseline that stays meaningful even when target and raw
# distributions nearly coincide (the theoretical baseline of exactly 1
# selects nothing under floor-division bias in that regime).
# Ordering by Σ ratios differs from ordering by Σ log-ratios (the ratio
# form over-weights individually-extreme buckets), which is the price of
# exactness; the selection SEMANTICS (more-target-like than baseline) are
# preserved. BIGINT magnitudes hold to ~1e9-doc corpora ((t+1)·r_tot·SCALE
# ≲ 2^63); past that, swap the two products to DECIMAL(38,0) on both
# engines — the expressions are otherwise unchanged.
IMP_SCALE = 1_000_000
IMP_TARGET_LANG = "en"


def _importance_oracle() -> str:
    from kstreams_spark.operators.classify import N_BUCKETS, bucket_sql

    return f"""
    WITH toks AS (
      SELECT doc_id, lang,
             {bucket_sql("tok")} AS bucket
      FROM (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS tok
            FROM documents)
    ),
    counts AS (
      SELECT bucket,
             COUNT(*) AS r,
             SUM(CASE WHEN lang = '{IMP_TARGET_LANG}' THEN 1 ELSE 0 END) AS t
      FROM toks GROUP BY bucket
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
    scored AS (
      SELECT tk.doc_id,
             COUNT(*) AS n_tokens,
             SUM(w.w)::BIGINT AS imp_score
      FROM toks tk JOIN weights w USING (bucket)
      GROUP BY tk.doc_id
    ),
    tot2 AS (
      SELECT SUM(imp_score) AS s_tot, SUM(n_tokens) AS n_tot FROM scored
    )
    SELECT doc_id, n_tokens, imp_score,
           CASE WHEN imp_score // n_tokens >= s_tot // n_tot
                THEN 1 ELSE 0 END AS is_selected
    FROM scored CROSS JOIN tot2
    """


@query("sample_importance_hashed", oracle=_importance_oracle())
def sample_importance_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped importance selection: hash every token into the
    classifier's 4096 md5 buckets, estimate target (lang =
    '{IMP_TARGET_LANG}') vs corpus bucket distributions in ONE agg,
    convert to integer importance weights (header comment), score each
    doc by its token-weight sum, select docs whose mean importance beats
    the corpus baseline. (doc_id, n_tokens, imp_score, is_selected) —
    every value exact integer arithmetic.

    Shuffle budget: one bucket agg (4096 rows out), a 1-row totals cross
    join, ONE broadcast weights join back onto the scan-shaped token
    stream, one per-doc agg. The same shape as text_quality_classifier —
    a learned model swap away from it: DSIR is 'the model IS the
    target/raw count ratio'."""
    from kstreams_spark.operators.classify import N_BUCKETS, bucket_sql

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "doc_id", "lang", F.expr(bucket_sql("tok")).cast("long").alias("bucket")
    )
    counts = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("r"),
        F.sum(
            F.when(F.col("lang") == IMP_TARGET_LANG, 1).otherwise(0)
        ).alias("t"),
        # r15 (guide §2.4/§5): `counts` feeds tot AND weights, and each
        # broadcast build re-derived the whole explode subtree (Catalyst
        # has no cross-branch subplan reuse). 4096 rows — the
        # orders_rfm_segmentation lineage-cut class.
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
    scored = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").cast("long").alias("imp_score"),
        )
        # r15: `scored` feeds tot2 AND the final select — without the
        # cut the tot2 broadcast re-ran explode+join+agg. Per-doc rows
        # of three longs — small.
        .localCheckpoint(eager=False)
    )
    tot2 = scored.agg(
        F.sum("imp_score").alias("s_tot"), F.sum("n_tokens").alias("n_tot")
    )
    return scored.crossJoin(F.broadcast(tot2)).select(
        "doc_id",
        "n_tokens",
        "imp_score",
        F.when(
            F.expr("imp_score DIV n_tokens") >= F.expr("s_tot DIV n_tot"), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("is_selected"),
    )


N_EPOCHS = 3  # epochs materialized by the shuffle-manifest demo
SHUFFLE_HEAD = 5  # manifest head rows kept per (epoch, shard)


@query(
    "sample_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT unnest(generate_series(0, {N_EPOCHS - 1})) AS epoch),
    r AS (
      SELECT e.epoch, d.lang, d.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.epoch, d.lang
               ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':'
                            || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS pos
      FROM documents d, e
    )
    SELECT epoch::BIGINT AS epoch, lang, pos::BIGINT AS pos, doc_id
    FROM r WHERE pos <= {SHUFFLE_HEAD}
    """,
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch reshuffle — the dataloader's epoch order
    as data: epoch e's order over a shard is md5(e:doc_id) ascending
    (ties to doc_id), so every epoch is a DIFFERENT pseudo-random
    permutation, yet any worker on any engine reconstructs the same one
    from (epoch, doc_id) alone — no RNG state to checkpoint, restarts
    and engine migrations keep their place mid-epoch. The registered
    demo materializes the first {SHUFFLE_HEAD} positions of each
    (epoch, lang) shard for {N_EPOCHS} epochs (value-visible: the heads
    differ across epochs).

    Scale shape: the 3-row epoch spine is a broadcast cross join; the
    rank window is partitioned by (epoch, shard) — the same sharded-
    window form as sample_token_budget_sharded, never a global order. A
    production run doesn't rank at all: it SORTS each shard's file list
    by the same md5 key at plan time (write_curated_lake partitions =
    shards) and streams; the hash IS the shuffle."""
    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    epochs = spark.range(N_EPOCHS).select(F.col("id").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs))
    w = Window.partitionBy("epoch", "lang").orderBy(
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
        "doc_id",
    )
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= SHUFFLE_HEAD)
        .select("epoch", "lang", "pos", "doc_id")
    )


# --- mixture plan (r9) ------------------------------------------------------

MIX_SCALE = 1_000_000  # rates/factors in parts-per-million


@query(
    "sample_mixture_plan",
    oracle=f"""
    WITH t AS (
      SELECT source,
             SUM(len(str_split(text, ' ')))::BIGINT AS avail,
             (1 + (CAST(substr(source, 4, 8) AS BIGINT) % 5))::BIGINT AS w
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(avail)::BIGINT AS total, SUM(w)::BIGINT AS sumw
            FROM t)
    SELECT t.source,
           t.avail AS avail_tokens,
           t.w AS weight,
           (tot.total * t.w) // tot.sumw AS need_tokens,
           LEAST({MIX_SCALE},
                 ((tot.total * t.w) // tot.sumw) * {MIX_SCALE} // t.avail)
             AS rate_ppm,
           ((tot.total * t.w) // tot.sumw) * {MIX_SCALE} // t.avail
             AS sample_factor_ppm,
           (((tot.total * t.w) // tot.sumw) + t.avail - 1) // t.avail
             AS epochs
    FROM t, tot
    """,
)
def sample_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATA-MIXING PLAN — the artifact between "here is my corpus"
    and "here is my training mixture" (the DoReMi/Pile-style recipe
    table): per source, the available token supply, the target weight
    (fixture: keyed off the source index), the token NEED to hit that
    weight at constant total size, and the two execution knobs a
    dataloader consumes — `rate_ppm` (the downsample rate, capped at
    unity) and `epochs` (the repeat count an UPsampled source needs,
    ceil(need/avail)); `sample_factor_ppm` is the uncapped ratio for
    audit. The rate/weighted/temperature samplers in this module are
    the per-doc EXECUTORS of such a plan; this query computes the plan
    itself.

    All integer: token sums, cross-multiplied shares, floor divisions
    (DIV ↔ //, the standing rule). Shuffle budget: ONE source agg
    (≤|sources| rows) + a broadcast 1-row totals join; at 100 TB the
    token supply census is the only corpus-touching pass."""
    d = load_table(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("avail"),
        F.max(
            F.expr("1 + (try_cast(substr(source, 4, 8) AS BIGINT) % 5)")
        )
        .cast("long")
        .alias("w"),
    )
    tot = t.agg(
        F.sum("avail").cast("long").alias("total"),
        F.sum("w").cast("long").alias("sumw"),
    )
    j = t.crossJoin(F.broadcast(tot))
    need = F.expr("(total * w) DIV sumw")
    return j.select(
        "source",
        F.col("avail").alias("avail_tokens"),
        F.col("w").alias("weight"),
        need.alias("need_tokens"),
        F.least(
            F.lit(MIX_SCALE).cast("long"),
            F.expr(f"((total * w) DIV sumw) * {MIX_SCALE} DIV avail"),
        ).alias("rate_ppm"),
        F.expr(f"((total * w) DIV sumw) * {MIX_SCALE} DIV avail").alias(
            "sample_factor_ppm"
        ),
        F.expr("(((total * w) DIV sumw) + avail - 1) DIV avail").alias(
            "epochs"
        ),
    )
