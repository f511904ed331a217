"""Benchmark decontamination — the standard curation stage that removes
training documents overlapping a held-out evaluation set (the GPT-3 /
PaLM / Llama recipe: flag any training doc sharing an n-gram, n≈8..13,
with any eval example).

Reference parity note: the reference app (BME680.java) has no analytics
surface; this module is part of the LLM-training-data extension the brief
mandates (SURVEY.md §2.3 north-star ops, VERDICT r5 "Next round" #1).

Scale posture (the 100 TB story):
- The ONLY join is a shingle-hash equi-join: training-side 8-gram md5
  hashes ⋈ eval-side 8-gram md5 hashes. Never doc×eval cross — the same
  candidate-scoped rule `ngram_jaccard_pairs` enforces (dedup.py).
- The eval side is structurally tiny relative to the corpus (benchmarks
  are ~10^4..10^6 examples → ~10^6..10^8 8-grams ≈ 16 B md5 keys each),
  so it broadcasts: the corpus-side shingle stream is probed map-side and
  the whole stage is shuffle-free except the final per-doc count agg.
  `broadcast_eval=False` falls back to a shuffle hash join for eval sets
  past broadcast size.
- Shingling the corpus is the dominant cost and is scan-shaped: explode
  → project → hash, all WholeStageCodegen, ∝ corpus token count.

Determinism: shingle identity travels as md5 hex (the only
Spark↔DuckDB-portable hash) on BOTH engines, so counts agree by
construction even in the (negligible) event of an md5 collision.

The registered fixture query synthesizes its eval set from the corpus
itself — every doc_id ≡ 7 (mod 50) contributes its first 40 tokens as one
eval example — so contamination is planted by construction and the DuckDB
oracle can re-derive the identical eval table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.operators.dedup import _shingles, shingles_sql
from kstreams_spark.registry import query

# Registered-query eval-set synthesis rule (mirrored in the oracle SQL):
# one eval example per doc_id ≡ EVAL_REM (mod EVAL_MOD), text = first
# EVAL_TOKENS whitespace tokens of the source doc.
EVAL_MOD = 50
EVAL_REM = 7
EVAL_TOKENS = 40
DECON_N = 8  # published pipelines use 8..13-gram overlap


def eval_ngram_hashes(eval_df: DataFrame, n: int = DECON_N) -> DataFrame:
    """(eval_id, text) → distinct (eval_id, sh) where sh = md5 of each
    n-gram shingle. The eval side of the decontamination join."""
    return (
        _shingles(eval_df.select(F.col("eval_id").alias("doc_id"), "text"), n)
        .select(F.col("doc_id").alias("eval_id"), F.md5("shingle").alias("sh"))
    )


def decontaminate(
    train_docs: DataFrame,
    eval_df: DataFrame,
    n: int = DECON_N,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training docs sharing any n-gram with the eval set.

    train_docs: (doc_id, text); eval_df: (eval_id, text).
    Returns one row per CONTAMINATED training doc:
      (doc_id, n_hit_ngrams, n_eval_docs_hit) — distinct overlapping
    n-grams and distinct eval examples hit. Downstream drops these ids
    with a left-anti join (see `decontaminate_survivors_sql` / the
    composite consumers).

    Shuffle budget: eval shingling (tiny) + corpus shingle scan (no
    shuffle; `_shingles` distinct is per-doc and the broadcast probe is
    map-side) + ONE per-doc count aggregation."""
    ev = eval_ngram_hashes(eval_df, n)
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _shingles(train_docs, n).select(
        "doc_id", F.md5("shingle").alias("sh")
    )
    return tr.join(ev, "sh").groupBy("doc_id").agg(
        F.count_distinct("sh").alias("n_hit_ngrams"),
        F.count_distinct("eval_id").alias("n_eval_docs_hit"),
    )


def _fixture_eval(docs: DataFrame) -> DataFrame:
    """The synthesized eval table for the registered queries."""
    return docs.filter(F.col("doc_id") % EVAL_MOD == EVAL_REM).select(
        F.col("doc_id").alias("eval_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), 1, EVAL_TOKENS)
        ).alias("text"),
    )


_EVAL_CTE = f"""
    eval_docs AS (
      SELECT doc_id,
             array_to_string(str_split(text, ' ')[1:{EVAL_TOKENS}], ' ') AS text
      FROM documents WHERE doc_id % {EVAL_MOD} = {EVAL_REM}
    )
"""


def _decontam_hits_sql() -> str:
    """Shared CTE chain ending in `hits` (doc_id, sh, eval_id)."""
    return f"""
    {_EVAL_CTE},
    ev_sh AS (
      SELECT doc_id AS eval_id, md5(shingle) AS sh
      FROM ({shingles_sql(DECON_N, "eval_docs")})
    ),
    tr_sh AS (
      SELECT doc_id, md5(shingle) AS sh
      FROM ({shingles_sql(DECON_N, "documents")})
    ),
    hits AS (
      SELECT t.doc_id, t.sh, e.eval_id
      FROM tr_sh t JOIN ev_sh e USING (sh)
    )
"""


@query(
    "decontaminate_against_eval",
    oracle=f"""
    WITH {_decontam_hits_sql()}
    SELECT doc_id,
           COUNT(DISTINCT sh) AS n_hit_ngrams,
           COUNT(DISTINCT eval_id) AS n_eval_docs_hit
    FROM hits GROUP BY doc_id
    """,
)
def decontaminate_against_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag every training doc sharing an 8-gram with the synthesized
    eval set (doc_id ≡ 7 mod 50 → first 40 tokens). Planted contamination:
    each eval source doc must flag itself, plus any exact/near duplicate
    of its opening 40 tokens. The eval shingle set is broadcast; the
    corpus side is a scan-shaped shingle stream (see module docstring)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return decontaminate(d, _fixture_eval(d))


@query(
    "decontaminate_survivor_stats",
    oracle=f"""
    WITH {_decontam_hits_sql()},
    flagged AS (SELECT DISTINCT doc_id FROM hits)
    SELECT d.source,
           COUNT(*) AS n_docs,
           COUNT(f.doc_id) AS n_flagged,
           COUNT(*) - COUNT(f.doc_id) AS n_kept
    FROM documents d LEFT JOIN flagged f USING (doc_id)
    GROUP BY d.source
    """,
)
def decontaminate_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drop step a real pipeline runs after flagging: per-source
    corpus size, contaminated count, and surviving count. The flagged set
    (distinct doc_ids, tiny) joins back LEFT so the survivors are
    everything unmatched — at 100 TB this is a broadcast left join
    against the corpus scan, then a 1-key agg."""
    d = spread(load_table(spark, sf_dir, "documents"))
    flagged = decontaminate(d, _fixture_eval(d)).select("doc_id")
    joined = d.select("doc_id", "source").join(
        F.broadcast(flagged.withColumn("is_hit", F.lit(1))), "doc_id", "left"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("is_hit").alias("n_flagged"),
        (F.count(F.lit(1)) - F.count("is_hit")).alias("n_kept"),
    )


# --- Fuzzy decontamination ------------------------------------------------
# Exact n-gram overlap misses lightly-edited contamination (a paraphrased
# or truncated eval example). The fuzzy pass flags training docs that are
# NEAR-duplicates of an eval example: MinHash bands propose candidate
# (train, eval) pairs over the corpus∪eval union, exact Jaccard verifies
# at a looser threshold. Pair space = band collisions restricted to CROSS
# pairs only (train×train and eval×eval collisions are filtered out
# before verification), so the candidate-scoped contract holds.
FUZZY_THRESHOLD = 0.3  # eval texts are 40-token prefixes: a 100-token
# source doc scores ≈ 38/98 ≈ 0.39 against its own prefix, so 0.5 would
# only catch short docs; 0.3 catches prefix-of-longer-doc contamination.
EVAL_ID_OFFSET = 1_000_000  # eval ids live above every corpus doc_id


def _fuzzy_sql() -> str:
    from kstreams_spark.operators.dedup import _minhash_verified_cte

    return f"""
    WITH uni AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT {EVAL_ID_OFFSET} + doc_id AS doc_id,
             array_to_string(str_split(text, ' ')[1:{EVAL_TOKENS}], ' ') AS text
      FROM documents WHERE doc_id % {EVAL_MOD} = {EVAL_REM}
    ),
    {_minhash_verified_cte("uni", FUZZY_THRESHOLD)}
    SELECT doc_id1 AS doc_id,
           COUNT(*) AS n_eval_neardups,
           MAX(jaccard) AS max_jaccard
    FROM ver
    WHERE doc_id1 < {EVAL_ID_OFFSET} AND doc_id2 >= {EVAL_ID_OFFSET}
    GROUP BY doc_id1
    """


def fuzzy_eval_flags(d: DataFrame) -> DataFrame:
    """The fuzzy-contamination pipeline body (shared by the registered
    query below and composite_contamination_report): corpus∪eval MinHash
    propose → cross-pair cut → Jaccard verify → per-doc
    (n_eval_neardups, max_jaccard)."""
    from kstreams_spark.operators.dedup import (
        minhash_band_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    uni = d.select("doc_id", "text").unionByName(
        _fixture_eval(d).select(
            (F.col("eval_id") + EVAL_ID_OFFSET).alias("doc_id"), "text"
        )
    )
    cross = minhash_band_pairs(minhash_signatures(uni)).filter(
        (F.col("doc_id1") < EVAL_ID_OFFSET)
        & (F.col("doc_id2") >= EVAL_ID_OFFSET)
    )
    pairs = ngram_jaccard_pairs(
        uni, candidates=cross, threshold=FUZZY_THRESHOLD
    )
    return pairs.groupBy(F.col("doc_id1").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_eval_neardups"),
        F.max("jaccard").alias("max_jaccard"),
    )


@query("decontaminate_fuzzy", oracle=_fuzzy_sql())
def decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate contamination: training docs whose 3-gram Jaccard
    against any eval example reaches FUZZY_THRESHOLD. MinHash bands over
    the corpus∪eval union propose, the candidate set is cut to CROSS
    (train, eval) pairs BEFORE the Jaccard verifier runs — train×train
    band collisions (the dedup signal, not the contamination signal)
    never reach verification. Output: flagged doc, how many eval
    examples it near-matches, and the worst overlap. The oracle replays
    propose→verify over the same union and filters the same cross
    pairs."""
    return fuzzy_eval_flags(spread(load_table(spark, sf_dir, "documents")))


def _report_sql() -> str:
    from kstreams_spark.operators.dedup import _minhash_verified_cte

    return f"""
    WITH {_decontam_hits_sql()},
    exact AS (
      SELECT doc_id, COUNT(DISTINCT sh) AS n_hit_ngrams
      FROM hits GROUP BY doc_id
    ),
    uni AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT {EVAL_ID_OFFSET} + doc_id AS doc_id,
             array_to_string(str_split(text, ' ')[1:{EVAL_TOKENS}], ' ') AS text
      FROM documents WHERE doc_id % {EVAL_MOD} = {EVAL_REM}
    ),
    {_minhash_verified_cte("uni", FUZZY_THRESHOLD)},
    fuzzy AS (
      SELECT doc_id1 AS doc_id,
             COUNT(*) AS n_eval_neardups,
             MAX(jaccard) AS max_jaccard
      FROM ver
      WHERE doc_id1 < {EVAL_ID_OFFSET} AND doc_id2 >= {EVAL_ID_OFFSET}
      GROUP BY doc_id1
    )
    SELECT COALESCE(e.doc_id, f.doc_id) AS doc_id,
           COALESCE(e.n_hit_ngrams, 0)::BIGINT AS n_hit_ngrams,
           COALESCE(f.n_eval_neardups, 0)::BIGINT AS n_eval_neardups,
           f.max_jaccard AS max_jaccard,
           (CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS flagged_exact,
           (CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS flagged_fuzzy
    FROM exact e FULL JOIN fuzzy f ON e.doc_id = f.doc_id
    """


@query("composite_contamination_report", oracle=_report_sql())
def composite_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit table a lab reviews before a training run: one row per
    doc flagged by EITHER decontamination signal — exact 8-gram overlap
    (n_hit_ngrams) and/or fuzzy near-duplication (n_eval_neardups,
    max_jaccard) — with per-signal flags, full-outer joined so each
    signal's misses are visible against the other's hits. Reuses both
    registered pipelines wholesale; the only new work is the tiny
    full-outer join of the two flag sets."""
    d = spread(load_table(spark, sf_dir, "documents"))
    exact = (
        decontaminate(d, _fixture_eval(d))
        .select("doc_id", "n_hit_ngrams")
    )
    fuzzy = fuzzy_eval_flags(d)
    j = exact.alias("e").join(
        fuzzy.alias("f"),
        F.col("e.doc_id") == F.col("f.doc_id"),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("e.doc_id"), F.col("f.doc_id")).alias("doc_id"),
        F.coalesce(F.col("e.n_hit_ngrams"), F.lit(0))
        .cast("long")
        .alias("n_hit_ngrams"),
        F.coalesce(F.col("f.n_eval_neardups"), F.lit(0))
        .cast("long")
        .alias("n_eval_neardups"),
        F.col("f.max_jaccard").alias("max_jaccard"),
        F.when(F.col("e.doc_id").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flagged_exact"),
        F.when(F.col("f.doc_id").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flagged_fuzzy"),
    )
