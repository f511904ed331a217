"""Model-based quality scoring — the fastText-style linear classifier
stage of CCNet / GPT-3 / RefinedWeb curation, re-expressed Spark-first.

Those pipelines score every document with a pretrained linear text
classifier (bag of hashed token features · weight vector → margin →
keep/drop). The Spark-native shape of that stage:

  1. tokens: scan-shaped explode, WholeStageCodegen, ∝ corpus tokens;
  2. feature hashing: token → bucket in [0, n_buckets) via the md5-prefix
     hex parse below — pure SQL, identical on both engines (the hashing
     trick: collisions are part of the model, exactly as in fastText);
  3. a BROADCAST join against the (bucket, weight) table — a 2^20-bucket
     int-weight model is 8 MB, broadcastable forever, so the scoring
     stage is map-side only;
  4. ONE per-doc aggregation: margin = Σ weight, decided against 0 by
     integer comparison.

`quality_classifier` takes any (bucket, weight) DataFrame — that is the
model-loading seam. The REGISTERED fixture query synthesizes
deterministic weights from md5(bucket) so the DuckDB oracle can rebuild
the identical model without a file: the stand-in for loading trained
weights, exactly like the injectable-client seam the MQTT sink uses.

Weights are INTEGERS (a fixed-point export of a trained model — common
in production quantized classifiers), so margins are exact BIGINTs on
both engines: no float summation anywhere.

Reference parity note: the reference app (BME680.java) has no analytics
surface; this is part of the LLM-training-data extension the brief
mandates (SURVEY.md §2.3 north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.registry import query

N_BUCKETS = 4096  # 16^3: three md5 hex chars; 2^20 in production
_HEX = "0123456789abcdef"


def _hexval_sql(col_sql: str, k: int) -> str:
    """Portable hex-digit value: instr is 1-based on both engines."""
    return f"(instr('{_HEX}', substr({col_sql}, {k}, 1)) - 1)"


def bucket_sql(tok_sql: str) -> str:
    """Token → bucket in [0, 4096): first 3 hex chars of md5, base-16."""
    h = f"md5({tok_sql})"
    return (
        f"({_hexval_sql(h, 1)} * 256 + {_hexval_sql(h, 2)} * 16 "
        f"+ {_hexval_sql(h, 3)})"
    )


def _weight_sql(bucket_sql_: str) -> str:
    """Synthesized int weight in [-32768, 32767] from md5('qw' || bucket).
    The fixture's model-loader stand-in (see module docstring)."""
    h = f"md5(concat('qw', CAST({bucket_sql_} AS STRING)))"
    return (
        f"({_hexval_sql(h, 1)} * 4096 + {_hexval_sql(h, 2)} * 256 "
        f"+ {_hexval_sql(h, 3)} * 16 + {_hexval_sql(h, 4)} - 32768)"
    )


def synthesized_weights(spark: SparkSession, n_buckets: int = N_BUCKETS) -> DataFrame:
    """(bucket, weight) for the registered fixture query."""
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        F.expr(_weight_sql("id")).cast("long").alias("weight"),
    )


def quality_classifier(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """Score (doc_id, text) against a (bucket, weight) linear model.

    Returns (doc_id, n_tokens, margin, is_quality): margin is the exact
    integer sum of bucket weights over all tokens (duplicates count, as
    in a bag-of-words model); is_quality = margin >= 0.

    Shuffle budget: broadcast model join (map-side) + ONE per-doc agg.
    The token explode is scan-shaped."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    bucketed = toks.select(
        "doc_id", F.expr(bucket_sql("tok")).cast("int").alias("bucket")
    )
    scored = bucketed.join(F.broadcast(weights), "bucket")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("weight").cast("long").alias("margin"),
    ).select(
        "doc_id",
        "n_tokens",
        "margin",
        F.when(F.col("margin") >= 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_quality"),
    )


# DuckDB twin of the weight generator — the only expression whose
# spelling differs between engines (int→string cast). The bucket
# expression is engine-identical, so the oracles use bucket_sql itself.
_bucket_sql_duck = bucket_sql


def _weight_sql_duck(bucket_sql_: str) -> str:
    h = f"md5('qw' || CAST({bucket_sql_} AS VARCHAR))"
    return (
        f"({_hexval_sql(h, 1)} * 4096 + {_hexval_sql(h, 2)} * 256 "
        f"+ {_hexval_sql(h, 3)} * 16 + {_hexval_sql(h, 4)} - 32768)"
    )


@query(
    "text_quality_classifier",
    oracle=f"""
    WITH w AS (
      SELECT i::INT AS bucket, {_weight_sql_duck("i")}::BIGINT AS weight
      FROM generate_series(0, {N_BUCKETS - 1}) t(i)
    ),
    toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    b AS (SELECT doc_id, {_bucket_sql_duck("tok")}::INT AS bucket FROM toks)
    SELECT b.doc_id,
           COUNT(*)::BIGINT AS n_tokens,
           SUM(w.weight)::BIGINT AS margin,
           (CASE WHEN SUM(w.weight) >= 0 THEN 1 ELSE 0 END)::BIGINT
             AS is_quality
    FROM b JOIN w USING (bucket)
    GROUP BY b.doc_id
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over the documents table with the
    synthesized md5-derived model (the loader seam's fixture model).
    Every doc gets a margin; the hashing trick, broadcast-model join,
    and integer-margin plumbing are exactly what a real exported
    fastText model would ride."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return quality_classifier(d, synthesized_weights(spark))


@query(
    "classifier_margin_by_lang",
    oracle=f"""
    WITH w AS (
      SELECT i::INT AS bucket, {_weight_sql_duck("i")}::BIGINT AS weight
      FROM generate_series(0, {N_BUCKETS - 1}) t(i)
    ),
    toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    b AS (SELECT doc_id, {_bucket_sql_duck("tok")}::INT AS bucket FROM toks),
    m AS (
      SELECT b.doc_id, SUM(w.weight) AS margin
      FROM b JOIN w USING (bucket) GROUP BY b.doc_id
    )
    SELECT d.lang,
           COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN m.margin >= 0 THEN 1 ELSE 0 END)::BIGINT AS n_pass,
           quantile_cont(m.margin, 0.25) AS margin_q25,
           quantile_cont(m.margin, 0.5) AS margin_median,
           quantile_cont(m.margin, 0.75) AS margin_q75
    FROM documents d JOIN m USING (doc_id)
    GROUP BY d.lang
    """,
)
def classifier_margin_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-monitoring report for the quality classifier: per-language
    margin quartiles + pass counts — the calibration check a curation
    run does before trusting one decision threshold across languages (a
    classifier trained on one language family systematically shifts
    margins on others; the quartiles make that visible BEFORE the gate
    drops half a language). Exact percentiles over integer margins —
    the shared portable percentile semantics."""
    d = spread(load_table(spark, sf_dir, "documents"))
    m = quality_classifier(
        d.select("doc_id", "text"), synthesized_weights(spark)
    ).select("doc_id", "margin")
    j = d.select("doc_id", "lang").join(m, "doc_id")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("margin") >= 0, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_pass"),
        F.percentile("margin", 0.25).alias("margin_q25"),
        F.percentile("margin", 0.5).alias("margin_median"),
        F.percentile("margin", 0.75).alias("margin_q75"),
    )
