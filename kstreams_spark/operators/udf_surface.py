"""UDF surface (SURVEY.md §2.3 "UDF surface"): row-at-a-time Python UDF,
vectorized pandas_udf (scalar + grouped-agg), applyInPandas (grouped map),
mapInPandas (in operators/multimodal.py).

These exist to prove the extension seams, NOT for the hot path — every one
of these computations is also expressible as built-in columns (and the
oracle SQL shows exactly what they compute). Performance order
(pyspark_guide): built-in >> pandas_udf (Arrow batches) >> Python UDF
(per-row pickle). The row-wise UDF query is deliberately bounded to 50
docs as a worked example of why it's the slow path.

Determinism: all UDF outputs here are integer-derived — no float drift.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kstreams_spark.io import load_table
from kstreams_spark.registry import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           len(str_split(text, ' ')) AS n_tokens_udf,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens_expr
    FROM documents
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow-batched token count) next to the
    equivalent built-in expression — same values, JVM vs Python path."""

    @F.pandas_udf(T.IntegerType())
    def token_count(s: pd.Series) -> pd.Series:
        return s.str.count(" ").add(1).astype("int32")

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens_udf"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1
        ).alias("n_tokens_expr"),
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT lang, source,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang, source
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (a Python UDAF): exact integer sum per
    group — Catalyst still plans partial/final around it."""

    @F.pandas_udf(T.LongType())
    def total_chars(s: pd.Series) -> int:
        return int(s.sum())

    @F.pandas_udf(T.LongType())
    def n_rows(s: pd.Series) -> int:
        return int(len(s))

    # NB: Spark disallows mixing pandas grouped-agg UDFs with built-in
    # aggregates in one agg() — so the count is a pandas UDF too.
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        total_chars("n_chars").alias("total_chars"),
        n_rows("n_chars").alias("n_docs"),
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(n_chars - MIN(n_chars) OVER (PARTITION BY lang) AS BIGINT)
             AS chars_above_min,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
                AS BIGINT) AS size_rank
    FROM documents
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (UDTF-like per-group transform): per-lang
    normalization + rank computed in pandas; shuffles once on the group
    key, each group handled as one pandas frame (groups must fit executor
    memory — at 100 TB choose group keys accordingly)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        pdf["chars_above_min"] = pdf["n_chars"] - pdf["n_chars"].min()
        pdf["size_rank"] = pdf.index + 1
        return pdf[["doc_id", "lang", "n_chars", "chars_above_min", "size_rank"]]

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        per_group,
        schema="doc_id long, lang string, n_chars long, "
        "chars_above_min long, size_rank long",
    )


@query(
    "udf_python_rowwise",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(list_transform(generate_series(1, length(source)),
                                        i -> ascii(substr(source, i, 1)))) % 1000
                AS BIGINT) AS src_checksum
    FROM documents
    WHERE doc_id < 50
    """,
)
def udf_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the documented slow path (per-row
    serialization), bounded input on purpose. Kept for API parity with
    arbitrary per-record logic (§2.2 Processor API)."""

    @F.udf(T.LongType())
    def checksum(s: str) -> int:
        return sum(ord(c) for c in s) % 1000

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", checksum("source").alias("src_checksum"))


@query(
    "udtf_bigram_explode",
    oracle="""
    WITH toks AS (
      SELECT doc_id, str_split(text, ' ') AS ts
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(pos AS INT) AS pos,
           ts[pos] || ' ' || ts[pos + 1] AS bigram
    FROM (SELECT doc_id, ts,
                 unnest(generate_series(1, len(ts) - 1)) AS pos
          FROM toks WHERE len(ts) >= 2)
    """,
)
def udtf_bigram_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 UDTF API) — the last
    extension seam of the UDF surface: one input row fans out to N output
    rows via a generator `eval`, consumed with SQL LATERAL so the left
    side's columns stay in scope. The worked example emits positional
    bigrams (the same values the built-in transform/sequence expression
    in text_top_bigrams produces — the oracle replays them), bounded to
    doc_id < 50 like the row-wise UDF demo: UDTFs are row-at-a-time
    Python and NOT the hot path; production n-gram fan-out stays in
    explode()+codegen."""

    @F.udtf(returnType="pos int, bigram string")
    class BigramExplode:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i + 1, toks[i] + " " + toks[i + 1]

    spark.udtf.register("kstreams_bigram_explode", BigramExplode)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("_kstreams_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.bigram
        FROM _kstreams_udtf_docs d,
             LATERAL kstreams_bigram_explode(d.text) t
        """
    )
