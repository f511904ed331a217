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


@query(
    "udf_cogroup_asof",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT p.user_id, p.event_id AS purchase_id,
             CAST(p.ts AS TIMESTAMP) AS purchase_ts,
             v.event_id AS view_id, CAST(v.ts AS TIMESTAMP) AS view_ts,
             ROW_NUMBER() OVER (PARTITION BY p.user_id, p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    SELECT user_id, purchase_id, purchase_ts, view_id, view_ts
    FROM m WHERE rn = 1
    """,
)
def udf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the two-relation half of the grouped-map
    seam (groupBy(k).cogroup(other.groupBy(k)).applyInPandas, Spark's
    KeyValueGroupedDataset.cogroup surface): both sides shuffle ONCE on
    the key and arrive as a pandas-frame pair per key. Worked example is
    last-touch attribution: per user, each purchase as-of-merged to the
    latest prior view (pandas merge_asof, backward, ties to the larger
    event_id via the (ts, event_id) sort — merge_asof keeps the LAST
    sorted match, which is exactly the oracle's ORDER BY ts DESC,
    event_id DESC rn=1 election). The built-in as-of operator family
    (join_asof_latest_order / join_asof_tolerance) is the hot-path form;
    this pins the extension seam against the same SQL semantics.

    Scale: one hash shuffle per side on user_id, per-key pandas frames
    (groups must fit executor memory — user-grain event history does);
    Arrow-batched both directions."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    p = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    v = ev.filter(F.col("event_type") == "view").drop("event_type")

    out_cols = ["user_id", "purchase_id", "purchase_ts", "view_id", "view_ts"]

    def per_user(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(columns=out_cols)
        left = left.sort_values(["ts", "event_id"]).reset_index(drop=True)
        right = (
            right.sort_values(["ts", "event_id"])
            .rename(columns={"event_id": "view_id", "ts": "view_ts"})
            .reset_index(drop=True)
        )
        m = pd.merge_asof(
            left,
            right[["view_ts", "view_id"]],
            left_on="ts",
            right_on="view_ts",
            direction="backward",
            allow_exact_matches=True,
        ).dropna(subset=["view_id"])
        m = m.rename(columns={"event_id": "purchase_id", "ts": "purchase_ts"})
        m["view_id"] = m["view_id"].astype("int64")
        return m[out_cols]

    return (
        p.groupBy("user_id")
        .cogroup(v.groupBy("user_id"))
        .applyInPandas(
            per_user,
            schema="user_id long, purchase_id long, purchase_ts timestamp, "
            "view_id long, view_ts timestamp",
        )
    )
