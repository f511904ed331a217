"""SCD2 effective-range derivation and corpus n-gram statistics — the
batch CDC shape (dimension versioning) and two more text-corpus ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.registry import query


@query(
    "scd2_effective_ranges",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS valid_to,
           CASE WHEN LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM orders
    """,
)
def scd2_effective_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) effective ranges: each
    version's valid_from/valid_to from LEAD over the change timeline,
    NULL valid_to = current version. One window shuffle on the entity
    key — the batch backfill for the streaming KeyedUpsertSink."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "text_top_bigrams",
    oracle="""
    WITH bi AS (
      SELECT unnest(list_transform(generate_series(1, len(l) - 1),
                                   i -> array_to_string(l[i:i+1], ' '))) AS bigram
      FROM (SELECT str_split(text, ' ') AS l FROM documents)
      WHERE len(l) >= 2
    )
    SELECT bigram, n, rk FROM (
      SELECT bigram, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram) AS rk
      FROM bi GROUP BY bigram
    ) WHERE rk <= 20
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams — the n-gram count shape of corpus
    statistics. Counts are a partial+final agg over exploded bigrams;
    the global top-k is TakeOrdered over the (small) distinct-bigram set."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    bi = F.expr(
        "transform(sequence(0, size(split(text, ' ')) - 2), "
        "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 2)))"
    )
    counts = (
        d.filter(F.size(toks) >= 2)
        .select(F.explode(bi).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("bigram", "n", "rk")
    )


@query(
    "text_scrub_patterns",
    oracle="""
    SELECT doc_id,
           regexp_replace(concat('contact: user', CAST(doc_id AS VARCHAR),
                                 '@example.com code ',
                                 CAST(doc_id * 7919 AS VARCHAR), ' ', text),
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                          '<EMAIL>', 'g') AS scrubbed_email,
           regexp_replace(concat('code ', CAST(doc_id * 7919 AS VARCHAR)),
                          '[0-9]{3,}', '<NUM>', 'g') AS scrubbed_nums
    FROM documents WHERE doc_id < 100
    """,
)
def text_scrub_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style pattern scrubbing (emails, long digit runs) — the
    redaction pass of a training-data pipeline, as pure regexp_replace
    (JVM regex, scan-speed). Synthetic PII is injected from doc_id so the
    scrub has something deterministic to remove."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    email_text = F.concat(
        F.lit("contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com code "),
        (F.col("doc_id") * 7919).cast("string"),
        F.lit(" "),
        F.col("text"),
    )
    num_text = F.concat(F.lit("code "), (F.col("doc_id") * 7919).cast("string"))
    return d.select(
        "doc_id",
        F.regexp_replace(
            email_text,
            r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "<EMAIL>",
        ).alias("scrubbed_email"),
        F.regexp_replace(num_text, "[0-9]{3,}", "<NUM>").alias("scrubbed_nums"),
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 <> 9
    ),
    v2 AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 3 THEN text || ' [rev2]'
                      ELSE text END) AS h
      FROM documents WHERE doc_id % 10 <> 0
    )
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'insert'
                WHEN v2.doc_id IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           v1.h AS old_md5, v2.h AS new_md5
    FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id
    WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.h <> v2.h
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the CDC read (Delta's table_changes / CDF)
    derived from two plain-parquet snapshots: full-outer join on the
    key, rows classified insert / delete / update by presence and
    content-hash inequality, unchanged rows dropped. The two snapshots
    are synthesized deterministically from `documents` (v1 misses the
    %10=9 docs, v2 drops the %10=0 docs and revises the %7=3 docs) so
    every change class carries volume and the oracle replays the whole
    derivation.

    Scale shape: each side reduces to (key, 16-byte md5) AT THE SCAN —
    the join shuffles hashes, never documents; with both snapshots
    bucketed on the key (io.write_bucketed) the exchange disappears
    entirely. The streaming twin is the KeyedUpsertSink's MERGE; this is
    its audit/backfill read."""
    d = load_table(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 10 != 9).select(
        F.col("doc_id").alias("k1"), F.md5("text").alias("old_md5")
    )
    v2 = d.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("k2"),
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 3, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("new_md5"),
    )
    j = v1.join(v2, v1.k1 == v2.k2, "full")
    return (
        j.select(
            F.coalesce(F.col("k1"), F.col("k2")).alias("doc_id"),
            F.when(F.col("k1").isNull(), "insert")
            .when(F.col("k2").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            "old_md5",
            "new_md5",
        )
        .filter(
            F.col("change_type").isin("insert", "delete")
            | (F.col("old_md5") != F.col("new_md5"))
        )
    )


@query(
    "join_scd2_pointintime",
    oracle="""
    WITH v AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS valid_to
      FROM orders
    ),
    f AS (
      SELECT event_id, user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT f.event_id, f.user_id,
           v.o_orderkey AS version_key,
           v.o_totalprice AS version_price
    FROM f JOIN v ON v.o_custkey = f.user_id
                 AND f.d >= v.valid_from
                 AND (v.valid_to IS NULL OR f.d < v.valid_to)
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 join — the feature-store enrichment that keeps
    training data leakage-free: each event joins the dimension VERSION
    effective AT ITS OWN time (here: the customer's latest order as of
    the event date), never a later one. Joining "current" dimension
    values into historical facts is the classic label-leakage bug; this
    is the correct temporal form, consuming the ranges
    scd2_effective_ranges builds.

    THE ORACLE IS THE NAIVE RANGE JOIN (fact date BETWEEN each
    version's [valid_from, valid_to)) — the hash match proves the
    scalable rewrite exact. The engine never materializes ranges or
    candidate pairs: versions and facts UNION into one timeline per
    key, ONE shuffle+sort on (key, date, kind, id), and
    last(ignorenulls) carries the in-effect version onto every fact row
    (the join_asof_latest_order pattern, pointed at a version
    timeline). Same-date ties resolve identically on both paths:
    versions sort before facts, and among same-date versions the
    max-orderkey one both owns the non-empty range (naive) and is the
    LOCF survivor (engine). Cost = sort of |facts|+|versions| — the
    shape that survives 100 TB where per-key BETWEEN joins explode."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("d"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("ord"),
        F.col("o_orderkey").alias("vkey"),
        F.col("o_totalprice").alias("vprice"),
        F.lit(None).cast("long").alias("event_id"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").cast("date").alias("d"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("ord"),
        F.lit(None).cast("long").alias("vkey"),
        F.lit(None).cast("double").alias("vprice"),
        "event_id",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("d", "kind", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = o.unionByName(ev).select(
        "k",
        "kind",
        "event_id",
        F.last("vkey", ignorenulls=True).over(w).alias("version_key"),
        F.last("vprice", ignorenulls=True).over(w).alias("version_price"),
    )
    return filled.filter(
        (F.col("kind") == 1) & F.col("version_key").isNotNull()
    ).select(
        "event_id",
        F.col("k").alias("user_id"),
        "version_key",
        "version_price",
    )
