"""Extended scalar/aggregate surface: higher-order array functions,
conditional aggregates, ordered collect, min_by/max_by, pattern matching,
null-handling combinators — rounding out SURVEY.md §2.3's "scalar fns" and
"aggregation" rows.

Portability notes: higher-order lambdas exist in both engines
(transform/filter/aggregate ↔ list_transform/list_filter/list_sum);
ordered collect is array_sort(collect_list()) ↔ list_sort(list()); Spark's
count_if ↔ SQL FILTER clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query


@query(
    "scalar_higher_order_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents
               WHERE doc_id < 100)
    SELECT doc_id,
           len(list_filter(toks, x -> length(x) >= 5)) AS n_long_tokens,
           CAST(list_sum(list_transform(toks, x -> length(x) * length(x)))
                AS BIGINT) AS sum_sq_len,
           array_to_string(list_transform(list_slice(toks, 1, 3),
                                          x -> upper(x)), '-') AS first3_upper
    FROM t
    """,
)
def scalar_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: filter (predicate lambda), transform +
    aggregate (fold), transform over a slice — the columnar flatMap/map
    toolkit, all JVM-side."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) >= 5)).alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x) * F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("bigint")
        .alias("sum_sq_len"),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), "-"
        ).alias("first3_upper"),
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_undiscounted,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                  FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS open_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (FILTER clause ↔ count_if / when-guarded
    sums) — one pass instead of N filtered subqueries."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_undiscounted"),
        F.sum(
            F.when(
                F.col("l_linestatus") == "O",
                F.col("l_extendedprice").cast("decimal(18,6)"),
            )
        )
        .cast("double")
        .alias("open_revenue"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(list(s_name)), ',') AS supplier_names,
           COUNT(*) AS n
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n_nationkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → array_sort → join: ordered collect (collect_list
    alone is partition-order-dependent; the sort makes it deterministic —
    the only safe way to emit collected arrays from a distributed agg)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "supplier_names"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) — the keyed-lookup aggregate behind
    KTable latest-value semantics. (Prices are continuous doubles; exact
    ties that would make arg selection ambiguous don't occur in the
    fixtures — for tie-prone keys use the row_number form instead,
    see ktable_latest_by_key.)"""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "scalar_pattern_matching",
    oracle="""
    SELECT p_partkey,
           CAST(p_name LIKE '%gold%' AS INT) AS has_gold,
           CAST(p_name LIKE 'a%' AS INT) AS starts_a,
           CAST(regexp_matches(p_type, '^(STANDARD|PROMO)') AS INT) AS is_std_promo,
           CAST(contains(p_type, 'BRASS') AS INT) AS has_brass,
           CAST(starts_with(p_brand, 'Brand#1') AS INT) AS brand1x,
           CAST(ends_with(p_name, 'e') AS INT) AS ends_e
    FROM part
    """,
)
def scalar_pattern_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / rlike / contains / startswith / endswith — predicate forms
    (cast to int for a stable cross-engine schema)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").like("%gold%").cast("int").alias("has_gold"),
        F.col("p_name").like("a%").cast("int").alias("starts_a"),
        F.col("p_type").rlike("^(STANDARD|PROMO)").cast("int").alias("is_std_promo"),
        F.contains(F.col("p_type"), F.lit("BRASS")).cast("int").alias("has_brass"),
        F.startswith(F.col("p_brand"), F.lit("Brand#1")).cast("int").alias("brand1x"),
        F.endswith(F.col("p_name"), F.lit("e")).cast("int").alias("ends_e"),
    )


@query(
    "scalar_null_combinators",
    oracle="""
    SELECT event_id,
           COALESCE(TRY_CAST(event_type AS DOUBLE), value, 0.0) AS first_present,
           nullif(event_type, 'error') AS type_or_null,
           CAST(value IS NOT NULL AS INT) AS value_present,
           ifnull(TRY_CAST(event_type AS BIGINT), -1) AS typed_or_default
    FROM events WHERE event_id < 300
    """,
)
def scalar_null_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL combinators: coalesce / nullif / is-null predicates / ifnull —
    the R9 null-guard family as expressions instead of branches."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    return ev.select(
        "event_id",
        F.coalesce(
            F.col("event_type").try_cast("double"), F.col("value"), F.lit(0.0)
        ).alias("first_present"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        F.col("value").isNotNull().cast("int").alias("value_present"),
        F.ifnull(F.col("event_type").try_cast("bigint"), F.lit(-1)).alias(
            "typed_or_default"
        ),
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_orderkey & l_partkey)::BIGINT AS b_and,
           (l_orderkey | l_partkey)::BIGINT AS b_or,
           xor(l_orderkey, l_partkey)::BIGINT AS b_xor,
           (~l_orderkey)::BIGINT AS b_not,
           (l_orderkey << 3)::BIGINT AS shl3,
           (l_orderkey >> 2)::BIGINT AS shr2,
           bit_count(l_orderkey)::BIGINT AS popcnt,
           ((l_orderkey >> 5) & 1)::BIGINT AS bit5
    FROM lineitem WHERE l_suppkey <= 2
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar battery — and/or/xor/not, shifts, popcount, bit
    probe — the integer toolbox the BQ sign-code scan and the Z-order
    interleave are built from, exercised as first-class columns (two's-
    complement semantics agree across engines on BIGINT; shifts bounded
    far under the DuckDB 1<<63 overflow edge documented in quantize.py).
    Pure scan-shaped codegen."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 2)
    ok = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ok.bitwiseAND(F.col("l_partkey")).cast("long").alias("b_and"),
        ok.bitwiseOR(F.col("l_partkey")).cast("long").alias("b_or"),
        ok.bitwiseXOR(F.col("l_partkey")).cast("long").alias("b_xor"),
        F.bitwise_not(ok).cast("long").alias("b_not"),
        F.shiftleft(ok, 3).cast("long").alias("shl3"),
        F.shiftright(ok, 2).cast("long").alias("shr2"),
        F.bit_count(ok).cast("long").alias("popcnt"),
        F.shiftright(ok, 5).bitwiseAND(F.lit(1)).cast("long").alias("bit5"),
    )
