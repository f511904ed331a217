"""Scalar function coverage (SURVEY.md §2.3 "scalar fns" row): string,
date/time, math, array, map functions — all built-in pyspark.sql.functions
(JVM-side, WholeStageCodegen) — plus explode/posexplode (flatMap analog,
§2.2 `flatMapValues`).

Oracle portability notes (DuckDB 1.0):
- date_trunc returns DATE for coarse units → CAST back to TIMESTAMP;
- round/floor/ceil on literals return DECIMAL → CAST to DOUBLE;
- no WITH ORDINALITY → generate_subscripts emulates posexplode;
- arrays are returned as delimited strings (array_to_string) so the
  driver's value hash sees a flat scalar;
- sqrt/abs are IEEE-exact so raw doubles compare bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.registry import query


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_name) AS name_l,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
           instr(p_type, 'BRASS') AS brass_pos,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim(concat('  ', p_brand, '  ')) AS brand_trim
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (R6/R10 family). Spark regexp_replace is
    global by default — DuckDB needs the 'g' flag to match."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_name").alias("name_l"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devowel"),
        F.instr("p_type", "BRASS").alias("brass_pos"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trim"
        ),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           dayofweek(o_orderdate) + 1 AS order_dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
           strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') AS formatted,
           strptime(strftime(o_orderdate, '%m/%d/%Y %H:%M:%S'),
                    '%m/%d/%Y %H:%M:%S') AS reparsed,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
             AS days_since_95
    FROM orders
    """,
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery incl. the reference's MM/dd/yyyy HH:mm:ss wire
    format round-trip (systemtime parsing, BME680.java:106; SURVEY §1.3).

    DuckDB's dayofweek is 0=Sunday; Spark's is 1=Sunday — oracle adds 1.
    """
    o = load_table(spark, sf_dir, "orders")
    fmt = "MM/dd/yyyy HH:mm:ss"
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.date_format("o_orderdate", fmt).alias("formatted"),
        F.to_timestamp(F.date_format("o_orderdate", fmt), fmt).alias("reparsed"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_95"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity) AS DOUBLE) AS qty_floor,
           CAST(ceil(l_quantity) AS DOUBLE) AS qty_ceil,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem WHERE l_suppkey <= 3
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery — restricted to IEEE-exact ops (abs/floor/ceil/sqrt/mod)
    so raw doubles compare bit-identically across engines; transcendentals
    (log/pow) are engine-libm-dependent and are covered in unit tests
    instead."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").cast("double").alias("qty_floor"),
        F.ceil("l_quantity").cast("double").alias("qty_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT doc_id,
           len(str_split(text, ' ')) AS n_tokens,
           len(list_distinct(str_split(text, ' '))) AS n_unique,
           str_split(text, ' ')[1] AS first_token,
           CAST(list_contains(str_split(text, ' '), 'spark') AS INT) AS has_spark,
           array_to_string(list_slice(str_split(text, ' '), 1, 5), ' ')
             AS first5,
           array_to_string(list_sort(list_distinct(str_split(text, ' '))), ',')
             AS vocab
    FROM documents WHERE doc_id < 100
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery over tokenized text: split/size/element_at/contains/
    slice/distinct/sort — the columnar form of flatMapValues (§2.2)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("first5"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           map_extract(MAP(['type', 'bucket'],
                           [event_type, CAST(user_id % 5 AS VARCHAR)]),
                       'type')[1] AS m_type,
           map_extract(MAP(['type', 'bucket'],
                           [event_type, CAST(user_id % 5 AS VARCHAR)]),
                       'bucket')[1] AS m_bucket,
           cardinality(MAP(['type', 'bucket'],
                           [event_type, CAST(user_id % 5 AS VARCHAR)]))::BIGINT
             AS m_size,
           array_to_string(map_keys(MAP(['type', 'bucket'],
                           [event_type, CAST(user_id % 5 AS VARCHAR)])), ',') AS m_keys,
           array_to_string(map_values(MAP(['type', 'bucket'],
                           [event_type, CAST(user_id % 5 AS VARCHAR)])), ',') AS m_vals
    FROM events WHERE event_id < 500
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map battery: construct, element_at, size, map_keys/map_values
    (MapType closure, §1.5). DuckDB's map_extract returns a LIST → [1]
    unwraps it. Key/value arrays are joined to strings because the
    driver's canonicalizer sorts on every column (list cells are
    unhashable there); literal create_map preserves insertion order in
    both engines, so the joined order is deterministic."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("bucket"),
        (F.col("user_id") % 5).cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "bucket").alias("m_bucket"),
        F.size(m).cast("long").alias("m_size"),
        F.concat_ws(",", F.map_keys(m)).alias("m_keys"),
        F.concat_ws(",", F.map_values(m)).alias("m_vals"),
    )


@query(
    "explode_posexplode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(str_split(text, ' '), 1) - 1 AS pos,
           unnest(str_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 20
    """,
)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — 1→N flatMap (§2.2 flatMap/flatMapValues ↔ explode).
    DuckDB 1.0 lacks WITH ORDINALITY; generate_subscripts-1 gives the
    0-based position to match Spark's posexplode."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )
