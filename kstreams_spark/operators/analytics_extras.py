"""Analytics extras: unpivot (wide→long), fixed-bucket histograms,
second-moment statistics from exact sums, and calendar gap-filling —
the reshaping/statistics/densification shapes a reporting layer needs.

Determinism notes: variance/stddev are derived from exact DECIMAL(18,6)
sums with the closed-form formula evaluated in IEEE doubles — identical
in both engines (native stddev would float-drift with partition order);
histogram buckets are integer floor-division; the date spine is a
sequence generator, no data-dependent floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import dsum
from kstreams_spark.registry import query


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
    FROM lineitem WHERE l_suppkey <= 2
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
    FROM lineitem WHERE l_suppkey <= 2
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_suppkey <= 2
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long / melt): three measure columns become
    (metric, val) rows — the inverse of pivot_qty_by_status. Values are
    raw column passthrough, bit-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 2)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_extendedprice", "price")
        .otherwise("discount"),
    )


@query(
    "histogram_fixed_buckets",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) * 50 AS bucket_lo,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM events
    GROUP BY 1
    """,
)
def histogram_fixed_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer floor-division bucketing (DuckDB
    1.0 has no width_bucket; this form is portable and, at scale, is a
    single partial+final aggregation regardless of bucket count)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.floor(F.col("value") / 50.0).cast("bigint") * 50).alias("bucket_lo")
    return ev.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@query(
    "agg_moments_exact",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(value) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS sx2
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           sx / n AS mean,
           (n * sx2 - sx * sx) / (n * (n - 1.0)) AS variance,
           sqrt((n * sx2 - sx * sx) / (n * (n - 1.0))) AS stddev
    FROM s
    """,
)
def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample mean/variance/stddev from exact first and second moments —
    the cross-engine-deterministic form of stddev_samp (native stddev
    uses streaming single-pass updates whose float order varies with
    partitioning). At 100 TB: still one partial+final aggregation; the
    closed form trades one extra decimal sum for reproducibility."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(18,6)"))
        .cast("double")
        .alias("sx2"),
    )
    n, sx, sx2 = F.col("n"), F.col("sx"), F.col("sx2")
    variance = (n * sx2 - sx * sx) / (n * (n - 1.0))
    return s.select(
        "event_type",
        "n",
        (sx / n).alias("mean"),
        variance.alias("variance"),
        F.sqrt(variance).alias("stddev"),
    )


@query(
    "gapfill_daily_order_counts",
    oracle="""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', MIN(o_orderdate)) AS TIMESTAMP) AS d0,
             CAST(date_trunc('day', MAX(o_orderdate)) AS TIMESTAMP) AS d1
      FROM orders
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT spine.day, COALESCE(daily.n, 0) AS n_orders
    FROM spine LEFT JOIN daily USING (day)
    """,
)
def gapfill_daily_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling / densification: generate the full day spine between
    min and max order dates, left-join daily counts, zero-fill. The spine
    generator is one row per day — broadcastable at any fact scale."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("d0"),
        F.date_trunc("day", F.max("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders")
    )


MAD_K = 3  # flag |value - median| > K * MAD


@query(
    "events_outlier_mad",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           COUNT(*)::BIGINT AS n_events,
           SUM(CASE WHEN abs(e.value - m.med) > {MAD_K} * d.mad
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           MIN(m.med) AS med_value,
           MIN(d.mad) AS mad_value
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    GROUP BY e.event_type
    """,
)
def events_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the sensor stream — the adaptive form
    of the reference's FIXED alert threshold (BME680.java's hard-coded
    temperature cutoff): per event_type, flag readings more than
    {MAD_K}×MAD from the median. Median/MAD (not mean/stddev) so the
    outliers being hunted can't drag the threshold toward themselves.

    Two exact-percentile passes (median, then median absolute
    deviation) with the per-type statistics broadcast back — the same
    linear-interpolation percentile both engines share
    (percentile_exact). At 100 TB swap `approx_quantiles` in for the
    two exact percentiles (same plan shape, GK sketch instead of sort)
    and accept its documented layout sensitivity — thresholds don't
    need bit-exact medians; the oracle gate does."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad")
    )
    j = with_med.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med")) > MAD_K * F.col("mad"),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_outliers"),
        F.min("med").alias("med_value"),
        F.min("mad").alias("mad_value"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    ),
    first_week AS (
      SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, u.week) / 7 AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT u.user_id)::BIGINT AS n_users
    FROM uw u JOIN first_week f USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts — the product-analytics staple: users
    grouped by their first-activity week, counted in every later week
    they return. Offsets divide exactly (weeks align on Monday on both
    engines), so the arithmetic stays integral.

    Shuffle budget: the distinct (1) + per-user min (1, co-partitioned)
    + final 2-key agg. At 100 TB the distinct is the cost — pre-bucket
    the events lake by user_id and both user-keyed stages co-locate."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = uw.join(first, "user_id")
    return j.groupBy(
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7)
        .cast("long")
        .alias("week_offset"),
    ).agg(F.count_distinct("user_id").cast("long").alias("n_users"))


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1)::BIGINT AS n_view,
           (SELECT COUNT(*) FROM s2)::BIGINT AS n_view_click,
           (SELECT COUNT(*) FROM s3)::BIGINT AS n_view_click_purchase
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (view → click → purchase, each step strictly
    AFTER the previous step's first completion): per-user sequential
    first-completion times via two user-keyed join+min stages, then one
    global count per stage. Min-based throughout — deterministic under
    any partitioning. At 100 TB each stage is a user-keyed equi-join
    over shrinking survivor sets (the funnel property does the
    pruning)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
        .crossJoin(
            s2.agg(F.count(F.lit(1)).cast("long").alias("n_view_click"))
        )
        .crossJoin(
            s3.agg(
                F.count(F.lit(1))
                .cast("long")
                .alias("n_view_click_purchase")
            )
        )
    )


PROFILE_COLS = {
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "events": ["event_id", "user_id", "event_type", "value", "props"],
}


def _profile_oracle() -> str:
    parts = []
    for tbl, cols in PROFILE_COLS.items():
        for c in cols:
            parts.append(
                f"""SELECT '{tbl}' AS tbl, '{c}' AS col,
                    COUNT(*) AS n_rows,
                    (COUNT(*) - COUNT({c}))::BIGINT AS n_nulls,
                    COUNT(DISTINCT {c})::BIGINT AS n_distinct
                    FROM {tbl}"""
            )
    return " UNION ALL ".join(parts)


@query("profile_tables", oracle=_profile_oracle())
def profile_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling audit — the first query run against an unfamiliar
    lake: per (table, column) row count, null count, and exact distinct
    count for the two content tables. All integers; no typed min/max in
    the output (cross-engine value formatting is the hash risk class,
    and counts are what gate a pipeline run).

    Scale shape: ONE aggregate pass per table computes every column's
    three counts (count-distinct expands to the standard two-phase
    partial_count under whole-stage codegen — still a single scan of
    each table), then the per-column rows are literal projections
    unioned together. Nothing is per-row Python; adding a column is one
    list entry."""
    outs = []
    for tbl, cols in PROFILE_COLS.items():
        t = load_table(spark, sf_dir, tbl)
        aggs = []
        for c in cols:
            aggs += [
                F.count(F.lit(1)).alias(f"{c}__rows"),
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
                F.countDistinct(c).alias(f"{c}__distinct"),
            ]
        row = t.agg(*aggs)
        for c in cols:
            outs.append(
                row.select(
                    F.lit(tbl).alias("tbl"),
                    F.lit(c).alias("col"),
                    F.col(f"{c}__rows").cast("long").alias("n_rows"),
                    F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                    F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _corpus_report_oracle() -> str:
    davg_q = (
        "CAST(SUM(CAST(0.4 * (CASE WHEN len(toks) > 100 THEN 1.0 "
        "ELSE CAST(len(toks) AS DOUBLE) / 100 END) "
        "+ 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) "
        "+ 0.3 * (CASE WHEN list_contains(toks, 'the') "
        "OR list_contains(toks, 'a') THEN 1.0 ELSE 0.0 END) "
        "AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"
    )
    return f"""
    WITH t AS (SELECT doc_id, text, lang, source,
                      str_split(text, ' ') AS toks FROM documents)
    SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM t
    UNION ALL
    SELECT 'n_tokens', CAST(SUM(len(toks))::BIGINT AS DOUBLE) FROM t
    UNION ALL
    SELECT 'distinct_text_ratio',
           CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*) FROM t
    UNION ALL
    SELECT 'mean_quality', {davg_q} FROM t
    UNION ALL
    SELECT 'source_hhi',
           CAST(SUM(n * n)::BIGINT AS DOUBLE)
             / (SUM(n)::BIGINT * SUM(n)::BIGINT)
    FROM (SELECT COUNT(*) AS n FROM t GROUP BY source)
    UNION ALL
    SELECT 'lang_hhi',
           CAST(SUM(n * n)::BIGINT AS DOUBLE)
             / (SUM(n)::BIGINT * SUM(n)::BIGINT)
    FROM (SELECT COUNT(*) AS n FROM t GROUP BY lang)
    """


@query("composite_corpus_report", oracle=_corpus_report_oracle())
def composite_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus health card — the one-table summary a dataset release
    ships: doc/token counts, exact-dup ratio (distinct md5(text) /
    docs), mean C4 quality (DECIMAL-exact mean, the standing float-agg
    rule), and source/language concentration as HHI (Σ pᵢ² — the
    Herfindahl index; entropy needs log, which the transcendental rule
    keeps out of oracle-checked queries, and HHI ranks concentration the
    same way). One row per metric, value always DOUBLE (each an exact
    integer/decimal ratio evaluated as one division — portable).

    Scale shape: every metric is an aggregate over one scan of
    documents (the HHIs add a tiny per-source/per-lang pre-agg);
    map-side partial aggregation everywhere; output is 6 rows."""
    from kstreams_spark.operators.text import c4_quality_expr

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.split("text", " ").alias("toks"),
    )
    q = c4_quality_expr(F.col("toks"))

    def one(metric, col_df):
        return col_df.select(
            F.lit(metric).alias("metric"), F.col("value").cast("double")
        )

    rows = [
        one("n_docs", t.agg(F.count(F.lit(1)).cast("double").alias("value"))),
        one(
            "n_tokens",
            t.agg(F.sum(F.size("toks")).cast("long").cast("double").alias("value")),
        ),
        one(
            "distinct_text_ratio",
            t.agg(
                (
                    F.countDistinct(F.md5("text")).cast("double")
                    / F.count(F.lit(1))
                ).alias("value")
            ),
        ),
        one(
            "mean_quality",
            t.agg(
                (
                    F.sum(q.cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("value")
            ),
        ),
        one(
            "source_hhi",
            t.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                (
                    F.sum(F.col("n") * F.col("n")).cast("long").cast("double")
                    / (F.sum("n").cast("long") * F.sum("n").cast("long"))
                ).alias("value")
            ),
        ),
        one(
            "lang_hhi",
            t.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                (
                    F.sum(F.col("n") * F.col("n")).cast("long").cast("double")
                    / (F.sum("n").cast("long") * F.sum("n").cast("long"))
                ).alias("value")
            ),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


SESSION_GAP_S = 1800  # classic 30-minute inactivity gap


@query(
    "events_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
      FROM events
    ),
    flagged AS (
      SELECT user_id, sec, event_type,
             CASE WHEN LAG(sec) OVER w IS NULL
                       OR sec - LAG(sec) OVER w >= {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY sec)
    ),
    sess AS (
      SELECT user_id, sec, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no::BIGINT AS session_no,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           MIN(sec) AS start_s,
           (MAX(sec) - MIN(sec))::BIGINT AS dur_s
    FROM sess GROUP BY user_id, session_no
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization — the batch twin of the streaming session
    window (streaming/windows.py::session_agg_stream, Kafka Streams'
    SessionWindows.with(inactivityGap)): a new session starts when a
    user's gap since their previous event reaches {SESSION_GAP_S} s —
    gap >= GAP, exactly Spark session_window's join rule (an event joins
    a session iff ts < window_end = last + gap), so the streaming twin
    (streaming/windows.py::session_agg_stream) produces the SAME
    sessions (parity pinned in tests/test_streaming.py on
    second-truncated input, the grid this query's unix_timestamp floor
    computes on); session ids are the running count of session starts.

    Determinism with tied timestamps: the start flag depends only on the
    PREVIOUS DISTINCT second (tied rows see gap 0), and the running sum
    uses the default RANGE frame, so all rows of one second share a
    session id regardless of how either engine orders ties — the
    session-level aggregates are tie-order invariant.

    Shuffle budget at 100 TB: ONE shuffle on user_id serves both windows
    and the final (user_id, session_no) aggregation (same prefix key, no
    second exchange); per-user state is a sort, never a collect. Skewed
    power users are bounded by their own event volume, not the corpus.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) >= SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("sec")
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("sec").alias("start_s"),
        (F.max("sec") - F.min("sec")).cast("long").alias("dur_s"),
    )


CMS_D = 4  # count-min hash rows
CMS_W = 16  # buckets per row — small so fixture-scale collisions are visible


@query(
    "sketch_countmin_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    cells AS (
      SELECT r, tok,
             (instr('0123456789abcdef',
                    substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 1)) - 1)
               % {CMS_W} AS bucket
      FROM toks, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r)
    ),
    sketch AS (
      SELECT r, bucket, COUNT(*) AS cnt FROM cells GROUP BY r, bucket
    ),
    exact AS (
      SELECT tok, COUNT(*) AS exact FROM toks GROUP BY tok
    ),
    probe AS (
      SELECT e.tok, s.r, s.cnt
      FROM exact e,
           (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r) rs
      JOIN sketch s
        ON s.r = rs.r
       AND s.bucket = (instr('0123456789abcdef',
                             substr(md5(CAST(rs.r AS VARCHAR) || ':' || e.tok),
                                    1, 1)) - 1) % {CMS_W}
    )
    SELECT p.tok,
           MIN(p.cnt)::BIGINT AS est,
           MIN(e.exact)::BIGINT AS exact,
           (MIN(p.cnt) - MIN(e.exact))::BIGINT AS overcount
    FROM probe p JOIN exact e ON e.tok = p.tok
    GROUP BY p.tok
    """,
)
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan '05) over corpus
    tokens, with every estimate audited against the exact count: est =
    min over {CMS_D} hash rows of the {CMS_W}-bucket cell counts;
    overcount = est − exact ≥ 0 always (one-sided error), and the min
    across rows is what shrinks it. {CMS_W} buckets is deliberately tiny
    so fixture-scale collisions make the overcount column non-zero —
    value-visible, not just schema-visible.

    Why this sketch is in the registry while GK percentile is banned
    (CLAUDE.md invariant): CMS cells are COUNTS — merge = addition,
    exactly associative/commutative, so the sketch is partition-order
    and shuffle-width invariant by construction (the drift gate's
    nondeterminism classes can't touch it). HLL shares this property
    (max of registers); GK's merge does not.

    Scale shape: the sketch build is one scan + a {CMS_D}·{CMS_W}-cell
    aggregation — memory O(d·w) REGARDLESS of vocabulary (the reason to
    use CMS at 100 TB where the exact groupBy's hash table is the
    bottleneck); probes broadcast-join the 64-cell table. The exact
    side here is the audit, not the production path."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    rows = spark.range(CMS_D).select(F.col("id").cast("int").alias("r"))

    def bucket(r, tok):
        h = F.md5(F.concat(r.cast("string"), F.lit(":"), tok))
        return (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
        ) % CMS_W

    cells = toks.crossJoin(F.broadcast(rows)).select(
        "r", bucket(F.col("r"), F.col("tok")).alias("bucket")
    )
    sketch = cells.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact"))
    probe = (
        exact.crossJoin(F.broadcast(rows))
        .withColumn("bucket", bucket(F.col("r"), F.col("tok")))
        .join(F.broadcast(sketch), ["r", "bucket"])
    )
    return probe.groupBy("tok").agg(
        F.min("cnt").cast("long").alias("est"),
        F.min("exact").cast("long").alias("exact"),
        (F.min("cnt") - F.min("exact")).cast("long").alias("overcount"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    seq AS (
      SELECT user_id, event_type AS to_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY sec, event_id) AS from_type
      FROM e
    ),
    trans AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    tot AS (SELECT from_type, SUM(n) AS n_from FROM trans GROUP BY from_type)
    SELECT t.from_type, t.to_type, t.n,
           CAST(t.n AS DOUBLE) / tot.n_from AS p
    FROM trans t JOIN tot USING (from_type)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence — the behavioral-model shape behind funnels (events_funnel
    asks one fixed path; this measures ALL paths). Lag order is total
    (sec, then unique event_id), so the pair extraction is deterministic
    under timestamp ties on both engines; p is one IEEE division of
    exact counts.

    Scale: one user_id shuffle for the lag window, then a ≤|types|²
    aggregation and a |types|-row broadcast join — the matrix is tiny
    regardless of event volume."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = trans.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    return trans.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("n_from")).alias("p"),
    )


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT event_type, value, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    seq AS (
      SELECT event_type, day, value,
             LEAD(sec) OVER (PARTITION BY event_type, day
                             ORDER BY sec, event_id) - sec AS dt
      FROM e
    )
    SELECT event_type, day,
           CAST(SUM(CAST(value * dt AS DECIMAL(18,6))) AS DOUBLE)
             / NULLIF(SUM(dt), 0) AS twa,
           COUNT(*) AS n_holds,
           SUM(dt)::BIGINT AS covered_s
    FROM seq WHERE dt IS NOT NULL
    GROUP BY event_type, day
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TimescaleDB's time_weight('locf') /
    a TWAP bar): each reading holds until the next one, so its weight is
    that duration — the right average for irregularly-sampled sensors,
    where the plain mean over-counts bursts (the reference's BME680
    readings are exactly this shape). Per (event_type, day):
    twa = Σ value·dt / Σ dt over last-observation-carried-forward holds;
    a day's final reading carries no within-day weight (boundary
    truncation — the standard continuous-aggregate convention).

    Determinism: value·dt is one IEEE multiply (exact), the sum goes
    through DECIMAL(18,6) (the dsum rule), dt from the unique
    (sec, event_id) order. Scale: windows and the final agg share the
    (event_type, day) key — one shuffle, partitions bounded by a day of
    one type's events, never the corpus."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.date_trunc("day", "ts").alias("day"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("sec", "event_id")
    seq = ev.withColumn("dt", F.lead("sec").over(w) - F.col("sec")).filter(
        F.col("dt").isNotNull()
    )
    return seq.groupBy("event_type", "day").agg(
        (
            F.sum((F.col("value") * F.col("dt")).cast("decimal(18,6)"))
            .cast("double")
            / F.nullif(F.sum("dt"), F.lit(0))
        ).alias("twa"),
        F.count(F.lit(1)).alias("n_holds"),
        F.sum("dt").cast("long").alias("covered_s"),
    )


@query(
    "events_ohlc_daily",
    oracle="""
    WITH e AS (
      SELECT event_type, value, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    ranked AS (
      SELECT event_type, day, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY sec, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY sec DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, day,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM ranked GROUP BY event_type, day
    """,
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (open-high-low-close) per (event_type, day) — the
    classic downsampling rollup for sensor/market series, and the other
    half of the hypertable-rollup pair with events_time_weighted_avg.
    Open/close are elected by ROW_NUMBER over the unique (sec, event_id)
    order (first ascending / first descending) — deterministic under
    timestamp ties, unlike bare arg_min on a tied timestamp. Both
    windows and the final agg share the (event_type, day) partition key:
    one shuffle total (same contract as sessionize, plan-pinned)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.date_trunc("day", "ts").alias("day"),
    )
    wa = Window.partitionBy("event_type", "day").orderBy("sec", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("sec").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "day").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_session_funnel",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
      FROM events
    ),
    flagged AS (
      SELECT user_id, sec, event_type,
             CASE WHEN LAG(sec) OVER w IS NULL
                       OR sec - LAG(sec) OVER w >= {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY sec)
    ),
    sess AS (
      SELECT user_id, sec, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec) AS sn
      FROM flagged
    ),
    s1 AS (
      SELECT user_id, sn, MIN(sec) AS t1 FROM sess
      WHERE event_type = 'view' GROUP BY user_id, sn
    ),
    s2 AS (
      SELECT s.user_id, s.sn, MIN(s.sec) AS t2
      FROM sess s JOIN s1 ON s1.user_id = s.user_id AND s1.sn = s.sn
      WHERE s.event_type = 'click' AND s.sec > s1.t1
      GROUP BY s.user_id, s.sn
    ),
    s3 AS (
      SELECT s.user_id, s.sn, MIN(s.sec) AS t3
      FROM sess s JOIN s2 ON s2.user_id = s.user_id AND s2.sn = s.sn
      WHERE s.event_type = 'purchase' AND s.sec > s2.t2
      GROUP BY s.user_id, s.sn
    )
    SELECT (SELECT COUNT(DISTINCT (user_id, sn)) FROM sess)::BIGINT
             AS n_sessions,
           (SELECT COUNT(*) FROM s1)::BIGINT AS n_view,
           (SELECT COUNT(*) FROM s2)::BIGINT AS n_view_click,
           (SELECT COUNT(*) FROM s3)::BIGINT AS n_view_click_purchase
    """,
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel WITHIN sessions — composing sessionize's gap labeling
    with the ordered-step funnel changes the question from "did this
    user ever convert" (events_funnel, lifetime grain) to "how many
    VISITS convert" (the product-analytics number): each (user, session)
    must see view → click → purchase strictly in order inside the same
    session. Same min-based shrinking-survivor stages at (user_id,
    session_no) grain; the session labeling and every stage share the
    user_id shuffle prefix. (Fixture note: full in-session conversion is
    rare by construction — n_view/n_view_click carry volume at sf0.01,
    the terminal stage legitimately counts 0; the lifetime-grain
    events_funnel exercises the 3-deep volume path.)"""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    sess = ev.withColumn(
        "new_s",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) >= SESSION_GAP_S),
            1,
        ).otherwise(0),
    ).withColumn(
        "sn",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("sec")
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    s1 = (
        sess.filter(F.col("event_type") == "view")
        .groupBy("user_id", "sn")
        .agg(F.min("sec").alias("t1"))
    )
    s2 = (
        sess.filter(F.col("event_type") == "click")
        .join(s1, ["user_id", "sn"])
        .filter(F.col("sec") > F.col("t1"))
        .groupBy("user_id", "sn")
        .agg(F.min("sec").alias("t2"))
    )
    s3 = (
        sess.filter(F.col("event_type") == "purchase")
        .join(s2, ["user_id", "sn"])
        .filter(F.col("sec") > F.col("t2"))
        .groupBy("user_id", "sn")
        .agg(F.min("sec").alias("t3"))
    )
    n_sessions = (
        sess.select("user_id", "sn")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
    return (
        n_sessions.crossJoin(
            s1.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
        )
        .crossJoin(
            s2.agg(F.count(F.lit(1)).cast("long").alias("n_view_click"))
        )
        .crossJoin(
            s3.agg(
                F.count(F.lit(1)).cast("long").alias("n_view_click_purchase")
            )
        )
    )


@query(
    "orders_revenue_gini_by_nation",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nationkey, c.c_custkey,
             CAST(round(SUM(o.o_totalprice) * 100) AS BIGINT) AS rev_fx
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, c.c_custkey
    ),
    ranked AS (
      SELECT nationkey, rev_fx,
             ROW_NUMBER() OVER (PARTITION BY nationkey
                                ORDER BY rev_fx, c_custkey) AS rk
      FROM rev
    ),
    agg AS (
      SELECT nationkey,
             COUNT(*) AS n,
             SUM(rev_fx)::BIGINT AS s,
             SUM(rk * rev_fx)::BIGINT AS s1
      FROM ranked GROUP BY nationkey
    )
    SELECT nationkey, n,
           CAST((2 * s1 - (n + 1) * s) AS DOUBLE) / (n * s) AS gini
    FROM agg WHERE s > 0
    """,
)
def orders_revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per nation — the inequality
    metric behind 'do a few customers carry this market', computed
    EXACTLY: revenue in integer cents (o_totalprice has 2 decimals, so
    ×100 then round is exact), the rank-sum identity
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the within-nation
    (revenue, custkey) order, one IEEE division at the end. The rank
    window is NATION-partitioned — the per-group form of a metric whose
    global version would need the unpartitioned-sort class SCALE.md
    reserves for demos; magnitudes stay ≤ ~1e16 ≪ 2^63 at fixture and
    cluster scale alike (cents × ranks both grow linearly in customers
    per nation — re-shard by sub-market before ranks approach 2^31)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "c_custkey")
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("rev_fx")
        )
    )
    w = Window.partitionBy("nationkey").orderBy("rev_fx", "c_custkey")
    ranked = rev.withColumn("rk", F.row_number().over(w))
    agg = ranked.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev_fx").cast("long").alias("s"),
        F.sum(F.col("rk") * F.col("rev_fx")).cast("long").alias("s1"),
    )
    return agg.filter(F.col("s") > 0).select(
        "nationkey",
        "n",
        (
            (2 * F.col("s1") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.col("n") * F.col("s"))
        ).alias("gini"),
    )


@query(
    "orders_cohort_revenue",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP))
               AS cohort
      FROM orders GROUP BY o_custkey
    ),
    joined AS (
      SELECT f.cohort,
             (CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) * 12
              + CAST(EXTRACT(month FROM o.o_orderdate) AS BIGINT))
             - (CAST(EXTRACT(year FROM f.cohort) AS BIGINT) * 12
                + CAST(EXTRACT(month FROM f.cohort) AS BIGINT))
               AS month_offset,
             o.o_totalprice AS price
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT cohort, month_offset,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM joined GROUP BY cohort, month_offset
    """,
)
def orders_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue cohort analysis — the money-side twin of the
    events_retention_cohorts activity grid: customers grouped by FIRST-
    order month, revenue laid out by months-since-acquisition. Reading
    down a column compares cohort quality at equal age; reading across a
    row shows a cohort's decay — the LTV input. Month arithmetic is
    pure integers (y·12+m deltas, no interval subtraction ambiguity);
    revenue is the DECIMAL(18,6) exact-sum rule. One customer-keyed
    first-order aggregate joined back (same key → co-partitioned), then
    a ≤cohorts×offsets aggregation."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    mo = (
        F.year("o_orderdate") * 12
        + F.month("o_orderdate")
        - (F.year("cohort") * 12 + F.month("cohort"))
    ).cast("long")
    joined = o.join(firsts, "o_custkey").select(
        "cohort", mo.alias("month_offset"), F.col("o_totalprice").alias("price")
    )
    return joined.groupBy("cohort", "month_offset").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("price").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "composite_segment_revenue_trend",
    oracle="""
    WITH m AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue,
             COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT segment, month, n_orders, revenue,
           revenue - LAG(revenue) OVER w AS mom_delta,
           (revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w AS mom_pct
    FROM m
    WINDOW w AS (PARTITION BY segment ORDER BY month)
    """,
)
def composite_segment_revenue_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Month-over-month revenue trend per market segment — the BI
    dashboard staple composing a dimension join (broadcast customer →
    orders), an exact-decimal monthly rollup, and a trend window
    (lag delta + growth rate). Determinism: the monthly revenue is the
    DECIMAL exact-sum rule; the MoM delta and ratio are then single
    IEEE subtract/divide of identical doubles on both engines — derived
    floats are safe exactly when every input float is already
    bit-identical. The lag window rides the (segment, month) grain
    (tiny), not raw orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy("segment").orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "segment",
        "month",
        "n_orders",
        "revenue",
        (F.col("revenue") - prev).alias("mom_delta"),
        ((F.col("revenue") - prev) / prev).alias("mom_pct"),
    )


@query(
    "histogram_2d_part",
    oracle="""
    SELECT p_size AS size_bucket,
           CAST(floor(p_retailprice / 250.0) AS BIGINT) * 250 AS price_lo,
           COUNT(*) AS n,
           MIN(p_retailprice) AS lo,
           MAX(p_retailprice) AS hi
    FROM part
    GROUP BY 1, 2
    """,
)
def histogram_2d_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (the heatmap shape): part counts over the
    size × price-band grid — one partial+final aggregation regardless
    of grid resolution, same contract as the 1-D histogram; the joint
    distribution view a single-axis histogram can't give (is price
    driven by size?)."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy(
        F.col("p_size").alias("size_bucket"),
        (F.floor(F.col("p_retailprice") / 250.0).cast("bigint") * 250).alias(
            "price_lo"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p_retailprice").alias("lo"),
        F.max("p_retailprice").alias("hi"),
    )


@query(
    "events_autocorr_lag1",
    oracle="""
    WITH seq AS (
      SELECT event_type, value AS x,
             LAG(value) OVER (PARTITION BY event_type
                              ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                       event_id) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(18,6))) AS DOUBLE) AS syy
      FROM seq WHERE y IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS r1
    FROM s
    """,
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per sensor type — is the series persistent
    (r₁ → 1), mean-reverting (r₁ < 0), or white noise (r₁ ≈ 0)? The
    statistic that says whether LOCF holds (events_time_weighted_avg's
    premise) are justified. Pearson r over (xₜ, xₜ₋₁) pairs from the
    unique (sec, event_id) lag order, computed from exact DECIMAL sums
    with the closed form evaluated in IEEE doubles — agg_moments_exact's
    determinism recipe applied to a bivariate statistic. One event_type
    shuffle serves the lag window and the moment aggregation."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").alias("x"),
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    seq = ev.select(
        "event_type", "x", F.lag("x").over(w).alias("y")
    ).filter(F.col("y").isNotNull())

    def dsum2(c):
        return F.sum(c.cast("decimal(18,6)")).cast("double")

    s = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum2(F.col("x")).alias("sx"),
        dsum2(F.col("y")).alias("sy"),
        dsum2(F.col("x") * F.col("y")).alias("sxy"),
        dsum2(F.col("x") * F.col("x")).alias("sxx"),
        dsum2(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        "event_type",
        "n",
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("r1"),
    )


@query(
    "part_brand_type_chi2",
    oracle="""
    WITH obs AS (
      SELECT p_brand, p_type, COUNT(*) AS o FROM part GROUP BY 1, 2
    ),
    rows_t AS (SELECT p_brand, SUM(o) AS rt FROM obs GROUP BY p_brand),
    cols_t AS (SELECT p_type, SUM(o) AS ct FROM obs GROUP BY p_type),
    tot AS (SELECT SUM(o) AS n FROM obs),
    cells AS (
      SELECT obs.p_brand, obs.p_type, obs.o,
             CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n AS e
      FROM obs JOIN rows_t USING (p_brand)
               JOIN cols_t USING (p_type)
               CROSS JOIN tot
    )
    SELECT p_brand, p_type, o, e,
           (o - e) * (o - e) / e AS contrib
    FROM cells
    """,
)
def part_brand_type_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells for brand ⊥ type — the categorical
    independence test behind 'is this attribute informative': per cell,
    observed count, expected count rt·ct/n under independence, and the
    (o−e)²/e contribution (big contributions point at the dependent
    cells). Expected/contrib are chains of single IEEE ops over exact
    integer marginals — deterministic without decimal detours. Three
    aggregations over the 150-cell grid; marginals broadcast back.
    (The scalar Σcontrib is left to the reader via dsum — summing the
    derived doubles raw would be partition-order-dependent, the one
    float-summation trap this repo's rules exist for.)"""
    p = load_table(spark, sf_dir, "part")
    obs = p.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("p_brand").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("p_type").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "p_brand")
        .join(F.broadcast(ct), "p_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "p_brand",
            "p_type",
            "o",
            (
                F.col("rt").cast("double")
                * F.col("ct").cast("double")
                / F.col("n")
            ).alias("e"),
        )
    )
    return cells.select(
        "p_brand",
        "p_type",
        "o",
        "e",
        (
            (F.col("o") - F.col("e"))
            * (F.col("o") - F.col("e"))
            / F.col("e")
        ).alias("contrib"),
    )


@query(
    "events_hourly_profile",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT event_type, SUM(n) AS tot FROM h GROUP BY event_type)
    SELECT h.event_type, h.hour_of_day, h.n,
           CAST(h.n AS DOUBLE) / t.tot AS share,
           ROW_NUMBER() OVER (PARTITION BY h.event_type
                              ORDER BY h.n DESC, h.hour_of_day) AS rk
    FROM h JOIN t USING (event_type)
    """,
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type — the baseline the
    rate-spike monitor (events_rate_spike) implicitly compares against,
    made explicit: per-hour counts, traffic share (one IEEE division of
    exact counts), and peak ranking (ties to the earlier hour). Hours
    extract under the UTC session pin, so both engines bucket
    identically. One (type, hour) aggregation — ≤ types·24 rows — plus
    a broadcast totals join and a tiny rank window."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    )
    h = ev.groupBy("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).alias("n")
    )
    t = h.groupBy("event_type").agg(F.sum("n").cast("long").alias("tot"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), "hour_of_day"
    )
    return (
        h.join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "hour_of_day",
            "n",
            (F.col("n").cast("double") / F.col("tot")).alias("share"),
        )
        .withColumn("rk", F.row_number().over(w))
    )


WINSOR_LO = 0.05
WINSOR_HI = 0.95


@query(
    "events_winsorized_stats",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, {WINSOR_LO}) AS p_lo,
             quantile_cont(value, {WINSOR_HI}) AS p_hi
      FROM events GROUP BY event_type
    ),
    c AS (
      SELECT e.event_type, q.p_lo, q.p_hi, e.value,
             LEAST(GREATEST(e.value, q.p_lo), q.p_hi) AS wv
      FROM events e JOIN q USING (event_type)
    )
    SELECT event_type,
           COUNT(*)::BIGINT AS n_events,
           SUM(CASE WHEN value < p_lo THEN 1 ELSE 0 END)::BIGINT
             AS n_clamped_lo,
           SUM(CASE WHEN value > p_hi THEN 1 ELSE 0 END)::BIGINT
             AS n_clamped_hi,
           MIN(p_lo) AS p_lo, MIN(p_hi) AS p_hi,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS mean_raw,
           CAST(SUM(CAST(wv AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS mean_winsorized
    FROM c GROUP BY event_type
    """,
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per event type — the fat-tail-proof
    mean the raw average isn't: values clamped at the exact
    [P{int(WINSOR_LO * 100)}, P{int(WINSOR_HI * 100)}] percentiles, both
    means reported side by side with the clamp counts (how much tail the
    clamp actually touched — the report a telemetry SLO or a
    quality-score normalizer cites before trusting an average).
    Completes the robust-stats family: MAD flags outliers
    (events_outlier_mad), this measures WITH and WITHOUT them.

    Determinism: exact interpolated percentiles (F.percentile ↔
    quantile_cont, the events_outlier_mad-proven pairing); the clamp is
    least/greatest on already-identical doubles; both means go through
    DECIMAL(18,6) (dsum rule). Plan: one percentile agg broadcast back
    + one final agg — two shuffles at (event_type) grain, the MAD
    shape; at 100 TB swap approx_quantiles in for the two percentiles
    and keep the clamp/mean pass unchanged."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", WINSOR_LO).alias("p_lo"),
        F.percentile("value", WINSOR_HI).alias("p_hi"),
    )
    c = ev.join(F.broadcast(q), "event_type").withColumn(
        "wv",
        F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi")),
    )
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("value") < F.col("p_lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clamped_lo"),
        F.sum(F.when(F.col("value") > F.col("p_hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clamped_hi"),
        F.min("p_lo").alias("p_lo"),
        F.min("p_hi").alias("p_hi"),
        (dsum("value") / F.count(F.lit(1))).alias("mean_raw"),
        (dsum("wv") / F.count(F.lit(1))).alias("mean_winsorized"),
    )


RFM_BUCKETS = 4


def _rfm_rank_sql(metric: str, order: str, alias: str) -> str:
    """Quartile via explicit rank arithmetic ((rnk-1)·B DIV n)+1 — NOT
    SQL NTILE, whose remainder distribution differs; the formula is the
    one the engine's two-phase rank computes, identical in both engines
    on integers."""
    return f"""
      SELECT c, ((rnk - 1) * {RFM_BUCKETS}) // n + 1 AS {alias} FROM (
        SELECT c, ROW_NUMBER() OVER (ORDER BY {order}) AS rnk,
               COUNT(*) OVER () AS n
        FROM m
      ) {metric}
    """


@query(
    "orders_rfm_segmentation",
    oracle=f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS d0 FROM orders),
    m AS (
      SELECT o_custkey AS c,
             date_diff('day', MAX(o_orderdate), MIN(mx.d0))::BIGINT
               AS r_days,
             COUNT(*)::BIGINT AS f_orders,
             CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 100)
                  AS BIGINT) AS m_cents
      FROM orders, mx GROUP BY o_custkey
    ),
    r AS ({_rfm_rank_sql("rr", "r_days, c", "r_score")}),
    f AS ({_rfm_rank_sql("ff", "f_orders DESC, c", "f_score")}),
    mm AS ({_rfm_rank_sql("mo", "m_cents DESC, c", "m_score")})
    SELECT m.c AS custkey, m.r_days, m.f_orders, m.m_cents,
           r.r_score::BIGINT AS r_score, f.f_score::BIGINT AS f_score,
           mm.m_score::BIGINT AS m_score,
           (r.r_score * 100 + f.f_score * 10 + mm.m_score)::BIGINT AS rfm
    FROM m JOIN r ON r.c = m.c JOIN f ON f.c = m.c JOIN mm ON mm.c = m.c
    """,
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-analytics staple: per customer,
    Recency (days since last order, against the corpus max date),
    Frequency (order count), Monetary (exact integer cents), each
    scored into {RFM_BUCKETS} quartiles, composed as the familiar
    3-digit RFM code; bucket 1 = most recent / most frequent / highest
    spend, so 111 is the champion segment.

    Quartiles use explicit rank arithmetic ((rnk−1)·B DIV n)+1 rather
    than SQL NTILE (whose remainder-bucket placement is a different
    convention), and each global rank is the TWO-PHASE form
    (global_row_number — range exchange + broadcast prefix offsets, no
    single-partition window) over the per-customer AGGREGATE table,
    which is ≪ the orders fact. All integer: day diffs, counts, cents
    (DECIMAL sum ×100 rounded once), rank arithmetic.

    Scale: one groupBy(custkey) over orders (+ broadcast 1-row max
    date), then three small-table rank passes; output is one row per
    customer."""
    from kstreams_spark.operators._util import global_row_number

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("d0"))
    m = (
        o.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(
            F.datediff(F.min("d0"), F.max("o_orderdate"))
            .cast("long")
            .alias("r_days"),
            F.count(F.lit(1)).cast("long").alias("f_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")) * 100
            )
            .cast("long")
            .alias("m_cents"),
        )
        # r15 (guide §2.4/§5): `m` feeds FIVE plan branches — the three
        # two-phase rank passes, the count, and the final join — and
        # Catalyst has no cross-branch subplan reuse, so without a
        # lineage cut the orders scan + groupBy re-ran per branch
        # (~6 scans/query; half of composite_feature_snapshot's 41
        # jobs). Lazy localCheckpoint materializes it once; the
        # per-customer aggregate is ≪ orders and the fence() class of
        # local-only artifact (a real cluster uses a checkpoint dir).
        .localCheckpoint(eager=False)
    )
    # r15: the customer count as an eager scalar — the former 1-row
    # `n` broadcast was rebuilt once per rank pass (3 extra jobs); one
    # count() over the checkpointed aggregate also materializes the
    # checkpoint up front. Same integer in the same DIV expression.
    n_rows = m.count()

    def score(df, order, alias):
        ranked = global_row_number(df, order, "_rnk")
        return ranked.select(
            "c",
            (
                F.expr(f"((_rnk - 1) * {RFM_BUCKETS}) DIV {n_rows}") + 1
            )
            .cast("long")
            .alias(alias),
        )

    r = score(m, [F.col("r_days"), F.col("c")], "r_score")
    f = score(m, [F.col("f_orders").desc(), F.col("c")], "f_score")
    mo = score(m, [F.col("m_cents").desc(), F.col("c")], "m_score")
    return (
        m.join(r, "c")
        .join(f, "c")
        .join(mo, "c")
        .select(
            F.col("c").alias("custkey"),
            "r_days",
            "f_orders",
            "m_cents",
            "r_score",
            "f_score",
            "m_score",
            (
                F.col("r_score") * 100
                + F.col("f_score") * 10
                + F.col("m_score")
            )
            .cast("long")
            .alias("rfm"),
        )
    )


ABC_A_PCT = 80  # cumulative-revenue share boundaries (integer percent)
ABC_B_PCT = 95


@query(
    "lineitem_abc_classification",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey AS partkey,
             CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))) * 100) AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY l_partkey
    ),
    run AS (
      SELECT partkey, rev_cents,
             ROW_NUMBER() OVER (ORDER BY rev_cents DESC, partkey)
               AS rnk,
             SUM(rev_cents) OVER (ORDER BY rev_cents DESC, partkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum_cents,
             SUM(rev_cents) OVER () AS total_cents
      FROM rev
    )
    SELECT partkey, rev_cents, rnk::BIGINT AS rnk,
           cum_cents::BIGINT AS cum_cents,
           CASE WHEN cum_cents * 100 <= {ABC_A_PCT} * total_cents THEN 'A'
                WHEN cum_cents * 100 <= {ABC_B_PCT} * total_cents THEN 'B'
                ELSE 'C' END AS abc_class
    FROM run
    """,
)
def lineitem_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue — the inventory
    analytics staple: rank parts by exact-cents revenue, take the
    global running share, class A while cumulative ≤ {ABC_A_PCT}%, B to
    {ABC_B_PCT}%, C after (the 80/20 rule as a materialized label).

    Both global passes are TWO-PHASE (operators/_util): the rank via
    global_row_number, the running sum via global_prefix_sum — one
    range exchange feeds per-range windows plus broadcast prefix
    offsets, so there is NO single-partition window even though the
    semantics are a full-table ORDER BY. Inputs are per-part aggregates
    (≪ lineitem); the class boundaries are integer cross-products
    (cum·100 ≤ pct·total), no float share ever computed.

    The oracle keeps the classic single-window SQL form — the hash
    match proves the two-phase rewrite exact, the
    rewrite-proof pattern."""
    from kstreams_spark.operators._util import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            * 100
        )
        .cast("long")
        .alias("rev_cents")
        # r15: `rev` feeds the two-phase pass AND the total agg — cut
        # lineage so the 600k-row lineitem groupBy runs once, not twice
        # (the orders_rfm_segmentation argument).
    ).localCheckpoint(eager=False)
    order = [F.col("rev_cents").desc(), F.col("partkey")]
    run = global_prefix_sum(
        rev, order, "rev_cents", "cum_cents", rank_col="rnk"
    )
    total = rev.agg(F.sum("rev_cents").cast("long").alias("total_cents"))
    return run.crossJoin(F.broadcast(total)).select(
        "partkey",
        "rev_cents",
        "rnk",
        "cum_cents",
        F.when(
            F.col("cum_cents") * 100 <= ABC_A_PCT * F.col("total_cents"),
            "A",
        )
        .when(
            F.col("cum_cents") * 100 <= ABC_B_PCT * F.col("total_cents"),
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "events_session_features",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
      FROM events
    ),
    flagged AS (
      SELECT user_id, sec, event_type,
             CASE WHEN LAG(sec) OVER w IS NULL
                       OR sec - LAG(sec) OVER w >= {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY sec)
    ),
    sess AS (
      SELECT user_id, sec, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec)
               AS session_no
      FROM flagged
    )
    SELECT user_id, session_no::BIGINT AS session_no,
           MIN(sec) AS start_s,
           (MAX(sec) - MIN(sec))::BIGINT AS dur_s,
           COUNT(*) AS n_events,
           SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
             AS n_view,
           SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
             AS n_click,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
             AS n_purchase,
           SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
             AS n_error,
           SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT
             AS n_signup,
           CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                         END) > 0 THEN 1 ELSE 0 END::BIGINT AS converted
    FROM sess GROUP BY user_id, session_no
    """,
)
def events_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session ML feature table — the feature-engineering step
    between raw events and a conversion/churn model: every
    (user, session) becomes one row of start, duration, event count,
    per-type conditional counts (the pivoted one-hot totals), and the
    `converted` label. Uses EXACTLY events_sessionize's gap/tie
    semantics (same {SESSION_GAP_S} s rule, same RANGE-frame session
    id), so these features join 1:1 onto any sessionized artifact —
    funnels, the streaming session window's output, retention labels.
    Pair with join_scd2_pointintime to add leakage-free dimension
    features at session start time.

    All integer (conditional SUMs, second deltas). Shuffle budget:
    the sessionize argument verbatim — ONE user_id exchange serves the
    gap windows and the (user, session) aggregation; the type counts
    add zero shuffles (same grouping keys)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) >= SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("sec")
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    def n_of(t: str):
        return (
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{t}")
        )

    agg = sess.groupBy("user_id", "session_no").agg(
        F.min("sec").alias("start_s"),
        (F.max("sec") - F.min("sec")).cast("long").alias("dur_s"),
        F.count(F.lit(1)).alias("n_events"),
        n_of("view"),
        n_of("click"),
        n_of("purchase"),
        n_of("error"),
        n_of("signup"),
    )
    return agg.withColumn(
        "converted",
        F.when(F.col("n_purchase") > 0, 1).otherwise(0).cast("long"),
    )


@query(
    "events_value_deciles",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]) AS qs
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           generate_subscripts(qs, 1)::BIGINT AS decile,
           unnest(qs) AS value
    FROM q
    """,
)
def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile table per event type — the distribution summary a
    monitoring dashboard or a feature-binning step reads: the nine
    interior deciles as rows (event_type, decile 1–9, value), from ONE
    exact multi-percentile aggregate per group (F.percentile with an
    array argument computes all nine in a single pass over the sorted
    group — not nine windows). Exact interpolated percentiles are the
    engine-portable pair (quantile_cont, the MAD/winsorized-proven
    pairing); the explode is 0-based in Spark and 1-based in DuckDB's
    generate_subscripts, aligned by the +1 here (the ordinality
    gotcha). At 100 TB swap approx_quantiles in, same output grain."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.percentile(
            "value",
            F.array(*[F.lit(i / 10.0) for i in range(1, 10)]),
        ).alias("qs")
    )
    return q.select(
        "event_type",
        F.posexplode("qs").alias("pos", "value"),
    ).select(
        "event_type",
        (F.col("pos") + 1).cast("long").alias("decile"),
        "value",
    )


@query(
    "events_anomaly_days",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             COUNT(*)::BIGINT AS n_events
      FROM events GROUP BY 1
    ),
    med AS (SELECT quantile_cont(n_events, 0.5) AS med FROM daily),
    mad AS (SELECT quantile_cont(abs(n_events - med.med), 0.5) AS mad
            FROM daily, med)
    SELECT daily.day, daily.n_events,
           CASE WHEN abs(daily.n_events - med.med) > {MAD_K} * mad.mad
                THEN 1 ELSE 0 END::BIGINT AS anomalous
    FROM daily, med, mad
    """,
)
def events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOLUME anomaly detection — events_outlier_mad's time-series twin:
    instead of flagging individual readings by value, flag DAYS whose
    event count sits more than {MAD_K}×MAD from the median daily count
    (the traffic-drop/spike pager alert; robust statistics so an outage
    day can't drag its own threshold). The day grain makes the stats
    input tiny (≤ timeline days), so both percentile passes run over a
    bounded table and the daily census is the only corpus-touching agg.
    At 100 TB the census is one partial+final count per (day) — the
    cheapest aggregate there is; everything downstream is broadcast
    1-row scalars."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    med = daily.agg(F.percentile("n_events", 0.5).alias("med"))
    with_med = daily.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.percentile(F.abs(F.col("n_events") - F.col("med")), 0.5).alias(
            "mad"
        )
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .select(
            "day",
            "n_events",
            F.when(
                F.abs(F.col("n_events") - F.col("med"))
                > MAD_K * F.col("mad"),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("anomalous"),
        )
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY 1
    )
    SELECT v.user_id % 4 AS cohort,
           COUNT(*) AS n_viewed,
           COUNT(c.user_id) AS n_clicked,
           COUNT(p.user_id) AS n_purchased
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    GROUP BY 1
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED FUNNEL analysis (r14): per user, the strict
    view → click → purchase sequence — each stage's timestamp must be
    the FIRST event of that type strictly after the PRIOR stage's
    timestamp (a purchase before any click, or a click before any
    view, does not convert; counting unordered event presence is the
    classic funnel bug this oracle catches). Per-cohort (user_id % 4)
    stage counts.

    Shape note: each stage is one filtered MIN aggregation joined back
    to the prior stage's frontier — stage k's input is only the
    surviving users, so work SHRINKS down the funnel (versus a
    per-user sort + sequential scan, which shuffles every event's full
    row). Three aggs + three key joins, all on user_id: one consistent
    hash partitioning reused across every stage (AQE coalesces the
    tiny tails)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p.select("user_id", "t_purchase"), "user_id", "left")
        .groupBy((F.col("user_id") % 4).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_viewed"),
            F.count("t_click").alias("n_clicked"),
            F.count("t_purchase").alias("n_purchased"),
        )
    )
