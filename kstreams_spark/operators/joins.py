"""Join operators (SURVEY.md §2.3 "joins" row): every SQL join flavor plus
the two non-native ones (range/theta, as-of).

Scale posture per query is noted inline; the general rules:
- dimension tables (region/nation/customer at TPC-H shape) are broadcast —
  Catalyst picks this automatically under the configured threshold, so the
  big fact side never shuffles for the join;
- fact-fact equi-joins shuffle on the join key; AQE handles skew;
- the as-of join is the union+sort+last_value formulation — ONE shuffle of
  both inputs, no row explosion, instead of a per-key join + window over
  candidate pairs (which blows up at 100 TB);
- the range/theta join keeps the small side literal + broadcast, so the
  nested-loop is a map-side operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import dsum
from kstreams_spark.registry import query


@query(
    "join_orders_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_orders_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way inner join, dims broadcast: orders ⋈ customer ⋈ nation.

    customer and nation are broadcast (dimension tables); the orders fact
    never shuffles for the join — only the final tiny groupBy shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "join_left_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE)
             AS spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
    )


@query(
    "join_right_suppliers_per_nation",
    oracle="""
    SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_right_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every nation kept, zero-supplier nations count 0."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full_customer_supplier_nations",
    oracle="""
    WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt FROM customer GROUP BY 1),
         sc AS (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY 1)
    SELECT COALESCE(cc.nk, sc.nk) AS nationkey, cc.c_cnt, sc.s_cnt
    FROM cc FULL OUTER JOIN sc ON cc.nk = sc.nk
    """,
)
def join_full_customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates; NULL counts where a side is absent."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cc = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("c_cnt"))
    sc = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("s_cnt"))
    return cc.join(sc, "nk", "full").select(
        F.coalesce(cc.nk, sc.nk).alias("nationkey"), "c_cnt", "s_cnt"
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS — no duplication of the left side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_customers_without_events",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
)
def join_anti_customers_without_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS — customers with no event activity
    (events.user_id keys into the low end of c_custkey, so this is
    non-empty at every sf)."""
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    return c.join(ev, c.c_custkey == ev.user_id, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (tiny × tiny only — a cross join of fact tables is a bug,
    not a plan)."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("r1"), F.col("r_regionkey").alias("k1"))
    b = r.select(F.col("r_name").alias("r2"), F.col("r_regionkey").alias("k2"))
    return a.crossJoin(b).filter(F.col("k1") != F.col("k2")).select("r1", "r2")


@query(
    "join_range_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 1000.0), ('mid', 1000.0, 5000.0),
             ('high', 5000.0, 100000000.0)
    )
    SELECT b.band, COUNT(*) AS n_orders
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a literal band table — broadcast nested loop,
    map-side only; the fact side never shuffles for the join."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 1000.0), ("mid", 1000.0, 5000.0), ("high", 5000.0, 1e8)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "join_asof_latest_order",
    oracle="""
    WITH tagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id
      FROM events WHERE event_type IN ('error', 'click')
    ), filled AS (
      SELECT *,
             last_value(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_err, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS asof_click_id
      FROM tagged
    )
    SELECT event_id, user_id, asof_click_id
    FROM filled WHERE is_err = 1
    """,
)
def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each 'error' event, the latest 'click' by the same
    user at-or-before its timestamp.

    Implemented as the distributed as-of pattern: union both sides, ONE
    shuffle+sort per user key, then last(ignorenulls) over an unbounded
    preceding frame. Unlike pair-join formulations this never materializes
    candidate pairs, so it survives 100 TB (cost = sort of |L|+|R|). The
    name says "order" after the reference's aspiration (enrich stream
    against latest state, SURVEY.md §2.2 stream⋈KTable); clicks play the
    KTable side here because the fixture's orders all predate event time.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("error", "click")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_err", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "asof_click_id", F.last("click_id", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("is_err") == 1).select(
        "event_id", "user_id", "asof_click_id"
    )


TIME_BAND_S = 300  # pair events within ±5 minutes


@query(
    "join_events_time_band",
    oracle=f"""
    SELECT a.event_type AS type1, b.event_type AS type2,
           COUNT(*)::BIGINT AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch(b.ts) - epoch(a.ts)) <= {TIME_BAND_S}
    GROUP BY a.event_type, b.event_type
    """,
)
def join_events_time_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded temporal self-join — 'pairs of events by the same user
    within ±{TIME_BAND_S} s' (co-occurrence mining, burst detection),
    the join shape a naive theta formulation turns into a per-user
    cross product. The scalable plan BUCKETS time at the band width and
    EXPLODES one side into its 3 adjacent buckets, so the pair space
    becomes a (user, bucket) EQUI-join; the exact |Δ| ≤ band predicate
    filters the bucket-adjacent candidates after the join. Each
    unordered pair surfaces exactly once (the left side explodes, the
    right side keeps its true bucket, id1 < id2 orients). The oracle is
    the naive theta join — hash-matching it proves the bucketed rewrite
    exact, the same proof shape the salted-skew queries use.

    At 100 TB: candidates per event = its user's events in 3 buckets —
    bounded by activity rate × band, never the user's whole history;
    the equi-join shuffles on (user_id, bucket), AQE handles hot users.

    Shuffle budget: the (user, bucket) equi-join (1) + final 2-key agg
    (1); the 3× explode is scan-shaped."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
    )
    bucket = F.floor(F.col("sec") / TIME_BAND_S).cast("long")
    left = ev.select(
        "user_id",
        F.col("event_id").alias("id1"),
        F.col("event_type").alias("type1"),
        F.col("sec").alias("sec1"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bucket"),
    )
    right = ev.select(
        "user_id",
        F.col("event_id").alias("id2"),
        F.col("event_type").alias("type2"),
        F.col("sec").alias("sec2"),
        bucket.alias("bucket"),
    )
    pairs = left.join(right, ["user_id", "bucket"]).filter(
        (F.col("id1") < F.col("id2"))
        & (F.abs(F.col("sec2") - F.col("sec1")) <= TIME_BAND_S)
    )
    return pairs.groupBy("type1", "type2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


ASOF_TOLERANCE_S = 124_000  # ~median same-user error->click gap at sf0.01,
# so the staleness gate accepts AND rejects in comparable volume at the
# driver's sf (a 10-minute production tolerance leaves the fixture's
# sparse per-user stream almost entirely unmatched)


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP)
             END AS click_ts
      FROM events WHERE event_type IN ('error', 'click')
    ), filled AS (
      SELECT *,
             last_value(click_id IGNORE NULLS) OVER w AS m_id,
             last_value(click_ts IGNORE NULLS) OVER w AS m_ts
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_err, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CASE WHEN m_id IS NOT NULL
                 AND date_diff('second', m_ts, ts) <= {ASOF_TOLERANCE_S}
                THEN m_id END AS asof_click_id,
           CASE WHEN m_id IS NOT NULL
                 AND date_diff('second', m_ts, ts) <= {ASOF_TOLERANCE_S}
                THEN date_diff('second', m_ts, ts) END AS lag_s
    FROM filled WHERE is_err = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (the pandas merge_asof / Flink interval
    semantics the plain as-of lacks): each error matches the latest
    same-user click at-or-before it ONLY if that click is within
    {ASOF_TOLERANCE_S} s — a stale match is as wrong as none. Same
    single-shuffle union + last(ignorenulls) fill as
    join_asof_latest_order (the matched click's id AND timestamp fill
    from the same last non-null row, so they stay consistent), plus a
    scan-side staleness predicate; still never materializes candidate
    pairs. lag_s reports match staleness (both engines: whole-second
    boundary diff)."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("error", "click")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "click_id"
        ),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_err", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "m_id", F.last("click_id", ignorenulls=True).over(w)
    ).withColumn("m_ts", F.last("click_ts", ignorenulls=True).over(w))
    lag = F.col("ts").cast("long") - F.col("m_ts").cast("long")
    ok = F.col("m_id").isNotNull() & (lag <= ASOF_TOLERANCE_S)
    return filled.filter(F.col("is_err") == 1).select(
        "event_id",
        "user_id",
        F.when(ok, F.col("m_id")).alias("asof_click_id"),
        F.when(ok, lag).alias("lag_s"),
    )


BASKET_CAP = 50  # drop pathological baskets: pair space is O(k²) per order
BASKET_TOP_K = 50


@query(
    "orders_market_basket",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    sized AS (
      SELECT l_orderkey FROM items GROUP BY l_orderkey
      HAVING COUNT(*) BETWEEN 2 AND {BASKET_CAP}
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN sized s ON s.l_orderkey = a.l_orderkey
      JOIN items b ON b.l_orderkey = a.l_orderkey
                  AND b.l_partkey > a.l_partkey
    ),
    sup AS (
      SELECT part_a, part_b, COUNT(*) AS support
      FROM pairs GROUP BY part_a, part_b
    )
    SELECT part_a, part_b, support, rk FROM (
      SELECT part_a, part_b, support,
             ROW_NUMBER() OVER (ORDER BY support DESC, part_a, part_b) AS rk
      FROM sup
    ) WHERE rk <= {BASKET_TOP_K}
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the Apriori support-counting core):
    top-{BASKET_TOP_K} part pairs bought together in one order. The
    pair space is O(k²) per basket, so baskets over {BASKET_CAP}
    distinct items are dropped FIRST (sized CTE) — the standard
    frequent-itemset guard; without it one pathological 10⁵-item basket
    materializes 10¹⁰ pairs from a single join key (same flood-valve
    reasoning as dedup's max_bucket). Reference: the self-join on
    l_orderkey is an equi-join both sides co-partition on; the global
    top-k is TakeOrdered over the (small) distinct-pair support table.
    """
    from kstreams_spark.operators._util import fence

    # items feeds the size filter and BOTH pair sides — fence so the
    # distinct computes once (plan audit: 3 scans unfenced)
    items = fence(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sized = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter((F.col("k") >= 2) & (F.col("k") <= BASKET_CAP))
        .select("l_orderkey")
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(sized, "l_orderkey")
        .join(b, "l_orderkey")
        .filter(F.col("part_b") > F.col("part_a"))
    )
    sup = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).alias("support")
    )
    w = Window.orderBy(
        F.col("support").desc(), F.col("part_a"), F.col("part_b")
    )
    return (
        sup.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BASKET_TOP_K)
    )


FUZZY_MOD = 3  # every 3rd customer contributes a corrupted probe name


@query(
    "join_fuzzy_match_names",
    oracle=f"""
    WITH probes AS (
      SELECT c_custkey AS probe_key,
             substr(c_name, 1, (c_custkey % (length(c_name) - 1)) + 1 - 1)
               || substr(c_name, (c_custkey % (length(c_name) - 1)) + 1 + 1)
               AS probe_name
      FROM customer WHERE c_custkey % {FUZZY_MOD} = 0
    )
    SELECT p.probe_key, c.c_custkey AS base_key,
           p.probe_name, c.c_name AS base_name,
           levenshtein(p.probe_name, c.c_name)::BIGINT AS dist
    FROM probes p, customer c
    WHERE levenshtein(p.probe_name, c.c_name) <= 1
    """,
)
def join_fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (record linkage): match 1-char-corrupted
    probe names back to the customer table at edit distance ≤ 1 — via
    DELETION-NEIGHBORHOOD BLOCKING (the SymSpell/FastSS trick): two
    strings within Levenshtein 1 (insert/delete/substitute) always share
    a member of their 1-deletion neighborhoods (string itself included),
    so hashing every name's len+1 deletion variants and equi-joining on
    the variant hash proposes ALL qualifying pairs; the built-in
    levenshtein (both engines ship it) verifies. Probes are synthesized
    deterministically (every {FUZZY_MOD}rd customer, drop the
    (custkey mod len-1)+1-th char).

    THE ORACLE IS THE NAIVE THETA JOIN (probes × customers, levenshtein
    ≤ 1) — the hash match proves the blocked rewrite finds exactly the
    naive pairs (recall 1 at d ≤ 1), the same proof shape as the banded
    temporal join and the salted-skew queries. Scale: the blocking join
    shuffles (len+1)·N 16-byte variant hashes instead of computing N·M
    edit distances — the difference between a hash join and a cartesian
    at 100 TB. The blocking/verify core is `fuzzy_match_pairs` (recall
    and the d>1 limit pinned on a planted corpus in
    tests/test_fuzzy_recall.py)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    probes = cust.filter(F.col("c_custkey") % FUZZY_MOD == 0).select(
        F.col("c_custkey").alias("probe_key"),
        F.concat(
            F.expr("substr(c_name, 1, (c_custkey % (length(c_name) - 1)) + 1 - 1)"),
            F.expr("substr(c_name, (c_custkey % (length(c_name) - 1)) + 1 + 1)"),
        ).alias("probe_name"),
    )
    return fuzzy_match_pairs(probes, cust)


def fuzzy_match_pairs(probes: DataFrame, base: DataFrame) -> DataFrame:
    """Deletion-neighborhood blocked fuzzy match at edit distance ≤ 1:
    probes(probe_key, probe_name) × base(c_custkey, c_name) →
    (probe_key, base_key, probe_name, base_name, dist).

    Recall contract (pinned in tests/test_fuzzy_recall.py): EXACTLY the
    Levenshtein-≤1 pairs — every single insert/delete/substitute (and
    exact match) is proposed, because two strings within distance 1
    always share a 1-deletion variant. Pairs at distance ≥ 2 are OUT OF
    SCOPE by design: the verify filter is ≤ 1, and the 1-deletion
    neighborhood can't guarantee proposals past d=1 anyway (d≤2 would
    need the O(len²) 2-deletion neighborhood — the standard SymSpell
    depth/cost trade).

    Verifier-input valve: candidates must also pass the length-bucket
    prefilter |len(probe) − len(base)| ≤ 1. The variant equi-join
    already implies it for REAL variants, but making it explicit costs
    one integer compare and caps the verify set under adversarial
    collisions (md5-equal variants of very different strings), so the
    levenshtein stage's input is bounded by construction, not by hash
    luck."""

    def variants(src: DataFrame, name_col: str, key_cols: list[str]) -> DataFrame:
        return src.select(
            *key_cols,
            F.col(name_col),
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(0, length({name_col})), "
                    f"i -> md5(concat(substr({name_col}, 1, i), "
                    f"substr({name_col}, i + 2)))))"
                )
            ).alias("vh"),
        )

    pv = variants(probes, "probe_name", ["probe_key"])
    cv = variants(base, "c_name", ["c_custkey"])
    cand = (
        pv.join(cv, "vh")
        .filter(
            F.abs(F.length("probe_name") - F.length("c_name")) <= 1
        )
        .select("probe_key", "probe_name", "c_custkey", "c_name")
        .distinct()
    )
    return cand.filter(
        F.levenshtein("probe_name", "c_name") <= 1
    ).select(
        "probe_key",
        F.col("c_custkey").alias("base_key"),
        "probe_name",
        F.col("c_name").alias("base_name"),
        F.levenshtein("probe_name", "c_name").cast("long").alias("dist"),
    )


FANOUT_TOP_K = 20


@query(
    "join_fanout_profile",
    oracle=f"""
    WITH a AS (
      SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY user_id
    ),
    b AS (
      SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
      GROUP BY o_custkey
    ),
    f AS (
      SELECT a.k, a.n_events, b.n_orders,
             a.n_events * b.n_orders AS fanout
      FROM a JOIN b USING (k)
    ),
    t AS (SELECT SUM(fanout) AS total FROM f)
    SELECT k, n_events, n_orders, fanout::BIGINT AS fanout,
           CAST((fanout * 1000000) // t.total AS BIGINT) AS fanout_ppm
    FROM f, t
    ORDER BY fanout DESC, k
    LIMIT {FANOUT_TOP_K}
    """,
)
def join_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join fan-out pre-flight — the measure-don't-guess step BEFORE a
    many-to-many join: per shared key, |left|·|right| is exactly the
    rows that key will emit, so the top offenders (with their
    parts-per-million share of the total output) tell you whether the
    join needs salting, a key-skew AQE hint, or a rethink — from two
    COUNT aggregations, never by running the join. Worked pair:
    events.user_id × orders.o_custkey (the activity-vs-orders
    enrichment join).

    Scale: the profile's inputs are the per-key COUNT tables (≪ the
    fact tables); their equi-join output is |shared keys| rows and the
    top-k is TakeOrderedAndProject. All integer; the share uses integer
    DIV in ppm so no float division enters the hash. The companion
    salted executions live in skew_salted_agg / skew_salted_broadcast_join
    — this is the diagnostic that says when to reach for them."""
    a = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    f = a.join(b, "k").withColumn(
        "fanout", (F.col("n_events") * F.col("n_orders")).cast("long")
    )
    t = f.agg(F.sum("fanout").alias("total"))
    return (
        f.crossJoin(F.broadcast(t))
        .withColumn(
            "fanout_ppm",
            F.expr("(fanout * 1000000) DIV total").cast("long"),
        )
        .select("k", "n_events", "n_orders", "fanout", "fanout_ppm")
        .orderBy(F.col("fanout").desc(), "k")
        .limit(FANOUT_TOP_K)
    )


# --- salted hot-key join (r9) -----------------------------------------------

SALT_R = 8  # salt fan-out: each dim row replicates R ways


@query(
    "join_salted_hotkey_revenue",
    oracle="""
    SELECT p.p_brand,
           COUNT(*)::BIGINT AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
)
def join_salted_hotkey_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join, as a query (SCALE.md's 'skewed keys → salting'
    advice made executable): per-brand revenue through a fact⋈dim join
    whose key is deliberately SALTED — the fact side appends a
    deterministic salt ∈ [0, {R}) (hash of the row's unique key), the
    dim side replicates each row {R}× with every salt value, and the
    join runs on (key, salt). A hot key's rows now land in {R}
    partitions instead of one: the straggler task becomes {R} even
    tasks, at the cost of an {R}× dim explode (dims are small — that's
    the trade). THE ORACLE IS THE PLAIN UNSALTED JOIN — the hash match
    proves salting is answer-invariant, which is the entire point of
    the technique. The merge hint forces the SortMergeJoin this pattern
    exists for (a broadcast join never has the problem — salting is for
    the shuffle-join regime where the dim outgrew the broadcast
    threshold); plan-pinned: SMJ on BOTH keys, salt included.

    At 100 TB: prefer AQE's skew-join split (automatic, no explode)
    when one side is merely skewed; reach for explicit salting when the
    aggregation itself keys on the hot column (AQE cannot split a
    hash-aggregate's key) or on engines without AQE."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        "l_discount",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_R))
        .cast("int")
        .alias("salt"),
    )
    p = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_brand")
        .crossJoin(
            F.broadcast(
                load_table(spark, sf_dir, "part")
                .sparkSession.range(SALT_R)
                .select(F.col("id").cast("int").alias("salt"))
            )
        )
    )
    j = li.join(
        p.hint("merge"),
        (li.l_partkey == p.p_partkey) & (li.salt == p.salt),
    )
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )
