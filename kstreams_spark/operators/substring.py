"""Exact repeated-substring dedup — the suffix-array dedup stage of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), re-expressed Spark-first.

The paper builds a corpus-wide suffix array and removes every substring
of >= 50 tokens that appears more than once. A suffix array is a global
sequential structure with no good distributed form; the Spark-native
equivalent is POSITIONAL n-gram shingles: a span of >= n tokens repeats
somewhere in the corpus iff every one of its length-n windows repeats,
so duplicated n-token windows are exactly the cover of all duplicated
maximal spans. We therefore:

  1. emit (doc_id, pos, md5(n-gram)) for every token position — a
     scan-shaped explode, WholeStageCodegen, ∝ corpus tokens;
  2. find duplicated windows with groupBy(sh) (partial map-side count —
     the shuffle carries one 16-byte key + count per DISTINCT shingle,
     not per occurrence) and elect the global winner occurrence per
     shingle with min(struct(doc_id, pos)) in the same agg;
  3. join the (small) duplicated-shingle stats back to the positional
     stream on sh — AQE broadcasts it when it fits;
  4. per doc, merge overlapping duplicated windows into covered spans
     with one lead() window over pos (sum of min(n, next-start gap)).

Reference parity note: the reference app (BME680.java) has no analytics
surface; this module is part of the LLM-training-data extension the
brief mandates (SURVEY.md §2.3 north-star ops).

Scale posture (100 TB): the only per-occurrence shuffles key on sh
(step 3) and doc_id (step 4) — both equi-joins/aggs, no cross product
anywhere. Both duplicate statistics (count, min) are algebraic, so an
ultra-hot boilerplate shingle can be two-phase salted without changing
results; `occ` is also a natural flood-valve column (drop shingles with
occ > corpus-anomaly threshold from the rewrite, exactly like
`dedup.py`'s max_bucket). Window n is a parameter: the paper's 50-token
threshold at 100 TB, 8 here so the ~55-token fixture docs exercise it.

Determinism: shingle identity is md5 hex on both engines; winner
election is the lexicographic min of (doc_id, pos) — total order, no
ties possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.registry import query

SPAN_N = 8  # window width; the paper uses 50 tokens at web scale
FLAG_DEN = 5  # flag a doc when covered_tokens * FLAG_DEN >= n_tokens (20%)


def positional_shingles(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """(doc_id, text) → (doc_id, pos, sh): md5 of the n-token window
    starting at 0-based token position pos. NOT distinct — positions are
    the payload here, unlike `dedup._shingles`."""
    toks = F.split(F.col("text"), " ")
    with_toks = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= n
    )
    hashed = F.expr(
        f"transform(sequence(0, size(toks) - {n}), "
        f"i -> md5(concat_ws(' ', slice(toks, i + 1, {n}))))"
    )
    return with_toks.select(
        "doc_id", F.posexplode(hashed).alias("pos", "sh")
    )


def duplicated_starts(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """(doc_id, pos, is_winner): every token position starting a window
    that occurs >= 2 times corpus-wide; is_winner=1 on the single
    lexicographically-first (doc_id, pos) occurrence of each window.

    r15 (guide §2.4 — two operations keyed the same way share one
    exchange): occ and the winner election run as WINDOW functions over
    `sh` instead of a groupBy(sh) + join-back — the join form evaluated
    the positional-md5 stream TWICE (once per branch; the shingle md5 is
    the expensive per-row compute) and paid a second sh shuffle. One ps
    evaluation, one Exchange, no join; identical rows (the oracle's own
    COUNT/ROW_NUMBER-OVER shape; interleaved A/B 0.7–0.8× warm).
    Skew note: `sh` partitions are shingle-grain (the module docstring's
    flood-valve argument bounds a hot shingle's group)."""
    ps = positional_shingles(docs, n)
    w = Window.partitionBy("sh")
    return (
        ps.select(
            "doc_id",
            "pos",
            F.count(F.lit(1)).over(w).alias("occ"),
            F.min(F.struct("doc_id", "pos")).over(w).alias("w"),
        )
        .filter(F.col("occ") >= 2)
        .select(
            "doc_id",
            "pos",
            (F.struct("doc_id", "pos") == F.col("w"))
            .cast("int")
            .alias("is_winner"),
        )
    )


# Shared DuckDB CTE chain: toks → positional shingles → duplicated starts
# with winner rank (ROW_NUMBER twin of the Spark min-struct election).
def _dup_starts_sql(n: int) -> str:
    nm1 = n - 1
    return f"""
    toks AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
    ps AS (
      SELECT doc_id, i::BIGINT - 1 AS pos,
             md5(array_to_string(l[i:i+{nm1}], ' ')) AS sh
      FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - {nm1})) AS i
            FROM toks WHERE len(l) >= {n})
    ),
    marked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY sh) AS occ,
             ROW_NUMBER() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rk
      FROM ps
    ),
    dup_starts AS (
      SELECT doc_id, pos, CASE WHEN rk = 1 THEN 1 ELSE 0 END AS is_winner
      FROM marked WHERE occ >= 2
    )
"""


def coverage_stats(
    dup: DataFrame, base: DataFrame, n: int = SPAN_N
) -> DataFrame:
    """dup = (doc_id, pos) duplicated starts; base = (doc_id, n_tokens)
    → (doc_id, n_tokens, n_dup_starts, covered_tokens, is_flagged).
    Overlapping windows merge via the sorted-starts identity
    covered = Σ min(n, next_start - start) — one lead() window per doc;
    every base doc gets a row (zeros when clean); is_flagged is the
    all-integer cross-multiplication covered·FLAG_DEN >= n_tokens.
    Shared by the batch query below and the streaming ingest-time index
    (streaming/substring.py)."""
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    cov = dup.select(
        "doc_id",
        "pos",
        F.least(
            F.lit(n),
            F.coalesce(F.lead("pos").over(w_doc) - F.col("pos"), F.lit(n)),
        ).alias("covered"),
    )
    per_doc = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_starts"),
        F.sum("covered").alias("covered_tokens"),
    )
    j = base.join(per_doc, "doc_id", "left")
    covered = F.coalesce(F.col("covered_tokens"), F.lit(0))
    return j.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_dup_starts"), F.lit(0))
        .cast("long")
        .alias("n_dup_starts"),
        covered.cast("long").alias("covered_tokens"),
        F.when(covered * FLAG_DEN >= F.col("n_tokens"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_flagged"),
    )


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH {_dup_starts_sql(SPAN_N)},
    cov AS (
      SELECT doc_id, pos,
             LEAST({SPAN_N},
                   COALESCE(LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                            - pos, {SPAN_N})) AS covered
      FROM dup_starts
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*)::BIGINT AS n_dup_starts,
             SUM(covered)::BIGINT AS covered_tokens
      FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.l)::BIGINT AS n_tokens,
           COALESCE(p.n_dup_starts, 0)::BIGINT AS n_dup_starts,
           COALESCE(p.covered_tokens, 0)::BIGINT AS covered_tokens,
           (CASE WHEN COALESCE(p.covered_tokens, 0) * {FLAG_DEN} >= len(t.l)
                 THEN 1 ELSE 0 END)::BIGINT AS is_flagged
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repeated-span coverage: how many token positions sit
    inside an 8-token window that appears >= 2 times anywhere in the
    corpus (within-doc repeats count — they are the paper's target too).
    See coverage_stats for the merge identity and output contract.

    Shuffle budget: groupBy(sh) with map-side partial agg + join back on
    sh + one per-doc window/agg. See module docstring for the 100 TB
    skew story."""
    d = spread(load_table(spark, sf_dir, "documents"))
    dup = duplicated_starts(d, SPAN_N).select("doc_id", "pos")
    base = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return coverage_stats(dup, base, SPAN_N)


@query(
    "dedup_substring_rewrite",
    oracle=f"""
    WITH {_dup_starts_sql(SPAN_N)},
    cover AS (
      SELECT doc_id, t, MAX(is_winner) AS protected
      FROM (SELECT doc_id,
                   unnest(generate_series(pos, pos + {SPAN_N - 1})) AS t,
                   is_winner
            FROM dup_starts)
      GROUP BY doc_id, t
    ),
    tokens AS (
      SELECT doc_id, i::BIGINT - 1 AS t, l[i] AS token
      FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
            FROM toks)
    ),
    kept AS (
      SELECT tk.doc_id, tk.t, tk.token
      FROM tokens tk LEFT JOIN cover c ON tk.doc_id = c.doc_id AND tk.t = c.t
      WHERE c.doc_id IS NULL OR c.protected = 1
    )
    SELECT doc_id,
           string_agg(token, ' ' ORDER BY t) AS clean_text,
           COUNT(*)::BIGINT AS n_kept_tokens
    FROM kept GROUP BY doc_id
    """,
)
def dedup_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paper's actual transform: REMOVE duplicated spans, keeping
    exactly one canonical occurrence corpus-wide. A token survives iff it
    is outside every duplicated window, or covered by a window whose
    global winner occurrence (min (doc_id, pos)) lives at that position's
    doc. Exact-duplicate docs lose every token (their windows' winners
    all live in the earlier copy) and drop out of the result entirely —
    on both engines, which is the point.

    Shuffle budget: the duplicated-starts machinery (see above) + token-
    grain explode (scan-shaped, ∝ corpus tokens) + groupBy(doc_id, t) +
    join on (doc_id, t) (co-partitioned with the groupBy, AQE reuses the
    exchange) + final per-doc reassembly agg. Reassembly is
    sort_array(collect_list(struct(t, token))) — per-doc state only,
    bounded by the longest document, the same bound `paragraphs.py`
    carries."""
    d = spread(load_table(spark, sf_dir, "documents"))
    dup = duplicated_starts(d, SPAN_N)
    cover = (
        dup.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SPAN_N - 1))
            ).alias("t"),
            "is_winner",
        )
        .groupBy("doc_id", "t")
        .agg(F.max("is_winner").alias("protected"))
    )
    tokens = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("t", "token"),
    )
    kept = tokens.join(cover, ["doc_id", "t"], "left").filter(
        F.col("protected").isNull() | (F.col("protected") == 1)
    )
    return kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(t, token))),"
            " x -> x.token), ' ')"
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept_tokens"),
    )


@query(
    "dedup_source_overlap",
    oracle=f"""
    WITH l AS (SELECT source, str_split(text, ' ') AS l FROM documents),
    ps AS (
      SELECT DISTINCT source,
             md5(array_to_string(l[i:i+{SPAN_N - 1}], ' ')) AS sh
      FROM (SELECT source, l,
                   unnest(generate_series(1, len(l) - {SPAN_N - 1})) AS i
            FROM l WHERE len(l) >= {SPAN_N})
    ),
    sizes AS (SELECT source, COUNT(*)::BIGINT AS n_sh FROM ps GROUP BY source)
    SELECT a.source AS source1, b.source AS source2,
           COUNT(*)::BIGINT AS n_shared,
           MIN(s1.n_sh) AS n_sh1, MIN(s2.n_sh) AS n_sh2
    FROM ps a
    JOIN ps b ON a.sh = b.sh AND a.source < b.source
    JOIN sizes s1 ON s1.source = a.source
    JOIN sizes s2 ON s2.source = b.source
    GROUP BY a.source, b.source
    """,
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication audit — the provenance report a corpus
    build runs before mixing sources (how much of source B is already in
    source A, e.g. a web crawl re-serving an encyclopedia): for every
    source pair, the number of DISTINCT {SPAN_N}-token windows both
    contain, with each side's distinct-window total so downstream can
    compute containment ratios. Exact-doc dedup misses this entirely
    when overlap is partial (the fixture has zero cross-source exact
    dups but 22 overlapping source pairs at window grain).

    Plan: per-source distinct shingles (reuses `dedup._shingles` with
    source standing in the doc_id slot) → self equi-join on the 16-byte
    window hash → per-pair count. Shuffle budget: the per-source
    distinct (1) + the hash join (1) + pair agg; per-hash source lists
    are bounded by the source count (dozens), so the join never
    explodes. At 100 TB sources are a low-cardinality column — the
    output is a #sources² report, driver-tiny."""
    from kstreams_spark.operators.dedup import _shingles

    d = spread(load_table(spark, sf_dir, "documents"))
    ps = _shingles(
        d.select(F.col("source").alias("doc_id"), "text"), SPAN_N
    ).select(F.col("doc_id").alias("source"), F.md5("shingle").alias("sh"))
    sizes = ps.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sh")
    )
    a = ps.alias("a")
    b = ps.alias("b")
    pairs = a.join(
        b,
        (F.col("a.sh") == F.col("b.sh"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source1"), F.col("b.source").alias("source2")
    )
    return (
        pairs.groupBy("source1", "source2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "source1")
                        .withColumnRenamed("n_sh", "n_sh1")),
            "source1",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "source2")
                        .withColumnRenamed("n_sh", "n_sh2")),
            "source2",
        )
        .select("source1", "source2", "n_shared", "n_sh1", "n_sh2")
    )


NOVEL_NUM, NOVEL_DEN = 4, 5  # flag novel when n_unique*5 >= n_windows*4


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(l[i:i+{SPAN_N - 1}], ' ')) AS sh
      FROM (SELECT doc_id, l,
                   unnest(generate_series(1, len(l) - {SPAN_N - 1})) AS i
            FROM toks WHERE len(l) >= {SPAN_N})
    ),
    cnt AS (SELECT sh, COUNT(*) AS nd FROM sh GROUP BY sh)
    SELECT s.doc_id,
           COUNT(*) AS n_windows,
           SUM(CASE WHEN c.nd = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
           (CASE WHEN SUM(CASE WHEN c.nd = 1 THEN 1 ELSE 0 END) * {NOVEL_DEN}
                      >= COUNT(*) * {NOVEL_NUM}
                 THEN 1 ELSE 0 END)::BIGINT AS is_novel
    FROM sh s JOIN cnt c USING (sh)
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the inverse signal of the
    repeated-span dedup machinery above: the fraction of a doc's
    DISTINCT {SPAN_N}-token windows that appear in NO other document.
    Low novelty means the doc is assembled from corpus-shared text
    (boilerplate, near-dups the cluster pass hasn't caught, templated
    spam); a curation pass can gate on it the way Gopher gates on
    repetition. Flag rule is the usual integer cross-multiplication
    (novel iff n_unique/{NOVEL_DEN} ≥ {NOVEL_NUM}·n_windows — no
    floats).

    Scale shape identical to dedup_substring_spans: the shuffle carries
    16-byte window hashes (never text), one groupBy(sh) counts document
    frequency, one hash-join attributes it back, one groupBy(doc_id)
    reduces — all partial-aggregated."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # (A/B'd r15: fencing the distinct window set measured SLOWER —
    # checkpoint write cost isn't paid back. The document-frequency
    # count runs as a WINDOW over sh instead of groupBy(sh)+join-back
    # (the duplicated_starts r15 argument): one evaluation of the
    # distinct set, one sh exchange, no join; identical rows —
    # interleaved A/B won every rep.)
    sh = positional_shingles(d).select("doc_id", "sh").distinct()
    per = sh.select(
        "doc_id",
        F.count(F.lit(1)).over(Window.partitionBy("sh")).alias("nd"),
    )
    uniq = F.sum(F.when(F.col("nd") == 1, 1).otherwise(0)).cast("long")
    return per.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        uniq.alias("n_unique"),
        (uniq * NOVEL_DEN >= F.count(F.lit(1)) * NOVEL_NUM)
        .cast("long")
        .alias("is_novel"),
    )
