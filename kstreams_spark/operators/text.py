"""Text-analysis operators for training-data pipelines (north-star):
token statistics, quality scoring, language-ID heuristic, document
fingerprinting, tf-idf-style term weighting.

All built-in column expressions over tokenized text — no Python in the hot
path. Each is a narrow scan → project (or one groupBy), so the 100 TB cost
is scan-bound; the only shuffles are the tiny aggregations.

Determinism: token counts and ratios are integer-derived; the only float
ops are divisions of exact integers and constant multiplies (IEEE,
bit-identical across engines); fingerprints are md5 (portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import global_row_number, spread
from kstreams_spark.registry import query

# tiny per-language stopword profiles for the lang-id heuristic
LANG_PROFILES = {
    "en": ("the", "a", "value", "row"),
    "de": ("der", "die", "und", "dup"),
    "es": ("el", "la", "que", "vector"),
    "fr": ("le", "la", "et", "window"),
    "zh": ("的", "是", "了", "merge"),
}


@query(
    "text_token_stats",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks, n_chars FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_unique,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
             AS n_token_chars,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / len(toks) AS mean_token_len,
           n_chars
    FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + counts: tokens, vocabulary, type/token
    ratio, mean token length. The BPE-ish regex variant is in
    text_bpe_token_count."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("ttr"),
        tok_chars.cast("bigint").alias("n_token_chars"),
        (tok_chars.cast("double") / F.size(toks)).alias("mean_token_len"),
        "n_chars",
    )


@query(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
             AS n_bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_chars_div4
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting the way LLM-data pipelines estimate it: a BPE-ish
    regex split (letter runs | digit runs | single punctuation) plus the
    chars/4 rule of thumb."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pat = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_chars_div4"),
    )


BPE_MERGE_TOP_K = 30


@query(
    "text_bpe_merge_pairs",
    oracle=f"""
    WITH w AS (
      SELECT tok, COUNT(*)::BIGINT AS cnt FROM (
        SELECT unnest(str_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY tok
    ),
    p AS (
      SELECT substr(w.tok, g.i, 2) AS pair, w.cnt
      FROM w, LATERAL (SELECT unnest(generate_series(1, length(w.tok) - 1))
                       AS i) g
      WHERE length(w.tok) >= 2
    ),
    agg AS (SELECT pair, SUM(cnt)::BIGINT AS pair_count FROM p GROUP BY pair)
    SELECT pair, pair_count, rk FROM (
      SELECT pair, pair_count,
             ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS rk
      FROM agg
    ) WHERE rk <= {BPE_MERGE_TOP_K}
    """,
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration, distributed (Sennrich et al. 2016's
    merge-candidate count — what a tokenizer-training job actually runs
    over a corpus): the top-{BPE_MERGE_TOP_K} adjacent character pairs
    by corpus frequency, which ARE the first merge candidates.

    The scalable form is the classic weighting trick: pair enumeration
    runs over the DISTINCT word vocabulary (≪ corpus tokens — web-scale
    vocab is ~10⁷ rows against ~10¹² tokens) with each word's pairs
    weighted by its corpus count, so the expensive explode touches
    vocab-sized data. Shuffle budget: ONE word-count agg over the token
    stream (hash-sized rows), ONE pair agg over the vocabulary, then
    the row_number-rank≤K class (limit pushed below the window).
    Pair extraction is a sequence/transform/substring expression —
    codegen, no Python. Guard: Spark's sequence(1, 0) steps BACKWARD
    (yields [1, 0]), so short words are filtered before the transform
    rather than relying on an empty sequence."""
    d = spread(load_table(spark, sf_dir, "documents"))
    words = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = (
        words.filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(tok) - 1), "
                    "i -> substring(tok, i, 2))"
                )
            ).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BPE_MERGE_TOP_K)
    )


# ---------------------------------------------------------------------------
# Intra-document repetition metrics (Gopher rules; Rae et al. 2021 §A1.1):
# repeated-line fraction + repeated-n-gram character fraction, n = 2..4.
# All per-doc array expressions — NO shuffle, NO Python: at 100 TB these
# gates run at scan speed inside WholeStageCodegen, which is exactly why
# production pipelines apply them before any shuffling stage. Per-doc
# cost is O(distinct_ngrams × ngrams) comparisons (docs are ~10² tokens).
#
# Definitions (mirrored verbatim in the DuckDB builders below):
# - lines = LINE_TOKENS-token chunks (fixture corpus has no newlines; the
#   paragraph convention of operators/paragraphs.py);
#   dup_line_frac = 1 − distinct_lines / lines.
# - dup_{n}gram_char_frac = Σ over distinct n-grams occurring ≥2× of
#   (count × chars(ngram)) / chars(doc), clamped to 1.0 — the standard
#   overlap-counting simplification of Gopher's character-marking rule.

LINE_TOKENS = 20
DUP_NS = (2, 3, 4)
# Curation-gate threshold for dup_2gram_char_frac (p90≈0.23, p99≈0.36 on
# the fixture corpus — the gate drops the most-repetitive ~7%).
DUP2_GATE = 0.25


def spark_ngram_arr(n: int, toks: str = "toks") -> str:
    """Spark SQL expr: the doc's token n-gram array (empty when short)."""
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n}))) "
        f"ELSE cast(array() as array<string>) END"
    )


def spark_dup_char_frac(g: str, text: str = "text") -> str:
    """Spark SQL expr: repeated-n-gram character fraction over array col
    `g` (clamped to 1.0; 0.0 for empty docs).

    Single-pass run-length fold over the SORTED n-gram array — O(n log n)
    per doc. The naive per-distinct `filter(g, y -> y = x)` counting form
    re-materializes the n-gram array per distinct element inside an
    interpreted lambda (higher-order funcs don't enter codegen) and
    measured 20× slower at sf0.01."""
    contrib = (
        "CASE WHEN s.run >= 2 THEN s.run * length(s.prev) "
        "ELSE cast(0 as bigint) END"
    )
    dup = (
        f"aggregate(array_sort({g}), "
        f"named_struct('prev', cast('' as string), 'run', cast(0 as bigint), "
        f"'acc', cast(0 as bigint)), "
        f"(s, x) -> CASE WHEN x = s.prev "
        f"THEN named_struct('prev', x, 'run', s.run + cast(1 as bigint), "
        f"'acc', s.acc) "
        f"ELSE named_struct('prev', x, 'run', cast(1 as bigint), "
        f"'acc', s.acc + {contrib}) END, "
        f"s -> s.acc + {contrib})"
    )
    return (
        f"least(cast(1.0 as double), coalesce({dup} / "
        f"nullif(cast(length({text}) as double), 0.0), cast(0.0 as double)))"
    )


def spark_lines_arr(toks: str = "toks", k: int = LINE_TOKENS) -> str:
    return (
        f"transform(sequence(0, cast(ceil(size({toks})/{k}.0) as int) - 1), "
        f"i -> concat_ws(' ', slice({toks}, i*{k}+1, {k})))"
    )


def spark_dup_line_frac(toks: str = "toks", k: int = LINE_TOKENS) -> str:
    lns = spark_lines_arr(toks, k)
    return (
        f"cast(1.0 as double) - size(array_distinct({lns})) / "
        f"cast(size({lns}) as double)"
    )


def duck_ngram_arr(n: int, toks: str = "toks") -> str:
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def duck_dup_char_frac(g: str, text: str = "text") -> str:
    # list_aggregate(.., 'histogram') → value→count map in one O(n) pass
    # (the per-distinct list_filter counting form measured 70× slower)
    ent = f"map_entries(list_aggregate({g}, 'histogram'))"
    dup = (
        f"list_sum(list_transform({ent}, e -> "
        f"CASE WHEN e.value >= 2 THEN e.value * length(e.key) ELSE 0 END))"
    )
    return (
        f"LEAST(CAST(1.0 AS DOUBLE), COALESCE({dup} / "
        f"NULLIF(CAST(length({text}) AS DOUBLE), 0), CAST(0.0 AS DOUBLE)))"
    )


def duck_dup_line_frac(toks: str = "toks", k: int = LINE_TOKENS) -> str:
    lns = (
        f"list_transform(generate_series(0, CAST(ceil(len({toks})/{k}.0) AS INT) - 1), "
        f"i -> array_to_string({toks}[i*{k}+1:i*{k}+{k}], ' '))"
    )
    return (
        f"CAST(1.0 AS DOUBLE) - len(list_distinct({lns})) / "
        f"CAST(len({lns}) AS DOUBLE)"
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, str_split(text, ' ') AS toks, length(text) AS n
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
             CASE WHEN len(toks) > 100 THEN 1.0
                  ELSE CAST(len(toks) AS DOUBLE) / 100 END AS len_score,
             CASE WHEN list_contains(toks, 'the') OR list_contains(toks, 'a')
                  THEN 1.0 ELSE 0.0 END AS stopword_score,
             {duck_dup_line_frac()} AS dup_line_frac,
             {duck_dup_char_frac(duck_ngram_arr(2))} AS dup_2gram_char_frac,
             {duck_dup_char_frac(duck_ngram_arr(3))} AS dup_3gram_char_frac,
             {duck_dup_char_frac(duck_ngram_arr(4))} AS dup_4gram_char_frac
      FROM t
    )
    SELECT doc_id, n_tokens, ttr, len_score, stopword_score,
           dup_line_frac, dup_2gram_char_frac, dup_3gram_char_frac,
           dup_4gram_char_frac,
           0.4 * len_score + 0.3 * ttr + 0.3 * stopword_score AS quality
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality score: length saturation + type/token
    ratio + stopword presence, linearly combined — the C4/Gopher-rule
    shape of quality filtering, engine-portable — plus the Gopher
    intra-document repetition metrics (repeated-line fraction and
    repeated-2..4-gram character fractions) as separate columns. The
    quality scalar is unchanged; repetition gates are thresholded by the
    consumer (see composite.py, gate = dup_2gram_char_frac ≤ DUP2_GATE).
    Everything stays a scan-shaped projection: no shuffle, no Python."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    base = d.select("doc_id", "text", toks.alias("toks"))
    n_tokens = F.size(F.col("toks"))
    ttr = F.size(F.array_distinct(F.col("toks"))).cast("double") / n_tokens
    len_score = F.when(n_tokens > 100, 1.0).otherwise(
        n_tokens.cast("double") / 100
    )
    stop_score = F.when(
        F.array_contains(F.col("toks"), "the")
        | F.array_contains(F.col("toks"), "a"),
        1.0,
    ).otherwise(0.0)
    return base.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ttr.alias("ttr"),
        len_score.alias("len_score"),
        stop_score.alias("stopword_score"),
        F.expr(spark_dup_line_frac()).alias("dup_line_frac"),
        F.expr(spark_dup_char_frac(spark_ngram_arr(2))).alias(
            "dup_2gram_char_frac"
        ),
        F.expr(spark_dup_char_frac(spark_ngram_arr(3))).alias(
            "dup_3gram_char_frac"
        ),
        F.expr(spark_dup_char_frac(spark_ngram_arr(4))).alias(
            "dup_4gram_char_frac"
        ),
        (0.4 * len_score + 0.3 * ttr + 0.3 * stop_score).alias("quality"),
    )


def _lang_score_sql(lang: str) -> str:
    words = LANG_PROFILES[lang]
    hits = " + ".join(
        f"CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END" for w in words
    )
    return f"({hits})"


# the lang-id oracle, as a nestable statement (reused verbatim by the
# composite CCNet pipeline at the bottom of this module)
_LANGID_SQL = f"""
    WITH t AS (SELECT doc_id, lang, str_split(text, ' ') AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql("en")} AS s_en,
             {_lang_score_sql("de")} AS s_de,
             {_lang_score_sql("es")} AS s_es,
             {_lang_score_sql("fr")} AS s_fr,
             {_lang_score_sql("zh")} AS s_zh
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE greatest(s_en, s_de, s_es, s_fr, s_zh)
             WHEN s_en THEN 'en' WHEN s_de THEN 'de' WHEN s_es THEN 'es'
             WHEN s_fr THEN 'fr' ELSE 'zh' END AS pred_lang,
           greatest(s_en, s_de, s_es, s_fr, s_zh) AS best_score
    FROM scored
    """


@query("text_language_id", oracle=_LANGID_SQL)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: score each language by profile-token
    hits, argmax with a fixed precedence order (en>de>es>fr>zh on ties).
    On this synthetic corpus every language shares a vocabulary, so the
    mechanism (not the accuracy) is what's exercised."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    scores = {
        lang: sum(
            F.when(F.array_contains(toks, w), 1).otherwise(0)
            for w in LANG_PROFILES[lang]
        ).alias(f"s_{lang}")
        for lang in LANG_PROFILES
    }
    scored = d.select("doc_id", F.col("lang").alias("labeled_lang"), *scores.values())
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_PROFILES])
    pred = (
        F.when(F.col("s_en") == best, "en")
        .when(F.col("s_de") == best, "de")
        .when(F.col("s_es") == best, "es")
        .when(F.col("s_fr") == best, "fr")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id", "labeled_lang", pred.alias("pred_lang"), best.alias("best_score")
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(l) - 4),
                                   i -> array_to_string(l[i:i+4], ' '))) AS w
      FROM (SELECT doc_id, str_split(text, ' ') AS l FROM documents)
      WHERE len(l) >= 5
    ),
    fp AS (SELECT doc_id, MIN(md5(w)) AS fingerprint FROM sh GROUP BY doc_id)
    SELECT doc_id, fingerprint,
           COUNT(*) OVER (PARTITION BY fingerprint) AS cluster_size
    FROM fp
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-of-hashes over 5-gram windows (winnowing
    collapsed to one hash) — docs sharing a fingerprint form near-dup
    clusters. Rolling-hash semantics with an md5 window hash so the
    oracle matches."""
    d = spread(load_table(spark, sf_dir, "documents"))
    sh = F.expr(
        "transform(sequence(0, size(split(text, ' ')) - 5), "
        "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 5)))"
    )
    fp = (
        d.filter(F.size(F.split(F.col("text"), " ")) >= 5)
        .select("doc_id", F.explode(sh).alias("w"))
        .groupBy("doc_id")
        .agg(F.min(F.md5("w")).alias("fingerprint"))
    )
    return fp.select(
        "doc_id",
        "fingerprint",
        F.count(F.lit(1))
        .over(Window.partitionBy("fingerprint"))
        .alias("cluster_size"),
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df) AS tfidf
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tfidf, rk FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf·(N/df) term weighting
    (idf without log, so the value is a ratio of exact integers — the log
    variant is engine-libm-dependent and lives in unit tests).

    N is a one-row aggregate broadcast-cross-joined in, so the whole query
    stays one lazy DAG — no driver-side count() action, no second scan
    submitted eagerly at plan-build time."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * (F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


@query(
    "text_rarity_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    ranked AS (
      SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk
      FROM vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(rnk) AS DOUBLE) / COUNT(*) AS mean_rank,
           MAX(rnk) AS max_rank
    FROM tok JOIN ranked USING (tok)
    GROUP BY doc_id
    """,
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity scoring — the engine-portable stand-in for
    LM-perplexity quality filters (which need log(), whose last-bit
    rounding differs between libm builds — see the determinism rules):
    rank the corpus vocabulary by descending frequency, then score each
    doc by the mean and max rank of its tokens (duplicates count — a doc
    of repeated rare tokens is still rare-heavy). High mean_rank = heavy
    tail vocabulary; a curation gate thresholds it from either side
    (gibberish above, boilerplate below).

    Shuffle budget: ONE vocab count agg + the two-phase rank's range
    exchange + ONE per-doc agg; the rank table broadcasts
    (vocabulary-sized, not corpus-sized — web-scale vocab is ~10⁷ rows
    ≪ corpus). The global (cnt DESC, tok) rank is computed WITHOUT an
    unpartitioned window (the old single-task sort of the full
    vocabulary was a straggler at exactly the moment the broadcast is
    also at its limit): see `global_row_number` — range-partition by
    the total order, rank within each range, add broadcast prefix
    offsets (the packing per-shard-offsets pattern). All-integer
    ranks; the only float op is one exact SUM/COUNT division."""
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = global_row_number(
        vocab, [F.col("cnt").desc(), F.col("tok")], "rnk"
    ).select("tok", "rnk")
    return (
        tok.join(F.broadcast(ranked), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("rnk").cast("double") / F.count(F.lit(1))).alias(
                "mean_rank"
            ),
            F.max("rnk").alias("max_rank"),
        )
    )


# --- Gopher rule set (the non-repetition gates) ---------------------------
# Rahimi-style published thresholds: word count in [50, 100k], mean word
# length in [3, 10], symbol-to-word ratio <= 0.1 (#/ellipsis), >= 80% of
# words contain an alphabetic character. All gates are integer
# cross-multiplications — no float ratios anywhere, so the oracle
# hash-matches trivially and thresholds can't drift between engines.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_LO = 3
GOPHER_MEAN_LEN_HI = 10
GOPHER_SYMBOL_DEN = 10  # n_symbol * 10 <= n_tokens  (ratio <= 0.1)
GOPHER_ALPHA_NUM = 8  # n_alpha * 10 >= 8 * n_tokens (>= 80%)


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, str_split(text, ' ') AS toks,
             len(str_split(text, ' '))::BIGINT AS n,
             (length(text) - (len(str_split(text, ' ')) - 1))::BIGINT
               AS total_chars
      FROM documents
    ),
    m AS (
      SELECT doc_id, n, total_chars,
             len(list_filter(toks,
                 x -> regexp_matches(x, '[a-zA-Z]')))::BIGINT AS n_alpha,
             len(list_filter(toks,
                 x -> instr(x, '#') > 0 OR instr(x, '...') > 0))::BIGINT
               AS n_symbol
      FROM t
    )
    SELECT doc_id, n AS n_tokens, total_chars, n_alpha, n_symbol,
      (CASE WHEN n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
            THEN 1 ELSE 0 END)::BIGINT AS ok_word_count,
      (CASE WHEN total_chars >= {GOPHER_MEAN_LEN_LO} * n
             AND total_chars <= {GOPHER_MEAN_LEN_HI} * n
            THEN 1 ELSE 0 END)::BIGINT AS ok_mean_word_len,
      (CASE WHEN n_symbol * {GOPHER_SYMBOL_DEN} <= n
            THEN 1 ELSE 0 END)::BIGINT AS ok_symbol_ratio,
      (CASE WHEN n_alpha * 10 >= {GOPHER_ALPHA_NUM} * n
            THEN 1 ELSE 0 END)::BIGINT AS ok_alpha_words,
      (CASE WHEN n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
             AND total_chars >= {GOPHER_MEAN_LEN_LO} * n
             AND total_chars <= {GOPHER_MEAN_LEN_HI} * n
             AND n_symbol * {GOPHER_SYMBOL_DEN} <= n
             AND n_alpha * 10 >= {GOPHER_ALPHA_NUM} * n
            THEN 1 ELSE 0 END)::BIGINT AS gopher_pass
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality gates text_quality_score doesn't carry: word
    count [{GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS}], mean word length
    [{GOPHER_MEAN_LEN_LO}, {GOPHER_MEAN_LEN_HI}] (via total_chars =
    length(text) - spaces, so no per-token length pass), symbol-to-word
    ratio (tokens containing '#' or '...'), and alphabetic-word fraction
    (>= 80% of tokens contain [a-zA-Z] — the gate that kills lorem/digit
    junk). Scan-shaped: one projection, higher-order filters, no shuffle,
    no Python. Composes with the repetition gates exactly as in
    composite_curation_pipeline."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("long")
    t = d.select(
        "doc_id",
        toks.alias("toks"),
        n.alias("n"),
        (F.length("text") - (n - 1)).cast("long").alias("total_chars"),
    )
    m = t.select(
        "doc_id",
        "n",
        "total_chars",
        F.size(
            F.expr("filter(toks, x -> x rlike '[a-zA-Z]')")
        ).cast("long").alias("n_alpha"),
        F.size(
            F.expr(
                "filter(toks, x -> instr(x, '#') > 0 OR instr(x, '...') > 0)"
            )
        ).cast("long").alias("n_symbol"),
    )
    ok_wc = (F.col("n") >= GOPHER_MIN_WORDS) & (F.col("n") <= GOPHER_MAX_WORDS)
    ok_len = (F.col("total_chars") >= GOPHER_MEAN_LEN_LO * F.col("n")) & (
        F.col("total_chars") <= GOPHER_MEAN_LEN_HI * F.col("n")
    )
    ok_sym = F.col("n_symbol") * GOPHER_SYMBOL_DEN <= F.col("n")
    ok_alpha = F.col("n_alpha") * 10 >= GOPHER_ALPHA_NUM * F.col("n")

    def _flag(c):
        return F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")

    return m.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "total_chars",
        "n_alpha",
        "n_symbol",
        _flag(ok_wc).alias("ok_word_count"),
        _flag(ok_len).alias("ok_mean_word_len"),
        _flag(ok_sym).alias("ok_symbol_ratio"),
        _flag(ok_alpha).alias("ok_alpha_words"),
        _flag(ok_wc & ok_len & ok_sym & ok_alpha).alias("gopher_pass"),
    )


@query(
    "text_mixed_language_flag",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, str_split(text, ' ') AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang,
             list_sort([{_lang_score_sql("en")}, {_lang_score_sql("de")},
                        {_lang_score_sql("es")}, {_lang_score_sql("fr")},
                        {_lang_score_sql("zh")}]) AS s
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           s[5]::BIGINT AS best_score,
           s[4]::BIGINT AS second_score,
           (CASE WHEN s[4] >= 1 AND s[5] - s[4] <= 1 THEN 1 ELSE 0 END)::BIGINT
             AS is_mixed
    FROM scored
    """,
)
def text_mixed_language_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language detection — the curation gate that keeps
    code-switched / boilerplate-contaminated documents out of
    single-language buckets: a doc is 'mixed' when its SECOND-best
    language profile scores within 1 of the best (and is non-zero), i.e.
    the language-id margin is too thin to trust. Same scan-shaped
    profile scoring as text_language_id — the margin is read off the
    sorted score list, no extra pass."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    arr = F.array(
        *[
            sum(
                F.when(F.array_contains(toks, w), 1).otherwise(0)
                for w in LANG_PROFILES[lang]
            ).cast("long")
            for lang in ("en", "de", "es", "fr", "zh")
        ]
    )
    s = F.sort_array(arr)
    best = F.element_at(s, 5)
    second = F.element_at(s, 4)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best.alias("best_score"),
        second.alias("second_score"),
        F.when((second >= 1) & (best - second <= 1), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_mixed"),
    )


def c4_quality_expr(toks: F.Column) -> F.Column:
    """The C4-shaped quality scalar every curation composite gates on
    (0.4·length-saturation + 0.3·type-token-ratio + 0.3·stopword
    presence) — ONE definition consumed by text_quality_score, all the
    curation composites (composite.py), and the streaming ingest gate
    (streaming/gates.py), so the gate semantics cannot drift between the
    batch pipelines and their streaming twin."""
    n_tokens = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    len_score = F.when(n_tokens > 100, 1.0).otherwise(
        n_tokens.cast("double") / 100
    )
    stop_score = F.when(
        F.array_contains(toks, "the") | F.array_contains(toks, "a"), 1.0
    ).otherwise(0.0)
    return 0.4 * len_score + 0.3 * ttr + 0.3 * stop_score


VOCAB_TOP_K = 100


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH counts AS (
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ),
    total AS (SELECT SUM(n)::BIGINT AS total_toks FROM counts),
    topk AS (
      SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT {VOCAB_TOP_K}
    ),
    ranked AS (
      SELECT tok, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank,
             SUM(n) OVER (ORDER BY n DESC, tok
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)::BIGINT AS cum_n
      FROM topk
    )
    SELECT r.rank, r.tok, r.n, r.cum_n,
           CAST(r.cum_n AS DOUBLE) / t.total_toks AS coverage
    FROM ranked r CROSS JOIN total t
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage curve — the first artifact of
    tokenizer training: the top-{VOCAB_TOP_K} corpus tokens by frequency
    with rank, count, and CUMULATIVE corpus-coverage fraction (how much
    of the token stream a vocab prefix of that size explains). The
    integer division cum/total is evaluated as one double divide of two
    exact BIGINTs — portable across engines.

    Scale shape: the frequency agg is map-side-combined on the token
    column; the global window runs over the TOP-K ROWS ONLY (top-k via
    TakeOrderedAndProject first, then a {VOCAB_TOP_K}-row cumsum — never
    an unpartitioned window over the full vocabulary, which would be
    10^8 rows in one task at corpus scale); the corpus total is a 1-row
    broadcast cross join."""
    d = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").cast("long").alias("total_toks"))
    topk = counts.orderBy(F.col("n").desc(), "tok").limit(VOCAB_TOP_K)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), "tok")
    ranked = topk.select(
        F.row_number().over(w).alias("rank"),
        "tok",
        "n",
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_n"),
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "tok",
        "n",
        "cum_n",
        (F.col("cum_n").cast("double") / F.col("total_toks")).alias("coverage"),
    )


# Multi-term keyword retrieval. Scoring is tf·idf with an INTEGER idf
# surrogate (docs·1000 // df, exact floor division in both engines) —
# the repo's standing rule keeps transcendentals (a log-based BM25 idf)
# out of oracle-checked queries because engine libms differ in the last
# ulp; the integer surrogate preserves the idf ORDERING (rarer term →
# larger weight), which is what the ranking consumes.
SEARCH_TERMS = ("spark", "window", "scan")
SEARCH_TOP_K = 20
IDF_SCALE = 1000


@query(
    "search_topk_keywords",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok IN {SEARCH_TERMS}
      GROUP BY doc_id, tok
    ),
    idf AS (
      SELECT tok,
             (SELECT n_docs FROM n) * {IDF_SCALE}
               // COUNT(DISTINCT doc_id) AS w
      FROM tf GROUP BY tok
    ),
    scored AS (
      SELECT t.doc_id,
             SUM(t.tf * i.w)::BIGINT AS score,
             COUNT(*) AS n_terms_hit
      FROM tf t JOIN idf i USING (tok)
      GROUP BY t.doc_id
    )
    SELECT doc_id, score, n_terms_hit
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {SEARCH_TOP_K}
    """,
)
def search_topk_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search over the corpus: top-{SEARCH_TOP_K} documents for a
    multi-term query, scored Σ_t tf(doc,t)·idf_int(t) with the integer
    idf surrogate above; ties → lowest doc_id (every LIMIT here has a
    total order). The op the engine's text side lacked: tfidf_top_terms
    profiles the CORPUS, this ranks DOCS for a query.

    Scale shape: the token explode filters to the query terms BEFORE the
    first shuffle (scan-side IN-list — the selective predicate reaches
    the scan), tf is one groupBy, idf is a |terms|-row agg broadcast
    back, the final ranking is TakeOrderedAndProject. Nothing scales
    with vocabulary; everything scales with posting-list size."""
    raw = load_table(spark, sf_dir, "documents")
    # r15: count BEFORE spread — the bare-scan count collapses to parquet
    # footer metadata; counting the spread output ran the repartition
    # exchange first (guide §2.4). Row count identical.
    n_docs = raw.count()  # metadata-cheap; drives the integer idf constant
    d = spread(raw)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok").isin(*SEARCH_TERMS))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # exact integer floor division (Spark DIV == DuckDB // on BIGINTs);
    # no float intermediary anywhere in the score
    idf = tf.groupBy("tok").agg(
        F.expr(
            f"CAST({n_docs * IDF_SCALE} DIV count(DISTINCT doc_id) AS BIGINT)"
        ).alias("w")
    )
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("w")).cast("long").alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(SEARCH_TOP_K)


@query(
    "text_tokenizer_fertility",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             length(text) AS n_chars,
             len(regexp_extract_all(text,
                 '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe,
             length(text) - length(replace(text, ' ', '')) + 1 AS n_words
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           SUM(n_chars)::BIGINT AS total_chars,
           SUM(n_bpe)::BIGINT AS total_bpe,
           SUM(n_words)::BIGINT AS total_words,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe) AS chars_per_token,
           CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words) AS tokens_per_word
    FROM t GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — the multilingual-tokenizer
    audit (how many BPE-ish tokens a word costs per language decides
    who pays more compute per sentence; high-fertility languages argue
    for vocabulary rebalancing). chars/token and tokens/word are single
    IEEE divisions of exact integer sums — deterministic on both
    engines (agg_moments_exact's rule). Scan + one small agg; nothing
    scales with vocabulary."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pat = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    t = d.select(
        "lang",
        F.length("text").alias("n_chars"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
        ).alias("n_bpe"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("n_words"),
    )
    g = t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_bpe").cast("long").alias("total_bpe"),
        F.sum("n_words").cast("long").alias("total_words"),
    )
    return g.select(
        "lang",
        "n_docs",
        "total_chars",
        "total_bpe",
        "total_words",
        (F.col("total_chars").cast("double") / F.col("total_bpe")).alias(
            "chars_per_token"
        ),
        (F.col("total_bpe").cast("double") / F.col("total_words")).alias(
            "tokens_per_word"
        ),
    )


@query(
    "text_weighted_median_doclen",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, n_chars,
             length(text) - length(replace(text, ' ', '')) + 1 AS w
      FROM documents
    ),
    o AS (
      SELECT lang, doc_id, n_chars, w,
             SUM(w) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY lang) AS tw
      FROM t
    ),
    sel AS (
      SELECT lang, n_chars, tw,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn_sel
      FROM o WHERE 2 * cw >= tw
    )
    SELECT lang, n_chars AS wmedian_chars, tw::BIGINT AS total_tokens
    FROM sel WHERE rn_sel = 1
    """,
)
def text_weighted_median_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median — the percentile family's weighted form, which
    neither engine ships natively: per language, the document length at
    which half the corpus TOKENS sit (corpus shape by volume, not by doc
    count — a few giant docs move this where the plain median never
    budges). Selection is the classic running-weight rule: sort by
    (value, unique tie-break), first row where 2·cum_w ≥ total_w. All
    integer comparisons; fully deterministic.

    Scale: one lang shuffle serves the two weight windows and the
    selection window (same-prefix keys); per-partition work is a sort —
    the exact-percentile caveat (sorting a language's docs) applies, and
    the production swap is the same GK-class tradeoff documented at
    subqueries.approx_quantiles."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("w"),
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("n_chars", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("lang")
    o = t.select(
        "lang",
        "doc_id",
        "n_chars",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wtot).alias("tw"),
    )
    wsel = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    sel = (
        o.filter(2 * F.col("cw") >= F.col("tw"))
        .withColumn("rn_sel", F.row_number().over(wsel))
        .filter(F.col("rn_sel") == 1)
    )
    return sel.select(
        "lang",
        F.col("n_chars").alias("wmedian_chars"),
        F.col("tw").cast("long").alias("total_tokens"),
    )



# --- bigram-LM surprise (CCNet-style perplexity-proxy gate) ----------------
SURPRISE_TRAIN_MOD = 10  # docs with doc_id % 10 < 8 train the LM
SURPRISE_OOV_BITS = 24  # charge for a context never seen in training

# the per-doc surprise oracle, as a nestable statement (the composite
# CCNet pipeline below embeds it verbatim as a CTE body)
_SURPRISE_SQL = f"""
    WITH tok AS (
      SELECT doc_id, str_split(text, ' ') AS l FROM documents
    ),
    pairs AS (
      SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
      FROM tok,
           LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
      WHERE len(l) >= 2
    ),
    big AS (
      SELECT w1, w2, COUNT(*)::BIGINT AS big_n FROM pairs
      WHERE doc_id % {SURPRISE_TRAIN_MOD} < 8 GROUP BY w1, w2
    ),
    ctx AS (SELECT w1, SUM(big_n)::BIGINT AS ctx_n FROM big GROUP BY w1),
    scored AS (
      SELECT p.doc_id,
             CASE WHEN b.big_n IS NOT NULL
                  THEN (length(bin(c.ctx_n)) - 1)
                       - (length(bin(b.big_n)) - 1)
                  WHEN c.ctx_n IS NOT NULL THEN length(bin(c.ctx_n))
                  ELSE {SURPRISE_OOV_BITS} END AS bits,
             CASE WHEN c.ctx_n IS NULL THEN 1 ELSE 0 END AS is_oov,
             CASE WHEN c.ctx_n IS NOT NULL AND b.big_n IS NULL
                  THEN 1 ELSE 0 END AS is_unseen
      FROM pairs p
      LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
      LEFT JOIN ctx c ON p.w1 = c.w1
    )
    SELECT doc_id,
           COUNT(*)::BIGINT AS n_bigrams,
           SUM(bits)::BIGINT AS bits_total,
           SUM(is_unseen)::BIGINT AS unseen_bigrams,
           SUM(is_oov)::BIGINT AS oov_bigrams,
           (SUM(bits)::BIGINT * 1000) // COUNT(*)::BIGINT
             AS bits_per_bigram_x1000
    FROM scored GROUP BY doc_id
    """


@query("text_bigram_surprise", oracle=_SURPRISE_SQL)
def text_bigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality gate, the CCNet shape (Wenzek et al.
    2020: score every document by a language model trained on a trusted
    slice, gate on the score) made ENGINE-EXACT: the repo's determinism
    rules ban libm log() (text_rarity_score's docstring carries the
    argument), so the per-bigram cost is the INTEGER bit-length
    surrogate floor(log2(ctx_n)) - floor(log2(big_n)) — within ±1 bit of
    the true -log2 P(w2|w1) under MLE — computed as length(bin(x)) - 1,
    identical unpadded-binary semantics in Spark and DuckDB. Bigrams
    unseen in training charge floor(log2(ctx_n)) + 1 bits (one count of
    smoothing mass); contexts never seen in training charge a flat
    SURPRISE_OOV_BITS (= 24) bits. The LM trains on doc_id % 10 < 8 (the
    hash-split idiom, modulo-simple here) and SCORES ALL DOCS — the
    train-on-A/apply-to-all pattern every learned curation filter
    needs; held-out docs (doc_id % 10 >= 8) get honest OOV charges.
    Output per doc (>= 2 tokens): bigram count, total bits,
    unseen/OOV counts, and the gate scalar bits_per_bigram_x1000
    (integer DIV — fluent text scores low, gibberish high).

    Shuffle budget: one (w1,w2) count agg over the exploded train pairs,
    one w1 re-agg OVER THE REDUCED BIGRAM TABLE (never the raw pairs),
    the scoring join shuffled on (w1,w2), the ctx join broadcast-sized
    (vocabulary-sized, ~1e7 rows at web scale vs ~1e11 pairs), one final
    doc_id agg. All columns integer; no Python, no floats anywhere.

    The body is composed from bigram_pairs / surprise_lm_counts /
    surprise_per_doc so the streaming twin
    (streaming/gates.py::StreamingPerplexityGate) scores with LITERALLY
    the same expressions — batch/stream agreement is structural."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = bigram_pairs(d)
    big, ctx = surprise_lm_counts(
        pairs.filter(F.col("doc_id") % SURPRISE_TRAIN_MOD < 8)
    )
    # r15 (guide §2.4/§5): `big` feeds the ctx re-agg AND the scoring
    # join, and each branch re-ran the corpus-wide bigram explode +
    # count agg (Catalyst has no cross-branch subplan reuse) — the
    # explode executed ~4× per query. One cut on the REDUCED bigram
    # table (vocab²-bounded, ≪ raw pairs) drops that to 2×; the raw
    # exploded `pairs` stays uncut (the measured dead-end class:
    # storing corpus-grain exploded rows costs more than recomputing a
    # codegen'd explode).
    big = big.localCheckpoint(eager=False)
    ctx = big.groupBy("w1").agg(F.sum("big_n").alias("ctx_n"))
    return surprise_per_doc(pairs, big, ctx)


def bigram_pairs(d: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → exploded (doc_id, w1, w2) bigram rows;
    docs with < 2 whitespace tokens drop (the sequence(1,0)-backward
    guard). Shared by the batch op and the streaming gate."""
    toks = F.split(F.col("text"), " ")
    return (
        d.filter(F.size(toks) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text, ' ')) - 2), "
                    "i -> struct(element_at(split(text, ' '), i + 1) AS w1, "
                    "element_at(split(text, ' '), i + 2) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )


def surprise_lm_counts(train_pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train the bigram LM: (w1, w2, big_n) and its w1 re-agg
    (w1, ctx_n) — the ctx pass runs over the REDUCED bigram table."""
    big = train_pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("big_n")
    )
    ctx = big.groupBy("w1").agg(F.sum("big_n").alias("ctx_n"))
    return big, ctx


def surprise_per_doc(
    pairs: DataFrame, big: DataFrame, ctx: DataFrame
) -> DataFrame:
    """Score (doc_id, w1, w2) rows against a frozen LM — the exact
    integer bit arithmetic of text_bigram_surprise's contract."""
    msb = lambda c: F.length(F.bin(c)) - 1  # noqa: E731
    bits = (
        F.when(F.col("big_n").isNotNull(), msb(F.col("ctx_n")) - msb(F.col("big_n")))
        .when(F.col("ctx_n").isNotNull(), msb(F.col("ctx_n")) + 1)
        .otherwise(F.lit(SURPRISE_OOV_BITS))
    )
    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .select(
            "doc_id",
            bits.cast("long").alias("bits"),
            F.when(F.col("ctx_n").isNull(), 1).otherwise(0).alias("is_oov"),
            F.when(
                F.col("ctx_n").isNotNull() & F.col("big_n").isNull(), 1
            ).otherwise(0).alias("is_unseen"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("bits").alias("bits_total"),
        F.sum("is_unseen").cast("long").alias("unseen_bigrams"),
        F.sum("is_oov").cast("long").alias("oov_bigrams"),
        F.expr("sum(bits) * 1000 DIV count(1)").alias("bits_per_bigram_x1000"),
    )


@query(
    "composite_curation_perplexity",
    oracle=f"""
    WITH sup AS ({_SURPRISE_SQL}),
    lid AS ({_LANGID_SQL}),
    j AS (
      SELECT l.pred_lang, s.doc_id, s.n_bigrams, s.bits_per_bigram_x1000 AS bpb,
             ntile(3) OVER (PARTITION BY l.pred_lang
                            ORDER BY s.bits_per_bigram_x1000, s.doc_id) AS t
      FROM sup s JOIN lid l ON s.doc_id = l.doc_id
    )
    SELECT pred_lang,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_bigrams)::BIGINT AS total_bigrams,
           MIN(bpb)::BIGINT AS min_bits_x1000,
           MAX(bpb)::BIGINT AS max_bits_x1000,
           SUM(bpb)::BIGINT // COUNT(*)::BIGINT AS mean_bits_x1000
    FROM j GROUP BY pred_lang, t
    """,
)
def composite_curation_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet pipeline end-to-end (Wenzek et al. 2020 — the paper's
    actual flow, not just its scoring stage): language-ID every doc,
    score every doc with the split-trained bigram LM, then bucket each
    LANGUAGE's docs into perplexity terciles (head = most fluent third,
    middle, tail) and report per-(lang, bucket) corpus statistics — the
    table a curation run reads to decide which buckets feed training.
    Oracle nests BOTH registered oracles verbatim (_SURPRISE_SQL +
    _LANGID_SQL), so one hash certifies lang-id, LM scoring, tercile
    assignment, and the rollup together. Tercile assignment is ntile(3)
    over the total order (bits, doc_id) — rank-based and tie-broken, so
    both engines assign identically; docs with < 2 tokens carry no LM
    score and drop at the inner join (the surprise op's documented
    grain).

    Shuffle budget: the surprise pipeline's budget + one doc-grain join
    + ONE per-language window sort (the tercile cutpoints — CCNet
    computes exactly this; at 100 TB the standard swap is sampled
    cutpoints broadcast as thresholds, trading exactness for one pass,
    behind the same bucket-label contract) + the final tiny agg."""
    lang = text_language_id(spark, sf_dir).select("doc_id", "pred_lang")
    sup = text_bigram_surprise(spark, sf_dir).select(
        "doc_id", "n_bigrams", "bits_per_bigram_x1000"
    )
    w = Window.partitionBy("pred_lang").orderBy(
        "bits_per_bigram_x1000", "doc_id"
    )
    j = (
        sup.join(lang, "doc_id")
        .select(
            "pred_lang",
            "n_bigrams",
            F.col("bits_per_bigram_x1000").alias("bpb"),
            F.ntile(3).over(w).alias("t"),
        )
    )
    bucket = (
        F.when(F.col("t") == 1, "head")
        .when(F.col("t") == 2, "middle")
        .otherwise("tail")
    )
    return j.groupBy("pred_lang", bucket.alias("ppl_bucket"), "t").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").alias("total_bigrams"),
        F.min("bpb").alias("min_bits_x1000"),
        F.max("bpb").alias("max_bits_x1000"),
        F.expr("sum(bpb) DIV count(1)").alias("mean_bits_x1000"),
    ).drop("t")


# --- multi-round BPE training (the iterative extension of
# text_bpe_merge_pairs: LEARN merges, don't just rank candidates) -----------
BPE_TRAIN_ROUNDS = 3
# one merge application = literal non-overlapping replace, applied 3x.
# SQL builder shared verbatim between the oracle and the docstring's
# contract; engine side mirrors it with F.replace (also literal).
_BPE_PAD = "' ' || {col} || ' '"


def _bpe_merge_sql(col: str) -> str:
    """DuckDB SQL: apply the round's (s1, s2) merge to spaced-symbol
    column `col` — pad, replace ' s1 s2 '→' s1s2 ' three times, trim."""
    out = f"' ' || {col} || ' '"
    for _ in range(3):
        out = (
            f"replace({out}, ' ' || s1 || ' ' || s2 || ' ', "
            f"' ' || s1 || s2 || ' ')"
        )
    return f"trim({out})"


def _bpe_vocab_sql() -> str:
    return """
      SELECT tok, array_to_string(str_split(tok, ''), ' ') AS spaced, cnt
      FROM (
        SELECT tok, COUNT(*)::BIGINT AS cnt FROM (
          SELECT unnest(str_split(text, ' ')) AS tok FROM documents
        ) WHERE tok <> '' GROUP BY tok)
    """


def _bpe_round_sql(prev: str, r: int) -> str:
    """CTE fragments for one training round over vocab CTE `prev`."""
    return f"""
    p{r} AS (
      SELECT l[i] AS s1, l[i + 1] AS s2, SUM(cnt)::BIGINT AS pair_count
      FROM (SELECT str_split(spaced, ' ') AS l, cnt FROM {prev}),
           LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
      WHERE len(l) >= 2 GROUP BY s1, s2
    ),
    t{r} AS (SELECT s1, s2, pair_count FROM p{r}
             ORDER BY pair_count DESC, s1, s2 LIMIT 1),
    v{r} AS (SELECT tok, {_bpe_merge_sql("spaced")} AS spaced, cnt
             FROM {prev}, t{r}),
    c{r} AS (SELECT SUM(cnt * len(str_split(spaced, ' ')))::BIGINT
               AS corpus_symbols_after FROM v{r})"""


_BPE_TRAIN_SQL = (
    f"WITH v0 AS ({_bpe_vocab_sql()}),"
    + ",".join(_bpe_round_sql(f"v{r - 1}", r) for r in range(1, BPE_TRAIN_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_round, s1 AS w1, s2 AS w2, pair_count, "
        f"corpus_symbols_after FROM t{r}, c{r}"
        for r in range(1, BPE_TRAIN_ROUNDS + 1)
    )
)


@query("text_bpe_train_merges", oracle=_BPE_TRAIN_SQL)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, BPE_TRAIN_ROUNDS (= 3) merge rounds
    distributed (Sennrich et al. 2016 — the iterative loop
    text_bpe_merge_pairs only ranks candidates for): each round counts
    adjacent symbol pairs over the weighted vocabulary, elects the
    global top pair (count DESC, pair ASC — total order), applies the
    merge to every word, and re-counts on the merged vocabulary. The
    output is the learned merge table itself — (round, pair, count) plus
    the weighted corpus symbol count after each round, the compression
    curve a tokenizer trainer monitors.

    The per-round top pair and symbol count are ONE-ROW driver state
    (the iterative-fit bounded-collect class, like kmeans' k×D sums —
    deterministic under the pinned total order); per-round cost is one
    vocab-sized pair agg + a top-1 TakeOrderedAndProject + a vocab-sized
    rewrite projection over the once-checkpointed vocabulary, so the
    round loop scales with ROUNDS × vocab, never corpus (the classic
    distinct-vocab-with-counts weighting trick; plan shape in
    _bpe_train_rounds).

    Merge semantics, stated exactly: one application = literal
    NON-OVERLAPPING left-to-right replace of ' s1 s2 ' in the padded
    spaced-symbol string, run 3 times (both engines' replace() is the
    same scan, so parity is structural). This equals textbook BPE
    everywhere except same-symbol runs ≥ 4 (e.g. 'aaaa' under merge
    (a,a) keeps an alternating single — boundary sharing), a documented,
    engine-identical approximation; the exact fold needs per-word
    sequential state neither engine's SQL has."""
    d = spread(load_table(spark, sf_dir, "documents"))
    _, rounds = _bpe_train_rounds(_bpe_vocab(d))
    return spark.createDataFrame(
        [
            (r, top.s1, top.s2, top.pair_count, n_after)
            for r, (top, n_after) in enumerate(rounds, start=1)
        ],
        "merge_round int, w1 string, w2 string, pair_count bigint,"
        " corpus_symbols_after bigint",
    )


def _bpe_vocab(d: DataFrame) -> DataFrame:
    """documents → (tok, spaced char-symbol string, corpus count)."""
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "tok",
            F.concat_ws(" ", F.split(F.col("tok"), "")).alias("spaced"),
            "cnt",
        )
    )


def _bpe_sym_pairs(v: DataFrame) -> DataFrame:
    return (
        v.filter(F.size(F.split("spaced", " ")) >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(spaced, ' ')) - 2),"
                    " i -> struct("
                    "element_at(split(spaced, ' '), i + 1) AS s1, "
                    "element_at(split(spaced, ' '), i + 2) AS s2))"
                )
            ).alias("p"),
            "cnt",
        )
        .select("p.s1", "p.s2", "cnt")
    )


def _bpe_merge3(spaced, s1, s2):
    """The Spark twin of _bpe_merge_sql — same 3× literal replace."""
    pat = F.concat(F.lit(" "), s1, F.lit(" "), s2, F.lit(" "))
    rep = F.concat(F.lit(" "), s1, s2, F.lit(" "))
    out = F.concat(F.lit(" "), spaced, F.lit(" "))
    for _ in range(3):
        out = F.replace(out, pat, rep)
    return F.trim(out)


# Above this many distinct weighted-vocabulary entries the BPE round
# loop stays fully distributed; at or below it the vocab collects and
# the rounds run on the driver (the dedup.DRIVER_CC_MAX_EDGES dispatch
# pattern — sized for collect()'s ~100-150 B/Row overhead: 200k rows ≈
# 30 MB). Real tokenizer trainers hold exactly this dictionary in
# memory (Sennrich et al. 2016): the CORPUS pass (tokenize + count) is
# the distributed part; the merge loop is vocab-sized by construction.
DRIVER_BPE_MAX_VOCAB = 200_000


class _BpeMerge:
    __slots__ = ("s1", "s2", "pair_count")

    def __init__(self, s1: str, s2: str, pair_count: int) -> None:
        self.s1, self.s2, self.pair_count = s1, s2, pair_count


def _bpe_merge3_py(spaced: str, s1: str, s2: str) -> str:
    """Driver twin of _bpe_merge3/_bpe_merge_sql: pad, literal
    non-overlapping replace ' s1 s2 '→' s1s2 ' three times, trim —
    str.replace is the same left-to-right scan as both engines'
    replace()."""
    out = " " + spaced + " "
    pat, rep = f" {s1} {s2} ", f" {s1}{s2} "
    for _ in range(3):
        out = out.replace(pat, rep)
    return out.strip(" ")


def _bpe_train_rounds(vocab: DataFrame):
    """Run BPE_TRAIN_ROUNDS merge rounds; returns (final merged vocab
    with tok retained, [(elected pair with .s1/.s2/.pair_count,
    corpus_symbols_after) per round]).

    Shape (r13 — the BPE-family bench fix): ONE distributed job builds
    the weighted vocabulary (the corpus tokenize + count — the only
    corpus-sized work BPE training has); at or below
    DRIVER_BPE_MAX_VOCAB entries the round loop then runs on the
    driver over the collected dictionary — microseconds, zero further
    jobs — exactly how reference tokenizer trainers work. Above the cap
    the loop stays distributed: vocab localCheckpoint-ed once, each
    round one vocab-sized pair agg + top-1 collect + one 1-row stats
    agg (the kmeans bounded-collect class). Both paths elect under the
    same total order (pair_count DESC, s1, s2 — UTF-8 byte order and
    code-point order agree, so Python tuple compare matches both
    engines' string collation) and apply the same literal 3× replace,
    so results are path-invariant. The r12 shape — per-round lazy
    broadcast crossJoins unioned at the end — re-derived the corpus
    vocabulary once per plan branch (no cross-branch subplan reuse in
    Catalyst) and paid ~7 sequential job latencies; measured 2.6 s at
    sf0.1 against ~1.2 s for this shape (SCALE.md §Round-13)."""
    head = vocab.limit(DRIVER_BPE_MAX_VOCAB + 1).collect()
    if len(head) <= DRIVER_BPE_MAX_VOCAB:
        entries = [(r.tok, r.spaced, int(r.cnt)) for r in head]
        rounds = []
        for _ in range(BPE_TRAIN_ROUNDS):
            pc: dict[tuple[str, str], int] = {}
            for _tok, spaced, cnt in entries:
                syms = spaced.split(" ")
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pc[p] = pc.get(p, 0) + cnt
            if not pc:
                break
            (s1, s2), n = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            entries = [
                (tok, _bpe_merge3_py(spaced, s1, s2), cnt)
                for tok, spaced, cnt in entries
            ]
            n_after = sum(
                cnt * len(sp.split(" ")) for _tok, sp, cnt in entries
            )
            rounds.append((_BpeMerge(s1, s2, n), n_after))
        final_v = vocab.sparkSession.createDataFrame(
            entries, "tok string, spaced string, cnt bigint"
        )
        return final_v, rounds
    rounds = []
    v = vocab.coalesce(16).localCheckpoint(eager=True)
    for _ in range(BPE_TRAIN_ROUNDS):
        hit = (
            _bpe_sym_pairs(v)
            .groupBy("s1", "s2")
            .agg(F.sum("cnt").cast("long").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "s1", "s2")
            .limit(1)
            .collect()
        )
        if not hit:  # vocabulary fully merged — no pairs left
            break
        top = hit[0]
        v = v.select(
            "tok",
            _bpe_merge3(
                F.col("spaced"), F.lit(top.s1), F.lit(top.s2)
            ).alias("spaced"),
            "cnt",
        )
        n_after = v.agg(
            F.sum(F.col("cnt") * F.size(F.split("spaced", " ")))
            .cast("long")
            .alias("corpus_symbols_after")
        ).collect()[0][0]
        rounds.append((top, n_after))
    return v, rounds


_BPE_FINAL_V = f"v{BPE_TRAIN_ROUNDS}"
_BPE_ALL_ROUNDS = f"WITH v0 AS ({_bpe_vocab_sql()})," + ",".join(
    _bpe_round_sql(f"v{r - 1}", r) for r in range(1, BPE_TRAIN_ROUNDS + 1)
)


@query(
    "text_bpe_encode",
    oracle=f"""
    {_BPE_ALL_ROUNDS},
    enc AS (
      SELECT tok, length(tok)::BIGINT AS n_chars,
             len(str_split(spaced, ' '))::BIGINT AS n_sym
      FROM {_BPE_FINAL_V}
    ),
    dt AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    )
    SELECT doc_id,
           COUNT(*)::BIGINT AS n_words,
           SUM(e.n_chars)::BIGINT AS n_chars_total,
           SUM(e.n_sym)::BIGINT AS n_bpe_symbols,
           (SUM(e.n_chars) - SUM(e.n_sym))::BIGINT AS symbols_saved
    FROM dt JOIN enc e USING (tok)
    WHERE dt.tok <> ''
    GROUP BY doc_id
    """,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the payoff of text_bpe_train_merges:
    encode every document with the 3 learned merges and report the
    per-doc compression (chars, post-merge symbol count, symbols
    saved). The apply step uses the SAME distinct-vocab trick as
    training: merges rewrite the vocabulary once (vocab-sized work),
    then each doc's encoded length is a broadcast join of its tokens
    against the encoded vocabulary + one per-doc agg — the corpus is
    never re-tokenized character-by-character. Train and apply share
    _bpe_train_rounds, so the encoder can never disagree with the
    trainer's merge table; the oracle nests the full 3-round training
    SQL and replays the join. The token-budget planner consumes
    n_bpe_symbols exactly as it consumes the chars/4 estimate today —
    this replaces the estimate with the learned tokenizer's true
    count."""
    d = spread(load_table(spark, sf_dir, "documents"))
    final_v, _ = _bpe_train_rounds(_bpe_vocab(d))
    enc = final_v.select(
        "tok",
        F.length("tok").cast("long").alias("n_chars"),
        F.size(F.split("spaced", " ")).cast("long").alias("n_sym"),
    )
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.join(F.broadcast(enc), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chars").alias("n_chars_total"),
            F.sum("n_sym").alias("n_bpe_symbols"),
            (F.sum("n_chars") - F.sum("n_sym")).alias("symbols_saved"),
        )
    )


BPE_TOKEN_BUDGET = 60_000  # fixture budget; bites at every sf (sf0.01 ≈ 120k symbols)


@query(
    "composite_bpe_token_budget",
    oracle=f"""
    {_BPE_ALL_ROUNDS},
    enc AS (
      SELECT tok, len(str_split(spaced, ' '))::BIGINT AS n_sym
      FROM {_BPE_FINAL_V}
    ),
    dt AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    per_doc AS (
      SELECT doc_id, SUM(e.n_sym)::BIGINT AS n_bpe_symbols
      FROM dt JOIN enc e USING (tok)
      WHERE dt.tok <> ''
      GROUP BY doc_id
    ),
    running AS (
      SELECT doc_id, n_bpe_symbols,
             SUM(n_bpe_symbols) OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_bpe
      FROM per_doc
    )
    SELECT doc_id, n_bpe_symbols, cum_bpe::BIGINT AS cum_bpe
    FROM running WHERE cum_bpe <= {BPE_TOKEN_BUDGET}
    """,
)
def composite_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting by the LEARNED tokenizer (VERDICT r10 task 3 —
    closing the gap its r10 verdict named: sample_token_budget counts
    whitespace tokens, but what a training job consumes is the
    tokenizer's output): train the 3-round BPE on the corpus
    (text_bpe_train_merges), encode every document with the learned
    merges (the text_bpe_encode distinct-vocab trick — vocab-sized
    work, never a per-char corpus pass), then take documents in
    md5(doc_id) order until the cumulative POST-MERGE SYMBOL count
    reaches the budget. The budget now bites on exactly the quantity
    the dataloader pays for.

    Oracle: the full 3-round training SQL nested as CTEs + the encode
    join + the running sum — the nested-CTE composition pattern, so the
    hash proves train → encode → budget agree end-to-end across
    engines. Shuffle budget: training is ROUNDS × distinct vocabulary
    (text_bpe_train_merges), the encode join broadcasts the vocab, and
    the prefix sum is the two-phase global_prefix_sum (one range
    exchange of (doc_id, n, h) triples) — same scale posture as
    sample_token_budget, with the whitespace estimate replaced by the
    learned tokenizer's true count."""
    from kstreams_spark.operators._util import global_prefix_sum

    d = spread(load_table(spark, sf_dir, "documents"))
    final_v, _ = _bpe_train_rounds(_bpe_vocab(d))
    enc = final_v.select(
        "tok", F.size(F.split("spaced", " ")).cast("long").alias("n_sym")
    )
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per_doc = (
        toks.join(F.broadcast(enc), "tok")
        .groupBy("doc_id")
        .agg(F.sum("n_sym").alias("n_bpe_symbols"))
        .withColumn("h", F.md5(F.col("doc_id").cast("string")))
    )
    run = global_prefix_sum(
        per_doc, [F.col("h"), F.col("doc_id")], "n_bpe_symbols", "cum_bpe"
    )
    return run.filter(F.col("cum_bpe") <= BPE_TOKEN_BUDGET).select(
        "doc_id", "n_bpe_symbols", "cum_bpe"
    )
