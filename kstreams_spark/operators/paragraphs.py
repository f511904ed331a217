"""Paragraph-grain deduplication (VERDICT r5 next-round #2): the
C4/RefinedWeb recipe dedups repeated paragraphs/lines ACROSS documents,
not just whole documents — a boilerplate paragraph (nav text, license
header) appearing in a million docs survives whole-doc dedup untouched.

Reference parity note: the reference app (BME680.java) has no analytics
surface; this module is part of the LLM-training-data extension the brief
mandates (SURVEY.md §2.3 north-star ops).

Paragraph segmentation: real corpora split on newlines; the fixture
corpus is single-line token streams, so the registered queries segment
into fixed PARA_TOKENS-token chunks — the fixture-facing stand-in that
keeps every downstream mechanism (global winner election, reassembly,
near-dup at paragraph grain) identical to the newline form. A caller
with newline text passes its own (doc_id, pos, para) rows.

Scale posture:
- exact: ONE shuffle on md5(para) (row_number window elects the global
  winner — min (doc_id, pos) — without a big-big join), one groupBy
  doc_id to reassemble, one doc_id-aligned join against the scan-shaped
  totals. Paragraph text crosses the wire once per stage; at 100 TB the
  winner election could shuffle (hash, doc_id, pos) only and re-join,
  but paragraphs ARE the payload being reassembled, so they travel.
- near-dup: the whole-doc MinHash propose → exact-Jaccard verify →
  connected-components chain (dedup.py) applied verbatim at paragraph
  grain via synthetic para_id = doc_id·PARA_ID_STRIDE + pos. Same
  candidate-scoped guarantees: band equi-join proposes, verifier only
  scores candidates, CC runs on the pair graph (batch-sized).

Determinism: winner election is a total order (doc_id, pos); reassembly
sorts collected (pos, para) structs; paragraph hashes are md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.operators.dedup import (
    _cluster_labels_cte,
    ngram_jaccard_pairs,
    resolve_clusters,
)
from kstreams_spark.registry import query

PARA_TOKENS = 20
# para_id = doc_id * STRIDE + pos. Fixture docs are ≤ ~500 chars → far
# under 1024 paragraphs; a corpus with longer docs raises the stride.
PARA_ID_STRIDE = 1024


def paragraph_rows(docs: DataFrame, k: int = PARA_TOKENS) -> DataFrame:
    """(doc_id, text) → (doc_id, pos, para): fixed k-token chunks in
    order. Pure array expressions (transform/slice) — scan-shaped, no
    shuffle, no Python."""
    toks = F.split(F.col("text"), " ")
    chunks = F.expr(
        f"transform(sequence(0, cast(ceil(size(toks)/{k}.0) as int) - 1), "
        f"i -> concat_ws(' ', slice(toks, i*{k}+1, {k})))"
    )
    return docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.posexplode(chunks).alias("pos", "para")
    )


def _paras_cte(k: int = PARA_TOKENS, src: str = "documents") -> str:
    """DuckDB twin of paragraph_rows: zipped unnest of (pos, chunk)."""
    n = f"CAST(ceil(len(toks)/{k}.0) AS INT) - 1"
    return f"""paras AS (
      SELECT doc_id,
             unnest(generate_series(0, {n})) AS pos,
             unnest(list_transform(generate_series(0, {n}),
                    i -> array_to_string(toks[i*{k}+1:i*{k}+{k}], ' '))) AS para
      FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM {src})
    )"""


def reassemble(paras_kept: DataFrame, totals: DataFrame) -> DataFrame:
    """Surviving (doc_id, pos, para) rows → per-doc (doc_id, n_paras,
    n_kept, text_kept); docs that lost every paragraph keep a row with
    n_kept = 0 and empty text (LEFT join against the totals scan)."""
    kept_agg = paras_kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, para))), "
            "x -> x.para), ' ')"
        ).alias("text_kept"),
    )
    return totals.join(kept_agg, "doc_id", "left").select(
        "doc_id",
        "n_paras",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("text_kept", F.lit("")).alias("text_kept"),
    )


def _totals(docs: DataFrame, k: int = PARA_TOKENS) -> DataFrame:
    return docs.select(
        "doc_id",
        F.ceil(F.size(F.split(F.col("text"), " ")) / F.lit(float(k)))
        .cast("bigint")
        .alias("n_paras"),
    )


_REASSEMBLE_SQL = """
    kept_agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             array_to_string(list_transform(
               list_sort(list(struct_pack(pos := pos, para := para))),
               x -> x.para), ' ') AS text_kept
      FROM kept GROUP BY doc_id
    ),
    totals AS (
      SELECT doc_id,
             CAST(ceil(len(str_split(text, ' '))/{k}.0) AS BIGINT) AS n_paras
      FROM documents
    )
    SELECT t.doc_id, t.n_paras,
           COALESCE(a.n_kept, 0) AS n_kept,
           COALESCE(a.text_kept, '') AS text_kept
    FROM totals t LEFT JOIN kept_agg a USING (doc_id)
"""


@query(
    "dedup_paragraph_exact",
    oracle=f"""
    WITH {_paras_cte()},
    ranked AS (
      SELECT doc_id, pos, para,
             ROW_NUMBER() OVER (PARTITION BY md5(para)
                                ORDER BY doc_id, pos) AS rn
      FROM paras
    ),
    kept AS (SELECT doc_id, pos, para FROM ranked WHERE rn = 1),
    {_REASSEMBLE_SQL.format(k=PARA_TOKENS)}
    """,
)
def dedup_paragraph_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact paragraph dedup: a paragraph (by md5) keeps
    only its global first occurrence — min (doc_id, pos) — everywhere
    else it is dropped; per-doc output is the reassembled surviving text.
    One window shuffle elects winners, one groupBy reassembles (see
    module docstring for the 100 TB budget)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    paras = paragraph_rows(d)
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "pos")
    kept = (
        paras.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return reassemble(kept, _totals(d))


def _para_neardup_sql() -> str:
    return f"""
    WITH RECURSIVE {_paras_cte()},
    paras2 AS (
      SELECT doc_id * {PARA_ID_STRIDE} + pos AS doc_id, para AS text
      FROM paras
    ),
    {_cluster_labels_cte("paras2")},
    losers AS (SELECT doc_id AS para_id FROM labels WHERE doc_id <> keep_id),
    kept AS (
      SELECT p.doc_id, p.pos, p.para
      FROM paras p
      LEFT JOIN losers l ON p.doc_id * {PARA_ID_STRIDE} + p.pos = l.para_id
      WHERE l.para_id IS NULL
    ),
    {_REASSEMBLE_SQL.format(k=PARA_TOKENS)}
    """


@query("dedup_paragraph_neardup", oracle=_para_neardup_sql())
def dedup_paragraph_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup paragraph dedup: the full whole-doc chain — MinHash bands
    propose, exact 3-gram Jaccard ≥ 0.5 verifies, connected components
    resolve, min para_id survives — run at paragraph grain (para_id =
    doc_id·{PARA_ID_STRIDE}+pos), then per-doc reassembly. Exact dups are
    the Jaccard=1 special case, so this subsumes dedup_paragraph_exact
    with a looser match. The oracle replays every stage, transitive
    closure included (WITH RECURSIVE)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    paras = paragraph_rows(d)
    pid = (F.col("doc_id") * PARA_ID_STRIDE + F.col("pos")).alias("doc_id")
    pdocs = paras.select(pid, F.col("para").alias("text"))
    losers = (
        resolve_clusters(ngram_jaccard_pairs(pdocs))
        .filter(~F.col("is_kept"))
        .select(F.col("doc_id").alias("para_id"))
    )
    kept = paras.join(
        losers,
        paras.doc_id * PARA_ID_STRIDE + paras.pos == losers.para_id,
        "left_anti",
    )
    return reassemble(kept, _totals(d))


# --- boilerplate removal (CCNet / RefinedWeb recipe) ----------------------
# Dedup keeps ONE winner occurrence of a repeated paragraph; boilerplate
# removal drops EVERY occurrence once a paragraph appears in enough
# distinct documents (nav bars, cookie banners, license headers) — the
# two ops are complementary passes over the same segmentation. Threshold
# expressed in DOCUMENTS (not occurrences) so one spammy doc repeating
# its own footer can't promote that footer to corpus boilerplate.
BOILER_MIN_DOCS = 3


@query(
    "text_boilerplate_top",
    oracle=f"""
    WITH {_paras_cte()},
    freq AS (
      SELECT md5(para) AS h, MIN(para) AS para,
             COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
      FROM paras GROUP BY md5(para)
    )
    SELECT h, para, n_docs, n_occurrences
    FROM freq WHERE n_docs >= {BOILER_MIN_DOCS}
    ORDER BY n_docs DESC, n_occurrences DESC, h
    LIMIT 20
    """,
)
def text_boilerplate_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate AUDIT a curator reads before rewriting: the most
    document-spanning repeated paragraphs with doc and occurrence
    counts. Shuffle budget: one groupBy on md5(para) (16-byte keys +
    one para payload via MIN), then TakeOrderedAndProject — the LIMIT
    has a total order (n_docs, n_occurrences, h)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    freq = (
        paragraph_rows(d)
        .groupBy(F.md5("para").alias("h"))
        .agg(
            F.min("para").alias("para"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= BOILER_MIN_DOCS)
    )
    return freq.orderBy(
        F.col("n_docs").desc(), F.col("n_occurrences").desc(), "h"
    ).limit(20)


@query(
    "text_boilerplate_rewrite",
    oracle=f"""
    WITH {_paras_cte()},
    freq AS (
      SELECT md5(para) AS h, COUNT(DISTINCT doc_id) AS n_docs
      FROM paras GROUP BY md5(para)
    ),
    kept AS (
      SELECT p.doc_id, p.pos, p.para
      FROM paras p JOIN freq f ON md5(p.para) = f.h
      WHERE f.n_docs < {BOILER_MIN_DOCS}
    ),
    {_REASSEMBLE_SQL.format(k=PARA_TOKENS)}
    """,
)
def text_boilerplate_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate REMOVAL: any paragraph appearing in >= BOILER_MIN_DOCS
    distinct documents is dropped from every document (no winner — that
    is dedup_paragraph_exact's job for legitimate content); per-doc
    output is the reassembled cleaned text, and a doc that was pure
    boilerplate keeps an empty row. Shuffle budget: the md5(para)
    frequency groupBy (hash + counts only), one hash-equi join back
    (boilerplate sets can reach 10^7 hashes at corpus scale, so the join
    stays a shuffle hash join rather than assuming broadcastability),
    one reassembly groupBy."""
    d = spread(load_table(spark, sf_dir, "documents"))
    paras = paragraph_rows(d)
    freq = paras.groupBy(F.md5("para").alias("h")).agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    kept = (
        paras.join(freq, F.md5(paras.para) == freq.h)
        .filter(F.col("n_docs") < BOILER_MIN_DOCS)
        .select("doc_id", "pos", "para")
    )
    return reassemble(kept, _totals(d))
