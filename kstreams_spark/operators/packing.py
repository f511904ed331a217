"""Corpus → training/serving units: sequence packing and chunk windows.

Two reshaping stages every LLM data pipeline runs after curation:

- SEQUENCE PACKING (the GPT-style concat-and-chunk dataloader): docs are
  concatenated in a deterministic order and sliced into fixed
  context-length sequences; the output manifest says which token span of
  which doc lands in which training sequence. Producing the manifest —
  rather than materializing packed token arrays — is the Spark-shaped
  form: it's a pure integer computation over (doc_id, n_tokens), and the
  actual token movement happens at read time partition-locally.

- CHUNK WINDOWS (the RAG/embedding indexer): overlapping fixed-stride
  token windows per document, the unit an embedding model consumes.

Scale posture (100 TB):
- Packing is SHARDED (per-lang here; any shard key): the running-offset
  window partitions and parallelizes, the same rewrite
  sample_token_budget_sharded applies to the global token budget. Chunk
  ids are per-shard; a training run enumerates (shard, chunk_id) pairs.
  Cost: one token-count scan + one partitioned window + a bounded
  explode (≤ spans-per-doc rows, each doc emits ≤ 1 + n/CTX rows).
- Chunk windows are scan-shaped: explode over a per-doc sequence,
  no shuffle at all.
- All arithmetic is integer; the only division is floor(int/int) via
  double, exact far past any real corpus size (< 2^53).

Reference parity note: the reference app (BME680.java) has no analytics
surface; this is part of the LLM-training-data extension the brief
mandates (SURVEY.md §2.3 north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators._util import spread
from kstreams_spark.registry import query

CTX_LEN = 128  # tokens per packed training sequence (fixture-scale)
WIN_TOKENS = 32  # chunk window width
WIN_STRIDE = 24  # chunk window stride (8-token overlap)


def _fdiv(a, b: int):
    """floor(a / b) for non-negative ints, portable (double exact <2^53)."""
    return F.floor(a / F.lit(float(b))).cast("long")


def pack_sequences(
    docs: DataFrame, ctx_len: int = CTX_LEN, shard_col: str = "lang"
) -> DataFrame:
    """(doc_id, text, shard) → packing manifest rows
    (shard, chunk_id, doc_id, doc_off, chunk_off, n_span):
    tokens [doc_off, doc_off+n_span) of doc_id occupy positions
    [chunk_off, chunk_off+n_span) of training sequence chunk_id in its
    shard. Docs are ordered by (md5(doc_id), doc_id) within the shard —
    the same deterministic-permutation idiom as sample_token_budget."""
    return manifest_from_offsets(shard_offsets(docs, shard_col), ctx_len)


def shard_offsets(
    docs: DataFrame, shard_col: str = "lang", base: DataFrame | None = None
) -> DataFrame:
    """(doc_id, text, <shard_col>) → (shard, doc_id, n, off): per-shard
    exclusive running token offsets in (md5(doc_id), doc_id) order — the
    deterministic-permutation idiom. `base` (a small (shard, base) frame)
    shifts every shard's offsets, which is how the STREAMING packer
    (streaming/packing.py) continues exactly where the previous
    microbatch left off; batch and streaming share this one definition,
    so the ordering key and window frame cannot drift apart."""
    toks = docs.select(
        F.col(shard_col).alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    if base is not None:
        toks = toks.join(F.broadcast(base), "shard", "left")
        base_off = F.coalesce(F.col("base"), F.lit(0))
    else:
        base_off = F.lit(0)
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return toks.select(
        "shard",
        "doc_id",
        "n",
        (base_off + F.coalesce(F.sum("n").over(w), F.lit(0))).alias("off"),
    )


def manifest_from_offsets(off: DataFrame, ctx_len: int = CTX_LEN) -> DataFrame:
    """(shard, doc_id, n, off) → manifest rows. Shared by the batch
    packer above and the streaming packer (streaming/packing.py), which
    injects per-shard BASE offsets carried across microbatches."""
    spans = off.select(
        "shard",
        "doc_id",
        "n",
        "off",
        F.explode(
            F.sequence(
                _fdiv(F.col("off"), ctx_len),
                _fdiv(F.col("off") + F.col("n") - 1, ctx_len),
            )
        ).alias("chunk_id"),
    )
    chunk_start = F.col("chunk_id") * ctx_len
    tok_start = F.greatest(F.col("off"), chunk_start)
    tok_end = F.least(F.col("off") + F.col("n"), chunk_start + ctx_len)
    return spans.select(
        "shard",
        "chunk_id",
        "doc_id",
        (tok_start - F.col("off")).alias("doc_off"),
        (tok_start - chunk_start).alias("chunk_off"),
        (tok_end - tok_start).alias("n_span"),
    )


@query(
    "sample_sequence_pack",
    oracle=f"""
    WITH toks AS (
      SELECT lang AS shard, doc_id,
             len(str_split(text, ' '))::BIGINT AS n,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    offs AS (
      SELECT shard, doc_id, n,
             COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY h, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0) AS off
      FROM toks
    ),
    spans AS (
      SELECT shard, doc_id, n, off,
             unnest(generate_series(
               CAST(floor(off / {CTX_LEN}.0) AS BIGINT),
               CAST(floor((off + n - 1) / {CTX_LEN}.0) AS BIGINT)
             )) AS chunk_id
      FROM offs
    )
    SELECT shard, chunk_id, doc_id,
           (GREATEST(off, chunk_id * {CTX_LEN}) - off)::BIGINT AS doc_off,
           (GREATEST(off, chunk_id * {CTX_LEN}) - chunk_id * {CTX_LEN})::BIGINT
             AS chunk_off,
           (LEAST(off + n, chunk_id * {CTX_LEN} + {CTX_LEN})
             - GREATEST(off, chunk_id * {CTX_LEN}))::BIGINT AS n_span
    FROM spans
    """,
)
def sample_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing manifest over documents, sharded by lang
    at CTX_LEN={CTX_LEN} tokens. Every token of every doc lands in
    exactly one (chunk_id, chunk_off) slot; chunk token counts sum to
    CTX_LEN except each shard's final chunk (invariants pinned in
    tests/test_packing.py)."""
    return pack_sequences(load_table(spark, sf_dir, "documents"))


def chunk_windows(
    docs: DataFrame, width: int = WIN_TOKENS, stride: int = WIN_STRIDE
) -> DataFrame:
    """(doc_id, text) → overlapping token windows
    (doc_id, win_id, start_tok, n_tok, chunk_text): win_id·stride is the
    window start; the last window is the first one reaching the doc tail
    (num windows = 1 + ceil(max(0, n-width)/stride)), so every token is
    covered and no fully-redundant trailing window is emitted."""
    # project the token array ONCE (dedup._shingles' convention) and
    # derive everything — n, window count, slice bounds — from it
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("l")
    ).withColumn("n", F.size("l").cast("long"))
    n_win = 1 + _fdiv(
        F.greatest(F.col("n") - width, F.lit(0)) + (stride - 1), stride
    )
    wins = toks.select(
        "doc_id",
        "l",
        "n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_win - 1)).alias(
            "win_id"
        ),
    )
    start = (F.col("win_id") * stride).alias("start_tok")
    n_tok = F.least(
        F.lit(width).cast("long"), F.col("n") - F.col("win_id") * stride
    ).alias("n_tok")
    return wins.select("doc_id", "win_id", start, n_tok, "l").select(
        "doc_id",
        "win_id",
        "start_tok",
        "n_tok",
        F.expr(
            "concat_ws(' ', slice(l, CAST(start_tok AS INT) + 1,"
            " CAST(n_tok AS INT)))"
        ).alias("chunk_text"),
    )


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, str_split(text, ' ') AS l,
             len(str_split(text, ' '))::BIGINT AS n
      FROM documents
    ),
    wins AS (
      SELECT doc_id, l, n,
             unnest(generate_series(0,
               CAST(floor((GREATEST(n - {WIN_TOKENS}, 0) + {WIN_STRIDE - 1})
                          / {WIN_STRIDE}.0) AS BIGINT)
             )) AS win_id
      FROM toks
    )
    SELECT doc_id, win_id,
           win_id * {WIN_STRIDE} AS start_tok,
           LEAST({WIN_TOKENS}, n - win_id * {WIN_STRIDE}) AS n_tok,
           array_to_string(
             l[win_id * {WIN_STRIDE} + 1 :
               win_id * {WIN_STRIDE} + LEAST({WIN_TOKENS},
                                             n - win_id * {WIN_STRIDE})],
             ' ') AS chunk_text
    FROM wins
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping {WIN_TOKENS}-token windows at stride {WIN_STRIDE}
    over documents — the embedding-indexer unit. Scan-shaped: per-doc
    sequence explode, zero shuffles."""
    return chunk_windows(load_table(spark, sf_dir, "documents"))


@query(
    "sample_pack_efficiency",
    oracle=f"""
    WITH toks AS (
      SELECT lang AS shard, doc_id,
             len(str_split(text, ' '))::BIGINT AS n,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    offs AS (
      SELECT shard, doc_id, n,
             COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY h, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0) AS off
      FROM toks
    ),
    spans AS (
      SELECT shard, doc_id, n, off,
             unnest(generate_series(
               CAST(floor(off / {CTX_LEN}.0) AS BIGINT),
               CAST(floor((off + n - 1) / {CTX_LEN}.0) AS BIGINT)
             )) AS chunk_id
      FROM offs
    ),
    chunks AS (
      SELECT shard, chunk_id,
             SUM(LEAST(off + n, chunk_id * {CTX_LEN} + {CTX_LEN})
                 - GREATEST(off, chunk_id * {CTX_LEN}))::BIGINT AS fill,
             COUNT(*)::BIGINT AS n_docs_in_chunk
      FROM spans GROUP BY shard, chunk_id
    )
    SELECT shard,
           COUNT(*)::BIGINT AS n_chunks,
           SUM(CASE WHEN fill = {CTX_LEN} THEN 1 ELSE 0 END)::BIGINT
             AS n_full,
           SUM(fill)::BIGINT AS total_tokens,
           (COUNT(*) * {CTX_LEN} - SUM(fill))::BIGINT AS padding_waste,
           MAX(n_docs_in_chunk)::BIGINT AS max_docs_per_chunk
    FROM chunks GROUP BY shard
    """,
)
def sample_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over the sequence-pack manifest — the
    metric packing exists to optimize, measured: per shard the chunk
    count, full-chunk count, packed tokens, PADDING WASTE (tokens the
    dataloader pads because the shard's last chunk is partial — with
    concat-and-chunk this is at most CTX_LEN−1 per shard, the report's
    checkable guarantee), and the max docs crossing one training
    sequence (attention-mask fragmentation). Re-aggregates the same
    manifest sample_sequence_pack emits; one extra groupBy pair on the
    already-partitioned (shard, chunk_id) keys."""
    m = pack_sequences(load_table(spark, sf_dir, "documents"))
    chunks = m.groupBy("shard", "chunk_id").agg(
        F.sum("n_span").cast("long").alias("fill"),
        F.count(F.lit(1)).cast("long").alias("n_docs_in_chunk"),
    )
    return chunks.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("fill") == CTX_LEN, 1).otherwise(0))
        .cast("long")
        .alias("n_full"),
        F.sum("fill").cast("long").alias("total_tokens"),
        (F.count(F.lit(1)) * CTX_LEN - F.sum("fill"))
        .cast("long")
        .alias("padding_waste"),
        F.max("n_docs_in_chunk").cast("long").alias("max_docs_per_chunk"),
    )


EPOCH_MANIFEST_EPOCHS = 2
EPOCH_MANIFEST_HEAD = 10


def _epoch_manifest_oracle() -> str:
    """Composes the registered packing oracle as a derived table
    (nested WITH) and ranks its distinct chunks per (epoch, shard)."""
    from kstreams_spark.registry import ORACLES

    pack = ORACLES["sample_sequence_pack"]
    return f"""
    WITH chunks AS (
      SELECT DISTINCT shard, chunk_id FROM ({pack}) t
    ),
    e AS (SELECT unnest(generate_series(0, {EPOCH_MANIFEST_EPOCHS - 1}))
            AS epoch),
    r AS (
      SELECT e.epoch, c.shard, c.chunk_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.epoch, c.shard
               ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':'
                            || CAST(c.chunk_id AS VARCHAR)), c.chunk_id
             ) AS seq_pos
      FROM chunks c, e
    )
    SELECT epoch::BIGINT AS epoch, shard, seq_pos::BIGINT AS seq_pos,
           chunk_id
    FROM r WHERE seq_pos <= {EPOCH_MANIFEST_HEAD}
    """


@query("composite_dataloader_epoch", oracle=_epoch_manifest_oracle())
def composite_dataloader_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The artifact a training run actually consumes, composed from two
    registered pieces: the packing manifest's fixed-CTX_LEN training
    sequences (sample_sequence_pack), ordered per epoch by the
    deterministic md5(epoch:chunk) permutation (sample_epoch_shuffle's
    idiom at CHUNK grain — shuffling packed sequences, not documents, is
    what preserves intra-sequence token contiguity). Registered demo:
    the first {EPOCH_MANIFEST_HEAD} sequence positions of each
    (epoch, shard) for {EPOCH_MANIFEST_EPOCHS} epochs; the oracle
    composes the packing oracle as a derived table and replays the
    ranking, so the hash certifies the whole chain.

    Scale: chunks-per-shard rank windows are (epoch, shard)-partitioned;
    a production loader sorts each shard's chunk list by the same key at
    plan time instead of ranking (sample_epoch_shuffle's docstring)."""
    chunks = (
        pack_sequences(
            spread(load_table(spark, sf_dir, "documents"))
        )
        .select("shard", "chunk_id")
        .distinct()
    )
    epochs = (
        chunks.sparkSession.range(EPOCH_MANIFEST_EPOCHS)
        .select(F.col("id").alias("epoch"))
    )
    keyed = chunks.crossJoin(F.broadcast(epochs))
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("chunk_id").cast("string"),
            )
        ),
        "chunk_id",
    )
    return (
        keyed.withColumn("seq_pos", F.row_number().over(w).cast("long"))
        .filter(F.col("seq_pos") <= EPOCH_MANIFEST_HEAD)
        .select("epoch", "shard", "seq_pos", "chunk_id")
    )


REHEARSAL_EPOCHS = 2
REHEARSAL_BATCH = 8  # packed sequences per training batch


def _training_rehearsal_oracle() -> str:
    """Composes the packing oracle as a derived table, replays the
    md5(epoch:chunk) permutation, buckets sequence positions into
    batches, and joins back to the manifest for the per-batch read
    plan — the whole chain in one certified hash."""
    from kstreams_spark.registry import ORACLES

    pack = ORACLES["sample_sequence_pack"]
    return f"""
    WITH m AS ({pack}),
    chunks AS (SELECT DISTINCT shard, chunk_id FROM m),
    e AS (SELECT unnest(generate_series(0, {REHEARSAL_EPOCHS - 1}))
            AS epoch),
    r AS (
      SELECT e.epoch, c.shard, c.chunk_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.epoch, c.shard
               ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':'
                            || CAST(c.chunk_id AS VARCHAR)), c.chunk_id
             ) AS seq_pos
      FROM chunks c, e
    ),
    b AS (
      SELECT epoch, shard, chunk_id,
             (seq_pos - 1) // {REHEARSAL_BATCH} AS batch_id
      FROM r
    )
    SELECT b.epoch::BIGINT AS epoch, b.shard,
           b.batch_id::BIGINT AS batch_id,
           COUNT(DISTINCT b.chunk_id)::BIGINT AS n_seqs,
           COUNT(*)::BIGINT AS n_reads,
           COUNT(DISTINCT m.doc_id)::BIGINT AS n_docs,
           SUM(m.n_span)::BIGINT AS n_tokens
    FROM b JOIN m USING (shard, chunk_id)
    GROUP BY b.epoch, b.shard, b.batch_id
    """


@query("composite_training_rehearsal", oracle=_training_rehearsal_oracle())
def composite_training_rehearsal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-run rehearsal capstone (VERDICT r7 task 8): the full
    artifact chain a run consumes — packing MANIFEST
    (sample_sequence_pack) → deterministic EPOCH ORDER (the
    md5(epoch:chunk) permutation of composite_dataloader_epoch /
    sample_epoch_shuffle) → BATCHED READS: consecutive sequence
    positions bucket into training batches of {REHEARSAL_BATCH}, and
    the join back to the manifest enumerates exactly which doc spans
    each batch fetches. Output is the per-(epoch, shard, batch) I/O
    plan: sequences, manifest-row reads, distinct docs touched, tokens
    moved. The oracle replays the entire chain (packing oracle as a
    derived table), so the hash certifies manifest, permutation,
    batching, and read fan-out together.

    tests/test_training_rehearsal.py then EXECUTES one batch: fetches
    its doc spans from a doc_id-bucketed store with partition pruning
    (the serving-layout idiom) and reassembles full CTX_LEN={CTX_LEN}
    sequences — proving the plan is executable, not just counted.

    Scale: rank windows are (epoch, shard)-partitioned; the manifest
    join is an equi-join on (shard, chunk_id); batch grain output is
    chunks/{REHEARSAL_BATCH} rows per shard·epoch. All integers."""
    m = pack_sequences(spread(load_table(spark, sf_dir, "documents")))
    chunks = m.select("shard", "chunk_id").distinct()
    epochs = (
        chunks.sparkSession.range(REHEARSAL_EPOCHS)
        .select(F.col("id").alias("epoch"))
    )
    keyed = chunks.crossJoin(F.broadcast(epochs))
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("chunk_id").cast("string"),
            )
        ),
        "chunk_id",
    )
    seq = keyed.withColumn("seq_pos", F.row_number().over(w)).withColumn(
        "batch_id", F.expr(f"(seq_pos - 1) DIV {REHEARSAL_BATCH}")
    )
    reads = seq.select("epoch", "shard", "batch_id", "chunk_id").join(
        m, ["shard", "chunk_id"]
    )
    return reads.groupBy("epoch", "shard", "batch_id").agg(
        F.countDistinct("chunk_id").cast("long").alias("n_seqs"),
        F.count(F.lit(1)).cast("long").alias("n_reads"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("n_span").cast("long").alias("n_tokens"),
    )


PASSAGE_TOP_K = 20


def _passage_oracle() -> str:
    """Composes the chunk-windows oracle as a derived table, scores each
    window by query-term occurrences, elects the best window per doc,
    and takes the global top passages."""
    from kstreams_spark.operators.text import SEARCH_TERMS
    from kstreams_spark.registry import ORACLES

    wins = ORACLES["text_chunk_windows"]
    terms = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    return f"""
    WITH w AS ({wins}),
    scored AS (
      SELECT doc_id, win_id, chunk_text,
             len(list_filter(str_split(chunk_text, ' '),
                             x -> x IN ({terms})))::BIGINT AS score
      FROM w
    ),
    best AS (
      SELECT doc_id, win_id, chunk_text, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, win_id) AS rn
      FROM scored WHERE score > 0
    )
    SELECT doc_id, win_id, score, chunk_text AS passage, rank FROM (
      SELECT doc_id, win_id, score, chunk_text,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM best WHERE rn = 1
    ) WHERE rank <= {PASSAGE_TOP_K}
    """


@query("search_best_passages", oracle=_passage_oracle())
def search_best_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage retrieval — the RAG step AFTER document ranking: within
    each document, elect the best fixed-width token window for the
    query (score = query-term occurrences in the window, the
    chunk-windows grid text_chunk_windows defines — windows overlap by
    stride, so a term cluster straddling a boundary still gets a
    window that contains it), then return the global top
    {PASSAGE_TOP_K} passages with their text. Document-level retrieval
    (search_topk_keywords / the hybrid RRF) says WHICH docs; this says
    WHERE IN THEM to read — the snippet a RAG prompt actually embeds.

    Scale: window scoring is scan-shaped (the chunk explode + one
    filter-count per window, no shuffle); the per-doc election
    partitions by doc_id; the global top-k is row_number + rank ≤ K —
    the TakeOrderedAndProject rewrite class. At serving scale the doc
    set entering this operator is the (tiny) retrieval output, not the
    corpus; the oracle composes the registered chunk-windows oracle so
    the grid cannot drift from the indexer's."""
    from kstreams_spark.operators.text import SEARCH_TERMS

    d = spread(load_table(spark, sf_dir, "documents"))
    w = chunk_windows(d)
    terms = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    scored = w.select(
        "doc_id",
        "win_id",
        "chunk_text",
        F.expr(
            f"CAST(size(filter(split(chunk_text, ' '), "
            f"x -> x IN ({terms}))) AS BIGINT)"
        ).alias("score"),
    ).filter(F.col("score") > 0)
    wd = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "win_id")
    best = scored.withColumn("rn", F.row_number().over(wd)).filter(
        F.col("rn") == 1
    )
    wg = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        best.withColumn("rank", F.row_number().over(wg))
        .filter(F.col("rank") <= PASSAGE_TOP_K)
        .select(
            "doc_id",
            "win_id",
            "score",
            F.col("chunk_text").alias("passage"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _rag_context_oracle() -> str:
    """Composes the registered keyword-retrieval oracle AND the
    chunk-windows oracle: the full doc-rank → passage-elect chain in
    one certified hash."""
    from kstreams_spark.operators.text import SEARCH_TERMS
    from kstreams_spark.registry import ORACLES

    topdocs = ORACLES["search_topk_keywords"]
    wins = ORACLES["text_chunk_windows"]
    terms = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    return f"""
    WITH topdocs AS ({topdocs}),
    ranked_docs AS (
      SELECT doc_id, score AS doc_score, n_terms_hit,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
               AS retrieval_rank
      FROM topdocs
    ),
    w AS ({wins}),
    scored AS (
      SELECT w.doc_id, w.win_id, w.chunk_text,
             len(list_filter(str_split(w.chunk_text, ' '),
                             x -> x IN ({terms})))::BIGINT AS passage_score
      FROM w JOIN ranked_docs rd ON rd.doc_id = w.doc_id
    ),
    best AS (
      SELECT doc_id, win_id, chunk_text, passage_score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY passage_score DESC, win_id) AS rn
      FROM scored
    )
    SELECT rd.retrieval_rank::BIGINT AS retrieval_rank, rd.doc_id,
           rd.doc_score, rd.n_terms_hit,
           b.win_id, b.passage_score, b.chunk_text AS passage
    FROM ranked_docs rd JOIN best b
      ON b.doc_id = rd.doc_id AND b.rn = 1
    """


@query("composite_rag_context", oracle=_rag_context_oracle())
def composite_rag_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly — the serving chain end-to-end in one plan:
    keyword retrieval ranks the documents (search_topk_keywords, the
    postings-index shape), then WITHIN each retrieved doc the best
    passage for the same query is elected (the chunk-windows grid), and
    the output is exactly what a RAG prompt builder consumes: one row
    per retrieved doc with its retrieval rank, doc score, and the
    passage text to embed. Both stages share the query terms, so the
    passage always contains the evidence the ranker scored. The oracle
    nests BOTH registered oracles — retrieval and grid — one hash for
    the whole chain.

    Scale: passage scoring runs only over the top-k docs' windows (the
    join against the ≤k retrieval output prunes the grid before any
    scoring — at serving scale the windows come from the pruned doc
    fetch, the training-rehearsal read path); elections partition by
    doc_id; no global window anywhere (retrieval_rank orders ≤k rows)."""
    from kstreams_spark.operators.text import SEARCH_TERMS
    from kstreams_spark.registry import QUERIES

    topdocs = QUERIES["search_topk_keywords"](spark, sf_dir)
    ranked_docs = (
        topdocs.select(
            F.col("doc_id"),
            F.col("score").alias("doc_score"),
            "n_terms_hit",
        )
        .withColumn(
            "retrieval_rank",
            F.row_number()
            .over(Window.orderBy(F.col("doc_score").desc(), "doc_id"))
            .cast("long"),
        )
        # r15 (guide §2.4/§5): ranked_docs feeds the prune join AND the
        # final join — without the cut the entire keyword-retrieval
        # subtree (scan, explode, two aggs) ran twice. ≤k rows.
        .localCheckpoint(eager=False)
    )
    d = spread(load_table(spark, sf_dir, "documents"))
    # r15: prune the CORPUS to the ≤k retrieved docs BEFORE windowing —
    # chunk_windows is strictly per-doc, so joining first is equivalent
    # and the explode+passage-scoring grid runs over k docs, not the
    # whole corpus (guide §2.3: project/filter before the heavy stage).
    w = chunk_windows(
        d.join(F.broadcast(ranked_docs.select("doc_id")), "doc_id")
    )
    terms = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    scored = w.select(
        "doc_id",
        "win_id",
        "chunk_text",
        F.expr(
            f"CAST(size(filter(split(chunk_text, ' '), "
            f"x -> x IN ({terms}))) AS BIGINT)"
        ).alias("passage_score"),
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("passage_score").desc(), "win_id"
    )
    best = scored.withColumn("rn", F.row_number().over(wd)).filter(
        F.col("rn") == 1
    )
    return ranked_docs.join(best, "doc_id").select(
        "retrieval_rank",
        "doc_id",
        "doc_score",
        "n_terms_hit",
        "win_id",
        "passage_score",
        F.col("chunk_text").alias("passage"),
    )
