"""Keyword postings serving index: the probe must read only the query
terms' bucket partitions (PartitionFilters) and score identically to
the batch search_topk_keywords on the same corpus."""

from __future__ import annotations

from kstreams_spark.io import load_table
from kstreams_spark.operators.text import SEARCH_TERMS, SEARCH_TOP_K
from kstreams_spark.registry import QUERIES, load_all
from kstreams_spark.serving import (
    probe_postings_index,
    tok_bucket_py,
    write_postings_index,
)

load_all()

SF = "/root/testdata/sf0.001"


def test_probe_matches_batch_search(spark, tmp_path):
    path = str(tmp_path / "postings")
    write_postings_index(load_table(spark, SF, "documents"), path)
    probe = probe_postings_index(
        spark, path, SEARCH_TERMS, k=SEARCH_TOP_K
    ).collect()
    batch = QUERIES["search_topk_keywords"](spark, SF).collect()
    assert [(r.doc_id, r.score, r.n_terms_hit) for r in probe] == [
        (r.doc_id, r.score, r.n_terms_hit) for r in batch
    ]


def test_probe_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "postings")
    write_postings_index(load_table(spark, SF, "documents"), path)
    df = probe_postings_index(spark, path, SEARCH_TERMS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the filter names the part column, and the scan reads <= |terms| dirs
    expected = sorted({f"p{tok_bucket_py(t)}" for t in SEARCH_TERMS})
    assert all(p in plan for p in expected), plan[:2000]


def test_bucket_twin_matches_engine(spark):
    from pyspark.sql import functions as F

    from kstreams_spark.serving import _tok_bucket

    toks = ["spark", "window", "scan", "the", "merge", "密"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string").select(
        "tok", _tok_bucket(F.col("tok")).alias("b")
    )
    got = {r.tok: r.b for r in df.collect()}
    assert got == {t: tok_bucket_py(t) for t in toks}
