"""Incremental IVF-SQ8 index maintenance — the quantized-ANN twin of
tests/test_postings_upsert.py: with quantizer and centroids FROZEN at
base build (the train-once contract), an index maintained by
upsert_ivf_sq8_delta probes byte-equal integer scores to one rebuilt
from scratch on the current corpus; revisions that MOVE cells are
hidden from probes of their old cell by targeted tombstones; replays
and compaction never change an answer."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.operators.quantize import sq8_params
from kstreams_spark.serving import (
    compact_ivf_sq8_index,
    probe_ivf_sq8_index,
    upsert_ivf_sq8_delta,
    write_ivf_sq8_index,
)

SF = "/root/testdata/sf0.001"
K = 10


def _probe(spark, path, vec, cents, n_probe):
    return [
        (r.vec_id, r.score_q)
        for r in probe_ivf_sq8_index(
            spark, path, vec, cents, k=K, n_probe=n_probe
        ).collect()
    ]


def _corpus(spark):
    """Base = vec_id%4 != 3; delta = the %4==3 newcomers PLUS re-embedded
    revisions (negated vectors — guaranteed to land in a DIFFERENT cell,
    the case the targeted tombstones exist for) of the %9==0 base vecs."""
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 4 != 3)
    revised = base.filter(F.col("vec_id") % 9 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    delta = emb.filter(F.col("vec_id") % 4 == 3).unionByName(revised)
    current = emb.filter(
        (F.col("vec_id") % 4 == 3)
        | ((F.col("vec_id") % 4 != 3) & (F.col("vec_id") % 9 != 0))
    ).unionByName(revised)
    return base, delta, current


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ivf_sq8_inc")
    inc, rebuilt = str(root / "inc"), str(root / "rebuilt")
    base, delta, current = _corpus(spark)
    cents = [
        [float(x) for x in r.embedding]
        for r in base.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    frozen = sq8_params(base)
    write_ivf_sq8_index(base, inc, cents, params=frozen)
    upsert_ivf_sq8_delta(delta, inc, epoch=1)
    # the twin rebuild uses the SAME frozen quantizer + centroids —
    # refitting is a rebuild by definition (write_ivf_sq8_index docstring)
    write_ivf_sq8_index(current, rebuilt, cents, params=frozen)
    probe_vec = [
        float(x)
        for x in load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 3)
        .first()
        .embedding
    ]
    return inc, rebuilt, cents, probe_vec


@pytest.mark.parametrize("n_probe", [1, 2, 4])
def test_upserted_probes_equal_rebuilt(spark, idx, n_probe):
    inc, rebuilt, cents, vec = idx
    got = _probe(spark, inc, vec, cents, n_probe)
    want = _probe(spark, rebuilt, vec, cents, n_probe)
    assert got == want and len(got) == K


def test_replayed_delta_is_invisible(spark, idx):
    inc, rebuilt, cents, vec = idx
    _, delta, _ = _corpus(spark)
    before = _probe(spark, inc, vec, cents, 4)
    upsert_ivf_sq8_delta(delta, inc, epoch=1)  # crash-rerun, same epoch
    assert _probe(spark, inc, vec, cents, 4) == before


def test_moved_vector_leaves_no_stale_code_in_old_cell(spark, idx):
    """A revised (negated) vector must not be retrievable from its OLD
    cell with its OLD code: the raw old-cell rows for moved vecs resolve
    to nothing."""
    from kstreams_spark.serving import _resolve_live_codes

    inc, _, _, _ = idx
    moved = (
        spark.read.parquet(inc + "/_vecs")
        .groupBy("vec_id")
        .agg(
            F.count_distinct("cen_id").alias("n_cells"),
            F.max_by("cen_id", "epoch").alias("live_cell"),
        )
        .filter(F.col("n_cells") > 1)
        .collect()
    )
    assert moved, "fixture produced no cell-moving revision"
    raw = spark.read.parquet(inc + "/cells")
    for r in moved[:5]:
        old_rows = _resolve_live_codes(
            raw.filter(
                (F.col("vec_id") == r.vec_id)
                & (F.col("cen_id") != r.live_cell)
            )
        )
        assert old_rows.count() == 0, r


def test_compaction_restores_fresh_form_and_answers(spark, idx):
    inc, rebuilt, cents, vec = idx
    before = _probe(spark, inc, vec, cents, 4)
    assert compact_ivf_sq8_index(spark, inc) > 0
    assert _probe(spark, inc, vec, cents, 4) == before
    raw = spark.read.parquet(inc + "/cells")
    assert raw.filter(F.col("q").isNull()).count() == 0
    assert (
        raw.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
    )
    for sub in glob.glob(os.path.join(inc, "cells", "cen_id=*")):
        assert len(glob.glob(os.path.join(sub, "*.parquet"))) == 1, sub
    assert compact_ivf_sq8_index(spark, inc) == 0  # idempotent
    assert _probe(spark, inc, vec, cents, 4) == before


def test_fitted_centroid_composed_path(spark, tmp_path_factory):
    """The documented PRODUCTION path, composed end-to-end (VERDICT r9
    task 4 — every other maintained-index test plants hand-made
    centroids): kmeans_fit on the base corpus → write_ivf_sq8_index with
    the FITTED centroids → upsert a delta → compact → probes byte-equal
    an index rebuilt from the current corpus with the SAME fitted
    centroids and frozen quantizer. Proves fitted (iterated, normalized)
    centroids flow through the freeze/upsert/compact contract exactly
    like planted ones — by construction they are just float lists, and
    this pins that no step re-fits or perturbs them."""
    from kstreams_spark.operators.kmeans import kmeans_fit

    root = tmp_path_factory.mktemp("ivf_sq8_fitted")
    inc, rebuilt = str(root / "inc"), str(root / "rebuilt")
    base, delta, current = _corpus(spark)
    cents = kmeans_fit(base, k=8, iters=2)  # the real fit, not a plant
    frozen = sq8_params(base)
    write_ivf_sq8_index(base, inc, cents, params=frozen)
    upsert_ivf_sq8_delta(delta, inc, epoch=1)
    assert compact_ivf_sq8_index(spark, inc) > 0
    write_ivf_sq8_index(current, rebuilt, cents, params=frozen)
    vec = [
        float(x)
        for x in load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 3)
        .first()
        .embedding
    ]
    for n_probe in (1, 3):
        got = _probe(spark, inc, vec, cents, n_probe)
        assert got == _probe(spark, rebuilt, vec, cents, n_probe)
        assert len(got) == K
    # the sidecar carries the fitted centroids verbatim (what the
    # maintainer's probe() reads back)
    stored = [
        [float(x) for x in r.cvec]
        for r in spark.read.parquet(inc + "/_centroids")
        .orderBy("cen_id")
        .collect()
    ]
    assert stored == [[float(x) for x in c] for c in cents]
