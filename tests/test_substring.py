"""Exact repeated-substring dedup semantics (operators/substring.py):
duplicated n-token windows cover the repeated spans; coverage merges
overlaps; the rewrite keeps exactly one canonical occurrence corpus-wide
and vaporizes exact-duplicate docs."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kstreams_spark.operators.substring import (
    SPAN_N,
    duplicated_starts,
    positional_shingles,
)

# Distinct-token vocabulary so windows collide only where planted.
SPAN = " ".join(f"s{i}" for i in range(SPAN_N))  # exactly one n-window
UA = " ".join(f"a{i}" for i in range(12))
UB = " ".join(f"b{i}" for i in range(12))


def _spans(spark, rows):
    from kstreams_spark.operators import substring as m

    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    dup = duplicated_starts(docs, SPAN_N)
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = dup.select(
        "doc_id",
        "pos",
        F.least(
            F.lit(SPAN_N),
            F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(SPAN_N)),
        ).alias("covered"),
    )
    return {
        r.doc_id: r
        for r in cov.groupBy("doc_id")
        .agg(F.sum("covered").alias("covered_tokens"))
        .collect()
    }


def test_positional_shingles_positions_and_count(spark):
    docs = spark.createDataFrame([(1, UA)], ["doc_id", "text"])
    rows = positional_shingles(docs, SPAN_N).collect()
    assert len(rows) == 12 - SPAN_N + 1
    assert sorted(r.pos for r in rows) == list(range(12 - SPAN_N + 1))


def test_shared_span_covers_both_docs(spark):
    # SPAN is one duplicated window; each doc's coverage = SPAN_N tokens.
    cov = _spans(
        spark, [(1, f"{UA} {SPAN}"), (2, f"{UB} {SPAN}")]
    )
    assert cov[1].covered_tokens == SPAN_N
    assert cov[2].covered_tokens == SPAN_N


def test_overlapping_windows_merge_not_double_count(spark):
    # SPAN + one extra repeated token -> two overlapping duplicated
    # windows (starts p and p+1) covering SPAN_N + 1 tokens, not 2n.
    span_plus = SPAN + " s_extra"
    cov = _spans(
        spark, [(1, f"{UA} {span_plus}"), (2, f"{UB} {span_plus}")]
    )
    assert cov[1].covered_tokens == SPAN_N + 1
    assert cov[2].covered_tokens == SPAN_N + 1


def test_within_doc_repeat_is_covered(spark):
    # The paper removes within-doc repeats too: SPAN twice in one doc.
    cov = _spans(spark, [(1, f"{SPAN} {UA} {SPAN}")])
    assert cov[1].covered_tokens == 2 * SPAN_N


def test_winner_is_lexicographic_min_occurrence(spark):
    docs = spark.createDataFrame(
        [(2, f"{UB} {SPAN}"), (1, f"{UA} {SPAN}")], ["doc_id", "text"]
    )
    dup = {
        (r.doc_id, r.pos): r.is_winner
        for r in duplicated_starts(docs, SPAN_N).collect()
    }
    assert dup[(1, 12)] == 1  # doc 1 holds the winning occurrence
    assert dup[(2, 12)] == 0


def test_rewrite_keeps_one_occurrence_and_drops_exact_dup(spark, tmp_path):
    import os

    import pandas as pd

    from kstreams_spark.operators.substring import dedup_substring_rewrite

    # Build a fixture dir shaped like the driver's: only documents is read.
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [f"{UA} {SPAN}", f"{UB} {SPAN}", f"{UA} {SPAN}"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [0] * 3,
        }
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    out = {
        r.doc_id: r
        for r in dedup_substring_rewrite(spark, str(tmp_path)).collect()
    }
    # doc 1: canonical for SPAN and for the UA-overlap windows -> intact
    assert out[1].clean_text == f"{UA} {SPAN}"
    # doc 2: loses SPAN (winner lives in doc 1), keeps its unique prefix.
    # The UB|SPAN boundary windows are unique to doc 2, so UB survives.
    assert out[2].clean_text == UB
    # doc 3: exact copy of doc 1 -> every window's winner is in doc 1 ->
    # vaporized (no row at all)
    assert 3 not in out


# ---------------------------------------------------------- property twin

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["w0", "w1", "w2"]  # tiny alphabet forces window collisions


def _py_coverage(texts: list[str], n: int) -> dict[int, int]:
    """Brute-force coverage twin: duplicated n-windows -> per-doc count
    of token positions covered by at least one duplicated window."""
    from collections import Counter

    occ: Counter[tuple[str, ...]] = Counter()
    toks = [t.split(" ") for t in texts]
    for tk in toks:
        for i in range(len(tk) - n + 1):
            occ[tuple(tk[i : i + n])] += 1
    out = {}
    for doc_id, tk in enumerate(toks):
        covered = set()
        for i in range(len(tk) - n + 1):
            if occ[tuple(tk[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        out[doc_id] = len(covered)
    return out


@settings(max_examples=12, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=4, max_size=14).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )
)
def test_coverage_matches_bruteforce_twin(spark, texts):
    """The lead()-window merge identity equals brute-force set coverage
    on random collision-heavy corpora (n=4 so short docs participate)."""
    n = 4
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    from kstreams_spark.operators.substring import (
        coverage_stats,
        duplicated_starts,
    )
    from pyspark.sql import functions as F

    dup = duplicated_starts(docs, n).select("doc_id", "pos")
    base = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    got = {
        r.doc_id: r.covered_tokens
        for r in coverage_stats(dup, base, n).collect()
    }
    assert got == _py_coverage(texts, n)
