"""Planted-corpus recall contract for the deletion-neighborhood fuzzy
matcher (operators/joins.py::fuzzy_match_pairs — VERDICT r7 task 6):
recall = 1 at edit distance <= 1 across every single-edit type, the
length-bucket prefilter never costs a qualifying pair, and distance-2
pairs are excluded BY DESIGN (the 1-deletion neighborhood + <=1 verify
stop at d=1; d<=2 would need the O(len^2) 2-deletion neighborhood)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kstreams_spark.operators.joins import fuzzy_match_pairs

BASE = [
    (1, "alphabet"),
    (2, "bravo"),
    (3, "charlie"),
    (4, "ab"),  # short string: every position is an edge case
]

PROBES_D01 = [
    # (probe_key, probe_name, expected base_key, expected dist)
    (100, "alphabet", 1, 0),  # exact
    (101, "alphabe", 1, 1),  # delete last
    (102, "lphabet", 1, 1),  # delete first
    (103, "alphxbet", 1, 1),  # substitute middle
    (104, "alphabets", 1, 1),  # insert last
    (105, "xalphabet", 1, 1),  # insert first
    (106, "brvo", 2, 1),  # delete middle
    (107, "a", 4, 1),  # short delete
    (108, "abx", 4, 1),  # short insert
]

PROBES_D2 = [
    (200, "alphabXY"),  # 2 substitutions
    (201, "alpha"),  # 3 deletes
    (202, "brxvoz"),  # substitute + insert
]


def _frames(spark):
    base = spark.createDataFrame(BASE, "c_custkey long, c_name string")
    probes = spark.createDataFrame(
        [(k, n) for k, n, _, _ in PROBES_D01] + list(PROBES_D2),
        "probe_key long, probe_name string",
    )
    return probes, base


def test_recall_is_one_at_distance_le_1(spark):
    probes, base = _frames(spark)
    got = {
        (r.probe_key, r.base_key, r.dist)
        for r in fuzzy_match_pairs(probes, base).collect()
    }
    # ground truth: the naive cross levenshtein <= 1
    want = {
        (r.probe_key, r.c_custkey, r.dist)
        for r in probes.crossJoin(base)
        .withColumn(
            "dist", F.levenshtein("probe_name", "c_name").cast("long")
        )
        .filter("dist <= 1")
        .collect()
    }
    assert got == want
    # and every planted single-edit pair is present explicitly
    for pk, _, bk, d in PROBES_D01:
        assert (pk, bk, d) in got, (pk, bk, d)


def test_distance_2_pairs_are_excluded_by_design(spark):
    """The documented d>1 limit: no distance-2 probe matches anything.
    (Real d=2 linkage needs 2-deletion neighborhoods or a different
    blocker — this operator's contract stops at 1.)"""
    probes, base = _frames(spark)
    got = fuzzy_match_pairs(probes, base)
    d2_keys = {k for k, _ in PROBES_D2}
    assert got.filter(F.col("probe_key").isin(d2_keys)).count() == 0
    # sanity: those probes ARE within distance 2 of a base name, so the
    # emptiness above is the blocking/verify contract, not a bad fixture
    near = (
        probes.filter(F.col("probe_key").isin(d2_keys))
        .crossJoin(base)
        .filter(F.levenshtein("probe_name", "c_name") == 2)
        .count()
    )
    assert near > 0


def test_length_prefilter_costs_no_qualifying_pair(spark):
    """|len(a)-len(b)| <= 1 is implied by levenshtein <= 1, so the
    explicit prefilter can only drop non-qualifying candidates; the
    result over a mixed-length corpus equals the naive theta join."""
    base = spark.createDataFrame(
        [(i, "x" * i) for i in range(1, 12)], "c_custkey long, c_name string"
    )
    probes = spark.createDataFrame(
        [(100 + i, "x" * i + ("y" if i % 2 else "")) for i in range(1, 12)],
        "probe_key long, probe_name string",
    )
    got = {
        (r.probe_key, r.base_key)
        for r in fuzzy_match_pairs(probes, base).collect()
    }
    want = {
        (r.probe_key, r.c_custkey)
        for r in probes.crossJoin(base)
        .filter(F.levenshtein("probe_name", "c_name") <= 1)
        .collect()
    }
    assert got == want
