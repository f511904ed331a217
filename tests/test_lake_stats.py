"""r15 data skipping: manifest-resident per-file column stats + the
driver-side file pruning built on them (lake_stats.py + the
lake_snapshot wiring). The files-opened pins are the point: a selective
read must receive ONLY the surviving file list (inputFiles()), with no
footer opened for a skipped file."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import kstreams_spark.lake_snapshot as ls
from kstreams_spark.io import load_table
from kstreams_spark.lake_snapshot import (
    snapshot_clone,
    snapshot_delete_where_dv,
    snapshot_merge,
    snapshot_publish,
    snapshot_read,
    snapshot_rename_column,
    snapshot_restore,
    snapshot_scan_stats,
    table_stats,
    vacuum,
)
from kstreams_spark.lake_stats import (
    STATS_MAX_STRING_LEN,
    collect_file_stats,
    file_may_match,
    parse_skip_conjuncts,
)


def _docs(spark, sf_dir, lo=0, hi=100):
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "text",
            F.when(F.col("doc_id") % 2 == 0, "train")
            .otherwise("val")
            .alias("split"),
        )
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )


def _ranged_lake(spark, sf_dir, tmp_path, name="skip"):
    """Four appends of 25-wide doc_id ranges, one file per
    (append, split) dir — eight live files with disjoint stats."""
    lake = str(tmp_path / name)
    for lo in range(0, 100, 25):
        snapshot_publish(
            _docs(spark, sf_dir, lo, lo + 25).coalesce(1),
            lake,
            mode="append" if lo else "replace",
            partition_cols=("split",),
        )
    return lake


# --- pure-unit surface ----------------------------------------------------


def test_parse_skip_conjuncts_grammar():
    assert parse_skip_conjuncts("a >= 1 AND b = 'x' AND c IS NULL") == [
        ("a", ">=", ("num", 1)),
        ("b", "=", ("str", "x")),
        ("c", "isnull", None),
    ]
    # literal-first comparisons flip
    assert parse_skip_conjuncts("5 < a") == [("a", ">", ("num", 5))]
    # OR / parens / unknown functions → no pruning at all
    assert parse_skip_conjuncts("a > 1 OR b < 2") == []
    assert parse_skip_conjuncts("(a > 1) AND b < 2") == []
    # an AND inside a string literal can only produce rejected
    # fragments, never a wrong conjunct
    assert parse_skip_conjuncts("t = 'x AND y'") == []
    # a function call carries parens → global reject (conservative)
    assert parse_skip_conjuncts("length(t) > 3 AND a = 2") == []
    # an unparseable paren-free conjunct drops, parseable ones survive
    assert parse_skip_conjuncts("t LIKE 'x%' AND a = 2") == [
        ("a", "=", ("num", 2))
    ]
    # r15 widening: BETWEEN desugars, IN-lists are whole conjuncts
    assert parse_skip_conjuncts("a BETWEEN 3 AND 9") == [
        ("a", ">=", ("num", 3)),
        ("a", "<=", ("num", 9)),
    ]
    assert parse_skip_conjuncts("s IN ('x', 'y') AND a = 1") == [
        ("s", "in", [("str", "x"), ("str", "y")]),
        ("a", "=", ("num", 1)),
    ]
    # IN with a function inside still rejects globally; NOT BETWEEN
    # desugars into rejected fragments (no wrong conjunct)
    assert parse_skip_conjuncts("s IN (lower('x'))") == []
    assert parse_skip_conjuncts("a NOT BETWEEN 3 AND 9") == []
    # a comma inside a string literal cannot mis-split an IN list
    assert parse_skip_conjuncts("s IN ('a,b', 'c')") == []


def test_in_and_between_pruning(spark):
    from kstreams_spark.lake_stats import file_may_match

    e = {"rows": 10, "cols": {"k": {"min": 5, "max": 50, "nulls": 0}}}
    t = {"k": "bigint"}
    may = lambda w: file_may_match(e, parse_skip_conjuncts(w), {}, t)
    assert not may("k IN (1, 2, 51)")
    assert may("k IN (1, 2, 50)")
    assert not may("k BETWEEN 51 AND 60")
    assert may("k BETWEEN 50 AND 60")


def test_violation_conjuncts_strictness():
    from kstreams_spark.lake_stats import violation_conjuncts

    assert violation_conjuncts("a < 5") == [("a", ">=", ("num", 5))]
    assert violation_conjuncts("a >= 0 AND a < 5") == [
        ("a", "<", ("num", 0)),
        ("a", ">=", ("num", 5)),
    ]
    assert violation_conjuncts("a BETWEEN 0 AND 5") == [
        ("a", "<", ("num", 0)),
        ("a", ">", ("num", 5)),
    ]
    assert violation_conjuncts("a IS NOT NULL") == [("a", "isnull", None)]
    # strict: one bad fragment kills the whole proof
    assert violation_conjuncts("a < 5 AND length(t) > 2") is None
    assert violation_conjuncts("a < 5 OR b > 2") is None
    assert violation_conjuncts("a IN (1, 2)") is None


def test_file_may_match_ranges_and_nulls():
    e = {"rows": 10, "cols": {"k": {"min": 5, "max": 50, "nulls": 2}}}
    t = {"k": "bigint"}
    may = lambda w: file_may_match(e, parse_skip_conjuncts(w), {}, t)
    assert not may("k > 50") and may("k >= 50")
    assert not may("k < 5") and may("k <= 5")
    assert not may("k = 4") and may("k = 5") and not may("k = 51")
    assert may("k != 7")
    assert may("k IS NULL")  # nulls=2 > 0
    assert may("k IS NOT NULL")
    # all-null file: no comparison can match; IS NOT NULL can't either
    allnull = {"rows": 3, "cols": {"k": {"nulls": 3}}}
    assert not file_may_match(
        allnull, parse_skip_conjuncts("k = 1"), {}, t
    )
    assert not file_may_match(
        allnull, parse_skip_conjuncts("k IS NOT NULL"), {}, t
    )
    # zero-null file skips IS NULL
    nonull = {"rows": 3, "cols": {"k": {"min": 1, "max": 2, "nulls": 0}}}
    assert not file_may_match(
        nonull, parse_skip_conjuncts("k IS NULL"), {}, t
    )
    # != can only skip a constant file
    const = {"rows": 3, "cols": {"k": {"min": 7, "max": 7, "nulls": 0}}}
    assert not file_may_match(const, parse_skip_conjuncts("k != 7"), {}, t)
    # missing stats / unknown column / unknown type: never skip
    assert file_may_match({}, parse_skip_conjuncts("k = 1"), {}, t)
    assert file_may_match(e, parse_skip_conjuncts("zz = 1"), {}, t)
    assert file_may_match(e, parse_skip_conjuncts("k = 1"), {}, {})


def test_string_truncation_bounds(spark, tmp_path):
    """A string longer than STATS_MAX_STRING_LEN stores a truncated min
    (valid lower bound) and a U+10FFFF-padded max (valid upper bound) —
    never a bound that would wrongly skip the file."""
    long_hi = "z" * (STATS_MAX_STRING_LEN + 40)
    long_lo = "a" * (STATS_MAX_STRING_LEN + 40)
    p = str(tmp_path / "trunc")
    spark.createDataFrame(
        [(long_lo,), (long_hi,)], "t string"
    ).coalesce(1).write.parquet(p)
    f = [
        os.path.join(p, x)
        for x in os.listdir(p)
        if x.endswith(".parquet")
    ][0]
    st = collect_file_stats(f)
    ce = st["cols"]["t"]
    assert len(ce["min"]) == STATS_MAX_STRING_LEN
    assert ce["min"] <= long_lo
    assert ce["max"] >= long_hi
    assert ce["max"].endswith("\U0010ffff")
    # the padded bound keeps a probe INSIDE the range un-skipped
    assert file_may_match(
        st,
        parse_skip_conjuncts(f"t = '{'z' * (STATS_MAX_STRING_LEN + 39)}'"),
        {},
        {"t": "string"},
    )


# --- lake wiring ----------------------------------------------------------


def test_selective_read_opens_only_surviving_files(spark, tmp_path, sf_dir):
    lake = _ranged_lake(spark, sf_dir, tmp_path)
    where = "doc_id >= 25 AND doc_id < 50 AND split = 'train'"
    plan = snapshot_scan_stats(lake, where)
    assert plan == {"total": 8, "scanned": 1, "skipped": 7}
    pruned = snapshot_read(spark, lake, where=where)
    # the scan physically receives ONE file
    assert len(pruned.inputFiles()) == 1
    # and the answer equals filter-over-full-read exactly
    full = snapshot_read(spark, lake).filter(where)
    assert sorted(r.doc_id for r in pruned.collect()) == sorted(
        r.doc_id for r in full.collect()
    )
    # a predicate outside every range scans nothing and returns empty
    none = snapshot_read(spark, lake, where="doc_id >= 1000")
    assert none.count() == 0
    assert snapshot_scan_stats(lake, "doc_id >= 1000")["scanned"] == 0
    # an unprunable predicate (OR) scans everything, still correct
    some = snapshot_read(
        spark, lake, where="doc_id = 3 OR doc_id = 30"
    )
    assert len(some.inputFiles()) == 8
    assert sorted(r.doc_id for r in some.collect()) == [3, 30]


def test_stats_survive_rename_clone_restore(spark, tmp_path, sf_dir):
    lake = _ranged_lake(spark, sf_dir, tmp_path)
    # rename: stats live under PHYSICAL names; predicates on the new
    # logical name keep pruning
    snapshot_rename_column(lake, "doc_id", "doc")
    plan = snapshot_scan_stats(lake, "doc >= 25 AND doc < 50")
    assert plan["scanned"] == 2 and plan["total"] == 8  # train + val
    got = snapshot_read(spark, lake, where="doc >= 25 AND doc < 50")
    assert got.count() == 25 and len(got.inputFiles()) == 2
    # clone: stats travel with the metadata commit
    clone = str(tmp_path / "skip_clone")
    snapshot_clone(lake, clone)
    assert snapshot_scan_stats(clone, "doc >= 75")["scanned"] == 2
    # restore: re-added files get their stats back
    ls.snapshot_delete_where(
        spark, lake, "doc >= 50", partition_cols=("split",)
    )
    v = ls.snapshot_versions(lake)[-1]
    assert snapshot_scan_stats(lake, "doc >= 75")["scanned"] == 0
    snapshot_restore(lake, v - 1)
    assert snapshot_scan_stats(lake, "doc >= 75")["scanned"] == 2
    assert (
        snapshot_read(spark, lake, where="doc >= 75").count() == 25
    )


def test_stats_fold_into_checkpoints_and_survive_vacuum(
    spark, tmp_path, sf_dir
):
    """More commits than CHECKPOINT_INTERVAL, then a vacuum that drops
    the early manifests: table_stats must resolve from the checkpoint,
    and pruning must keep working."""
    lake = str(tmp_path / "cpstats")
    for i, lo in enumerate(range(0, 120, 10)):  # 12 commits
        snapshot_publish(
            _docs(spark, sf_dir, lo, lo + 10).coalesce(1),
            lake,
            mode="append" if i else "replace",
            partition_cols=("split",),
        )
    st = table_stats(lake, ls.snapshot_versions(lake)[-1])
    assert len(st) == 24  # every live file has stats
    vacuum(lake, keep_versions=1, grace_seconds=0, force=True)
    st2 = table_stats(lake, ls.snapshot_versions(lake)[-1])
    assert st2 == st
    plan = snapshot_scan_stats(lake, "doc_id >= 110")
    assert plan["scanned"] == 2 and plan["total"] == 24


def test_dv_delete_prunes_scan_but_commits_full_liveset(
    spark, tmp_path, sf_dir
):
    """Regression (caught during r15 bring-up): the DV delete's pruned
    SCAN set must not leak into the commit's live-file set — every
    other file stays in the table."""
    lake = _ranged_lake(spark, sf_dir, tmp_path, "dvskip")
    n = snapshot_delete_where_dv(spark, lake, "doc_id = 30")
    assert n == 1
    ids = sorted(r.doc_id for r in snapshot_read(spark, lake).collect())
    assert len(ids) == 99 and 30 not in ids and 0 in ids and 99 in ids
    # and the DV landed on the one file whose range holds 30
    v = ls.snapshot_versions(lake)[-1]
    dvs = ls.table_dvs(lake, v)
    assert len(dvs) == 1 and list(dvs.values())[0] != []


def test_merge_key_range_prunes_matched_scan(spark, tmp_path, sf_dir):
    """A merge whose source keys span one 25-range must produce the
    same result as ever (pruning is scan-side only), for CoW and MoR,
    including delete intents."""
    for mor in (False, True):
        lake = _ranged_lake(spark, sf_dir, tmp_path, f"mrg{mor}")
        src = (
            _docs(spark, sf_dir, 30, 35)
            .withColumn("text", F.lit("merged"))
            .withColumn("_kill", F.col("doc_id") == 31)
        )
        r = snapshot_merge(
            spark,
            lake,
            src,
            key_cols=("doc_id",),
            partition_cols=("split",),
            merge_on_read=mor,
            delete_col="_kill",
        )
        assert (r["updated"], r["inserted"], r["deleted"]) == (4, 0, 1)
        now = {
            x.doc_id: x.text for x in snapshot_read(spark, lake).collect()
        }
        assert len(now) == 99 and 31 not in now
        assert now[30] == "merged" and now[34] == "merged"
        assert now[29] != "merged" and now[50] != "merged"


def test_merge_insert_only_outside_ranges(spark, tmp_path, sf_dir):
    """Source keys entirely outside every file's range: the matched
    scan prunes to zero files, and the merge is a pure insert."""
    for mor in (False, True):
        lake = _ranged_lake(spark, sf_dir, tmp_path, f"mrgins{mor}")
        src = _docs(spark, sf_dir, 200, 205)
        r = snapshot_merge(
            spark,
            lake,
            src,
            key_cols=("doc_id",),
            partition_cols=("split",),
            merge_on_read=mor,
        )
        assert (r["updated"], r["inserted"]) == (0, 5)
        assert (
            snapshot_read(spark, lake).filter("doc_id >= 200").count()
            == 5
        )
        assert snapshot_read(spark, lake).count() == 105


def test_append_after_schema_widens_without_stats_still_reads(
    spark, tmp_path, sf_dir
):
    """A file with no stats entry (simulated legacy commit) is simply
    never skipped."""
    lake = _ranged_lake(spark, sf_dir, tmp_path, "legacy")
    v = ls.snapshot_versions(lake)[-1]
    # strip add_stats from one manifest in place (pre-r15 shape)
    import json

    mp = ls._manifest_path(lake, v)
    with open(mp) as fh:
        body = json.load(fh)
    body.pop("add_stats", None)
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(body, fh)
    # the stripped commit's two files ([75,100)) lost their stats:
    # they always scan — matching or not — while statted files skip
    assert snapshot_scan_stats(lake, "doc_id >= 75")["scanned"] == 2
    assert snapshot_scan_stats(lake, "doc_id < 25")["scanned"] == 4
    got = snapshot_read(spark, lake, where="doc_id >= 75")
    assert got.count() == 25


def test_optimize_where_scopes_by_partition(spark, tmp_path, sf_dir):
    """r15 OPTIMIZE ... WHERE: only matching partitions rewrite
    (untouched ones keep byte-identical files); data-column or
    unparseable predicates raise by name (Delta's rule)."""
    import pytest

    from kstreams_spark.lake_snapshot import snapshot_compact

    lake = _ranged_lake(spark, sf_dir, tmp_path, "optwhere")
    before = {
        f: os.path.getmtime(os.path.join(lake, f))
        for f in ls._live_files(lake, ls.snapshot_versions(lake)[-1])
    }
    n = snapshot_compact(
        spark,
        lake,
        n_files=1,
        partition_cols=("split",),
        where="split = 'train'",
    )
    assert n == 1  # only the train partition compacted (4 files -> 1)
    after = ls._live_files(lake, ls.snapshot_versions(lake)[-1])
    val_files = {f for f in after if "split=val" in f}
    assert val_files == {f for f in before if "split=val" in f}
    assert all(
        os.path.getmtime(os.path.join(lake, f)) == before[f]
        for f in val_files
    )
    assert len({f for f in after if "split=train" in f}) == 1
    assert snapshot_read(spark, lake).count() == 100  # pure re-layout
    with pytest.raises(ValueError, match="not partition columns"):
        snapshot_compact(
            spark, lake, partition_cols=("split",), where="doc_id < 10"
        )
    with pytest.raises(ValueError, match="outside the partition"):
        snapshot_compact(
            spark, lake, partition_cols=("split",),
            where="split = 'a' OR split = 'b'",
        )


def test_metadata_min_max_and_decline_paths(spark, tmp_path, sf_dir):
    """r15 metadata-only MIN/MAX: exact answers with zero scans while
    provable; DVs, missing stats, and truncated strings each DECLINE
    (None), never return a wrong extreme."""
    from kstreams_spark.lake_snapshot import (
        snapshot_delete_where_dv,
        snapshot_min_max,
    )

    lake = _ranged_lake(spark, sf_dir, tmp_path, "mm")
    mm = snapshot_min_max(lake, ["doc_id"])
    assert mm == {"doc_id": (0, 99)}
    # long strings: text bounds truncate -> decline
    assert snapshot_min_max(lake, ["text"]) is None
    # a DV in force makes every extreme unprovable
    snapshot_delete_where_dv(spark, lake, "doc_id = 99")
    assert snapshot_min_max(lake, ["doc_id"]) is None
    # version pin: the pre-DV version still answers
    v = ls.snapshot_versions(lake)[-1] - 1
    assert snapshot_min_max(lake, ["doc_id"], version=v) == {
        "doc_id": (0, 99)
    }
    import pytest

    with pytest.raises(ValueError, match="unknown column"):
        snapshot_min_max(lake, ["nope"])


def test_snapshot_detail_surface(spark, tmp_path, sf_dir):
    from kstreams_spark.lake_snapshot import (
        snapshot_detail,
        snapshot_set_constraint,
    )

    lake = _ranged_lake(spark, sf_dir, tmp_path, "detail")
    snapshot_set_constraint(spark, lake, "ids", "doc_id < 1000")
    d = snapshot_detail(lake)
    assert d["num_files"] == 8 and d["stats_files"] == 8
    assert d["partition_columns"] == ["split"]
    assert d["n_constraints"] == 1 and d["num_dv_files"] == 0
    assert d["size_bytes"] > 0
    assert "doc_id" in d["schema"]


def test_zorder_compact_feeds_manifest_skipping(spark, tmp_path, sf_dir):
    """OPTIMIZE ZORDER × data skipping (r15): after a z-order compact,
    the rewritten files' MANIFEST stats are narrow on BOTH keys, so
    driver-side pruning skips files on the secondary dimension too —
    the footer-level payoff tests/test_zorder.py pins, now available
    without opening a footer."""
    from kstreams_spark.lake_snapshot import snapshot_compact

    lake = str(tmp_path / "zskip")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        # a second dimension decorrelated from doc_id
        ((F.col("doc_id") * 37) % 100).alias("bucket"),
        F.lit("all").alias("split"),
    ).filter(F.col("doc_id") < 400)
    snapshot_publish(docs, lake, partition_cols=("split",))
    snapshot_compact(
        spark,
        lake,
        n_files=8,
        partition_cols=("split",),
        zorder_by=("doc_id", "bucket"),
    )
    total = snapshot_scan_stats(lake, "doc_id >= 0")["total"]
    assert total == 8
    # a band on EITHER dimension skips manifest-side
    for where in ("doc_id BETWEEN 0 AND 40", "bucket BETWEEN 0 AND 20"):
        plan = snapshot_scan_stats(lake, where)
        assert plan["skipped"] > 0, (where, plan)
        pruned = snapshot_read(spark, lake, where=where)
        full = snapshot_read(spark, lake).filter(where)
        assert sorted(r.doc_id for r in pruned.collect()) == sorted(
            r.doc_id for r in full.collect()
        )


# --- property: pruning is NEVER wrong (hypothesis) ------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_OPS = ["=", "!=", "<", "<=", ">", ">="]


def _sat(v, op, lit):
    if v is None:
        return False  # NULL satisfies no comparison / IN
    return {
        "=": v == lit, "!=": v != lit, "<": v < lit,
        "<=": v <= lit, ">": v > lit, ">=": v >= lit,
    }[op]


@settings(max_examples=300, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.integers(-1000, 1000), st.none()),
        min_size=1,
        max_size=12,
    ),
    op=st.sampled_from(_OPS + ["in", "isnull", "isnotnull", "between"]),
    lit=st.integers(-1000, 1000),
    lit2=st.integers(-1000, 1000),
    in_list=st.lists(st.integers(-1000, 1000), min_size=1, max_size=4),
)
def test_property_skip_implies_no_satisfying_row(
    vals, op, lit, lit2, in_list
):
    """The one-directional contract, adversarially: build the stats
    entry exactly as collect_file_stats would from an arbitrary value
    multiset (nulls included), evaluate an arbitrary conjunct — if the
    file is SKIPPED, brute force must find NO satisfying row. (The
    converse — may_match but nothing satisfies — is allowed slack, not
    checked: that is what 'conservative' means.)"""
    nn = [v for v in vals if v is not None]
    entry = {
        "rows": len(vals),
        "cols": {
            "k": (
                {
                    "min": min(nn),
                    "max": max(nn),
                    "nulls": len(vals) - len(nn),
                }
                if nn
                else {"nulls": len(vals)}
            )
        },
    }
    t = {"k": "bigint"}
    if op == "in":
        where = f"k IN ({', '.join(str(x) for x in in_list)})"
        sat = lambda v: v is not None and v in in_list
    elif op == "between":
        lo, hi = min(lit, lit2), max(lit, lit2)
        where = f"k BETWEEN {lo} AND {hi}"
        sat = lambda v: v is not None and lo <= v <= hi
    elif op == "isnull":
        where = "k IS NULL"
        sat = lambda v: v is None
    elif op == "isnotnull":
        where = "k IS NOT NULL"
        sat = lambda v: v is not None
    else:
        where = f"k {op} {lit}"
        sat = lambda v: _sat(v, op, lit)
    conj = parse_skip_conjuncts(where)
    assert conj, where  # the whole grammar must parse these forms
    if not file_may_match(entry, conj, {}, t):
        assert not any(sat(v) for v in vals), (where, vals)


@settings(max_examples=300, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.integers(-1000, 1000), st.none()),
        min_size=1,
        max_size=12,
    ),
    op=st.sampled_from(_OPS),
    lit=st.integers(-1000, 1000),
    lit2=st.integers(-1000, 1000),
    use_between=st.booleans(),
)
def test_property_compliance_proof_never_wrong(
    vals, op, lit, lit2, use_between
):
    """The CHECK-proof mirror: when every violation conjunct is
    stats-impossible, brute force must find NO violating row (a row
    violates when the predicate is FALSE; NULL passes)."""
    from kstreams_spark.lake_stats import violation_conjuncts

    nn = [v for v in vals if v is not None]
    entry = {
        "rows": len(vals),
        "cols": {
            "k": (
                {
                    "min": min(nn),
                    "max": max(nn),
                    "nulls": len(vals) - len(nn),
                }
                if nn
                else {"nulls": len(vals)}
            )
        },
    }
    t = {"k": "bigint"}
    if use_between:
        lo, hi = min(lit, lit2), max(lit, lit2)
        pred = f"k BETWEEN {lo} AND {hi}"
        holds = lambda v: lo <= v <= hi
    else:
        pred = f"k {op} {lit}"
        holds = lambda v: _sat(v, op, lit)
    viols = violation_conjuncts(pred)
    assert viols is not None, pred
    proven = all(
        not file_may_match(entry, [vc], {}, t) for vc in viols
    )
    if proven:
        # no NON-NULL value may violate (nulls pass CHECK)
        assert all(holds(v) for v in nn), (pred, vals)


def test_timestamp_and_date_skipping_end_to_end(spark, tmp_path, sf_dir):
    """The temporal coercion path: timestamp stats land as naive-UTC
    ISO strings and prune against TIMESTAMP/plain literals; date
    columns prune with DATE literals — exact answers either way."""
    from kstreams_spark.io import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "ts",
            F.to_date("ts").alias("day"),
            F.lit("all").alias("split"),
        )
        .filter(F.col("event_id") < 4000)
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    lake = str(tmp_path / "tsskip")
    # two appends: before/after the midpoint -> disjoint ts ranges
    for i, pred in enumerate(
        (F.col("ts") < F.lit(mid), F.col("ts") >= F.lit(mid))
    ):
        snapshot_publish(
            ev.filter(pred).coalesce(1),
            lake,
            mode="append" if i else "replace",
            partition_cols=("split",),
        )
    probe = hi.strftime("%Y-%m-%d %H:%M:%S")
    where = f"ts >= TIMESTAMP '{probe}'"
    plan = snapshot_scan_stats(lake, where)
    assert plan == {"total": 2, "scanned": 1, "skipped": 1}, plan
    got = snapshot_read(spark, lake, where=where)
    want = snapshot_read(spark, lake).filter(where)
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in want.collect()
    )
    # plain string literal coerces the same way
    assert snapshot_scan_stats(lake, f"ts >= '{probe}'")["skipped"] == 1
    # date column with a DATE literal
    dhi = hi.strftime("%Y-%m-%d")
    pd_ = snapshot_scan_stats(lake, f"day >= DATE '{dhi}'")
    assert pd_["scanned"] <= 2 and pd_["total"] == 2
    got2 = snapshot_read(spark, lake, where=f"day >= DATE '{dhi}'")
    want2 = snapshot_read(spark, lake).filter(f"day >= DATE '{dhi}'")
    assert got2.count() == want2.count()
