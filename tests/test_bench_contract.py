"""The bench output contract the grading driver depends on
(VERDICT r7 task 1): the LAST stdout line is a compact JSON summary that
fits any tail-capture window regardless of how many headline queries
accumulate; the per-query map lives on its own earlier line and in
BENCH_DETAIL.json. (BENCH_r07 parsed as null because the single line
outgrew the window — this pins the fix.)"""

from __future__ import annotations

import json

import bench


def test_summary_line_is_bounded_and_parseable():
    # worst-case realistic future: 500 headline queries
    times = {f"query_with_a_rather_long_name_{i:03d}": 123.456 for i in range(500)}
    probes = {
        "probe_postings_index": 0.418,
        "probe_ivf_sq8_index": 0.704,
        "probe_ivf_pq_index": 0.353,
    }
    passes = {n: [t + 0.5, t] for n, t in times.items()}
    probe_passes = {k: [v + 0.1, v] for k, v in probes.items()}
    detail_line, summary_line = bench.format_output(
        times, probes, 0.1, passes=passes, probe_passes=probe_passes
    )

    assert len(summary_line.encode()) <= bench.SUMMARY_MAX_BYTES, len(
        summary_line
    )
    out = json.loads(summary_line)
    assert out["metric"] == "headline_queries_total_time"
    assert out["unit"] == "sec"
    assert out["n_queries"] == 500
    assert abs(out["value"] - 500 * 123.456) < 0.01
    assert set(out["probes"]) == set(probes)
    # no canary query in this synthetic map -> ratio is null, key present
    assert "canary_ratio" in out and out["canary_ratio"] is None
    # the spread lives ONLY in the detail sidecar — the summary line must
    # not grow with it (VERDICT r9 task 1)
    assert "passes" not in out

    det = json.loads(detail_line)
    assert det["queries"] == times and det["probes"] == probes
    assert det["passes"] == passes and det["probe_passes"] == probe_passes


def test_passes_optional_for_backcompat():
    """format_output without passes (older callers / partial re-runs)
    still emits the keys, empty — BENCH_DETAIL readers can rely on their
    presence."""
    _, summary = bench.format_output({"q": 1.0}, {}, 0.1)
    det_line, _ = bench.format_output({"q": 1.0}, {}, 0.1)
    det = json.loads(det_line)
    assert det["passes"] == {} and det["probe_passes"] == {}
    assert json.loads(summary)["n_queries"] == 1


def test_canary_ratio_normalizes_machine_state():
    """VERDICT r8 task 1: the summary carries canary_ratio = (this run's
    total over the 5 pinned trivial queries) / CANARY_REF_TOTAL_S, so a
    reader can divide any cross-round delta by the machine-state factor."""
    times = {c: 1.0 for c in bench.CANARY}
    times["composite_curation_pipeline"] = 9.0
    _, summary_line = bench.format_output(times, {}, 0.1)
    out = json.loads(summary_line)
    want = round(len(bench.CANARY) * 1.0 / bench.CANARY_REF_TOTAL_S, 3)
    assert out["canary_ratio"] == want

    # canaries must stay registered headline queries (a renamed canary
    # silently degrades the ratio to a partial sum)
    assert set(bench.CANARY) <= set(bench.HEADLINE)


def test_headline_names_are_registered():
    """Every headline entry must resolve — a typo'd name silently
    shrinks the bench (the filter drops unknowns)."""
    from kstreams_spark import registry

    registry.load_all()
    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, missing
