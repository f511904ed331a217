"""Recurrence guard for the round-6 driver-red class: a DuckDB oracle whose
integer aggregate widens to HUGEINT surfaces in pandas as float64 while the
Spark side stays int64 — values coincide, dtypes differ, the driver's value
hash diverges (`composite_curation_budget`, CORRECTNESS_r06).

Two layers of protection:
1. `tests/oracle_harness.py::_canon_cell` tags numeric cells by dtype class,
   so `test_oracle_parity` fails on any int-vs-float divergence.
2. This test inspects the DuckDB-side RESULT TYPES of every oracle directly
   (no Spark run needed): any HUGEINT/UHUGEINT output column is an uncast
   integer aggregate waiting to go red — fail fast with the column name.
"""

from __future__ import annotations

import pytest

from kstreams_spark import registry

registry.load_all()

ORACLE_NAMES = sorted(registry.ORACLES)

# DuckDB types that pandas cannot represent losslessly as int64 — their
# fetchdf() conversion is float64, which the strict canonicalizer (and the
# grading driver's value hash) treats as a different value class.
_BANNED = {"HUGEINT", "UHUGEINT", "UBIGINT"}


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_emits_no_hugeint(duck, name):
    rel = duck.sql(registry.ORACLES[name])
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if str(t) in _BANNED
    ]
    assert not bad, (
        f"{name}: oracle output column(s) {bad} widen beyond BIGINT — "
        f"pandas renders them float64 and the driver hash diverges from "
        f"Spark's int64. Add an explicit ::BIGINT cast in the oracle SQL "
        f"(portability rule: memory file kstreams-spark-duckdb-portability)."
    )
