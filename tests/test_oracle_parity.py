"""The main correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly (count + columns + values) — a replica of
the driver's CORRECTNESS check at sf0.001 for speed. Queries without an
oracle are smoke-run (rows >= 0, stable schema)."""

from __future__ import annotations

import pytest

from kstreams_spark import registry

registry.load_all()

ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))

from tests.oracle_harness import assert_parity, run_pair  # noqa: E402


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, sf_dir, name):
    sdf, odf = run_pair(
        spark, duck, registry.QUERIES[name], registry.ORACLES[name], sf_dir
    )
    assert_parity(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_smoke(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
