"""Shared pytest fixtures: one SparkSession per test session, a DuckDB
connection with the fixture views registered (mirroring the driver's oracle
side), and sf-dir paths."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("KSTREAMS_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from kstreams_spark.session import get_session

    # r16: knobs overridable for suite-latency A/Bs (defaults pinned —
    # the suite is job-latency-bound, see OPTIMIZATION_r16.md item 1)
    cores = int(os.environ.get("KSTREAMS_TEST_CORES", "8"))
    shuf = int(os.environ.get("KSTREAMS_TEST_SHUFFLE", "8"))
    s = get_session(
        app_name="kstreams_spark_tests", cores=cores, shuffle_partitions=shuf
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE
