"""Filtered oracle check: run NAMED queries exactly like driver_sim
(vanilla session, DuckDB hash-compare) without paying for all 298.

Usage: python tools/check_queries.py q1,q2[,...] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    from oracle_harness import assert_parity

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                assert_parity(sdf, odf, name)
                status = f"OK    oracle-match rows={len(sdf)}"
            else:
                status = f"OK    rows-only   rows={len(sdf)}"
        except Exception as ex:  # noqa: BLE001
            status = f"FAIL  {type(ex).__name__}: {str(ex)[:300]}"
            failed.append(name)
        print(f"  {name:40s} {time.time() - t0:6.2f}s {status}")
    print("ALL OK" if not failed else "FAILED: " + ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
