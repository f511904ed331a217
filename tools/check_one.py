"""Parity-check a SUBSET of registered queries by name — the per-operator
inner loop (driver_sim runs the full 250+ registry; this runs just the
ones you're iterating on, same vanilla session + DuckDB oracle compare).

Usage: python tools/check_one.py [sf_dir] name [name ...]
       python tools/check_one.py name [name ...]      (sf_dir defaults
                                                       to /root/testdata/sf0.01)
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
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    if not names:
        print("usage: check_one.py [sf_dir] name [name ...]")
        return 2

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_one")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    from oracle_harness import assert_parity

    qs, oracles = e.queries(), e.oracle_sql()
    rc = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            rc = 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                assert_parity(sdf, odf, name)
                print(
                    f"{name}: OK oracle-match rows={len(sdf)}"
                    f" ({time.time() - t0:.2f}s)"
                )
            else:
                print(
                    f"{name}: OK rows-only rows={len(sdf)}"
                    f" ({time.time() - t0:.2f}s)"
                )
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAIL {type(ex).__name__}: {str(ex)[:500]}")
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
