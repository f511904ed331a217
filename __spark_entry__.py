"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kstreams_spark/`` (see SURVEY.md §7); this module
is a thin adapter over kstreams_spark.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kstreams_spark import registry  # noqa: E402

registry.load_all()

# Harden worker-side unpickling: UDF bodies (pandas_udf / applyInPandas /
# mapInPandas / applyInPandasWithState) normally pickle BY REFERENCE and
# require `kstreams_spark` to be importable inside executor Python
# workers — true when the driver runs from the repo root, not guaranteed
# otherwise. Registering the package for by-value pickling removes the
# import requirement entirely.
try:  # pragma: no cover - defensive; by-reference path also works in-repo
    # NB: PySpark serializes with its VENDORED cloudpickle — registering
    # with the standalone `cloudpickle` package has no effect.
    from pyspark.cloudpickle import register_pickle_by_value

    for _name, _mod in list(sys.modules.items()):
        if _name.startswith("kstreams_spark") and _mod is not None:
            register_pickle_by_value(_mod)
except Exception:  # noqa: BLE001
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's sensor-alert
    pipeline (SURVEY.md §2.1) on the events table."""
    return registry.QUERIES["sensor_alert_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return dict(registry.ORACLES)
