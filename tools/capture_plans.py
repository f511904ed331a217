"""Capture .explain("formatted") for headline queries into plans/r15/.

Usage:
    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

With no query names, captures every bench.py HEADLINE query that is
registered. Output: plans/r15/<query>_<tag>.txt. Pure plan capture —
no noop write, so lazy queries are not executed (lake/streaming chain
queries do run their setup verbs when invoked; that is inherent to
calling them at all).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kstreams_spark import registry  # noqa: E402
from kstreams_spark.session import get_session  # noqa: E402

registry.load_all()


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_session(app_name="kstreams_plan_capture", cores=cores)
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} bytes")


if __name__ == "__main__":
    main()
