"""Demo scripts run end-to-end (the reference's tests/test_demo.sh:4-12
smoke pattern: every example exits 0)."""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMOS = sorted(glob.glob(os.path.join(REPO, "demo", "example*.py")))


@pytest.mark.parametrize("demo", DEMOS, ids=[os.path.basename(d)
                                             for d in DEMOS])
def test_demo_runs(demo, tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""     # keep demos off the shared chip
    proc = subprocess.run(
        [sys.executable, demo], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-3000:]
