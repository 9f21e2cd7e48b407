"""The driver's correctness gate covers only the first 50 registry
entries; every entry changed since the last round boundary must sit
inside that window (scripts/check_gate_order.py)."""

import subprocess
import sys


def test_gate_rotation_honest():
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/check_gate_order.py"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
