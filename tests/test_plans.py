"""Physical-plan property gate: the BENCH/PLANS.md assertions
(pushdown, broadcast, codegen, shuffle-free extraction, salted
two-phase shapes) must keep holding as the code evolves."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_plan_audit_passes():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "plan_audit.py")],
        capture_output=True, text=True, timeout=500,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
