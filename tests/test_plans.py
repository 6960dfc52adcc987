"""Physical-plan property gate: the BENCH/PLANS.md assertions
(pushdown, broadcast, codegen, shuffle-free extraction, salted
two-phase shapes) must keep holding as the code evolves."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_plan_audit_passes(tmp_path):
    # write the audit to a scratch file: the committed BENCH/PLANS.md
    # holds production (32-partition) plans, and the test session runs
    # at a smaller parallelism that would rewrite every partition count
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "plan_audit.py")],
        capture_output=True, text=True, timeout=500,
        env={**os.environ, "PLAN_AUDIT_OUT": str(tmp_path / "PLANS.md")},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
