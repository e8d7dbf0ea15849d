"""The rotation-ledger invariants, enforced at test time: a newly
registered query that is not in the driver's graded cap would
otherwise silently never be verified (the CORRECTNESS_r05 lesson)."""

import subprocess
import sys


def test_grading_ledger_invariants_hold():
    """scripts/grading_ledger.py exits 0: every never-graded entry is
    inside CAP_50 (hard invariant); staleness overruns are warnings
    for the next rotation, not failures."""
    out = subprocess.run(
        [sys.executable, "scripts/grading_ledger.py"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "INVARIANT VIOLATION" not in out.stdout
