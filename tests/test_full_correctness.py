"""Opt-in full oracle replay as a pytest gate (ADVICE r4).

The driver's per-round correctness gate checks only the first 50
``queries()`` entries; ``tools/check_correctness.py`` replays ALL of them.
This test makes that replay a CI-runnable required gate so an
out-of-window regression cannot land silently between rounds — it is
env-gated (the full replay is ~3 min at sf0.01 in a fresh JVM) so the
default `pytest tests/` stays fast:

    SPARK_GRAFT_FULL_CORRECTNESS=1 python -m pytest tests/test_full_correctness.py
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_CORRECTNESS") != "1",
    reason="full oracle replay of every registered query (~3 min); set SPARK_GRAFT_FULL_CORRECTNESS=1",
)
def test_all_registered_queries_match_oracle():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), sf],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = proc.stdout[-6000:] + "\n" + proc.stderr[-2000:]
    assert proc.returncode == 0, f"out-of-window oracle regression:\n{tail}"
