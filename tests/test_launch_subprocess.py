"""Launcher smoke test: two robot processes over the real TCP bus
exchange descriptors and verify loop closures within a short mission.
(The full-length mission incl. optimization is exercised manually /
in benchmarks; this keeps CI time bounded.)"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(os.environ.get("CSLAM_SKIP_SUBPROCESS") == "1",
                    reason="subprocess test disabled")
def test_launch_two_robots_sim():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, "-m", "cslam_tpu.launch", "--robots", "2",
         "--duration", "14", "--sim", "--sim-poses", "10",
         "--sim-kf-period", "0.1", "--base-port", "18700"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=220)
    out = result.stdout
    assert result.returncode == 0, result.stderr[-2000:]
    assert "[r0] done" in out and "[r1] done" in out
    for rid in (0, 1):
        line = [ln for ln in out.splitlines() if f"[r{rid}] done" in ln][0]
        # all keyframes ingested and loop closures verified over TCP
        assert "10 keyframes" in line
        n_fixed = int(line.split("keyframes, ")[1].split(" verified")[0])
        assert n_fixed > 0, line
        tx = int(line.split("tx=")[1].split("B")[0])
        assert tx > 0
