"""Crash recovery end-to-end: SIGKILL one robot process mid-mission,
restart it from its periodic checkpoint, and require that it regains
liveness, contributes NEW verified loop closures after the resume, and
converges to optimized estimates (VERDICT round-3 item 5 — the
checkpoint proving its actual purpose, not just round-tripping).

Uses real OS processes over the C++ TCP bus (one per robot via
--robot-id), exactly the multi-host deployment path."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_PORT = 19310


def _robot_cmd(rid, duration, out_dir, resume=False):
    cmd = [
        sys.executable, "-u", "-m", "cslam_tpu.launch",
        "--robot-id", str(rid), "--robots", "2",
        "--duration", str(duration), "--sim", "--sim-poses", "30",
        "--sim-kf-period", "0.4", "--base-port", str(BASE_PORT),
        "--json-out", os.path.join(out_dir, "metrics"),
        "--checkpoint-dir", os.path.join(out_dir, "ckpt"),
        "--checkpoint-period", "1.0",
    ]
    if resume:
        cmd.append("--resume")
    return cmd


@pytest.mark.skipif(os.environ.get("CSLAM_SKIP_SUBPROCESS") == "1",
                    reason="subprocess test disabled")
def test_sigkill_and_resume_from_checkpoint(tmp_path):
    out_dir = str(tmp_path)
    env = dict(os.environ)
    procs = {}
    try:
        procs[0] = subprocess.Popen(
            _robot_cmd(0, 42, out_dir), cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        procs[1] = subprocess.Popen(
            _robot_cmd(1, 42, out_dir), cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

        # let the mission run ~1/3 of its keyframes, then kill r1 HARD
        time.sleep(14)
        ckpt_manifest = os.path.join(out_dir, "ckpt", "robot1",
                                     "manifest.json")
        assert os.path.exists(ckpt_manifest), \
            "no periodic checkpoint written before the crash"
        procs[1].send_signal(signal.SIGKILL)
        procs[1].wait(timeout=10)
        assert procs[1].returncode != 0  # died, not exited

        # restart r1 from its checkpoint for the rest of the mission
        time.sleep(1)
        procs[1] = subprocess.Popen(
            _robot_cmd(1, 26, out_dir, resume=True), cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

        out1, _ = procs[1].communicate(timeout=200)
        out0, _ = procs[0].communicate(timeout=200)
        assert procs[0].returncode == 0, out0[-2000:]
        assert procs[1].returncode == 0, out1[-2000:]
    finally:
        for p in procs.values():
            if p.poll() is None:
                p.kill()

    assert "resumed from checkpoint" in out1, out1[-2000:]

    with open(os.path.join(out_dir, "metrics", "robot1.json")) as f:
        m1 = json.load(f)
    with open(os.path.join(out_dir, "metrics", "robot0.json")) as f:
        m0 = json.load(f)

    # r1 actually restored mid-mission state (not a fresh start) ...
    assert m1["resumed_from_keyframe"] is not None
    assert m1["resumed_from_keyframe"] > 0
    # ... regained liveness and finished the keyframe stream
    assert m1["keyframes"] == 30
    # ... and contributed NEW verified loop closures after the resume
    assert m1["verified_loop_closures"] > \
        (m1["verified_loop_closures_at_resume"] or 0), m1
    # both sides converged to optimized estimates
    assert m1["optimizations"] >= 1
    assert m0["verified_loop_closures"] > 0
    assert m1["optimized_estimates"] > 3
    assert m1["ate_optimized_m"] is not None
    # optimization beats raw drifting odometry after the crash-resume
    assert m1["ate_optimized_m"] < m1["ate_odometry_m"], m1
