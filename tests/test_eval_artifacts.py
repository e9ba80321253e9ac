"""Round-2 evaluation artifacts: the KITTI eval harness runs from a
dataset file to an ATE JSON in one call; the reference-frame/TF chain is
published for consumers (decentralized_pgo.cpp:744-851); the
greedy-vs-MAC spectral matches land in CSVs (logger.cpp:174-191)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fixture_poses(path, n=240):
    """KITTI-format figure-8 (revisits -> loop-closure opportunities)."""
    ts, Rs = [], []
    for k in range(n):
        u = 2 * np.pi * k / n
        ts.append([50 * np.sin(2 * u) / 2, 0.3 * np.sin(3 * u),
                   40 * np.sin(u)])
    ts = np.asarray(ts)
    for k in range(n):
        d = ts[min(k + 1, n - 1)] - ts[max(k - 1, 0)]
        d = d / max(np.linalg.norm(d), 1e-9)
        up = np.array([0.0, 1.0, 0.0])
        r = np.cross(up, d)
        r /= max(np.linalg.norm(r), 1e-9)
        Rs.append(np.stack([r, np.cross(d, r), d], axis=1))
    flat = np.concatenate([np.asarray(Rs), ts[:, :, None]],
                          axis=2).reshape(-1, 12)
    np.savetxt(path, flat, fmt="%.9e")


def test_kitti_eval_one_command(tmp_path):
    """dataset file -> full swarm -> ATE JSON, via the CLI."""
    poses = str(tmp_path / "poses.txt")
    out = str(tmp_path / "eval.json")
    _fixture_poses(poses)
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "benchmarks",
                                            "kitti_eval.py"),
         "--data", poses, "--robots", "2", "--kf-distance", "3.0",
         "--drift", "0.04", "--rounds", "4", "--out", out],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    results = json.load(open(out))
    assert results["n_robots"] == 2
    assert results["optimizations"] >= 1
    assert results["verified_loop_closures"] >= 1
    assert results["ate_rmse_merged_optimized_m"] is not None
    assert results["ate_merged_improvement"] > 1.0
    assert results["gossip_comm_bytes"] > 0


def test_reference_frames_published_after_optimization():
    """broadcast_tf_callback publishes the origin->map->latest-optimized
    ->current chain; origin-frame composition is consistent."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_e2e_swarm import build_swarm, drive_pipeline, run_optimization
    from cslam_tpu.comm import messages as msgs

    router, clock, world, nodes, handlers, odom = build_swarm(
        2, n_poses=16, drift=0.02)
    frames = []
    nodes[1].bus.subscribe("/cslam/reference_frames", frames.append)
    drive_pipeline(router, nodes, world, odom)
    run_optimization(router, nodes)
    router.spin_until_idle()
    assert frames, "no ReferenceFrames published after optimization"
    fr = frames[-1]
    assert isinstance(fr, msgs.ReferenceFrames)
    # chain consistency: latest_optimized composed with odom_delta equals
    # the published current-in-origin pose
    R = fr.latest_optimized[0] @ fr.odom_delta[0]
    t = fr.latest_optimized[0] @ fr.odom_delta[1] + fr.latest_optimized[1]
    np.testing.assert_allclose(R, fr.current_in_origin[0], atol=1e-5)
    np.testing.assert_allclose(t, fr.current_in_origin[1], atol=1e-4)
    # a viewer can reconstruct the robot's current pose in the origin
    # frame; it must be near the robot's latest odometry ground truth
    gt_R, gt_t = world.pose(fr.robot_id, world.n_poses - 1)
    assert np.linalg.norm(np.asarray(fr.current_in_origin[1]) - gt_t) < 2.0


def test_spectral_matches_csv_written(tmp_path):
    """enable_sparsification_comparison -> spectral_matches.csv +
    greedy_matches.csv appear under the logger folder with the
    reference's columns."""
    native = pytest.importorskip("cslam_tpu.runtime.native")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_e2e_swarm import build_swarm, drive_pipeline

    router, clock, world, nodes, handlers, odom = build_swarm(
        2, n_poses=16, drift=0.02)
    folder = str(tmp_path / "logs")
    logger = native.NativeLogger(folder)
    det = nodes[0].detection
    det.logger = logger
    det.params["evaluation.enable_sparsification_comparison"] = True
    det.lcm.candidate_selector.params[
        "evaluation.enable_sparsification_comparison"] = True
    drive_pipeline(router, nodes, world, odom)
    logger.write_logs()
    spectral = os.path.join(folder, "spectral_matches.csv")
    greedy = os.path.join(folder, "greedy_matches.csv")
    assert os.path.exists(spectral) and os.path.exists(greedy)
    lines = open(spectral).read().strip().splitlines()
    assert lines[0].replace(" ", "") == \
        "robot0_id,robot0_keyframe_id,robot1_id,robot1_keyframe_id,weight"
    assert len(lines) > 1, "no spectral matches recorded"
    r0, k0, r1, k1, w = lines[1].split(",")
    assert int(r0) == 0 and int(r1) == 1
    logger.close()


def test_real_seq_mission_artifact():
    """The committed real-pixel 2-robot mission artifact: loop closures
    earned from photographs (VERDICT round-3 item 4). Regenerate with
    python benchmarks/real_seq_mission_bench.py."""
    path = os.path.join(REPO, "benchmarks", "REAL_SEQ_MISSION.json")
    assert os.path.exists(path), "run real_seq_mission_bench.py"
    r = json.load(open(path))
    assert r["pixels"].startswith("real photographs")
    assert r["n_robots"] == 2
    assert r["verified_inter_robot_loop_closures"] >= 1
    assert r["n_robots_evaluated"] == 2
    assert r["ate_rmse_optimized"] < r["ate_rmse_odometry"]
    assert r["ate_improvement"] > 1.5
