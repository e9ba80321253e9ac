#!/usr/bin/env python
"""Two-robot mission whose loop closures come from REAL pixels.

VERDICT round-3 item 4: every prior mission-level ATE artifact ran on
rendered synthetic worlds. Here the FULL protocol — descriptor gossip
-> kNN match -> sparsification -> broker dispatch -> shipped-weight
SuperPoint/LightGlue verification FROM PHOTOGRAPHIC FRAMES -> RANSAC ->
decentralized GNC-LM — runs on the checked-in real-image sequences:

- robot 0 drives tests/data/real_seq (16 frames, rectangular loop with
  a 4 px self-revisit),
- robot 1 drives tests/data/real_seq_b (14 frames: retraces robot 0's
  bottom row at a 4 px offset — the inter-robot overlap — then an
  exclusive row robot 0 never sees, then its own 4 px self-revisit).

Both sequences are real photographs (matplotlib's public-domain Grace
Hopper portrait) cut by the exact planar-scene camera model
(tests/data/real_seq/make_sequence.py): ground truth is exact, scene
depth is constant, and the pixels carry real photographic statistics
the learned front-end was never trained on. Odometry is the true
relative motion composed with drift noise; PGO must win its ATE back
through closures verified from pixels (reference analog:
rgbd_handler.cpp:657-726 inter-robot verification from camera frames).

    python benchmarks/real_seq_mission_bench.py

Writes benchmarks/REAL_SEQ_MISSION.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms",
                  os.environ.get("CSLAM_EVAL_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir", os.path.join(
    REPO, ".jax_cache", os.environ.get("CSLAM_EVAL_PLATFORM", "cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cslam_tpu.backend import pgo  # noqa: E402
from cslam_tpu.comm.bus import (InProcessBus, InProcessRouter,  # noqa: E402
                                ManualClock)
from cslam_tpu.frontend.global_descriptor_component import \
    GlobalDescriptorComponent  # noqa: E402
from cslam_tpu.frontend.rgbd_handler import RGBDHandler  # noqa: E402
from cslam_tpu.node import SwarmNode  # noqa: E402
from cslam_tpu.ops import se3  # noqa: E402
from cslam_tpu.utils.evaluation import ate_rmse  # noqa: E402
from cslam_tpu.utils.image_sequence import open_sequence  # noqa: E402

SEQ_DIRS = [os.path.join(REPO, "tests", "data", "real_seq"),
            os.path.join(REPO, "tests", "data", "real_seq_b")]


def drifted_odometry(R, t, seed, drift=0.02):
    """Integrate true relative motions composed with SE(3) noise."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    oR, ot = [R[0]], [t[0]]
    for k in range(1, len(t)):
        Rm = R[k - 1].T @ R[k]
        tm = R[k - 1].T @ (t[k] - t[k - 1])
        xi = rng.standard_normal(6).astype(np.float32) * drift
        dR, dt = (np.asarray(a) for a in se3.se3_exp(jnp.asarray(xi)))
        Rm, tm = Rm @ dR, tm + Rm @ dt
        oR.append((oR[-1] @ Rm).astype(np.float32))
        ot.append((ot[-1] + oR[-2] @ tm).astype(np.float32))
    return oR, ot


def make_params(robot_id, n_robots, budget=6, sim_threshold=0.75):
    return {
        "robot_id": robot_id,
        "max_nb_robots": n_robots,
        "frontend.features": "learned",
        "frontend.lightglue_score_threshold": 0.1,
        # real-pixel operating point (tests/test_real_pixels.py): the
        # flag-stripe perceptual aliasing collects ~20 spurious
        # consistent matches, so the bar sits at 30
        "frontend.pnp_min_inliers": 30,
        "frontend.max_queue_size": 5,
        "frontend.keyframe_generation_ratio_threshold": 1.0,
        "frontend.similarity_threshold": sim_threshold,
        "frontend.global_descriptor_technique": "custom",
        "frontend.inter_robot_loop_closure_budget": budget,
        "frontend.nb_best_matches": 8,
        "frontend.intra_loop_min_inbetween_keyframes": 5,
        "frontend.detection_publication_max_elems_per_msg": 8,
        "frontend.enable_intra_robot_loop_closures": True,
        "frontend.enable_sparsification": True,
        "frontend.use_vertex_cover_selection": True,
        "frontend.sensor_type": "rgbd",
        "backend.max_waiting_time_sec": 60.0,
        "neighbor_management.enable_neighbor_monitoring": False,
        "neighbor_management.init_delay_sec": 0.0,
        "neighbor_management.max_heartbeat_delay_sec": 5.0,
        "evaluation.enable_logs": False,
        "evaluation.enable_simulated_rendezvous": False,
        "evaluation.rendezvous_schedule_file": "",
        "evaluation.enable_sparsification_comparison": False,
    }


def main(budget=6, sim_threshold=0.75, drift=0.02, seed=4):
    t0 = time.perf_counter()
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_e2e_swarm import run_optimization

    from cslam_tpu.models.cosplace import CosPlace
    model = CosPlace({"frontend.nn_checkpoint": "shipped"})
    assert model.enabled, "no shipped CosPlace weights"

    # ---- per-stage wall accumulators (round-4 verdict item 6: the
    # real-pixel artifact needs a per-stage split). Class-level wraps
    # so bus subscriptions capture the timed versions. Device-time
    # reference for each stage's kernels is BENCH_DETAIL.json
    # hot_loops (slope-timed on chip); a live mission cannot separate
    # device time from dispatch wall per call.
    import functools
    stage_wall = {"feature_extraction": 0.0, "verification": 0.0,
                  "place_inference": 0.0}

    def timed(fn, key):
        @functools.wraps(fn)
        def wrapped(*a, **k):
            ts = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                stage_wall[key] += time.perf_counter() - ts
        return wrapped

    RGBDHandler.compute_local_descriptors = timed(
        RGBDHandler.compute_local_descriptors, "feature_extraction")
    RGBDHandler.receive_local_image_descriptors = timed(
        RGBDHandler.receive_local_image_descriptors, "verification")
    RGBDHandler.receive_local_keyframe_match = timed(
        RGBDHandler.receive_local_keyframe_match, "verification")
    model.compute_embedding = timed(model.compute_embedding,
                                    "place_inference")
    model.compute_embeddings_batch = timed(model.compute_embeddings_batch,
                                           "place_inference")

    seqs = [open_sequence(d) for d in SEQ_DIRS]
    n_robots = len(seqs)
    router = InProcessRouter()
    clock = ManualClock()
    # full GNC anneal depth (library default): rounds are cheap with the
    # round-4 solver (2 warm-started LM steps each) and capping them at
    # 6 measured 0.059 vs 0.035 final ATE on the lidar mission
    cfg = pgo.PGOConfig(lm_max_iters=15, cg_max_iters=80)
    nodes, handlers = {}, {}
    for rid in range(n_robots):
        bus = InProcessBus(router, rid)
        params = make_params(rid, n_robots, budget, sim_threshold)
        handlers[rid] = RGBDHandler(params, bus, clock, max_keypoints=128)
        GlobalDescriptorComponent(params, bus, model=model, batch_size=1)
        nodes[rid] = SwarmNode(params, bus, clock, descriptor_model=model,
                               pgo_config=cfg)

    truths, odoms = [], []
    for rid, seq in enumerate(seqs):
        R, t = seq.poses
        truths.append((R, t))
        odoms.append(drifted_odometry(R, t, seed + rid, drift))

    t_setup = time.perf_counter()
    depth_shape = seqs[0].frame(0).shape[:2]
    n_kf = 0
    kf_to_pose = {rid: {} for rid in range(n_robots)}
    Z = json.load(open(os.path.join(SEQ_DIRS[0],
                                    "meta.json")))["scene_depth_m"]
    max_frames = max(len(s) for s in seqs)
    for k in range(max_frames):
        for rid, seq in enumerate(seqs):
            if k >= len(seq):
                continue
            depth = np.full(depth_shape, Z, np.float32)
            handlers[rid].add_sensor_data(
                seq.frame(k), depth, seq.intrinsics(),
                (odoms[rid][0][k], odoms[rid][1][k]))
            kf_id = handlers[rid].process_new_sensor_data()
            if kf_id is not None:
                kf_to_pose[rid][kf_id] = k
                n_kf += 1
        router.spin_until_idle(max_rounds=2000)
    for _ in range(4):
        for node in nodes.values():
            node.tick_detection_publication()
        router.spin_until_idle(max_rounds=2000)
        for node in nodes.values():
            node.tick_inter_robot_detection()
        router.spin_until_idle(max_rounds=2000)
    t_pipeline = time.perf_counter()

    run_optimization(router, nodes, rounds=20)
    t_opt = time.perf_counter()

    n_intra = sum(sum(1 for f in n.backend.local_factors if f.is_loop)
                  for n in nodes.values())
    n_inter = sum(len(lcs)
                  for n in nodes.values()
                  for lcs in n.backend.inter_robot_loop_closures.values()
                  ) // n_robots
    ates_raw, ates_opt = [], []
    for rid in range(n_robots):
        gt_t = truths[rid][1]
        est = nodes[rid].backend.current_pose_estimates
        own = [k for k in sorted(est) if k[0] == rid
               and k[1] in kf_to_pose[rid]]
        if len(own) < 3:
            continue
        pose_idx = [kf_to_pose[rid][k[1]] for k in own]
        est_t = np.stack([est[k][1] for k in own])
        ates_opt.append(ate_rmse(est_t, gt_t[pose_idx]))
        ates_raw.append(ate_rmse(
            np.stack([odoms[rid][1][i] for i in pose_idx]),
            gt_t[pose_idx]))

    results = {
        "platform": jax.devices()[0].platform,
        "pixels": "real photographs (checked-in real_seq + real_seq_b)",
        "front_end": "shipped CosPlace + SuperPoint + LightGlue weights",
        "n_robots": n_robots,
        "n_keyframes": n_kf,
        "verified_intra_loop_closures": n_intra,
        "verified_inter_robot_loop_closures": n_inter,
        "pipeline_wall_s": t_pipeline - t_setup,
        "optimization_wall_s": t_opt - t_pipeline,
        "stage_wall_s": {k: round(v, 3) for k, v in stage_wall.items()},
        "stage_device_reference":
            "per-kernel on-chip device times in BENCH_DETAIL.json "
            "hot_loops (SuperPoint/LightGlue/CosPlace/verification "
            "slope-timed); live-mission walls include per-dispatch "
            "relay overhead (bench relay_sync_floor_ms)",
        "n_robots_evaluated": len(ates_opt),
        "ate_rmse_odometry": float(np.mean(ates_raw)) if ates_raw else None,
        "ate_rmse_optimized": float(np.mean(ates_opt)) if ates_opt else None,
        "ate_improvement": float(np.mean(ates_raw) / np.mean(ates_opt))
        if ates_opt else None,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "REAL_SEQ_MISSION.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=6)
    ap.add_argument("--sim-threshold", type=float, default=0.75)
    ap.add_argument("--drift", type=float, default=0.02)
    args = ap.parse_args()
    main(budget=args.budget, sim_threshold=args.sim_threshold,
         drift=args.drift)
