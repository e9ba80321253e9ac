#!/usr/bin/env python
"""cslam_tpu quickstart: the library surface in five bites.

Runs on CPU in under a minute (set up like tests/conftest.py); the same
code runs unchanged on a TPU chip — drop the platform override.

  python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init

import numpy as np
import jax.numpy as jnp


def descriptor_matching():
    """1. Global-descriptor database: add + cosine top-k search."""
    from cslam_tpu.matching.descriptor_db import DescriptorDatabase

    rng = np.random.default_rng(0)
    db = DescriptorDatabase()          # method="auto": pallas on TPU
    for kf_id in range(200):
        v = rng.standard_normal(512).astype(np.float32)
        db.add_item(v / np.linalg.norm(v), ("robot0", kf_id))
    query = rng.standard_normal(512).astype(np.float32)
    items, sims = db.search(query, k=5)
    print(f"[knn] top-5 of {len(db)}: {items[0]} @ {sims[0]:.3f}")


def point_cloud_registration():
    """2. GNC-TLS ICP between two noisy views of one cloud."""
    from cslam_tpu.ops import se3
    from cslam_tpu.ops.registration import gnc_icp

    rng = np.random.default_rng(1)
    src = rng.standard_normal((512, 3)).astype(np.float32) * 2.0
    R_true, t_true = se3.se3_exp(jnp.asarray(
        [0.05, -0.1, 0.08, 0.3, -0.2, 0.1], dtype=jnp.float32))
    dst = src @ np.asarray(R_true).T + np.asarray(t_true)
    dst = dst + rng.standard_normal(dst.shape).astype(np.float32) * 0.005
    mask = jnp.ones(512, dtype=jnp.float32)
    result = gnc_icp(jnp.asarray(src), mask, jnp.asarray(dst), mask,
                     jnp.eye(3), jnp.zeros(3))
    err = np.linalg.norm(np.asarray(result.t) - np.asarray(t_true))
    print(f"[icp] translation error {err:.4f} m "
          f"(inliers {float(result.inlier_frac):.2f}, "
          f"success={bool(result.success)})")


def robust_pose_graph_optimization():
    """3. GNC-LM pose-graph solve with an injected outlier loop."""
    from cslam_tpu.backend import pgo
    from cslam_tpu.backend.factor_graph import (BetweenFactor, FactorGraph,
                                                diag_sqrt_info)
    from cslam_tpu.ops import se3

    rng = np.random.default_rng(2)
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    fg = FactorGraph()
    n = 60
    # circle trajectory, noisy odometry + one true loop + one outlier
    Rk, tk = np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32)
    fg.add_node((0, 0), Rk, tk)
    step = np.asarray(se3.se3_exp(jnp.asarray(
        [0, 0, 2 * np.pi / n, 1.0, 0, 0], dtype=jnp.float32))[0])
    t_step = np.asarray(se3.se3_exp(jnp.asarray(
        [0, 0, 2 * np.pi / n, 1.0, 0, 0], dtype=jnp.float32))[1])
    for k in range(n - 1):
        noise_R, noise_t = se3.se3_exp(jnp.asarray(
            rng.standard_normal(6) * 0.0005, dtype=jnp.float32))
        Rm = step @ np.asarray(noise_R)
        tm = t_step + np.asarray(noise_t)
        fg.add_between(BetweenFactor((0, k), (0, k + 1), Rm, tm, sq))
        tk = Rk @ tm + tk
        Rk = Rk @ Rm
        fg.add_node((0, k + 1), Rk, tk)
    fg.add_between(BetweenFactor((0, 0), (0, n - 1),
                                 step.T, -step.T @ t_step, sq, is_loop=True))
    fg.add_between(BetweenFactor((0, 5), (0, 40),  # gross outlier
                                 np.eye(3, dtype=np.float32),
                                 np.asarray([9., 9., 9.], np.float32), sq,
                                 is_loop=True))
    fg.set_prior((0, 0))
    result = pgo.optimize(fg, pgo.PGOConfig())
    w = np.asarray(result.weights)[:fg.num_factors]
    print(f"[pgo] cost {float(result.initial_cost):.1f} -> "
          f"{float(result.cost):.2f}; outlier weight "
          f"{w[-1]:.2f}, true-loop weight {w[-2]:.2f}")


def budgeted_loop_closure_selection():
    """4. MAC: pick the 3 candidate edges that maximize connectivity."""
    from cslam_tpu.sparsification.mac import MAC, select_measurements
    from cslam_tpu.utils.edges import Edge

    fixed = [Edge(i, i + 1, 1.0) for i in range(29)]       # odometry chain
    cands = [Edge(0, 29, 1.0), Edge(0, 15, 1.0), Edge(14, 16, 1.0),
             Edge(5, 25, 1.0), Edge(10, 20, 1.0), Edge(1, 3, 1.0)]
    mac = MAC(fixed, cands, num_poses=30)
    w0 = np.zeros(len(cands), dtype=np.float32)
    w0[:3] = 1.0
    res = mac.fw_subset(w0, k=3)
    picked = select_measurements(cands, res.w)
    print(f"[mac] selected {[(e.i, e.j) for e in picked]} "
          f"(lambda2 upper bound {res.upper_bound:.3f})")


def learned_feature_matching():
    """5. Shipped SuperPoint + LightGlue: detect and match across a
    synthetic homography warp with the in-repo-trained weights."""
    from cslam_tpu.models import zoo
    sp_ckpt = zoo.shipped_checkpoint("superpoint_synth.npz")
    lg_ckpt = zoo.shipped_checkpoint("lightglue_synth.npz")
    if not (sp_ckpt and lg_ckpt):
        print("[learned] shipped weights absent; skipping")
        return
    from cslam_tpu.models.superpoint import SuperPoint
    from cslam_tpu.models.lightglue import LightGlue
    from cslam_tpu.models.synthetic_shapes import make_pair_sample

    rng = np.random.default_rng(0)
    pair = make_pair_sample(rng, 120, 160)
    sp = SuperPoint(checkpoint=sp_ckpt, max_keypoints=128)
    lg = LightGlue(checkpoint=lg_ckpt,
                   num_layers=zoo.SHIPPED_LIGHTGLUE_LAYERS)
    xy0, d0, s0, m0 = sp.extract_features(pair["img0"])
    xy1, d1, s1, m1 = sp.extract_features(pair["img1"])
    idx1, valid = lg.match(d0, xy0, m0, d1, xy1, m1, size=(160, 120))
    print(f"[learned] {int(np.asarray(m0).sum())}+"
          f"{int(np.asarray(m1).sum())} keypoints, "
          f"{int(np.asarray(valid).sum())} LightGlue matches "
          f"across the warp")


def real_sequence_verification():
    """6. Real pixels end to end: read the checked-in photographic
    KITTI-layout sequence, extract with the shipped weights, and verify
    the loop's revisit with a metric relative pose."""
    import os

    from cslam_tpu.models import zoo
    sp_ckpt = zoo.shipped_checkpoint("superpoint_synth.npz")
    if not sp_ckpt:
        print("[real] shipped weights absent; skipping")
        return
    from cslam_tpu.models.superpoint import SuperPoint
    from cslam_tpu.ops.matching2d import verify_keyframe_pair
    from cslam_tpu.utils.image_sequence import open_sequence

    seq_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                           "tests", "data", "real_seq")
    seq = open_sequence(seq_dir)          # auto-detects KITTI/TUM/glob
    intr = seq.intrinsics()
    sp = SuperPoint(checkpoint=sp_ckpt, max_keypoints=128)

    def feats3d(i, depth_m=2.0):
        gray = np.asarray(seq.frame(i), np.float32).mean(-1) / 255.0
        xy, desc, _, mask = sp.extract_features(gray)
        xy = np.asarray(xy)
        z = np.full(len(xy), depth_m, np.float32)
        pts = np.stack([(xy[:, 0] - intr.cx) / intr.fx * z,
                        (xy[:, 1] - intr.cy) / intr.fy * z, z], axis=-1)
        return desc, pts, mask

    d0, p0, m0 = feats3d(0)
    d1, p1, m1 = feats3d(14)              # frame 14 revisits frame 0
    res, n = verify_keyframe_pair(d0, p0, m0, d1, p1, m1, min_inliers=30)
    print(f"[real] revisit verified={bool(res.success)} "
          f"({int(res.num_inliers)} RANSAC inliers, "
          f"t = {np.round(np.asarray(res.t), 3).tolist()} m; "
          f"ground truth [-0.04, -0.04, 0])")


if __name__ == "__main__":
    descriptor_matching()
    point_cloud_registration()
    robust_pose_graph_optimization()
    budgeted_loop_closure_selection()
    learned_feature_matching()
    real_sequence_verification()
    print("quickstart ok")
