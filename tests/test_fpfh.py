"""FPFH features: rotation invariance, correspondence recovery, and
FPFH-seeded global registration."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import fpfh, registration, se3
from cslam_tpu.ops.matching2d import ransac_rigid3d


def structured_cloud(rng, n=256):
    """Cloud with geometric variety: a plane patch, an edge, a corner."""
    n3 = n // 3
    plane = np.stack([rng.uniform(-3, 3, n3), rng.uniform(-3, 3, n3),
                      rng.normal(0, 0.01, n3)], axis=1)
    wall = np.stack([rng.uniform(-3, 3, n3),
                     np.full(n3, 3.0) + rng.normal(0, 0.01, n3),
                     rng.uniform(0, 2, n3)], axis=1)
    pillar = np.stack([np.full(n - 2 * n3, -3.0) + rng.normal(0, 0.01,
                                                              n - 2 * n3),
                       rng.uniform(-3, 3, n - 2 * n3),
                       rng.uniform(0, 2, n - 2 * n3)], axis=1)
    return np.concatenate([plane, wall, pillar]).astype(np.float32)


def test_fpfh_rotation_invariance():
    rng = np.random.default_rng(0)
    pts = structured_cloud(rng)
    mask = jnp.ones(len(pts))
    R = np.asarray(se3.so3_exp(jnp.asarray([0.2, -0.1, 0.7],
                                           dtype=jnp.float32)))
    f0 = np.asarray(fpfh.fpfh(jnp.asarray(pts), mask))
    f1 = np.asarray(fpfh.fpfh(jnp.asarray(pts @ R.T), mask))
    # descriptors of corresponding points nearly identical under rotation
    sims = np.sum(f0 * f1, axis=1)
    assert np.median(sims) > 0.95


def test_fpfh_distinguishes_geometry():
    rng = np.random.default_rng(1)
    pts = structured_cloud(rng, n=240)
    mask = jnp.ones(len(pts))
    f = np.asarray(fpfh.fpfh(jnp.asarray(pts), mask))
    n3 = 80
    plane_mean = f[:n3].mean(axis=0)
    pillar_mean = f[2 * n3:].mean(axis=0)
    # different structures produce different mean histograms
    assert np.linalg.norm(plane_mean - pillar_mean) > 0.05


def test_fpfh_correspondences_and_registration():
    """Full TEASER-replacement path: FPFH -> mutual correspondences ->
    RANSAC alignment -> GNC-ICP refinement, with no pose prior."""
    rng = np.random.default_rng(2)
    pts = structured_cloud(rng, n=300)
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.05, 0.02, 0.9],
                                                dtype=jnp.float32)))
    t_true = np.array([2.0, -1.0, 0.3], dtype=np.float32)
    dst = pts @ R_true.T + t_true
    mask = jnp.ones(len(pts))
    fa = fpfh.fpfh(jnp.asarray(pts), mask)
    fb = fpfh.fpfh(jnp.asarray(dst), mask)
    idx, valid = fpfh.fpfh_correspondences(fa, mask, fb, mask)
    valid_np = np.asarray(valid)
    idx_np = np.asarray(idx)
    # enough correspondences and most are correct (identity permutation)
    assert valid_np.sum() > 50
    correct = np.mean(idx_np[valid_np > 0] ==
                      np.arange(len(pts))[valid_np > 0])
    assert correct > 0.5, f"only {correct:.2f} correct correspondences"
    # robust alignment from the correspondences
    res = ransac_rigid3d(jnp.asarray(pts), jnp.asarray(dst)[idx],
                         valid, inlier_threshold=0.3)
    assert bool(res.success)
    # refine with GNC-ICP
    refined = registration.gnc_icp(jnp.asarray(pts), mask, jnp.asarray(dst),
                                   mask, res.R, res.t, max_corr_dist=1.0)
    np.testing.assert_allclose(np.asarray(refined.R), R_true, atol=2e-2)
    np.testing.assert_allclose(np.asarray(refined.t), t_true, atol=1e-1)
