"""GNC-ICP registration: exact recovery, robustness to outliers and
partial overlap, voxel downsampling."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import registration, se3


def make_cloud(rng, n=512, scale=10.0):
    return (rng.standard_normal((n, 3)) * scale * [1, 1, 0.2]).astype(
        np.float32)


def apply_transform(pts, R, t):
    return pts @ np.asarray(R).T + np.asarray(t)


def pad(pts, cap):
    out = np.zeros((cap, 3), dtype=np.float32)
    out[:len(pts)] = pts
    mask = np.zeros(cap, dtype=np.float32)
    mask[:len(pts)] = 1.0
    return jnp.asarray(out), jnp.asarray(mask)


def test_icp_recovers_transform():
    rng = np.random.default_rng(0)
    src = make_cloud(rng)
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.02, -0.03, 0.4],
                                                dtype=jnp.float32)))
    t_true = np.array([1.0, -0.5, 0.1], dtype=np.float32)
    dst = apply_transform(src, R_true, t_true)
    s, sm = pad(src, 512)
    d, dm = pad(dst, 512)
    res = registration.gnc_icp(s, sm, d, dm, jnp.eye(3), jnp.zeros(3),
                               max_corr_dist=2.0)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.R), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=1e-2)


def test_icp_robust_to_outliers_and_noise():
    rng = np.random.default_rng(1)
    src = make_cloud(rng, n=400)
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.0, 0.0, 0.3],
                                                dtype=jnp.float32)))
    t_true = np.array([0.5, 0.2, 0.0], dtype=np.float32)
    dst = apply_transform(src, R_true, t_true)
    dst += rng.standard_normal(dst.shape).astype(np.float32) * 0.02
    # 20% outliers in dst
    n_out = 100
    outliers = make_cloud(rng, n=n_out, scale=30.0)
    dst_full = np.concatenate([dst, outliers])
    s, sm = pad(src, 512)
    d, dm = pad(dst_full, 512)
    res = registration.gnc_icp(s, sm, d, dm, jnp.eye(3), jnp.zeros(3),
                               max_corr_dist=1.0)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.R), R_true, atol=0.02)
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=0.1)


def test_icp_yaw_init_large_rotation():
    """90-degree yaw: plain ICP fails, yaw-seeded ICP succeeds."""
    rng = np.random.default_rng(2)
    src = make_cloud(rng, n=600)
    yaw = np.pi / 2
    R_true = np.asarray(registration.yaw_rotation(jnp.float32(yaw)))
    dst = apply_transform(src, R_true, np.zeros(3))
    s, sm = pad(src, 1024)
    d, dm = pad(dst, 1024)
    res_seeded = registration.gnc_icp(
        s, sm, d, dm, registration.yaw_rotation(jnp.float32(yaw)),
        jnp.zeros(3), max_corr_dist=2.0)
    np.testing.assert_allclose(np.asarray(res_seeded.R), R_true, atol=1e-2)


def test_voxel_downsample():
    rng = np.random.default_rng(3)
    pts = make_cloud(rng, n=1000, scale=5.0)
    p, m = pad(pts, 1024)
    ds, dm = registration.voxel_downsample(p, m, 1.0)
    kept = int(np.asarray(dm).sum())
    assert 0 < kept < 1000
    kept_pts = np.asarray(ds)[np.asarray(dm) > 0]
    # per-voxel centroids, verified against a brute-force grouping
    # (matches open3d voxel_down_sample, lidar_handler_node.py:180)
    vox = np.floor((pts + 100.0) / 1.0).astype(int)
    groups = {}
    for pt, v in zip(pts, vox):
        groups.setdefault(tuple(v), []).append(pt)
    expect = sorted(tuple(np.mean(g, axis=0).round(4))
                    for g in groups.values())
    got = sorted(tuple(r.round(4)) for r in kept_pts)
    assert len(expect) == len(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-3)
    # downsampled set covers the cloud at voxel resolution
    for q in pts[rng.choice(1000, 20)]:
        assert np.min(np.linalg.norm(kept_pts - q, axis=1)) < 2.0
