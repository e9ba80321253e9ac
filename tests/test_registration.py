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


def test_horn_rotation_matches_svd_kabsch():
    """horn_rotation (quaternion eigenproblem by matrix squaring, no
    batched LAPACK) agrees with SVD-Kabsch on the objective tr(R^T cov)
    and always returns a PROPER rotation — including reflection-shaped
    covariances where SVD needs its det-flip guard."""
    rng = np.random.default_rng(3)
    for trial in range(50):
        n = int(rng.integers(3, 40))
        src = rng.standard_normal((n, 3)).astype(np.float32)
        A = rng.standard_normal((3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        noise = rng.standard_normal((n, 3)) * rng.choice([0.0, 0.01, 0.3])
        dst = (src @ Q.T + noise).astype(np.float32)
        w = rng.random(n).astype(np.float32)
        ws = w.sum()
        mu_s = (src * w[:, None]).sum(0) / ws
        mu_d = (dst * w[:, None]).sum(0) / ws
        cov = ((dst - mu_d) * w[:, None]).T @ (src - mu_s) / ws
        Rh = np.asarray(registration.horn_rotation(jnp.asarray(cov)))
        assert np.linalg.det(Rh) == pytest.approx(1.0, abs=1e-4)
        np.testing.assert_allclose(Rh @ Rh.T, np.eye(3), atol=1e-5)
        U, _, Vt = np.linalg.svd(cov)
        S = np.diag([1.0, 1.0, np.linalg.det(U @ Vt)])
        Rs = U @ S @ Vt
        assert np.trace(Rh.T @ cov) >= np.trace(Rs.T @ cov) - 1e-5
    # reflection-shaped (negative-determinant) covariances
    for trial in range(20):
        cov = rng.standard_normal((3, 3)).astype(np.float32)
        Rh = np.asarray(registration.horn_rotation(jnp.asarray(cov)))
        assert np.linalg.det(Rh) == pytest.approx(1.0, abs=1e-4)
        U, _, Vt = np.linalg.svd(cov)
        S = np.diag([1.0, 1.0, np.linalg.det(U @ Vt)])
        assert np.trace(Rh.T @ cov) >= np.trace((U @ S @ Vt).T @ cov) - 1e-5
    # degenerate: zero covariance -> identity
    np.testing.assert_allclose(
        np.asarray(registration.horn_rotation(jnp.zeros((3, 3)))),
        np.eye(3), atol=1e-6)


def test_weighted_kabsch_exact_recovery():
    rng = np.random.default_rng(4)
    src = rng.standard_normal((32, 3)).astype(np.float32)
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.standard_normal(3).astype(np.float32)
    dst = src @ Q.T + t
    R_est, t_est = registration.weighted_kabsch(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(32))
    np.testing.assert_allclose(np.asarray(R_est), Q, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-5)
