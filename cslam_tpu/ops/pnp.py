"""Batched 2D-3D (PnP) RANSAC — verification without query-side depth.

The reference verifies loop closures with rtabmap RegistrationVis PnP
RANSAC (2D keypoints against 3D landmarks, rgbd_handler.cpp:696-726),
so a query frame needs no depth; the repo's 3D-3D path
(ops/matching2d.ransac_rigid3d) requires valid depth on BOTH sides and
loses closures the reference would accept when the query frame's depth
is sparse. This module closes that gap TPU-natively.

Design (no LAPACK anywhere — the batched-small-eigh/svd pathology,
CLAUDE.md):

- minimal solver: P3P via the Grunert depth-ratio system. For a
  3-correspondence sample with world points W_i and unit query rays
  f_i, depths s_1, s_2 = u s_1, s_3 = v s_1 satisfy three law-of-
  cosines equations; eliminating s_1 and u leaves a one-variable root
  problem g_branch(v) = 0 with two u-branches. Instead of the classic
  quartic-coefficient route (numerically treacherous in f32), g is
  evaluated on a fixed log-spaced v grid and every sign change is
  refined by a FIXED-iteration bisection — branch-free, exact to f32,
  and fully batched over (hypotheses x branches x root slots).
- each recovered depth triple gives 3 camera-frame points; the pose is
  closed-form Kabsch (ops/registration.weighted_kabsch — quaternion by
  matrix squaring, VPU-only).
- all candidate poses (hypotheses x 2 branches x root slots) are
  scored at once on normalized-reprojection consensus with a
  cheirality gate; the winner is polished by a few fixed Gauss-Newton
  steps on its inliers (6-dof, jacfwd, one batched einsum pipeline).

Conventions match ransac_rigid3d: the returned (R, t) maps frame-a
(3D landmark) points into the query camera frame b; rays are
normalized image coordinates (x/z, y/z).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cslam_tpu.ops.batched_linalg import batched_inv_small
from cslam_tpu.ops.matching2d import RansacResult, mutual_match
from cslam_tpu.ops.registration import weighted_kabsch
from cslam_tpu.ops import se3

# v-grid for the Grunert root scan: depth RATIOS s3/s1 of two scene
# points seen by one camera live well inside [1/8, 8] (a wider true
# ratio implies extreme perspective the consensus stage would reject
# anyway). 128 cells resolve every quartic root separation seen in
# randomized tests; missed pathological roots only waste a hypothesis.
_V_GRID = 128
_V_LO, _V_HI = 0.125, 8.0
_BISECT_ITERS = 24
_ROOT_SLOTS = 4  # a quartic has <= 4 real roots across both branches


def _grunert_residual(v, cos_ab, cos_ac, cos_bc, a2, b2, c2, branch):
    """g(v) for one u-branch; returns (g, valid).

    Equations (depths s1, s2 = u s1, s3 = v s1; angles: cos_ab between
    rays 1-2, cos_ac 1-3, cos_bc 2-3; squared distances c2 = |W1-W2|^2,
    b2 = |W1-W3|^2, a2 = |W2-W3|^2):
      Q(v)  = 1 + v^2 - 2 v cos_ac           (s1^2 Q = b2)
      u^2 - 2 cos_ab u + (1 - c2 Q / b2) = 0 -> u = cos_ab +- sqrt(D)
      g(v)  = u^2 + v^2 - 2 u v cos_bc - a2 Q / b2
    """
    Q = 1.0 + v * v - 2.0 * v * cos_ac
    Cv = c2 * Q / jnp.maximum(b2, 1e-12)
    disc = cos_ab * cos_ab - 1.0 + Cv
    valid = (disc >= 0.0) & (Q > 1e-9)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = cos_ab + branch * sq
    valid = valid & (u > 1e-6)
    g = u * u + v * v - 2.0 * u * v * cos_bc - a2 * Q / jnp.maximum(
        b2, 1e-12)
    return g, valid, u


def _p3p_poses(W, f, key_dummy=None):
    """All P3P candidate poses for ONE 3-correspondence sample.

    W: (3, 3) world points (frame a); f: (3, 3) unit rays (frame b).
    Returns (R, t) stacked (2 * _ROOT_SLOTS, 3, 3) / (.., 3) plus a
    validity mask — invalid slots carry identity poses and are masked
    out of consensus scoring."""
    c2 = jnp.sum((W[0] - W[1]) ** 2)
    b2 = jnp.sum((W[0] - W[2]) ** 2)
    a2 = jnp.sum((W[1] - W[2]) ** 2)
    cos_ab = jnp.dot(f[0], f[1])
    cos_ac = jnp.dot(f[0], f[2])
    cos_bc = jnp.dot(f[1], f[2])

    vgrid = jnp.logspace(jnp.log10(_V_LO), jnp.log10(_V_HI), _V_GRID + 1)

    def roots_for_branch(branch):
        g, valid, _ = _grunert_residual(vgrid, cos_ab, cos_ac, cos_bc,
                                        a2, b2, c2, branch)
        # sign change on a valid cell
        change = (jnp.sign(g[:-1]) * jnp.sign(g[1:]) < 0.0) & \
            valid[:-1] & valid[1:]
        # pick up to _ROOT_SLOTS change cells (earliest first)
        score = jnp.where(change, 1.0, 0.0) * \
            (2.0 - jnp.arange(_V_GRID) / _V_GRID)
        _, cells = jax.lax.top_k(score, _ROOT_SLOTS)
        slot_ok = change[cells]
        lo = vgrid[cells]
        hi = vgrid[cells + 1]

        def bisect(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            g_lo, _, _ = _grunert_residual(lo, cos_ab, cos_ac, cos_bc,
                                           a2, b2, c2, branch)
            g_mid, _, _ = _grunert_residual(mid, cos_ab, cos_ac, cos_bc,
                                            a2, b2, c2, branch)
            same = jnp.sign(g_mid) == jnp.sign(g_lo)
            return jnp.where(same, mid, lo), jnp.where(same, hi, mid)

        lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bisect, (lo, hi))
        v = 0.5 * (lo + hi)
        _, v_ok, u = _grunert_residual(v, cos_ab, cos_ac, cos_bc,
                                       a2, b2, c2, branch)
        Q = 1.0 + v * v - 2.0 * v * cos_ac
        s1 = jnp.sqrt(jnp.maximum(b2, 1e-12) /
                      jnp.maximum(Q, 1e-9))
        return v, u, s1, slot_ok & v_ok

    vs, us, s1s, oks = jax.vmap(roots_for_branch)(jnp.array([1.0, -1.0]))
    vs, us, s1s, oks = (x.reshape(-1) for x in (vs, us, s1s, oks))

    def pose_from_root(v, u, s1, ok):
        depths = jnp.stack([s1, u * s1, v * s1])
        X = depths[:, None] * f            # camera-frame points
        R, t = weighted_kabsch(W, X, jnp.ones(3))
        return R, t

    Rs, ts = jax.vmap(pose_from_root)(vs, us, s1s, oks)
    return Rs, ts, oks


def _reproject_residuals(R, t, pts3d, rays):
    """Normalized-plane reprojection residual per point + cheirality."""
    X = pts3d @ R.T + t
    z = X[:, 2]
    front = z > 1e-6
    pred = X[:, :2] / jnp.maximum(z, 1e-6)[:, None]
    res = jnp.linalg.norm(pred - rays, axis=-1)
    return res, front


def _gn_polish(R, t, pts3d, rays, weights, iters=8):
    """Fixed-iteration Gauss-Newton on weighted reprojection error.

    6-dof right-perturbation of (R, t); each iteration is one batched
    jacfwd over the 2N residuals + a 6x6 solve (Gauss-Jordan inverse,
    no LAPACK)."""

    def residuals(xi, R, t):
        dR, dt = se3.se3_exp(xi)
        Rc, tc = se3.compose(R, t, dR, dt)
        X = pts3d @ Rc.T + tc
        z = jnp.maximum(X[:, 2], 1e-6)
        pred = X[:, :2] / z[:, None]
        return ((pred - rays) * weights[:, None]).reshape(-1)

    jac = jax.jacfwd(residuals, argnums=0)

    def step(_, Rt):
        R, t = Rt
        r = residuals(jnp.zeros(6), R, t)
        J = jac(jnp.zeros(6), R, t)
        H = J.T @ J + 1e-8 * jnp.eye(6)
        g = J.T @ r
        dx = -(batched_inv_small(H[None])[0] @ g)
        dR, dt = se3.se3_exp(dx)
        return se3.compose(R, t, dR, dt)

    return jax.lax.fori_loop(0, iters, step, (R, t))


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_pnp(pts3d, rays, valid, inlier_threshold=0.01,
               min_inliers=6, num_hypotheses=128, seed=0):
    """Robust absolute pose from matched 3D points and 2D rays.

    Args:
      pts3d: (N, 3) landmark points in frame a.
      rays: (N, 2) matched normalized image coordinates in the query
        camera b (x/z, y/z) — NO depth needed.
      valid: (N,) float mask of usable correspondences.
      inlier_threshold: max normalized-plane residual (0.01 ~ 5 px at
        f=500).
      min_inliers: success gate (reference frontend.pnp_min_inliers).
      num_hypotheses: static P3P sample count; each yields up to
        2 x _ROOT_SLOTS candidate poses, all scored in one batch.

    Returns RansacResult (pose maps frame-a points into the query
    camera frame), with a [omega, v] covariance diagonal from the
    polished Gauss-Newton system.
    """
    N = pts3d.shape[0]
    key = jax.random.PRNGKey(seed)
    probs = valid / jnp.maximum(jnp.sum(valid), 1.0)
    samples = jax.random.choice(key, N, shape=(num_hypotheses, 3),
                                replace=True, p=probs)
    f = jnp.concatenate([rays, jnp.ones_like(rays[:, :1])], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    Rs, ts, oks = jax.vmap(lambda s: _p3p_poses(pts3d[s], f[s]))(samples)
    H = num_hypotheses * 2 * _ROOT_SLOTS
    Rs = Rs.reshape(H, 3, 3)
    ts = ts.reshape(H, 3)
    oks = oks.reshape(H)

    # consensus over all candidate poses at once
    X = jnp.einsum("hij,nj->hni", Rs, pts3d) + ts[:, None, :]
    z = X[..., 2]
    pred = X[..., :2] / jnp.maximum(z, 1e-6)[..., None]
    res = jnp.linalg.norm(pred - rays[None], axis=-1)
    inl = (res < inlier_threshold) & (z > 1e-6) & (valid[None] > 0)
    counts = jnp.where(oks, jnp.sum(inl, axis=1), -1)
    best = jnp.argmax(counts)
    w_best = inl[best].astype(jnp.float32)

    R_ref, t_ref = _gn_polish(Rs[best], ts[best], pts3d, rays, w_best)
    res_f, front = _reproject_residuals(R_ref, t_ref, pts3d, rays)
    final_inliers = ((res_f < inlier_threshold) & front &
                     (valid > 0)).astype(jnp.float32)
    num = jnp.sum(final_inliers)
    sigma_sq = jnp.sum(final_inliers * res_f * res_f) / jnp.maximum(num,
                                                                    1.0)

    # covariance of the polished estimate: sigma^2 (J^T J)^-1 diagonal
    def residuals(xi):
        dR, dt = se3.se3_exp(xi)
        Rc, tc = se3.compose(R_ref, t_ref, dR, dt)
        Xc = pts3d @ Rc.T + tc
        zc = jnp.maximum(Xc[:, 2], 1e-6)
        predc = Xc[:, :2] / zc[:, None]
        return ((predc - rays) * final_inliers[:, None]).reshape(-1)

    J = jax.jacfwd(residuals)(jnp.zeros(6))
    JtJ = J.T @ J + 1e-8 * jnp.eye(6)
    cov = batched_inv_small(JtJ[None])[0] * jnp.maximum(sigma_sq, 1e-8)
    return RansacResult(R=R_ref, t=t_ref, inliers=final_inliers,
                        num_inliers=num, success=num >= min_inliers,
                        cov_diag=jnp.diag(cov))


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def verify_keyframe_pairs_pnp(desc0, pts0, mask0, desc1, rays1, mask1,
                              ratio_threshold=0.9, inlier_threshold=0.01,
                              min_inliers=6, num_hypotheses=128, seed=0):
    """Batched 2D-3D verification: B of MY keyframes (3D landmarks)
    against ONE received depth-less query frame in a single program —
    the PnP twin of matching2d.verify_keyframe_pairs (one dispatch for
    the whole detection-round budget).

    desc0/pts0/mask0: (B, K, D), (B, K, 3), (B, K); desc1/rays1/mask1:
    (K, D), (K, 2) normalized coords, (K,). Returns (RansacResult with
    leading (B,) axes, (B,) match counts)."""
    B = desc0.shape[0]
    seeds = jnp.int32(seed) + 9973 * jnp.arange(B, dtype=jnp.int32)

    def one(d0, p0, m0, s):
        idx1, valid = mutual_match(d0, m0, desc1, mask1, ratio_threshold)
        res = ransac_pnp(p0, rays1[idx1], valid,
                         inlier_threshold=inlier_threshold,
                         min_inliers=min_inliers,
                         num_hypotheses=num_hypotheses, seed=s)
        return res, jnp.sum(valid)

    return jax.vmap(one)(desc0, pts0, mask0, seeds)


def normalize_keypoints(xy, intrinsics):
    """Pixel keypoints -> normalized image coordinates (x/z, y/z).

    intrinsics: (fx, fy, cx, cy)."""
    import numpy as np
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    xy = np.asarray(xy, dtype=np.float32)
    return np.stack([(xy[:, 0] - cx) / max(fx, 1e-6),
                     (xy[:, 1] - cy) / max(fy, 1e-6)], axis=1)


def verify_keyframe_pair_pnp(desc0, pts0, mask0, desc1, rays1, mask1,
                             ratio_threshold=0.9, inlier_threshold=0.01,
                             min_inliers=6, seed=0):
    """Full 2D-3D verification: match descriptors, then PnP RANSAC.

    frame 0 = my keyframe (3D landmarks + descriptors), frame 1 = the
    query frame (2D keypoints only — its depth may be missing
    entirely). Returns (RansacResult, match_count); the pose maps my
    frame-0 points into the query camera, the SAME convention as
    matching2d.verify_keyframe_pair, so callers swap modes freely."""
    idx1, match_valid = mutual_match(desc0, mask0, desc1, mask1,
                                     ratio_threshold)
    matched_rays = rays1[idx1]
    result = ransac_pnp(pts0, matched_rays, match_valid,
                        inlier_threshold=inlier_threshold,
                        min_inliers=min_inliers, seed=seed)
    return result, jnp.sum(match_valid)
