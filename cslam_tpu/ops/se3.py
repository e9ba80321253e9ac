"""SO(3)/SE(3) Lie-group ops, batched and jit-friendly.

Conventions match GTSAM's Pose3 (used by the reference back-end,
/root/reference/src/back_end/decentralized_pgo.cpp and gtsam_utils.cpp):

- A pose is (R, t): R a (..., 3, 3) rotation, t a (..., 3) translation;
  it maps local points p to world points R @ p + t.
- Tangent vectors xi are (..., 6) ordered [omega, v] (rotation first),
  matching gtsam::Pose3::Expmap/Logmap.
- Exp/Log use the exact exponential with the SO(3) left Jacobian V:
  Exp([w, v]) = (exp(w^), V(w) v).

All ops are elementwise in the leading batch dims; no data-dependent
control flow (Taylor fallbacks selected with jnp.where) so everything
jits and vmaps cleanly on TPU.
"""

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)


def vee(W):
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq):
    """Return A = sin(t)/t, B = (1-cos t)/t^2, C = (t - sin t)/t^3.

    Taylor fallbacks (series to t^4) below theta = 0.1 — a threshold chosen
    for float32: the exact forms lose ~eps/theta^2 relative accuracy to
    cancellation, the series has error O(theta^6) ~ 1e-10 at the boundary.
    All guards are on the *inputs* of non-smooth ops so forward-mode
    autodiff through the unselected branch stays finite (no 0 * inf)."""
    small = theta_sq < 1e-2
    # Guard against 0/0 — the guarded values are discarded by jnp.where.
    safe_t2 = jnp.where(small, 1.0, theta_sq)
    safe_t = jnp.sqrt(safe_t2)
    t2 = theta_sq
    t4 = theta_sq * theta_sq
    A = jnp.where(small, 1.0 - t2 / 6.0 + t4 / 120.0,
                  jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - t2 / 24.0 + t4 / 720.0,
                  (1.0 - jnp.cos(safe_t)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0 + t4 / 5040.0,
                  (safe_t - jnp.sin(safe_t)) / (safe_t2 * safe_t))
    return A, B, C


def so3_exp(w):
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R):
    """(..., 3, 3) -> (..., 3). Robust near theta=0 and theta=pi, and safe
    under forward-mode autodiff at the identity (the pose-graph residual
    Jacobians differentiate through here at near-zero error): arccos is
    never evaluated near +-1 in a selected branch — below theta ~ 0.32 the
    coefficient theta/(2 sin theta) uses a series in (1 - cos theta)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    antisym = vee(R - jnp.swapaxes(R, -1, -2))
    u = 1.0 - cos_theta  # >= 0; theta^2 ~ 2u + u^2/3 near 0
    small = cos_theta > 0.95
    near_pi = cos_theta < jnp.cos(jnp.pi - 1e-3)
    # k(theta) = theta / (2 sin theta):
    #   series: 0.5 * (1 + u/3 + 2 u^2/15)   (error < 1e-5 for theta < 0.32)
    k_series = 0.5 * (1.0 + u / 3.0 + 2.0 * u * u / 15.0)
    #   exact: arccos(c) / (2 sqrt(1 - c^2)), evaluated away from c = +-1
    c_safe = jnp.where(small | near_pi, 0.0, cos_theta)
    k_exact = jnp.arccos(c_safe) / (2.0 * jnp.sqrt(
        jnp.maximum(1.0 - c_safe * c_safe, 1e-12)))
    k = jnp.where(small, k_series, k_exact)
    # theta for the near-pi branch only (arccos near -1 is fine primal-wise)
    theta = jnp.arccos(jnp.where(near_pi, cos_theta, 0.0))
    w_generic = k[..., None] * antisym
    # near pi: use the symmetric part. R = I + 2 B ww^T/theta^2 ... Extract
    # axis from diagonal of (R + I)/2 = I + (1-cos)/th^2 * W^2 ~  aa^T when
    # theta ~ pi:  (R + I)/2 ~ aa^T  =>  a_i^2 = (R_ii + 1)/2.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag + 1.0) * 0.5, 0.0)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonal sums: (R_ij + R_ji)/2 = a_i a_j (1 - cos) ~ 2 a_i a_j
    # Pick the largest axis component as reference positive.
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    imax = jnp.argmax(axis_sq, axis=-1)
    ax = axis[..., 0]
    ay = axis[..., 1]
    az = axis[..., 2]
    # sign pattern relative to the dominant axis
    ay0 = jnp.where(s01 < 0, -ay, ay)  # if x dominant
    az0 = jnp.where(s02 < 0, -az, az)
    ax1 = jnp.where(s01 < 0, -ax, ax)  # if y dominant
    az1 = jnp.where(s12 < 0, -az, az)
    ax2 = jnp.where(s02 < 0, -ax, ax)  # if z dominant
    ay2 = jnp.where(s12 < 0, -ay, ay)
    axis_fixed = jnp.where(
        (imax == 0)[..., None],
        jnp.stack([ax, ay0, az0], axis=-1),
        jnp.where((imax == 1)[..., None],
                  jnp.stack([ax1, ay, az1], axis=-1),
                  jnp.stack([ax2, ay2, az], axis=-1)))
    norm = jnp.linalg.norm(axis_fixed, axis=-1, keepdims=True)
    axis_fixed = axis_fixed / jnp.maximum(norm, _EPS)
    # Align axis sign with antisymmetric part (vanishes exactly at pi; any
    # sign is a valid log there).
    sign_dot = jnp.sum(axis_fixed * antisym, axis=-1, keepdims=True)
    axis_fixed = jnp.where(sign_dot < 0, -axis_fixed, axis_fixed)
    w_pi = axis_fixed * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_left_jacobian(w):
    """V(w) with Exp([w,v]) translation = V(w) v."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def so3_left_jacobian_inv(w):
    """V(w)^-1, exact with Taylor fallback."""
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < 1e-2  # f32: exact form cancels below theta ~ 0.1
    safe_t = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * safe_t
    cot_coeff = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) /
        jnp.where(small, 1.0, theta_sq))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_coeff[..., None, None] * W2


def se3_exp(xi):
    """(..., 6) [w, v] -> (R, t)."""
    w = xi[..., :3]
    v = xi[..., 3:]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R, t):
    """(R, t) -> (..., 6) [w, v]."""
    w = so3_log(R)
    Vinv = so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) * (Rb, tb)."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def inverse(R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t)
    return Rinv, tinv


def between(Ra, ta, Rb, tb):
    """a^-1 * b — the relative pose (GTSAM BetweenFactor measurement frame)."""
    Rinv, tinv = inverse(Ra, ta)
    return compose(Rinv, tinv, Rb, tb)


def adjoint(R, t):
    """Ad_T (6x6) for xi ordered [w, v]: Ad = [[R, 0], [t^ R, R]]."""
    tx = hat(t)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bottom = jnp.concatenate([tx @ R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(R, t, p):
    """Apply pose to points: (..., 3, 3), (..., 3), (..., N, 3) -> (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", R, p) + t[..., None, :]


def normalize_rotation(R):
    """Project a near-rotation onto SO(3) (numerical hygiene after many
    composition steps; chordal-init SO(3) rounding).

    Newton polar iteration instead of batched SVD: the TPU SVD
    custom-call wants O(batch) VMEM scratch (out-of-memory at a
    65536-pose chordal init) and runs as a LAPACK-style loop."""
    from cslam_tpu.ops.batched_linalg import polar_rotation3x3
    return polar_rotation3x3(R)


def quat_to_rot(q):
    """(..., 4) quaternion [qx, qy, qz, qw] -> (..., 3, 3) rotation."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], axis=-1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], axis=-1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def rot_to_quat(R):
    """(..., 3, 3) -> (..., 4) [qx, qy, qz, qw], w >= 0 (Shepperd's method,
    numerically stable across all four cases)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the one with the largest pivot
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    c0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01),
                    4.0 * qw0 * qw0], axis=-1) / (4.0 * qw0[..., None])
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    c1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20),
                    (m21 - m12)], axis=-1) / (4.0 * qx1[..., None])
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    c2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21),
                    (m02 - m20)], axis=-1) / (4.0 * qy2[..., None])
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    c3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3,
                    (m10 - m01)], axis=-1) / (4.0 * qz3[..., None])
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                        -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 3:4] < 0, -q, q)


def identity_poses(n, dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))
    t = jnp.zeros((n, 3), dtype=dtype)
    return R, t
