"""Point-cloud registration in JAX: robust ICP with GNC-TLS
correspondence weighting.

Replaces the reference's TEASER++ + ICP lidar registration
(/root/reference/cslam/lidar_pr/icp_utils.py:68-135): FPFH + mutual-kNN
correspondences feed TEASER's GNC-TLS solver, then point-to-point ICP
refines. The TPU-native design:

- correspondences: brute-force nearest neighbors as one (N, M) distance
  matmul per iteration (MXU) instead of KD-trees;
- robustness: TLS weights on correspondence residuals driven by the same
  GNC schedule as the PGO back-end (Yang et al.'s GNC — exactly what
  TEASER uses internally);
- alignment: weighted Kabsch/Umeyama via Horn's quaternion method
  (horn_rotation — batched-LAPACK-free, see its docstring);
- initialization: the Scan Context yaw estimate (matching stage) seeds
  the rotation, standing in for TEASER's global rotation search — the
  pipeline pairing used by the lidar handler.

Static shapes: both clouds padded with masks. Everything jits; the
ICP inner loop is a convergence-gated lax.while_loop (capped at
max_iters) under a fori_loop GNC continuation.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cslam_tpu.ops.batched_linalg import batched_inv_small


class RegistrationResult(NamedTuple):
    R: jnp.ndarray        # (3, 3)
    t: jnp.ndarray        # (3,)
    rmse: jnp.ndarray     # inlier RMSE
    inlier_frac: jnp.ndarray
    success: jnp.ndarray  # bool
    cov_diag: jnp.ndarray  # (6,) [omega, v] estimate covariance diagonal


def se3_estimate_covariance(moved, w, sigma_sq):
    """Gauss-Newton covariance of an SE(3) point-registration estimate.

    cov = sigma^2 (J^T W J)^-1 with per-correspondence Jacobian
    J_i = [-[a_i]_x | I_3] of the residual r_i = exp(xi^) a_i + v - d_i
    w.r.t. the left-perturbation tangent [omega, v] (our SE(3)
    convention), a_i = R s_i + t the transformed source point. This is
    the covariance the reference propagates from rtabmap's
    RegistrationVis / registration into loop-closure messages
    (rgbd_handler.cpp:623, :703) and GTSAM builds noise models from
    (decentralized_pgo.cpp:307-312).

    Args:
      moved: (N, 3) source points mapped into the destination frame.
      w: (N,) inlier weights.
      sigma_sq: scalar residual variance (e.g. inlier rmse^2).

    Returns (6,) covariance diagonal. Degenerate geometry (rank-deficient
    J^T W J) is regularized, giving large-but-finite variances.
    """
    a = moved
    zeros = jnp.zeros(a.shape[0])
    # A_i = skew(a_i), rows stacked: (N, 3, 3)
    A = jnp.stack([
        jnp.stack([zeros, -a[:, 2], a[:, 1]], axis=-1),
        jnp.stack([a[:, 2], zeros, -a[:, 0]], axis=-1),
        jnp.stack([-a[:, 1], a[:, 0], zeros], axis=-1),
    ], axis=1)
    eye = jnp.broadcast_to(jnp.eye(3), A.shape)
    J = jnp.concatenate([-A, eye], axis=2)  # (N, 3, 6)
    H = jnp.einsum("nij,nik,n->jk", J, J, w)
    H = H + 1e-4 * jnp.eye(6)
    # unrolled Gauss-Jordan: a single 6x6 jnp.linalg.inv still pays
    # the TPU batched-LU path (~0.7 ms for batches; CLAUDE.md gotcha)
    cov = jnp.maximum(sigma_sq, 1e-8) * batched_inv_small(H)
    return jnp.diag(cov)


def horn_rotation(cov):
    """Optimal PROPER rotation maximizing tr(R^T cov), cov = sum w xd xs^T.

    Horn's closed-form absolute orientation: the best rotation is the
    top eigenvector of a symmetric 4x4 quaternion matrix. The eigenvector
    is extracted by iterated matrix squaring (B^1024 collapses to the
    rank-1 dominant subspace; the largest column IS the eigenvector) —
    10 4x4 matmuls of pure VPU work instead of a 3x3 SVD, because
    batched small-matrix LAPACK ops are poison on TPU (a 256-hypothesis
    vmap of jnp.linalg.svd dominated the whole RANSAC verification
    kernel; same gotcha as batched_inv_small). Unlike SVD-Kabsch's
    det-flip guard this is exact under reflections too: the quaternion
    parameterization only ranges over proper rotations.
    """
    S = cov.T  # S[i, j] = sum w src_i dst_j (Horn's convention)
    Sxx, Sxy, Sxz = S[0, 0], S[0, 1], S[0, 2]
    Syx, Syy, Syz = S[1, 0], S[1, 1], S[1, 2]
    Szx, Szy, Szz = S[2, 0], S[2, 1], S[2, 2]
    N4 = jnp.array([
        [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
        [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
        [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]])
    # Frobenius norm bounds |eigenvalues|, so B = N/|N| + I is PSD with
    # the same top eigenvector; renormalize between squarings.
    scale = jnp.maximum(jnp.linalg.norm(N4), 1e-12)
    B = N4 / scale + jnp.eye(4, dtype=N4.dtype)

    def body(_, Bk):
        Bk = Bk @ Bk
        return Bk / jnp.maximum(jnp.linalg.norm(Bk), 1e-30)

    Bk = jax.lax.fori_loop(0, 10, body, B)
    # all columns are now ~parallel to the eigenvector u, scaled by u_i;
    # the largest column never degenerates (one-hot matvec, no gather)
    col = jnp.argmax(jnp.sum(Bk * Bk, axis=0))
    q = Bk @ jax.nn.one_hot(col, 4, dtype=Bk.dtype)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def weighted_kabsch(src, dst, w):
    """Best-fit (R, t) minimizing sum w_i ||R src_i + t - dst_i||^2."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    xs = src - mu_s
    xd = dst - mu_d
    cov = (xd * w[:, None]).T @ xs / wsum
    R = horn_rotation(cov)
    t = mu_d - R @ mu_s
    return R, t


def nearest_neighbors(src, src_mask, dst, dst_mask):
    """(N,) indices into dst of each src point's nearest neighbor + d2.
    One (N, M) distance matrix — MXU-shaped work."""
    # barriers: stop XLA re-fusing the squared-norm rows into every
    # distance-matrix tile (per-tile recompute pathology, see ops/knn.py)
    s2 = jax.lax.optimization_barrier(jnp.sum(src * src, axis=1))
    d2n = jax.lax.optimization_barrier(jnp.sum(dst * dst, axis=1))
    d2 = s2[:, None] + d2n[None, :] - 2.0 * src @ dst.T
    d2 = jnp.where(dst_mask[None, :] > 0, d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1)
    best = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
    # the expanded form cancels catastrophically for (near-)exact
    # matches and can go slightly NEGATIVE — an exact alignment then
    # makes sqrt(mean d2) NaN downstream (bitten when horn_rotation
    # started landing R exactly)
    best = jnp.maximum(best, 0.0)
    best = jnp.where(src_mask > 0, best, jnp.inf)
    return idx, best


@functools.partial(jax.jit, static_argnames=("max_iters", "gnc_steps",
                                              "iters_per_level"))
def gnc_icp(src, src_mask, dst, dst_mask, R_init, t_init,
            max_corr_dist=1.0, max_iters=30, gnc_steps=10,
            fitness_threshold=0.3, step_tol=1e-4, iters_per_level=5):
    """Robust point-to-point ICP.

    Args:
      src, dst: (N, 3) / (M, 3) padded clouds with (N,), (M,) masks.
      R_init, t_init: initial guess (e.g. from Scan Context yaw).
      max_corr_dist: TLS inlier scale c (meters).
      iters_per_level: ICP iteration cap per GNC continuation level.
        Small on purpose: at soft mu the TLS weights respond to every
        correspondence change and the iteration OSCILLATES at a
        ~1e-2 step size instead of converging — measured traces show
        the early levels burning any cap you give them while the pose
        barely moves, which made the default solve cost 10x its useful
        work. GNC only needs each level to move the pose toward the
        next basin, not converge.
      max_iters: cap for the FINAL refinement pass at the hardest mu
        (step-gated; converged solves exit in a few iterations).
      gnc_steps: GNC continuation levels (mu *= 1.4 each).
      step_tol: convergence threshold on ||dR||_F + ||dt|| (1e-4:
        ~0.1 mm/step — far below scan noise at voxel-scale data).

    Returns RegistrationResult; success = inlier fraction above
    fitness_threshold (the reference's registration gate analog).
    """
    c_sq = max_corr_dist * max_corr_dist

    def tls_weights(r_sq, mu):
        ub = (mu + 1.0) / mu * c_sq
        lb = mu / (mu + 1.0) * c_sq
        mid = jnp.sqrt(c_sq * mu * (mu + 1.0) /
                       jnp.maximum(r_sq, 1e-12)) - mu
        return jnp.where(r_sq >= ub, 0.0,
                         jnp.where(r_sq <= lb, 1.0, jnp.clip(mid, 0.0, 1.0)))

    def icp_at(mu, R, t, iter_cap):
        # Convergence-gated with a cap. The exit test is the step size
        # itself (Frobenius dR + dt norm), cheap relative to one
        # (N, M) NN pass.
        def cond(carry):
            _, _, delta, it = carry
            return (it < iter_cap) & (delta > step_tol)

        def body(carry):
            R, t, _, it = carry
            moved = src @ R.T + t
            idx, d2 = nearest_neighbors(moved, src_mask, dst, dst_mask)
            matched = dst[idx]
            w = tls_weights(d2, mu) * src_mask
            w = jnp.where(jnp.isfinite(d2), w, 0.0)
            Rn, tn = weighted_kabsch(src, matched, w)
            delta = jnp.sqrt(jnp.sum((Rn - R) ** 2)) + \
                jnp.linalg.norm(tn - t)
            return Rn, tn, delta, it + 1

        R, t, _, _ = jax.lax.while_loop(
            cond, body, (R, t, jnp.float32(jnp.inf), jnp.int32(0)))
        return R, t

    def gnc_body(k, carry):
        R, t, mu = carry
        R, t = icp_at(mu, R, t, iters_per_level)
        return R, t, mu * 1.4

    # mu small = soft (near-convex), growing toward hard TLS
    R, t, mu = jax.lax.fori_loop(
        0, gnc_steps, gnc_body, (R_init, t_init, jnp.float32(0.05)))
    # final refinement at the hardest mu, run to convergence
    R, t = icp_at(mu, R, t, max_iters)

    moved = src @ R.T + t
    idx, d2 = nearest_neighbors(moved, src_mask, dst, dst_mask)
    finite = jnp.isfinite(d2)
    inlier = (d2 < c_sq) & (src_mask > 0) & finite
    n_src = jnp.maximum(jnp.sum(src_mask), 1.0)
    inlier_frac = jnp.sum(inlier) / n_src
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(inlier, d2, 0.0)) /
        jnp.maximum(jnp.sum(inlier), 1.0))
    cov_diag = se3_estimate_covariance(
        moved, inlier.astype(jnp.float32), rmse * rmse)
    return RegistrationResult(R=R, t=t, rmse=rmse, inlier_frac=inlier_frac,
                              success=inlier_frac > fitness_threshold,
                              cov_diag=cov_diag)


def yaw_rotation(yaw_rad):
    c = jnp.cos(yaw_rad)
    s = jnp.sin(yaw_rad)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


@functools.partial(jax.jit, static_argnames=("voxel_grid",))
def voxel_downsample(points, mask, voxel_size, voxel_grid=64,
                     origin_range=100.0):
    """Deterministic voxel-grid downsample (centroid per voxel), static
    shape: returns (voxel_grid^2-bounded) representative points + mask.

    Replaces open3d voxel_down_sample in the lidar keyframe path
    (lidar_handler_node.py:168-203). Points outside +-origin_range are
    dropped. Output capacity equals the input capacity (upper bound).
    """
    n = points.shape[0]
    vox = jnp.floor((points + origin_range) / voxel_size).astype(jnp.int32)
    cells = jnp.ceil(2 * origin_range / voxel_size).astype(jnp.int32)
    in_range = jnp.all((vox >= 0) & (vox < cells), axis=1)
    valid = (mask > 0) & in_range
    # Collision-free voxel key split across two int32s (a single linear
    # int32 index would overflow for cells > ~1290 per axis); sort
    # lexicographically, invalid points pushed to the end.
    sentinel = jnp.iinfo(jnp.int32).max
    k_hi = jnp.where(valid, vox[:, 0], sentinel)
    k_lo = jnp.where(valid, vox[:, 1] * cells + vox[:, 2], sentinel)
    order = jnp.lexsort((k_lo, k_hi))
    hi_s, lo_s = k_hi[order], k_lo[order]
    first = jnp.concatenate(
        [jnp.array([True]),
         (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])])
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    pts_s = points[order]
    w = (hi_s != sentinel).astype(jnp.float32)
    sums = jax.ops.segment_sum(pts_s * w[:, None], seg_id, num_segments=n)
    counts = jax.ops.segment_sum(w, seg_id, num_segments=n)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    keep = first & (hi_s != sentinel)
    return centroids[seg_id], keep.astype(jnp.float32)
