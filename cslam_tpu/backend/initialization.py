"""Chordal initialization for pose-graph optimization.

Gauss-Newton on SE(3) converges locally; when initial estimates are far
from the basin (severe odometry drift, arbitrary inter-robot frames),
the standard fix is chordal initialization (Carlone et al., ICRA 2015):

1. rotation averaging in the chordal (Frobenius) relaxation — the
   residual vec(R_j) - (Z_ij^T kron I_3) vec(R_i) is *linear* in the
   stacked 9-D rotation vectors, so one linear least-squares solve
   (CG here, 9-D blocks, same gather/scatter pattern as the PGO normal
   equations) gives globally-informed rotations, projected back to SO(3)
   by SVD;
2. translations from a second linear solve of
   t_j - t_i - R_i t_ij ~ 0 with rotations fixed.

GTSAM exposes the same idea as InitializePose3; the reference relies on
odometry-integration initial values instead (decentralized_pgo.cpp
odometry_pose_estimates_) which this complements for harder geometry.
Enabled via PGOConfig.use_chordal_init.
"""

import functools

import jax
import jax.numpy as jnp

from cslam_tpu.backend.factor_graph import GraphArrays
from cslam_tpu.ops import se3


def _cg(matvec, b, iters, tol=1e-14):
    # tol is relative to ||b||^2, which the anchor term dominates — keep
    # it very tight so the chain actually converges, not just the anchor.
    def cond(s):
        it, _, r, _, rr = s
        return (it < iters) & (rr > tol * jnp.maximum(jnp.sum(b * b), 1e-30))

    def body(s):
        it, x, r, p, rr = s
        Ap = matvec(p)
        alpha = rr / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_new = jnp.sum(r * r)
        beta = rr_new / jnp.maximum(rr, 1e-30)
        return it + 1, x, r, r + beta * p, rr_new

    x0 = jnp.zeros_like(b)
    _, x, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, b, b, jnp.sum(b * b)))
    return x


@jax.jit
def chordal_initialize(g: GraphArrays):
    """(R, t) initial estimates from the chordal relaxation of g's
    between-measurements. Anchor: the prior pose at g.prior_idx.

    CG iteration budget scales with the node count: an unpreconditioned
    chain's condition number grows ~P^2, so fixed iteration counts
    under-converge on large graphs (observed on sphere-10k)."""
    P = g.R.shape[0]
    cg_iters = min(max(400, 2 * P), 4000)
    w = g.edge_mask
    anchor_w = 1e2

    # ---- stage 1: rotations, x_i = R_i as (P, 3, 3) ----
    # residual per edge: X_j - X_i Z_ij  (Frobenius) => normal equations
    #   A^T A x with matvec: y_e = X_j - X_i Z; scatter back with -Z^T.
    Z = g.R_meas

    def rot_matvec(X):
        Xi = X[g.e_i]
        Xj = X[g.e_j]
        r_e = (Xj - jnp.einsum("eab,ebc->eac", Xi, Z)) * w[:, None, None]
        out = jnp.zeros_like(X)
        out = out.at[g.e_j].add(r_e)
        out = out.at[g.e_i].add(-jnp.einsum("eab,ecb->eac", r_e, Z))
        out = out.at[g.prior_idx].add(anchor_w * X[g.prior_idx])
        # tiny ridge keeps padded/disconnected nodes nonsingular
        return out + 1e-6 * X

    b_rot = jnp.zeros((P, 3, 3)).at[g.prior_idx].add(anchor_w * g.prior_R)
    X = _cg(rot_matvec, b_rot, iters=cg_iters)
    R_init = se3.normalize_rotation(X + 1e-6 * jnp.eye(3))
    # padded nodes: keep identity
    R_init = jnp.where(g.node_mask[:, None, None] > 0, R_init,
                       jnp.eye(3)[None])

    # ---- stage 2: translations with rotations fixed ----
    # residual: t_j - t_i - R_i t_ij
    rhs_e = jnp.einsum("eab,eb->ea", R_init[g.e_i], g.t_meas) * w[:, None]

    def t_matvec(T):
        r_e = (T[g.e_j] - T[g.e_i]) * w[:, None]
        out = jnp.zeros_like(T)
        out = out.at[g.e_j].add(r_e)
        out = out.at[g.e_i].add(-r_e)
        out = out.at[g.prior_idx].add(anchor_w * T[g.prior_idx])
        return out + 1e-6 * T

    b_t = jnp.zeros((P, 3))
    b_t = b_t.at[g.e_j].add(rhs_e)
    b_t = b_t.at[g.e_i].add(-rhs_e)
    b_t = b_t.at[g.prior_idx].add(anchor_w * g.prior_t)
    t_init = _cg(t_matvec, b_t, iters=cg_iters)
    t_init = t_init * g.node_mask[:, None]
    return R_init, t_init
