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
from cslam_tpu.ops.block_tridiag import (bcr_factor, bcr_solve,
                                         bcr_solve_multi)


def _pcg(matvec, apply_minv, b, iters, tol=1e-14):
    """Preconditioned CG. Convergence is still gated on the PLAIN
    residual norm (vs tol*||b||^2) so the stopping point is identical
    to the unpreconditioned solver's — the preconditioner only changes
    how fast it gets there.

    tol is relative to ||b||^2, which the anchor term dominates — keep
    it very tight so the chain actually converges, not just the anchor.
    """
    def cond(s):
        it, _, r, _, _ = s
        return (it < iters) & (jnp.sum(r * r)
                               > tol * jnp.maximum(jnp.sum(b * b), 1e-30))

    def body(s):
        it, x, r, p, rz = s
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_minv(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        return it + 1, x, r, z + beta * p, rz_new

    x0 = jnp.zeros_like(b)
    z0 = apply_minv(b)
    _, x, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, b, z0, jnp.sum(b * z0)))
    return x


def _chain_tridiag_factor(g, w, anchor_w, couple_fwd, couple_rev, s):
    """BCR factor of the chain-tridiagonal part of either chordal
    normal-equation system (s=3 blocks).

    Both stages share the structure: every edge adds w to each
    endpoint's diagonal (the per-edge operators are orthogonal /
    identity, so A^T A contributes w*I_3 on both sides), and the
    CHAIN edges (|i-j| == 1) contribute the only off-diagonals kept:
    O[m] = H[m, m-1] = -w * couple(edge). M = tridiag(D, O) is the
    exact chain system plus the PSD diagonal of loop contributions —
    same SPD-preserving split as the PGO preconditioner
    (ops/block_tridiag.py)."""
    P = g.R.shape[0]
    deg = jnp.zeros((P,), dtype=w.dtype)
    deg = deg.at[g.e_i].add(w).at[g.e_j].add(w)
    dscale = deg + 1e-6
    dscale = dscale.at[g.prior_idx].add(anchor_w)
    D = dscale[:, None, None] * jnp.eye(s, dtype=w.dtype)[None]
    # flat (P, s*s) scatter — trailing (s, s) minors scatter ~6.5x
    # slower (ops/block_tridiag layout notes)
    fwd = ((g.e_j == g.e_i + 1) & (w > 0))[:, None]
    rev = ((g.e_i == g.e_j + 1) & (w > 0))[:, None]
    O = jnp.zeros((P, s * s), dtype=w.dtype)
    wb = w[:, None]
    O = O.at[g.e_j].add(
        jnp.where(fwd, -couple_fwd.reshape(-1, s * s) * wb, 0.0))
    O = O.at[g.e_i].add(
        jnp.where(rev, -couple_rev.reshape(-1, s * s) * wb, 0.0))
    return bcr_factor(D, O.reshape(P, s, s).at[0].set(0.0))


@functools.partial(jax.jit, static_argnames=("cg_iters",))
def chordal_initialize(g: GraphArrays, cg_iters=None):
    """(R, t) initial estimates from the chordal relaxation of g's
    between-measurements. Anchor: the prior pose at g.prior_idx.

    Both linear solves are PCG with an exact chain-tridiagonal
    preconditioner (block cyclic reduction, ops/block_tridiag.py): the
    unpreconditioned chain's condition number grows ~P^2 and ate
    2.0 s of sphere-10000's 2.7 s wall (4000 op-floor CG trips,
    round 4); with the chain solved exactly PCG only works off the
    loop couplings."""
    P = g.R.shape[0]
    if cg_iters is None:
        cg_iters = min(max(100, P // 4), 600)
    w = g.edge_mask
    anchor_w = 1e2

    # ---- stage 1: rotations, x_i = R_i as (P, 3, 3) ----
    # residual per edge: X_j - X_i Z_ij  (Frobenius) => normal equations
    #   A^T A x with matvec: y_e = X_j - X_i Z; scatter back with -Z^T.
    Z = g.R_meas

    def rot_matvec(X):
        # Scatters go through the flat (P, 9) view: index/strided
        # updates on a trailing (3, 3) minor are tile-padded per block
        # and measured 6.5x slower (1.69 vs 0.26 ms at P=16384, v5e).
        Xi = X.reshape(P, 3, 3)[g.e_i]
        Xj = X.reshape(P, 3, 3)[g.e_j]
        r_e = (Xj - jnp.einsum("eab,ebc->eac", Xi, Z)) * w[:, None, None]
        back = jnp.einsum("eab,ecb->eac", r_e, Z)
        out = jnp.zeros((P, 9), dtype=X.dtype)
        out = out.at[g.e_j].add(r_e.reshape(-1, 9))
        out = out.at[g.e_i].add(-back.reshape(-1, 9))
        out = out.at[g.prior_idx].add(anchor_w * X[g.prior_idx])
        # tiny ridge keeps padded/disconnected nodes nonsingular
        return out + 1e-6 * X

    # Chain preconditioner, rotation stage. In per-row column form
    # v_i = (row k of X_i)^T the edge residual is v_j - Z^T v_i, so the
    # chain couplings are H[m, m-1] = -Z^T (fwd edge m-1 -> m) and -Z
    # (rev). The three row-systems ride bcr_solve_multi's leading rhs
    # axis — X's native (P, 3_row, 3_col) layout IS (n, m, s), so the
    # apply needs no transposes at all.
    fac_rot = _chain_tridiag_factor(
        g, w, anchor_w, jnp.swapaxes(Z, -2, -1), Z, 3)

    def solve_rows(Vflat):
        return bcr_solve_multi(
            fac_rot, Vflat.reshape(P, 3, 3)).reshape(P, 9)

    b_rot = jnp.zeros((P, 9)).at[g.prior_idx].add(
        anchor_w * g.prior_R.reshape(9))
    X = _pcg(rot_matvec, solve_rows, b_rot, iters=cg_iters).reshape(
        P, 3, 3)
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
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), Z.shape)
    fac_t = _chain_tridiag_factor(g, w, anchor_w, eye3, eye3, 3)
    t_init = _pcg(t_matvec, lambda v: bcr_solve(fac_t, v), b_t,
                  iters=cg_iters)
    t_init = t_init * g.node_mask[:, None]
    return R_init, t_init
