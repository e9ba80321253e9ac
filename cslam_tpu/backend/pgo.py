"""GNC-robust pose-graph optimization in JAX — the TPU back-end core.

Replaces the reference's GTSAM GncOptimizer<GncParams<LevenbergMarquardtParams>>
solve (/root/reference/src/back_end/decentralized_pgo.cpp:853-886) with a
fully-batched, jit-compiled pipeline:

  GNC outer loop (TLS surrogate, mu *= mu_step)
    -> Levenberg-Marquardt inner loop
       -> per-edge residuals r_e = Gamma Log(Z^-1 X_i^-1 X_j) and exact
          right-perturbation Jacobians via forward-mode autodiff, batched
          over all edges (MXU-friendly (E,6,6) einsums);
       -> preconditioned conjugate gradients on the Gauss-Newton normal
          equations with a block-Jacobi (6x6) preconditioner — the Hessian
          is never materialized; matvecs are two gathers, two batched
          einsums and two scatter-adds.

GNC-TLS follows gtsam::GncOptimizer semantics: per-factor error
u = 0.5 ||r||^2 compared against mu-dependent bounds, weights
w in {0..1}, mu initialized from the max residual and multiplied by
mu_step until the weights become binary. Robustness is applied to
loop-closure factors; odometry and the gauge prior are trusted
(config BackendConfig.gnc_*).

Everything is static-shape: padded nodes/edges contribute zero through
masks, so the same compiled program serves a growing graph until its
capacity bucket doubles.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cslam_tpu.backend.factor_graph import FactorGraph, GraphArrays
from cslam_tpu.ops.batched_linalg import batched_inv_small
from cslam_tpu.ops import se3


class EdgeReduce(NamedTuple):
    """Cross-shard reductions for factor-sharded solves.

    The GNC-LM core is written against LOCAL edge arrays plus these two
    hooks: `sum` all-reduces edge-summed quantities (costs, gradients,
    Hessian blocks), `max` all-reduces edge maxima (GNC mu init,
    weight-stability checks). Single-chip passes red=None (identity);
    parallel/distributed_pgo.py passes psum/pmax over the mesh axis —
    the two paths share every line of solver code, so round-4 wins
    (BCR chain preconditioner built once per solve, single-eval LM,
    lam/warm-start carry) apply to both by construction."""
    sum: object
    max: object


def _rsum(red, x):
    return x if red is None else red.sum(x)


def _rmax(red, x):
    return x if red is None else red.max(x)


class PGOResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    cost: jnp.ndarray          # final robust cost
    initial_cost: jnp.ndarray
    gnc_iters: jnp.ndarray
    weights: jnp.ndarray       # final GNC weights per edge


class PGOConfig(NamedTuple):
    # Inlier gate on u = 0.5||r_whitened||^2. For 6-DOF between factors
    # chi2(0.99, 6)/2 ~ 8.4; the default 10.0 keeps correctly-whitened
    # inliers under realistic odometry drift (gtsam's barcSq=1.0 default
    # assumes residuals are pre-scaled).
    barc_sq: float = 10.0
    mu_step: float = 1.4
    gnc_max_outer_iters: int = 20
    # Budget for the initial unit-weight solve and the final polish
    # (both exit early on rel-cost convergence). The deep 25-step
    # polish was a block-Jacobi-era need (under-converged inner solves
    # left residual error for the polish to grind out); with the
    # chain-exact tridiag preconditioner, 12 is quality-IDENTICAL on
    # every seed of the 8-seed sweep (pgo_quality_sweep: ate_med
    # 0.1226 / recall 0.75 both) and saves ~20 ms device at 1000
    # poses. Cutting lm_init_iters or gnc_lm_iters instead DOES cost
    # recall (0.75 -> 0.62-0.63) — the budget belongs in the rounds.
    lm_max_iters: int = 12
    lm_init_lambda: float = 1e-4
    # CG budget per LM step. With the chain-exact tridiag
    # preconditioner, 25 matches 50 on every seed of the 8-seed mixed
    # inlier/outlier sweep (benchmarks/pgo_quality_sweep.py, round 4:
    # ate_med 0.123/recall 0.75 both) — and the tridiag runs BEAT the
    # round-3 jacobi@50 defaults on quality (0.256/0.55), because
    # better-converged inner solves make better GNC decisions. 12
    # blows up one seed (3.7 ATE) — don't go lower. (The round-3
    # warning against 25 was measured under the jacobi preconditioner,
    # where inner solves at 25 were badly unconverged.)
    cg_max_iters: int = 25
    # CG budget during the unit-weight init solve and the GNC
    # reweighting rounds; 0 = use cg_max_iters.
    gnc_cg_max_iters: int = 0
    # inexact-Newton: 1e-6 relative residual halves+ the solve time vs
    # 1e-8 at <1% cost difference (sphere-1000 sweep)
    cg_tol: float = 1e-6
    # CG steps fused per while-loop iteration. On TPU every while-loop
    # trip is a separately dispatched program with fixed overhead; the
    # (P,6)-sized matvecs here are far too small to amortize it, so
    # running `cg_unroll` steps per trip (convergence checked between
    # groups) cuts the solve's dispatch count ~unroll-fold. Wasted
    # post-convergence steps are numerically inert (alpha -> 0 under the
    # denominator guards).
    cg_unroll: int = 4
    # LM budget inside GNC reweighting rounds. Each round only needs to
    # track the slowly-moving weighted optimum (warm-started, with the
    # LM trust-region lambda carried across rounds). ONE step per round
    # matched two on a 16-seed mixed 10-60%-outlier sweep, but FAILS
    # the single-gross-outlier structural case (test_pgo.py::
    # test_single_gross_outlier_does_not_reject_true_loop): when the
    # first reweighting zeroes every loop, one step per round cannot
    # pull the estimate back before the anneal hardens, and the true
    # loop stays rejected. Two is the floor. 0 = use lm_max_iters.
    gnc_lm_iters: int = 2
    # Budget for the initial unit-weight solve only. Driving it to full
    # convergence is wasted work — it exists to initialize mu from the
    # max residual, and the first GNC rounds reshuffle the weights
    # anyway. 5 matches 10 on the same 16-seed sweep (ate/recall
    # identical to 4 decimals). 0 = use lm_max_iters.
    lm_init_iters: int = 5
    gnc_on_loops_only: bool = True
    # "pcg": matrix-free block-Jacobi PCG (O(E) memory, any size).
    # "dense": scatter-assembled 6Px6P Cholesky — one large kernel
    #   instead of ~cg_max_iters tiny matvecs; much faster on TPU for
    #   small/medium graphs (launch-latency-bound regime).
    # "auto": dense when 6P <= dense_threshold, else pcg.
    linear_solver: str = "auto"
    # On TPU the dense Cholesky wins only for small blocks (the (P,P,6,6)
    # scatter-assembly dominates beyond that); measured crossover ~P=256.
    dense_threshold: int = 1536  # on 6P (i.e. P <= 256 poses)
    # PCG preconditioner. "tridiag": exact block-tridiagonal solve of
    # the odometry-chain part of H by cyclic reduction (log2(P) levels
    # of batched 6x6 arithmetic, ops/block_tridiag.py) — the chain is
    # the ill-conditioned part (condition ~P^2), and with it removed
    # CG only has the loop-closure couplings left. "jacobi": per-node
    # 6x6 block inverses (round-3 behavior; measured burning the FULL
    # 50-iteration CG budget on every LM step at 1000 poses).
    preconditioner: str = "tridiag"
    # Chordal initialization (backend/initialization.py): replaces the
    # stored initial estimates with a rotation-averaging solution before
    # the first LM — enables convergence from arbitrary initial frames.
    use_chordal_init: bool = False


# ----------------------------------------------------------------------
# Residuals and Jacobians
# ----------------------------------------------------------------------
def _edge_residual(xi_i, xi_j, Ri, ti, Rj, tj, Rm, tm, Gamma):
    """Whitened between-factor residual at right-perturbed endpoints."""
    dRi, dti = se3.se3_exp(xi_i)
    dRj, dtj = se3.se3_exp(xi_j)
    Ri2, ti2 = se3.compose(Ri, ti, dRi, dti)
    Rj2, tj2 = se3.compose(Rj, tj, dRj, dtj)
    Rrel, trel = se3.between(Ri2, ti2, Rj2, tj2)
    Rerr, terr = se3.between(Rm, tm, Rrel, trel)
    return Gamma @ se3.se3_log(Rerr, terr)


_edge_jac = jax.jacfwd(_edge_residual, argnums=(0, 1))


def edge_residuals(g: GraphArrays, R, t):
    """(E, 6) whitened residuals of all between factors at (R, t).

    Direct batched form (no zero-perturbation exp/compose: the vmapped
    `_edge_residual(0, 0, ...)` form paid an se3_exp and two composes
    per edge for nothing — measured 2x the cost of this)."""
    Rrel, trel = se3.between(R[g.e_i], t[g.e_i], R[g.e_j], t[g.e_j])
    RE, tE = se3.between(g.R_meas, g.t_meas, Rrel, trel)
    return jnp.einsum("eij,ej->ei", g.sqrt_info, se3.se3_log(RE, tE))


def _log_after_perturb(xi, RE, tE, Gamma):
    """Gamma Log(E exp(xi)) — the only map that needs differentiating:
    see edge_residuals_jacobians."""
    dR, dt = se3.se3_exp(xi)
    Rc, tc = se3.compose(RE, tE, dR, dt)
    return Gamma @ se3.se3_log(Rc, tc)


_log_jac = jax.jacfwd(_log_after_perturb, argnums=0)


def edge_residuals_jacobians(g: GraphArrays, R, t):
    """Fused (r, Ji, Jj) for all between factors — half the autodiff
    work of jacfwd over both endpoints.

    With E0 = Z^-1 X_i^-1 X_j the residual is r = Gamma Log(E0), and
    right-perturbing the endpoints gives
      r(xi_j) = Gamma Log(E0 exp(xi_j))               (definition)
      r(xi_i) = Gamma Log(E0 exp(-Ad_{X_j^-1 X_i} xi_i))
    (conjugation: Z^-1 e^{-xi_i} Z E0 = E0 e^{-Ad_{E0^-1 Z^-1} xi_i}
    and E0^-1 Z^-1 = (X_j^-1 X_i) as group elements). So only the
    6-tangent jacfwd of xi -> Gamma Log(E0 exp(xi)) is needed;
    J_i = -J_j Ad_{X_j^-1 X_i} follows EXACTLY from group structure
    (se3_exp is the true SE(3) exponential). The shared E0 also serves
    the residual, so the LM body computes between() once per edge
    instead of three times."""
    Ri, ti = R[g.e_i], t[g.e_i]
    Rj, tj = R[g.e_j], t[g.e_j]
    Rrel, trel = se3.between(Ri, ti, Rj, tj)
    RE, tE = se3.between(g.R_meas, g.t_meas, Rrel, trel)
    r = jnp.einsum("eij,ej->ei", g.sqrt_info, se3.se3_log(RE, tE))
    zeros = jnp.zeros((g.e_i.shape[0], 6), dtype=R.dtype)
    Jj = jax.vmap(_log_jac)(zeros, RE, tE, g.sqrt_info)
    Rji, tji = se3.between(Rj, tj, Ri, ti)
    Ji = -jnp.einsum("eok,ekl->eol", Jj, se3.adjoint(Rji, tji))
    return r, Ji, Jj


def edge_jacobians(g: GraphArrays, R, t):
    """((E,6,6), (E,6,6)) Jacobians wrt right-perturbations of X_i, X_j."""
    _, Ji, Jj = edge_residuals_jacobians(g, R, t)
    return Ji, Jj


def _prior_residual(xi, Rp, tp, Rx, tx, w):
    dR, dt = se3.se3_exp(xi)
    Rx2, tx2 = se3.compose(Rx, tx, dR, dt)
    Rerr, terr = se3.between(Rp, tp, Rx2, tx2)
    return w * se3.se3_log(Rerr, terr)


_prior_jac = jax.jacfwd(_prior_residual, argnums=0)


def graph_cost(g: GraphArrays, R, t, weights, red=None):
    """Robust weighted cost 0.5 sum w_e ||r_e||^2 (+ prior). The edge
    sum is reduced across shards (red), the prior is replicated."""
    r = edge_residuals(g, R, t)
    u = 0.5 * jnp.sum(r * r, axis=-1)
    cost = _rsum(red, jnp.sum(weights * g.edge_mask * u))
    rp = _prior_residual(jnp.zeros(6, R.dtype), g.prior_R, g.prior_t,
                         R[g.prior_idx], t[g.prior_idx], g.prior_weight)
    return cost + 0.5 * jnp.sum(rp * rp)


# ----------------------------------------------------------------------
# Gauss-Newton normal equations: dense Cholesky or block-Jacobi PCG
# ----------------------------------------------------------------------
def _solve_normal_eqs_dense(g: GraphArrays, Ji, Jj, r, lam, Jp, rp):
    """Scatter-assemble H = J^T J as a dense (6P, 6P) matrix and solve by
    Cholesky — one MXU-sized kernel instead of a PCG loop. Right choice
    when 6P fits comfortably in HBM (SURVEY §7 hard part 2: robots as
    dense blocks)."""
    P = g.R.shape[0]
    # flat (P*P, 36) scatter with linearized indices — trailing (6, 6)
    # minors scatter ~6.5x slower (ops/block_tridiag layout notes)
    H = jnp.zeros((P * P, 36), dtype=r.dtype)
    H = H.at[g.e_i * P + g.e_i].add(
        jnp.einsum("eoi,eoj->eij", Ji, Ji).reshape(-1, 36))
    H = H.at[g.e_j * P + g.e_j].add(
        jnp.einsum("eoi,eoj->eij", Jj, Jj).reshape(-1, 36))
    H = H.at[g.e_i * P + g.e_j].add(
        jnp.einsum("eoi,eoj->eij", Ji, Jj).reshape(-1, 36))
    H = H.at[g.e_j * P + g.e_i].add(
        jnp.einsum("eoi,eoj->eij", Jj, Ji).reshape(-1, 36))
    H = H.at[g.prior_idx * (P + 1)].add((Jp.T @ Jp).reshape(36))
    H = H.reshape(P, P, 6, 6)
    H6 = jnp.transpose(H, (0, 2, 1, 3)).reshape(6 * P, 6 * P)
    H6 = H6 + lam * jnp.eye(6 * P, dtype=r.dtype)

    b = jnp.zeros((P, 6), dtype=r.dtype)
    b = b.at[g.e_i].add(jnp.einsum("eoi,eo->ei", Ji, r))
    b = b.at[g.e_j].add(jnp.einsum("eoi,eo->ei", Jj, r))
    b = b.at[g.prior_idx].add(Jp.T @ rp)
    rhs = -b.reshape(6 * P)

    L = jnp.linalg.cholesky(H6)
    dx = jax.scipy.linalg.cho_solve((L, True), rhs)
    return dx.reshape(P, 6) * g.node_mask[:, None]


# Max P*2E entries for the one-hot incidence matmul in the PCG
# matvec (16 MB f32 ~ the 1024-pose bucket). Module-level so
# tests can pin either path.
_INCIDENCE_MAX_ENTRIES = 4 * 1024 * 1024


def edge_transpose_operators(e_i, e_j, edge_mask, P, dtype):
    """(idx, gather_x, jt_scatter) for the stacked (2E,) edge layout.

    Shared by the single-chip PCG and the shard_map distributed solve
    (parallel/distributed_pgo.py) so the gather/scatter-vs-incidence
    decision lives in exactly one place. At op-floor-bound sizes,
    gather/scatter-add are the most expensive ops in the matvec
    (~25-40 us each on v5e); a one-hot incidence matmul turns both into
    MXU work at the price of P*2E*4 bytes of HBM traffic per apply —
    worth it up to ~16 MB (the 1024-pose bucket), beyond which the
    scatter path's linear scaling wins. Static-shape decision.
    """
    E = e_i.shape[0]
    idx = jnp.concatenate([e_i, e_j], axis=0)          # (2E,)
    if P * 2 * E <= _INCIDENCE_MAX_ENTRIES:
        inc = (idx[None, :] == jnp.arange(P, dtype=idx.dtype)[:, None])
        emask2 = jnp.concatenate([edge_mask, edge_mask])
        inc = inc.astype(dtype) * emask2[None, :]      # (P, 2E)
        inc_t = inc.T

        def gather_x(x):
            return inc_t @ x

        def jt_scatter(vals):
            return inc @ vals
    else:
        def gather_x(x):
            return x[idx]

        def jt_scatter(vals):
            return jnp.zeros((P, 6), dtype=dtype).at[idx].add(vals)
    return idx, gather_x, jt_scatter


def _build_precond(g: GraphArrays, Ji, Jj, lam, cfg, Jp, red=None):
    """Build the PCG preconditioner state from sqrt(weight)*mask-scaled
    Jacobians. Returned pytree feeds _solve_normal_eqs(precond=...).

    Built ONCE per LM solve, not per LM step: the Hii/O scatter-
    assembly (~0.50 ms) plus the cyclic-reduction factorization
    (~0.34 ms) were ~40% of a 2.1 ms LM step at P=1024 (round-4
    microprof), and a preconditioner only steers CG — Jacobians and
    lam drifting over a solve's steps costs at most a few extra CG
    iterations inside the tolerance-gated loop, not correctness.

    Sharded (red != None): the edge-scattered Hii/O contributions are
    psum'ed, then the BCR factorization runs REPLICATED per chip (poses
    are replicated) — two (P, 36)-sized collectives per LM solve, zero
    extra ICI inside the CG loop."""
    P = g.R.shape[0]
    Jst = jnp.concatenate([Ji, Jj], axis=0)
    idx = jnp.concatenate([g.e_i, g.e_j], axis=0)
    # Scatter through the flat (P, 36) view: index scatters on a
    # trailing (6, 6) minor are tile-padded per block and cost ~6.5x
    # (measured 1.69 vs 0.26 ms at 16k rows on v5e — see
    # ops/block_tridiag.bcr_solve_multi).
    Hii = jnp.zeros((P, 36), dtype=Ji.dtype)
    Hii = Hii.at[idx].add(
        jnp.einsum("eoi,eoj->eij", Jst, Jst).reshape(-1, 36))
    Hii = _rsum(red, Hii)
    Hii = Hii.at[g.prior_idx].add((Jp.T @ Jp).reshape(36))
    Hii = Hii.reshape(P, 6, 6) + lam * jnp.eye(6, dtype=Ji.dtype)[None]
    if getattr(cfg, "preconditioner", "tridiag") == "tridiag":
        # Exact solve of M = tridiag(Hii, chain couplings) by block
        # cyclic reduction: M is the full GN Hessian of the odometry
        # chain (+lam, +prior) plus the PSD block-diagonal of loop
        # contributions, so PCG is left with only the loop couplings —
        # block-Jacobi alone burned the full CG budget every LM step
        # (measured 50/50 at 1000 poses, round 4).
        from cslam_tpu.ops.block_tridiag import (bcr_factor,
                                                 chain_offdiag_from_edges)
        O_chain = _rsum(red, chain_offdiag_from_edges(
            g.e_i, g.e_j, Ji, Jj, P).reshape(P, 36)).reshape(P, 6, 6)
        return ("tridiag", bcr_factor(Hii, O_chain))
    # batched unrolled Gauss-Jordan: jnp.linalg.inv on (P, 6, 6) is
    # a ~730 us batched-LU call on TPU — the most expensive op in
    # the whole LM body (ops/batched_linalg.py)
    return ("jacobi", batched_inv_small(Hii))


def _solve_normal_eqs(g: GraphArrays, Ji, Jj, r, sw, lam, Jp, rp, cfg,
                      x0=None, cg_iters=None, precond=None, red=None,
                      return_iters=False):
    """PCG solve of (J^T J + lam I) dx = -J^T r. Ji/Jj/r are pre-scaled by
    sqrt(weight)*mask (sw kept for the Hessian diag). Returns (P, 6).

    The per-edge Jacobian blocks are stacked as (2E, 6, 6) with a single
    (2E,) endpoint-index vector so each CG matvec is ONE gather, ONE
    batched einsum each way and ONE scatter-add: at these sizes (E~1k,
    P~512) the solve is bound by the per-op floor inside the program,
    not FLOPs, so halving the op count ~halves the CG cost.

    `x0` warm-starts CG (the previous LM iteration's step): one extra
    matvec buys a residual that is already small when consecutive
    trust-region subproblems are similar. `precond` reuses a
    _build_precond result across LM steps (see there)."""
    P = g.R.shape[0]
    E = Ji.shape[0]
    Jst = jnp.concatenate([Ji, Jj], axis=0)           # (2E, 6, 6)
    idx, gather_x, jt_scatter = edge_transpose_operators(
        g.e_i, g.e_j, g.edge_mask, P, r.dtype)

    def jt_apply(y):
        """J^T y for per-edge (E, 6) y -> (P, 6)."""
        y2 = jnp.concatenate([y, y], axis=0)
        return jt_scatter(jnp.einsum("eoi,eo->ei", Jst, y2))

    # gradient b = -J^T r  (E-batched; edge scatter psum'ed when
    # sharded, prior added replicated post-reduce)
    b = -_rsum(red, jt_apply(r))
    b = b.at[g.prior_idx].add(-Jp.T @ rp)

    def hvp(x):
        part = jnp.einsum("eoi,ei->eo", Jst, gather_x(x))
        y = part[:E] + part[E:]
        out = _rsum(red, jt_apply(y))
        out = out.at[g.prior_idx].add(Jp.T @ (Jp @ x[g.prior_idx]))
        return out + lam * x

    if precond is None:
        precond = _build_precond(g, Ji, Jj, lam, cfg, Jp, red=red)
    kind, state = precond
    if kind == "tridiag":
        from cslam_tpu.ops.block_tridiag import bcr_solve

        def apply_minv(v):
            return bcr_solve(state, v) * g.node_mask[:, None]
    else:
        def apply_minv(v):
            return jnp.einsum("pij,pj->pi", state, v)

    def dot(a, bb):
        return jnp.sum(a * bb)

    if x0 is None:
        x0 = jnp.zeros((P, 6), dtype=r.dtype)
        r0 = b
    else:
        x0 = x0 * g.node_mask[:, None]
        r0 = b - hvp(x0)
    z0 = apply_minv(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    b_norm = jnp.maximum(dot(b, b), 1e-30)

    unroll = max(int(cfg.cg_unroll), 1)
    cg_budget = cfg.cg_max_iters if cg_iters is None else cg_iters

    def cond(state):
        it, _, rr, _, rz = state[0], state[1], state[2], state[3], state[4]
        res = dot(rr, rr)
        return (it < cg_budget) & (res > cfg.cg_tol * b_norm)

    def body(state):
        it, x, rr, p, rz = state
        for _ in range(unroll):  # fused steps, one dispatch
            Hp = hvp(p)
            alpha = rz / jnp.maximum(dot(p, Hp), 1e-30)
            x = x + alpha * p
            rr = rr - alpha * Hp
            z = apply_minv(rr)
            rz_new = dot(rr, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            rz = rz_new
        return it + unroll, x, rr, p, rz

    it, dx, _, _, _ = jax.lax.while_loop(cond, body,
                                         (jnp.int32(0), x0, r0, p0, rz0))
    dx = dx * g.node_mask[:, None]
    if return_iters:
        return dx, it
    return dx


def _retract(R, t, dx, node_mask):
    dR, dt = se3.se3_exp(dx)
    Rn, tn = se3.compose(R, t, dR, dt)
    keep = node_mask[:, None] > 0
    return (jnp.where(keep[..., None], Rn, R), jnp.where(keep, tn, t))


# ----------------------------------------------------------------------
# Levenberg-Marquardt with GNC weights
# ----------------------------------------------------------------------
def _lm_optimize(g: GraphArrays, R, t, weights, cfg: PGOConfig,
                 max_iters=None, lam0=None, cg_iters=None, red=None,
                 count_iters=False):
    """Runs up to max_iters damped Gauss-Newton steps from (R, t).

    lam0 carries the trust-region state across GNC reweighting rounds:
    with small per-round LM budgets (gnc_lm_iters 1-2) a fresh
    lm_init_lambda every round discards what the previous round learned
    about the local curvature and wastes the round's only step(s) on
    re-adapting lambda.

    count_iters=True (a static flag, zero cost when off) additionally
    returns (lm_steps_taken, cg_iterations_total) — the data behind
    the phase-breakdown benchmark (bench.py::bench_pgo_phases)."""
    max_iters = cfg.lm_max_iters if max_iters is None else max_iters
    sw = jnp.sqrt(jnp.maximum(weights * g.edge_mask, 0.0))
    zeros6 = jnp.zeros(6, R.dtype)
    # sharded mode always uses PCG: assembling the dense (6P, 6P)
    # Hessian would psum a P*P*36 array per step for no win
    use_dense = red is None and (cfg.linear_solver == "dense" or (
        cfg.linear_solver == "auto"
        and 6 * g.R.shape[0] <= cfg.dense_threshold))

    def eval_point(R, t):
        """Residuals+Jacobians and exact cost at a point — the ONE
        per-step evaluation. The candidate's evaluation doubles as the
        accept-test cost (cost = 0.5 sum w |r|^2 from the residuals
        already in hand) AND the next step's linearization; the old
        structure evaluated residuals twice per step (resjac + a full
        graph_cost re-evaluation, ~0.46 ms of a 2.1 ms step at P=1024,
        round-4 microprof)."""
        r, Ji, Jj = edge_residuals_jacobians(g, R, t)
        rp = _prior_residual(zeros6, g.prior_R, g.prior_t, R[g.prior_idx],
                             t[g.prior_idx], g.prior_weight)
        cost = (_rsum(red, jnp.sum(weights * g.edge_mask *
                                   0.5 * jnp.sum(r * r, axis=-1)))
                + 0.5 * jnp.sum(rp * rp))
        return r, Ji, Jj, rp, cost

    def body(state):
        R, t, lam, cost, it, done, dx_prev, r, Ji, Jj, rp, cg_tot = state
        r_s = r * sw[:, None]
        Ji_s = Ji * sw[:, None, None]
        Jj_s = Jj * sw[:, None, None]
        Jp = _prior_jac(zeros6, g.prior_R, g.prior_t, R[g.prior_idx],
                        t[g.prior_idx], g.prior_weight)
        if use_dense:
            dx = _solve_normal_eqs_dense(g, Ji_s, Jj_s, r_s, lam, Jp, rp)
        elif count_iters:
            dx, cg_it = _solve_normal_eqs(
                g, Ji_s, Jj_s, r_s, sw, lam, Jp, rp, cfg, x0=dx_prev,
                cg_iters=cg_iters, precond=precond, red=red,
                return_iters=True)
            cg_tot = cg_tot + cg_it
        else:
            dx = _solve_normal_eqs(g, Ji_s, Jj_s, r_s, sw, lam, Jp, rp, cfg,
                                   x0=dx_prev, cg_iters=cg_iters,
                                   precond=precond, red=red)
        Rc, tc = _retract(R, t, dx, g.node_mask)
        r_c, Ji_c, Jj_c, rp_c, cost_c = eval_point(Rc, tc)
        accept = cost_c < cost
        R = jnp.where(accept, Rc, R)
        t = jnp.where(accept, tc, t)
        r = jnp.where(accept, r_c, r)
        Ji = jnp.where(accept, Ji_c, Ji)
        Jj = jnp.where(accept, Jj_c, Jj)
        rp = jnp.where(accept, rp_c, rp)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        rel = jnp.abs(cost - cost_c) / jnp.maximum(cost, 1e-30)
        done = accept & (rel < 1e-7)
        cost = jnp.where(accept, cost_c, cost)
        return R, t, lam, cost, it + 1, done, dx, r, Ji, Jj, rp, cg_tot

    def cond(state):
        it, done = state[4], state[5]
        return (it < max_iters) & (~done)

    r0e, Ji0, Jj0, rp0, cost0 = eval_point(R, t)
    lam_init = jnp.float32(cfg.lm_init_lambda) if lam0 is None else lam0
    # Preconditioner built ONCE per LM solve from the entry
    # linearization (see _build_precond for the staleness argument).
    precond = None
    if not use_dense:
        Jp0 = _prior_jac(zeros6, g.prior_R, g.prior_t, R[g.prior_idx],
                         t[g.prior_idx], g.prior_weight)
        precond = _build_precond(g, Ji0 * sw[:, None, None],
                                 Jj0 * sw[:, None, None], lam_init, cfg,
                                 Jp0, red=red)
    dx0 = jnp.zeros((g.R.shape[0], 6), dtype=R.dtype)
    state = (R, t, lam_init, cost0, jnp.int32(0), jnp.bool_(False), dx0,
             r0e, Ji0, Jj0, rp0, jnp.int32(0))
    final = jax.lax.while_loop(cond, body, state)
    R, t, lam, cost = final[:4]
    if count_iters:
        return R, t, cost, lam, final[4], final[11]
    return R, t, cost, lam


# ----------------------------------------------------------------------
# GNC outer loop (TLS)
# ----------------------------------------------------------------------
def _gnc_weights_tls(u, mu, barc_sq):
    """gtsam GncOptimizer::calculateWeights for TLS, on u = 0.5||r||^2."""
    ub = (mu + 1.0) / mu * barc_sq
    lb = mu / (mu + 1.0) * barc_sq
    mid = jnp.sqrt(barc_sq * mu * (mu + 1.0) / jnp.maximum(u, 1e-30)) - mu
    w = jnp.where(u >= ub, 0.0, jnp.where(u <= lb, 1.0,
                                          jnp.clip(mid, 0.0, 1.0)))
    return w


def gnc_optimize_core(g: GraphArrays, cfg: PGOConfig, red=None,
                      stop_after: str = "polish",
                      count_iters: bool = False):
    """GNC-TLS robust PGO from the graph's stored initial estimates.

    `red=None` is the single-chip path (see gnc_optimize); an EdgeReduce
    makes the SAME code run with factor shards and replicated poses
    inside a shard_map (parallel/distributed_pgo.py) — every decision
    variable (costs, mu, lambda, accept flags) is computed from reduced
    quantities and therefore identical on every chip.

    stop_after / count_iters (static; zero cost at defaults) exist for
    the phase-breakdown benchmark (bench.py::bench_pgo_phases):
    stop_after in {"init", "gnc", "polish"} truncates the pipeline so
    nested-prefix slope timings decompose the solve into phases;
    count_iters additionally returns a dict of per-phase LM-step and
    CG-iteration totals as a second output."""
    if cfg.use_chordal_init:
        assert red is None, \
            "chordal init runs on the full edge set; initialize before sharding"
        from cslam_tpu.backend.initialization import chordal_initialize
        R0, t0 = chordal_initialize(g)
        g = g._replace(R=R0, t=t0)
    R0, t0 = g.R, g.t
    ones = jnp.ones_like(g.edge_mask)
    initial_cost = graph_cost(g, R0, t0, ones, red=red)

    robust_mask = g.is_loop if cfg.gnc_on_loops_only else g.edge_mask

    # First LM solve with unit weights (gtsam does the same before mu init)
    lm_init = cfg.lm_init_iters if cfg.lm_init_iters > 0 else cfg.lm_max_iters
    gnc_cg = cfg.gnc_cg_max_iters if cfg.gnc_cg_max_iters > 0 \
        else cfg.cg_max_iters
    stats = {}
    if count_iters:
        R1, t1, _, lam1, stats["lm_init"], stats["cg_init"] = _lm_optimize(
            g, R0, t0, ones, cfg, max_iters=lm_init, cg_iters=gnc_cg,
            red=red, count_iters=True)
    else:
        R1, t1, _, lam1 = _lm_optimize(g, R0, t0, ones, cfg,
                                       max_iters=lm_init, cg_iters=gnc_cg,
                                       red=red)
    if stop_after == "init":
        result = PGOResult(R=R1, t=t1,
                           cost=graph_cost(g, R1, t1, ones, red=red),
                           initial_cost=initial_cost,
                           gnc_iters=jnp.int32(0), weights=ones)
        return (result, stats) if count_iters else result

    r = edge_residuals(g, R1, t1)
    u = 0.5 * jnp.sum(r * r, axis=-1) * g.edge_mask
    u_robust = u * robust_mask
    max_u = _rmax(red, jnp.max(u_robust))
    # gtsam initializeMu (TLS): mu0 = barcSq / (2 rmax^2 - barcSq);
    # non-positive => all residuals already inliers, no GNC needed.
    denom = 2.0 * max_u - cfg.barc_sq
    mu0 = cfg.barc_sq / jnp.maximum(denom, 1e-12)
    skip_gnc = denom <= 0.0

    def weights_for(mu, u):
        w = _gnc_weights_tls(u, mu, cfg.barc_sq)
        return jnp.where(robust_mask > 0, w, 1.0)

    def cond(state):
        it, done = state[0], state[6]
        return (it < cfg.gnc_max_outer_iters) & (~done)

    gnc_lm = cfg.gnc_lm_iters if cfg.gnc_lm_iters > 0 else cfg.lm_max_iters

    def body(state):
        it, R, t, mu, w, lam, _, lm_tot, cg_tot = state
        if count_iters:
            R, t, _, lam, lmN, cgN = _lm_optimize(
                g, R, t, w, cfg, max_iters=gnc_lm, lam0=lam,
                cg_iters=gnc_cg, red=red, count_iters=True)
            lm_tot = lm_tot + lmN
            cg_tot = cg_tot + cgN
        else:
            R, t, _, lam = _lm_optimize(g, R, t, w, cfg, max_iters=gnc_lm,
                                        lam0=lam, cg_iters=gnc_cg, red=red)
        r = edge_residuals(g, R, t)
        u = 0.5 * jnp.sum(r * r, axis=-1) * g.edge_mask
        w_new = weights_for(mu, u)
        # Converged = weights essentially binary on robust factors AND
        # stable across rounds. Binariness alone is a trap: with one
        # gross outlier the unit-weight init solve is dragged far enough
        # that the FIRST reweighting can reject every loop (w == 0
        # everywhere => frac == 0) while the anneal would recover the
        # true inliers two rounds later — observed on a 60-pose circle
        # with a 9-meter outlier closure.
        frac = _rsum(red, jnp.sum(w_new * (1.0 - w_new) * robust_mask))
        stable = _rmax(red,
                       jnp.max(jnp.abs(w_new - w) * robust_mask)) < 1e-3
        done = (frac < 1e-5) & stable
        return (it + 1, R, t, mu * cfg.mu_step, w_new, lam, done,
                lm_tot, cg_tot)

    w0 = jnp.where(skip_gnc, ones, weights_for(mu0, u))
    init = (jnp.int32(0), R1, t1, jnp.maximum(mu0, 1e-6), w0, lam1,
            jnp.bool_(skip_gnc), jnp.int32(0), jnp.int32(0))
    gnc_iters, R, t, _, w, lam, _, lm_gnc, cg_gnc = jax.lax.while_loop(
        cond, body, init)
    if count_iters:
        stats["gnc_rounds"] = gnc_iters
        stats["lm_gnc"] = lm_gnc
        stats["cg_gnc"] = cg_gnc
    if stop_after == "gnc":
        result = PGOResult(R=R, t=t,
                           cost=graph_cost(g, R, t, w, red=red),
                           initial_cost=initial_cost,
                           gnc_iters=gnc_iters, weights=w)
        return (result, stats) if count_iters else result

    # Final polish with converged weights
    if count_iters:
        R, t, cost, _, stats["lm_polish"], stats["cg_polish"] = \
            _lm_optimize(g, R, t, w, cfg, lam0=lam, red=red,
                         count_iters=True)
    else:
        R, t, cost, _ = _lm_optimize(g, R, t, w, cfg, lam0=lam, red=red)
    result = PGOResult(R=R, t=t, cost=cost, initial_cost=initial_cost,
                       gnc_iters=gnc_iters, weights=w)
    return (result, stats) if count_iters else result


@functools.partial(jax.jit, static_argnames=("cfg",))
def gnc_optimize(g: GraphArrays, cfg: PGOConfig = PGOConfig()) -> PGOResult:
    """Full GNC-TLS robust PGO from the graph's stored initial estimates."""
    return gnc_optimize_core(g, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def gnc_optimize_batch(gs: GraphArrays,
                       cfg: PGOConfig = PGOConfig()) -> PGOResult:
    """vmapped GNC-LM over a batch of independent graphs.

    `gs` is a GraphArrays whose leaves carry a leading batch axis (same
    node/edge capacity buckets — to_arrays' power-of-two padding makes
    stacking natural). One fused program optimizes all graphs at once:
    the per-solve while-loop/dispatch overhead that dominates small
    graphs is paid once for the whole batch instead of per robot —
    the multi-robot mission's independent per-subgraph solves
    (reference runs one GTSAM solve per robot's optimizer,
    decentralized_pgo.cpp:853-886) become a single TPU program.
    Iteration counts follow the slowest graph in the batch; converged
    members idle harmlessly under the guards."""
    return jax.vmap(lambda g: gnc_optimize(g, cfg))(gs)


def optimize_batch(fgs, cfg: PGOConfig = PGOConfig()):
    """Host entry for a list of FactorGraphs: pad to the largest bucket,
    stack, solve in one program, write back. Returns a list of
    PGOResults (sliced per graph)."""
    arrays = [fg.to_arrays() for fg in fgs]
    n_cap = max(a.R.shape[0] for a in arrays)
    e_cap = max(a.e_i.shape[0] for a in arrays)
    arrays = [fg.to_arrays(min_node_capacity=n_cap,
                           min_edge_capacity=e_cap) for fg in fgs]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *arrays)
    result = gnc_optimize_batch(stacked, cfg)
    out = []
    for b, fg in enumerate(fgs):
        r = jax.tree.map(lambda x, b=b: x[b], result)
        fg.update_estimates(r.R, r.t)
        out.append(r)
    return out


def optimize(fg: FactorGraph, cfg: PGOConfig = PGOConfig()) -> PGOResult:
    """Host entry: arrays, jitted solve, write-back of estimates.

    Chordal initialization runs as its OWN program: fusing it into the
    gnc_optimize executable faulted the TPU runtime at a 65536-pose
    graph (the split runs fine), and the extra dispatch only matters for
    small solves, which don't use chordal init."""
    g = fg.to_arrays()
    if cfg.use_chordal_init:
        from cslam_tpu.backend.initialization import chordal_initialize
        R0, t0 = chordal_initialize(g)
        g = g._replace(R=R0, t=t0)
        cfg = cfg._replace(use_chordal_init=False)
    result = gnc_optimize(g, cfg)
    fg.update_estimates(result.R, result.t)
    return result
