"""Pose-graph optimization distributed over a device mesh.

Factor-parallel decomposition: between-factors shard across chips (each
robot's factor block lands contiguously, so the robot axis maps onto the
shard axis); pose estimates replicate. Every Gauss-Newton matvec is

    local gather -> batched (E/d, 6, 6) einsum -> scatter-add -> psum,

so the reduced normal equations are formed collectively (the TPU
equivalent of the reference's "aggregate everything on the elected
optimizer then solve", decentralized_pgo.cpp:602-681 + :853-886 — here
the solve itself is the collective). ICI traffic per CG iteration is one
psum of the (P, 6) state — independent of edge count.

The GNC-TLS outer loop and LM damping follow backend/pgo.py exactly; the
only difference is where the factor work lives.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cslam_tpu.backend.factor_graph import FactorGraph, GraphArrays
from cslam_tpu.backend import pgo as pgo_mod
from cslam_tpu.ops.batched_linalg import batched_inv_small
from cslam_tpu.ops import se3


def _shard_graph(mesh: Mesh, g: GraphArrays, axis_name: str):
    """Place edge arrays sharded, node arrays replicated."""
    eshard = NamedSharding(mesh, P(axis_name))
    eshard2 = NamedSharding(mesh, P(axis_name, None))
    eshard3 = NamedSharding(mesh, P(axis_name, None, None))
    rep = NamedSharding(mesh, P())
    return GraphArrays(
        R=jax.device_put(g.R, rep), t=jax.device_put(g.t, rep),
        node_mask=jax.device_put(g.node_mask, rep),
        e_i=jax.device_put(g.e_i, eshard),
        e_j=jax.device_put(g.e_j, eshard),
        R_meas=jax.device_put(g.R_meas, eshard3),
        t_meas=jax.device_put(g.t_meas, eshard2),
        sqrt_info=jax.device_put(g.sqrt_info, eshard3),
        edge_mask=jax.device_put(g.edge_mask, eshard),
        is_loop=jax.device_put(g.is_loop, eshard),
        prior_idx=jax.device_put(g.prior_idx, rep),
        prior_R=jax.device_put(g.prior_R, rep),
        prior_t=jax.device_put(g.prior_t, rep),
        prior_weight=jax.device_put(g.prior_weight, rep))


def distributed_gnc_optimize(mesh: Mesh, g: GraphArrays,
                             cfg: pgo_mod.PGOConfig = pgo_mod.PGOConfig(),
                             axis_name: str = "shard"):
    """GNC-LM solve with factors sharded over `mesh`.

    The shard_map body reuses the single-chip optimizer code paths on the
    local factor shard; cross-shard reductions happen via psum inside
    residual/cost/normal-equation assembly. Poses stay replicated
    (identical on every chip by construction — all updates are computed
    from psum-reduced quantities).
    """
    n_shards = mesh.shape[axis_name]
    assert g.e_i.shape[0] % n_shards == 0

    if cfg.use_chordal_init:
        from cslam_tpu.backend.initialization import chordal_initialize
        R0, t0 = chordal_initialize(g)
        g = g._replace(R=R0, t=t0)

    g_sharded = _shard_graph(mesh, g, axis_name)

    edge_specs = GraphArrays(
        R=P(), t=P(), node_mask=P(),
        e_i=P(axis_name), e_j=P(axis_name),
        R_meas=P(axis_name, None, None), t_meas=P(axis_name, None),
        sqrt_info=P(axis_name, None, None),
        edge_mask=P(axis_name), is_loop=P(axis_name),
        prior_idx=P(), prior_R=P(), prior_t=P(), prior_weight=P())

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(edge_specs,),
                       out_specs=(P(), P(), P(), P(axis_name)),
                       check_vma=False)
    def _solve(gl: GraphArrays):
        # gl: local shard of edges, replicated nodes.
        psum = lambda x: jax.lax.psum(x, axis_name)

        def graph_cost(R, t, weights):
            r = pgo_mod.edge_residuals(gl, R, t)
            u = 0.5 * jnp.sum(r * r, axis=-1)
            cost = psum(jnp.sum(weights * gl.edge_mask * u))
            rp = pgo_mod._prior_residual(jnp.zeros(6, R.dtype), gl.prior_R,
                                         gl.prior_t, R[gl.prior_idx],
                                         t[gl.prior_idx], gl.prior_weight)
            return cost + 0.5 * jnp.sum(rp * rp)

        Pn = gl.R.shape[0]

        def lm_solve(R, t, weights, lam0):
            def body(state):
                R, t, lam, cost, it, done = state
                r = pgo_mod.edge_residuals(gl, R, t)
                Ji, Jj = pgo_mod.edge_jacobians(gl, R, t)
                sw = jnp.sqrt(jnp.maximum(weights * gl.edge_mask, 0.0))
                r_s = r * sw[:, None]
                Ji_s = Ji * sw[:, None, None]
                Jj_s = Jj * sw[:, None, None]
                zeros6 = jnp.zeros(6, R.dtype)
                rp = pgo_mod._prior_residual(zeros6, gl.prior_R, gl.prior_t,
                                             R[gl.prior_idx], t[gl.prior_idx],
                                             gl.prior_weight)
                Jp = pgo_mod._prior_jac(zeros6, gl.prior_R, gl.prior_t,
                                        R[gl.prior_idx], t[gl.prior_idx],
                                        gl.prior_weight)

                # same op-floor trade as the single-chip solver, via
                # the shared helper (backend/pgo.py): stacked (2E, 6, 6)
                # blocks + incidence matmuls on small shards
                El = gl.e_i.shape[0]
                Jst = jnp.concatenate([Ji_s, Jj_s], axis=0)
                idx, gather_x, jt_scatter = \
                    pgo_mod.edge_transpose_operators(
                        gl.e_i, gl.e_j, gl.edge_mask, Pn, r.dtype)

                def jt_apply(y):
                    y2 = jnp.concatenate([y, y], axis=0)
                    return jt_scatter(jnp.einsum("eoi,eo->ei", Jst, y2))

                b = -psum(jt_apply(r_s))
                b = b.at[gl.prior_idx].add(-Jp.T @ rp)

                def hvp(x):
                    part = jnp.einsum("eoi,ei->eo", Jst, gather_x(x))
                    y = part[:El] + part[El:]
                    out = psum(jt_apply(y))
                    out = out.at[gl.prior_idx].add(Jp.T @ (Jp @ x[gl.prior_idx]))
                    return out + lam * x

                # flat (Pn, 36) scatter — trailing (6, 6) minors
                # scatter ~6.5x slower (ops/block_tridiag layout notes)
                Hii = jnp.zeros((Pn, 36), dtype=r.dtype)
                Hii = Hii.at[idx].add(
                    jnp.einsum("eoi,eoj->eij", Jst, Jst).reshape(-1, 36))
                Hii = psum(Hii).reshape(Pn, 6, 6)
                Hii = Hii.at[gl.prior_idx].add(Jp.T @ Jp)
                Minv = batched_inv_small(Hii + lam * jnp.eye(6)[None])
                apply_minv = lambda v: jnp.einsum("pij,pj->pi", Minv, v)
                dot = lambda a, bb: jnp.sum(a * bb)

                b_norm = jnp.maximum(dot(b, b), 1e-30)

                def cg_cond(s):
                    it_cg, _, rr, _, _ = s
                    return (it_cg < cfg.cg_max_iters) & \
                        (dot(rr, rr) > cfg.cg_tol * b_norm)

                def cg_body(s):
                    it_cg, x, rr, p, rz = s
                    Hp = hvp(p)
                    alpha = rz / jnp.maximum(dot(p, Hp), 1e-30)
                    x = x + alpha * p
                    rr = rr - alpha * Hp
                    z = apply_minv(rr)
                    rz_new = dot(rr, z)
                    beta = rz_new / jnp.maximum(rz, 1e-30)
                    return it_cg + 1, x, rr, z + beta * p, rz_new

                z0 = apply_minv(b)
                _, dx, _, _, _ = jax.lax.while_loop(
                    cg_cond, cg_body,
                    (jnp.int32(0), jnp.zeros((Pn, 6)), b, z0, dot(b, z0)))
                dx = dx * gl.node_mask[:, None]
                Rc, tc = pgo_mod._retract(R, t, dx, gl.node_mask)
                cost_c = graph_cost(Rc, tc, weights)
                accept = cost_c < cost
                R = jnp.where(accept, Rc, R)
                t = jnp.where(accept, tc, t)
                lam = jnp.where(accept, lam * 0.5, lam * 4.0)
                rel = jnp.abs(cost - cost_c) / jnp.maximum(cost, 1e-30)
                done = accept & (rel < 1e-7)
                cost = jnp.where(accept, cost_c, cost)
                return R, t, lam, cost, it + 1, done

            def cond(state):
                return (state[4] < cfg.lm_max_iters) & (~state[5])

            cost0 = graph_cost(R, t, weights)
            R, t, _, cost, _, _ = jax.lax.while_loop(
                cond, body,
                (R, t, jnp.float32(lam0), cost0, jnp.int32(0),
                 jnp.bool_(False)))
            return R, t, cost

        # ---- GNC outer loop over the local weights (sharded) ----
        ones = jnp.ones_like(gl.edge_mask)
        robust_mask = gl.is_loop if cfg.gnc_on_loops_only else gl.edge_mask
        R1, t1, _ = lm_solve(gl.R, gl.t, ones, cfg.lm_init_lambda)
        r = pgo_mod.edge_residuals(gl, R1, t1)
        u = 0.5 * jnp.sum(r * r, axis=-1) * gl.edge_mask
        max_u = jax.lax.pmax(jnp.max(u * robust_mask), axis_name)
        denom = 2.0 * max_u - cfg.barc_sq
        mu0 = cfg.barc_sq / jnp.maximum(denom, 1e-12)
        skip = denom <= 0.0

        def weights_for(mu, u):
            w = pgo_mod._gnc_weights_tls(u, mu, cfg.barc_sq)
            return jnp.where(robust_mask > 0, w, 1.0)

        def outer_cond(s):
            return (s[0] < cfg.gnc_max_outer_iters) & (~s[5])

        def outer_body(s):
            it, R, t, mu, w, _ = s
            R, t, _ = lm_solve(R, t, w, cfg.lm_init_lambda)
            r = pgo_mod.edge_residuals(gl, R, t)
            u = 0.5 * jnp.sum(r * r, axis=-1) * gl.edge_mask
            w_new = weights_for(mu, u)
            frac = psum(jnp.sum(w_new * (1.0 - w_new) * robust_mask))
            return it + 1, R, t, mu * cfg.mu_step, w_new, frac < 1e-5

        w0 = jnp.where(skip, ones, weights_for(mu0, u))
        it, R, t, _, w, _ = jax.lax.while_loop(
            outer_cond, outer_body,
            (jnp.int32(0), R1, t1, jnp.maximum(mu0, 1e-6), w0,
             jnp.bool_(skip)))
        R, t, cost = lm_solve(R, t, w, cfg.lm_init_lambda)
        return R, t, cost, w

    R, t, cost, w = _solve(g_sharded)
    return pgo_mod.PGOResult(R=R, t=t, cost=cost,
                             initial_cost=jnp.float32(0.0),
                             gnc_iters=jnp.int32(-1), weights=w)


def optimize(mesh: Mesh, fg: FactorGraph,
             cfg: pgo_mod.PGOConfig = pgo_mod.PGOConfig()):
    n = mesh.shape[list(mesh.shape.keys())[0]]
    # robot-contiguous factor blocks: robots map onto the shard axis
    g = fg.to_arrays(edge_bucket_multiple=n, sort_by_robot=True)
    result = distributed_gnc_optimize(mesh, g, cfg)
    fg.update_estimates(result.R, result.t)
    return result
