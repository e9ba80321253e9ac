"""Op-level decomposition of one PGO LM step on chip.

Slope-times (chained lax.scan, k1=32/k2=96 per CLAUDE.md) the pieces
that make up an LM step at P=1024: BCR factorization, one BCR
preconditioner apply, one Hessian-vector product, residual+Jacobian
evaluation, and a full normal-equation PCG solve; also reports the CG
iteration count the tolerance gate actually leaves running. This is the
data behind any per-LM-step optimization — round-4 found the solve is
~40 LM steps whose per-step cost, not the phase structure, is the
remaining lever."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks.pgo_speed_check import build  # noqa: E402


def chain_time(make_step, x0, k1=32, k2=96):
    """Time (T(k2)-T(k1))/(k2-k1) of step chained k times in ONE
    program. make_step returns a jitted f(carry) -> carry (same pytree
    structure); carry must be a pytree of real arrays (non-scalar)."""
    import jax

    def runner(k):
        @jax.jit
        def run(c):
            def body(c, _):
                return make_step(c), 0.0
            c, _ = jax.lax.scan(body, c, None, length=k)
            return c
        return run

    r1, r2 = runner(k1), runner(k2)
    x0 = jax.device_put(x0)
    out = r1(x0)
    jax.block_until_ready(out)
    out = r2(x0)
    jax.block_until_ready(out)  # both compiled

    def timed(run, k):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(r1, k1)
    t2 = timed(r2, k2)
    return (t2 - t1) / (k2 - k1)


def main(n=1000):
    import jax
    import jax.numpy as jnp
    from cslam_tpu.backend import pgo
    from cslam_tpu.ops.block_tridiag import (bcr_factor, bcr_solve,
                                             chain_offdiag_from_edges)

    print("platform:", jax.devices()[0].platform, flush=True)
    fg = build(n)
    g = jax.device_put(fg.to_arrays())
    P = g.R.shape[0]
    E = g.e_i.shape[0]
    print(f"P={P} E={E}", flush=True)
    cfg = pgo.PGOConfig()

    R, t = g.R, g.t
    r, Ji, Jj = pgo.edge_residuals_jacobians(g, R, t)
    sw = jnp.sqrt(jnp.maximum(jnp.ones_like(g.edge_mask) * g.edge_mask,
                              0.0))
    Ji_s = Ji * sw[:, None, None]
    Jj_s = Jj * sw[:, None, None]
    lam = jnp.float32(1e-4)

    # Hii assembly (same as _solve_normal_eqs)
    Jst = jnp.concatenate([Ji_s, Jj_s], axis=0)
    idx = jnp.concatenate([g.e_i, g.e_j], axis=0)
    Hii = jnp.zeros((P, 6, 6), dtype=r.dtype)
    Hii = Hii.at[idx].add(jnp.einsum("eoi,eoj->eij", Jst, Jst))
    Hii = Hii + lam * jnp.eye(6, dtype=r.dtype)[None]
    O = chain_offdiag_from_edges(g.e_i, g.e_j, Ji_s, Jj_s, P)

    # 1. bcr_factor slope: vary Hii slightly per trip via the carry
    def factor_step(c):
        Hc = Hii + c[0, 0, 0] * 1e-9
        f = bcr_factor(Hc, O)
        # collapse the factor into a (P,6,6)-shaped carry perturbation
        return c + f["tail_inv"][0, 0] * 1e-20

    if "--skip-factor" not in sys.argv:
        dt = chain_time(factor_step, Hii)
        print(f"bcr_factor: {dt*1e3:.3f} ms", flush=True)

    # 2. bcr_solve slope (fixed factor, varying rhs)
    fac = jax.jit(bcr_factor)(Hii, O)
    # device_put would wrap the static ints (tail_n, s) into arrays and
    # break bcr_solve's reshape — put only the array leaves
    fac = {"levels": jax.device_put(fac["levels"]),
           "tail_inv": jax.device_put(fac["tail_inv"]),
           "tail_n": int(fac["tail_n"]), "s": int(fac["s"])}
    b0 = jnp.ones((P, 6), dtype=np.float32)

    def solve_step(b):
        return bcr_solve(fac, b) + 1e-9

    if "--skip-apply" not in sys.argv:
        dt = chain_time(solve_step, b0)
        print(f"bcr_solve(apply): {dt*1e3:.3f} ms", flush=True)

    # 3. hvp slope
    idxg, gather_x, jt_scatter = pgo.edge_transpose_operators(
        g.e_i, g.e_j, g.edge_mask, P, r.dtype)

    def hvp_step(x):
        part = jnp.einsum("eoi,ei->eo", Jst, gather_x(x))
        y = part[:E] + part[E:]
        y2 = jnp.concatenate([y, y], axis=0)
        out = jt_scatter(jnp.einsum("eoi,eo->ei", Jst, y2))
        return out + lam * x

    if "--skip-apply" not in sys.argv:
        dt = chain_time(hvp_step, b0)
        print(f"hvp: {dt*1e3:.3f} ms", flush=True)

    # 4. resjac slope (carry matches t: (P, 3))
    def resjac_step(c):
        r2, Ji2, Jj2 = pgo.edge_residuals_jacobians(g, R, t + c * 1e-9)
        fold = (jnp.sum(r2) + jnp.sum(Ji2) + jnp.sum(Jj2)) * 1e-20
        return c + fold

    dt = chain_time(resjac_step, jnp.asarray(t))
    print(f"resjac: {dt*1e3:.3f} ms", flush=True)

    # 4b. Hii + chain-offdiag assembly slope
    def assembly_step(c):
        Js = Jst + c[0, 0, 0] * 1e-12
        H2 = jnp.zeros((P, 6, 6), dtype=r.dtype)
        H2 = H2.at[idx].add(jnp.einsum("eoi,eoj->eij", Js, Js))
        H2 = H2 + lam * jnp.eye(6, dtype=r.dtype)[None]
        O2 = chain_offdiag_from_edges(g.e_i, g.e_j, Js[:E], Js[E:], P)
        return c + (jnp.sum(H2) + jnp.sum(O2)) * 1e-20

    dt = chain_time(assembly_step, Hii)
    print(f"Hii+O assembly: {dt*1e3:.3f} ms", flush=True)

    # 4c. graph_cost + retract slope
    def cost_step(c):
        Rc, tc = pgo._retract(R, t + c * 1e-12, jnp.zeros((P, 6)),
                              g.node_mask)
        cost = pgo.graph_cost(g, Rc, tc, jnp.ones_like(g.edge_mask))
        return c + cost * 1e-20

    dt = chain_time(cost_step, jnp.asarray(t))
    print(f"retract+graph_cost: {dt*1e3:.3f} ms", flush=True)

    # 5. full normal-eq solve slope + CG iteration census
    rp = jnp.zeros(6, dtype=np.float32)
    Jp = jnp.eye(6, dtype=np.float32) * g.prior_weight

    def nsolve_step(c):
        dx = pgo._solve_normal_eqs(g, Ji_s, Jj_s, r + c[:E, :1] * 1e-9,
                                   sw, lam, Jp, rp, cfg, x0=None)
        out = jnp.zeros((E, 6), dtype=np.float32) + dx[:1]
        return c + out * 1e-20

    dt = chain_time(nsolve_step, jnp.ones((E, 6), dtype=np.float32))
    print(f"normal_eq_solve(full PCG): {dt*1e3:.3f} ms", flush=True)

    # Simplest honest census: run solves with cg budgets 1..25 and
    # find where dx stops changing.
    dx_ref = pgo._solve_normal_eqs(g, Ji_s, Jj_s, r, sw, lam, Jp, rp,
                                   cfg, x0=None)
    dx_ref = np.asarray(dx_ref)
    for budget in (1, 2, 3, 4, 6, 8, 12, 25):
        dx_b = np.asarray(pgo._solve_normal_eqs(
            g, Ji_s, Jj_s, r, sw, lam, Jp, rp, cfg, x0=None,
            cg_iters=budget))
        rel = np.linalg.norm(dx_b - dx_ref) / max(
            np.linalg.norm(dx_ref), 1e-30)
        print(f"cg budget {budget:3d}: rel-to-converged {rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
