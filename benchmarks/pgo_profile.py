"""Component-level TPU attribution of the GNC-LM solve at 500 poses.

Times (a) full gnc_optimize under knob sweeps, (b) a single LM descent
with fixed budgets, (c) slope-timed residual+Jacobian evaluation, so the
per-LM-step / per-CG-trip costs can be separated. Distinct inputs per
timed call + array D2H sync per call (relay memoization / scalar-ack
gotchas, CLAUDE.md)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks.pgo_speed_check import build  # noqa: E402


def timeit(fn, variants, iters=5):
    fn(variants[-1])
    t0 = time.perf_counter()
    for i in range(iters):
        fn(variants[i])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from cslam_tpu.backend import pgo
    print("platform:", jax.devices()[0].platform, flush=True)
    n = 500
    fg = build(n)
    g = fg.to_arrays()
    variants = [
        jax.device_put(g._replace(t=g.t + 0.01 * jax.random.normal(
            jax.random.PRNGKey(s), g.t.shape)))
        for s in range(7)
    ]

    # -- full solve, knob sweep ------------------------------------------
    for name, cfg in [
        ("default", pgo.PGOConfig()),
        ("unroll8", pgo.PGOConfig(cg_unroll=8)),
        ("unroll16", pgo.PGOConfig(cg_unroll=16)),
        ("cg25", pgo.PGOConfig(cg_max_iters=25)),
        ("outer10", pgo.PGOConfig(gnc_max_outer_iters=10)),
        ("lminit5-polish12", pgo.PGOConfig(lm_init_iters=5,
                                           lm_max_iters=12)),
    ]:
        def run(gv, cfg=cfg):
            res = pgo.gnc_optimize(gv, cfg)
            np.asarray(res.t)
            return res
        dt = timeit(run, variants)
        res = run(variants[0])
        print(f"full[{name:18s}] {dt*1e3:7.1f} ms  cost={float(res.cost):9.2f}"
              f" gnc_iters={int(res.gnc_iters)}", flush=True)

    # -- single LM descent, unit weights ---------------------------------
    cfg = pgo.PGOConfig()
    for k in (1, 5, 10, 25):
        @jax.jit
        def lm_k(gv, k=k):
            ones = jnp.ones_like(gv.edge_mask)
            R, t, cost, _ = pgo._lm_optimize(gv, gv.R, gv.t, ones, cfg,
                                             max_iters=k)
            return t, cost
        def run(gv, f=lm_k):
            t, _ = f(gv)
            np.asarray(t)
        dt = timeit(run, variants)
        print(f"lm[max_iters={k:2d}] {dt*1e3:7.1f} ms", flush=True)

    # -- residual+jacobian eval, slope-timed chain -----------------------
    def chain(k):
        @jax.jit
        def f(gv):
            def body(c, _):
                r, Ji, Jj = pgo.edge_residuals_jacobians(gv, gv.R,
                                                         gv.t + 1e-6 * c)
                return c + jnp.sum(r) * 1e-20, (jnp.sum(Ji) + jnp.sum(Jj))
            c, o = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return o
        return f
    f32, f96 = chain(32), chain(96)
    t32 = timeit(lambda gv: np.asarray(f32(gv)), variants)
    t96 = timeit(lambda gv: np.asarray(f96(gv)), variants)
    print(f"resjac slope: {(t96-t32)/64*1e6:.1f} us/eval", flush=True)

    profile_1000()


def _phase_programs(cfg):
    """Jitted (init-only, init+GNC, full) programs sharing gnc_optimize's
    exact structure, for subtractive phase attribution."""
    import functools

    import jax
    import jax.numpy as jnp
    from cslam_tpu.backend import pgo

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def init_only(g, cfg):
        ones = jnp.ones_like(g.edge_mask)
        lm_init = cfg.lm_init_iters if cfg.lm_init_iters > 0 \
            else cfg.lm_max_iters
        gnc_cg = cfg.gnc_cg_max_iters if cfg.gnc_cg_max_iters > 0 \
            else cfg.cg_max_iters
        R1, t1, _, _ = pgo._lm_optimize(g, g.R, g.t, ones, cfg,
                                        max_iters=lm_init, cg_iters=gnc_cg)
        return t1

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def init_gnc(g, cfg):
        ones = jnp.ones_like(g.edge_mask)
        robust_mask = g.is_loop if cfg.gnc_on_loops_only else g.edge_mask
        lm_init = cfg.lm_init_iters if cfg.lm_init_iters > 0 \
            else cfg.lm_max_iters
        gnc_cg = cfg.gnc_cg_max_iters if cfg.gnc_cg_max_iters > 0 \
            else cfg.cg_max_iters
        R1, t1, _, lam1 = pgo._lm_optimize(g, g.R, g.t, ones, cfg,
                                           max_iters=lm_init,
                                           cg_iters=gnc_cg)
        r = pgo.edge_residuals(g, R1, t1)
        u = 0.5 * jnp.sum(r * r, axis=-1) * g.edge_mask
        u_robust = u * robust_mask
        denom = 2.0 * jnp.max(u_robust) - cfg.barc_sq
        mu0 = cfg.barc_sq / jnp.maximum(denom, 1e-12)
        skip = denom <= 0.0
        gnc_lm = cfg.gnc_lm_iters if cfg.gnc_lm_iters > 0 \
            else cfg.lm_max_iters

        def weights_for(mu, u):
            w = pgo._gnc_weights_tls(u, mu, cfg.barc_sq)
            return jnp.where(robust_mask > 0, w, 1.0)

        def cond(state):
            it, done = state[0], state[6]
            return (it < cfg.gnc_max_outer_iters) & (~done)

        def body(state):
            it, R, t, mu, w, lam, _ = state
            R, t, _, lam = pgo._lm_optimize(g, R, t, w, cfg,
                                            max_iters=gnc_lm, lam0=lam,
                                            cg_iters=gnc_cg)
            r = pgo.edge_residuals(g, R, t)
            u = 0.5 * jnp.sum(r * r, axis=-1) * g.edge_mask
            w_new = weights_for(mu, u)
            frac = jnp.sum(w_new * (1.0 - w_new) * robust_mask)
            stable = jnp.max(jnp.abs(w_new - w) * robust_mask) < 1e-3
            return (it + 1, R, t, mu * cfg.mu_step, w_new, lam,
                    (frac < 1e-5) & stable)

        w0 = jnp.where(skip, ones, weights_for(mu0, u))
        init = (jnp.int32(0), R1, t1, jnp.maximum(mu0, 1e-6), w0, lam1,
                jnp.bool_(skip))
        it, R, t, _, w, _, _ = jax.lax.while_loop(cond, body, init)
        return t, it

    return init_only, init_gnc


def profile_1000(n=1000):
    import jax
    from cslam_tpu.backend import pgo
    fg = build(n)
    g = fg.to_arrays()
    variants = [
        jax.device_put(g._replace(t=g.t + 0.01 * jax.random.normal(
            jax.random.PRNGKey(s), g.t.shape)))
        for s in range(7)
    ]
    print(f"\n==== {n}-pose phase attribution / lever sweep "
          f"(P={g.R.shape[0]}, E={g.e_i.shape[0]}) ====", flush=True)

    cfg0 = pgo.PGOConfig()
    init_only, init_gnc = _phase_programs(cfg0)

    t_init = timeit(lambda gv: np.asarray(init_only(gv, cfg0)), variants)
    t_gnc = timeit(lambda gv: np.asarray(init_gnc(gv, cfg0)[0]), variants)
    def run_full(gv):
        res = pgo.gnc_optimize(gv, cfg0)
        np.asarray(res.t)
        return res
    t_full = timeit(run_full, variants)
    res = run_full(variants[0])
    _, gnc_it = init_gnc(variants[0], cfg0)
    print(f"phase: init LM {t_init*1e3:7.1f} ms | +GNC rounds "
          f"{(t_gnc-t_init)*1e3:7.1f} ms ({int(gnc_it)} rounds) | "
          f"+polish {(t_full-t_gnc)*1e3:7.1f} ms | full {t_full*1e3:7.1f} ms",
          flush=True)

    sweeps = [
        ("default", pgo.PGOConfig()),
        ("unroll8", pgo.PGOConfig(cg_unroll=8)),
        ("unroll16", pgo.PGOConfig(cg_unroll=16)),
        ("mu2.0", pgo.PGOConfig(mu_step=2.0)),
        ("mu2.8", pgo.PGOConfig(mu_step=2.8)),
        ("gnc_lm1", pgo.PGOConfig(gnc_lm_iters=1)),
        ("lm_init5", pgo.PGOConfig(lm_init_iters=5)),
        ("polish12", pgo.PGOConfig(lm_max_iters=12)),
        ("cg_tol1e-5", pgo.PGOConfig(cg_tol=1e-5)),
        ("dense@1024", pgo.PGOConfig(linear_solver="dense")),
    ]
    for name, cfg in sweeps:
        def run(gv, cfg=cfg):
            res = pgo.gnc_optimize(gv, cfg)
            np.asarray(res.t)
            return res
        try:
            dt = timeit(run, variants)
            res = run(variants[0])
            print(f"full[{name:12s}] {dt*1e3:7.1f} ms  "
                  f"cost={float(res.cost):9.2f} "
                  f"gnc_iters={int(res.gnc_iters)}", flush=True)
        except Exception as exc:
            print(f"full[{name:12s}] FAILED {type(exc).__name__}: "
                  f"{str(exc)[:80]}", flush=True)

    # incidence-matmul threshold: at P=1024/E=2048 the default 4M-entry
    # cap just excludes the matmul path — force it on to measure
    old = pgo._INCIDENCE_MAX_ENTRIES
    try:
        pgo._INCIDENCE_MAX_ENTRIES = 16 * 1024 * 1024
        jax.clear_caches()
        def run(gv):
            res = pgo.gnc_optimize(gv, cfg0)
            np.asarray(res.t)
            return res
        dt = timeit(run, variants)
        res = run(variants[0])
        print(f"full[incidence16M] {dt*1e3:7.1f} ms  "
              f"cost={float(res.cost):9.2f} "
              f"gnc_iters={int(res.gnc_iters)}", flush=True)
    finally:
        pgo._INCIDENCE_MAX_ENTRIES = old
        jax.clear_caches()


if __name__ == "__main__":
    main()
