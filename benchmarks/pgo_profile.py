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


if __name__ == "__main__":
    main()
