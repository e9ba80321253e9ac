"""Quick TPU A/B of the PGO loop-structure levers (cg_unroll,
gnc_lm_iters) at 500/1000 poses. Distinct initial estimates per timed
call + D2H array sync per call (relay memoizes identical executions and
acks scalars early — CLAUDE.md gotchas)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(n, seed=2):
    import jax.numpy as jnp
    from cslam_tpu.backend.factor_graph import (BetweenFactor, FactorGraph,
                                                diag_sqrt_info)
    from cslam_tpu.ops import se3
    rng = np.random.default_rng(seed)
    fg = FactorGraph()
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    # ONE batched se3_exp + ONE fetch: a per-factor jnp call here costs
    # a relay roundtrip per factor on the tunnel backend (n=1000 built
    # for 30+ min under relay-latency spikes)
    xi = rng.standard_normal((n - 1, 6)).astype(np.float32) * 0.1
    dR_all, dt_all = (np.asarray(a) for a in se3.se3_exp(jnp.asarray(xi)))
    for k in range(n - 1):
        fg.add_between(BetweenFactor((0, k), (0, k + 1), dR_all[k],
                                     dt_all[k], sq))
    for _ in range(max(20, n // 20)):
        i, j = sorted(rng.integers(0, n, size=2).tolist())
        if j - i < 2:
            continue
        fg.add_between(BetweenFactor((0, i), (0, j),
                                     np.eye(3, dtype=np.float32),
                                     np.zeros(3, dtype=np.float32), sq,
                                     is_loop=True))
    fg.set_prior((0, 0))
    return fg


def time_cfg(fg, cfg, iters=5):
    import jax
    from cslam_tpu.backend import pgo
    g = fg.to_arrays()
    variants = [
        g._replace(t=g.t + 0.01 * jax.random.normal(
            jax.random.PRNGKey(s), g.t.shape))
        for s in range(iters + 1)
    ]
    res = pgo.gnc_optimize(variants[-1], cfg)
    np.asarray(res.t)
    t0 = time.perf_counter()
    costs = []
    for i in range(iters):
        res = pgo.gnc_optimize(variants[i], cfg)
        np.asarray(res.t)
        costs.append(float(res.cost))
    dt = (time.perf_counter() - t0) / iters
    return dt, np.mean(costs)


def main():
    import jax
    from cslam_tpu.backend import pgo
    print("platform:", jax.devices()[0].platform, flush=True)
    for n in (500, 1000):
        fg = build(n)
        for name, cfg in [
            ("lm5-cg50", pgo.PGOConfig(lm_max_iters=10, cg_max_iters=50,
                                       gnc_max_outer_iters=10,
                                       cg_unroll=4, gnc_lm_iters=5)),
            ("lm5-cg12", pgo.PGOConfig(lm_max_iters=10, cg_max_iters=12,
                                       gnc_max_outer_iters=10,
                                       cg_unroll=4, gnc_lm_iters=5)),
            ("lm3-cg50", pgo.PGOConfig(lm_max_iters=10, cg_max_iters=50,
                                       gnc_max_outer_iters=10,
                                       cg_unroll=4, gnc_lm_iters=3)),
            ("lm5-dense", pgo.PGOConfig(lm_max_iters=10, cg_max_iters=50,
                                        gnc_max_outer_iters=10,
                                        gnc_lm_iters=5,
                                        linear_solver="dense")),
        ]:
            dt, cost = time_cfg(fg, cfg)
            print(f"n={n} {name:14s} {dt*1e3:8.1f} ms/solve "
                  f"cost={cost:.4f}", flush=True)


if __name__ == "__main__":
    main()
