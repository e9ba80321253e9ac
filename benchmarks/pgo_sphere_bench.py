#!/usr/bin/env python
"""Large-scale PGO benchmark: synthetic sphere graph (the classic
"sphere2500" torture test shape — a spiral of poses over a sphere with
odometry + inter-ring loop closures, noisy measurements, initialized by
integrating the noisy odometry). Exercises chordal initialization + the
GNC-LM solver at the scale the reference's GTSAM back-end is benchmarked
on. Writes benchmarks/PGO_SPHERE.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_sphere_graph(n=2500, ring=50, meas_noise=0.02, seed=0):
    import jax.numpy as jnp
    from cslam_tpu.backend.factor_graph import (BetweenFactor, FactorGraph,
                                                diag_sqrt_info)
    from cslam_tpu.ops import se3

    rng = np.random.default_rng(seed)
    radius = 30.0
    # ground truth: spiral over the sphere (batched)
    ks = np.arange(n)
    theta = 2 * np.pi * (ks % ring) / ring
    phi = np.pi * (ks / n - 0.5)
    t_gt = (radius * np.stack([np.cos(phi) * np.cos(theta),
                               np.cos(phi) * np.sin(theta),
                               np.sin(phi)], axis=1)).astype(np.float32)
    w_gt = np.stack([np.zeros(n), phi * 0.3, theta + np.pi / 2],
                    axis=1).astype(np.float32)
    R_gt = np.asarray(se3.so3_exp(jnp.asarray(w_gt)))

    def rel_batch(ii, jj):
        R = np.einsum("nba,nbc->nac", R_gt[ii], R_gt[jj])
        t = np.einsum("nba,nb->na", R_gt[ii], t_gt[jj] - t_gt[ii])
        return R.astype(np.float32), t.astype(np.float32)

    def noisy_batch(R, t):
        xi = rng.standard_normal((len(t), 6)).astype(np.float32) * meas_noise
        dR, dt = se3.se3_exp(jnp.asarray(xi))
        return (np.einsum("nab,nbc->nac", R, np.asarray(dR)).astype(
            np.float32), (t + np.asarray(dt)).astype(np.float32))

    fg = FactorGraph()
    sq = diag_sqrt_info([meas_noise] * 3 + [meas_noise * 5] * 3)
    odo_R, odo_t = noisy_batch(*rel_batch(ks[:-1], ks[1:]))
    for k in range(n - 1):
        fg.add_between(BetweenFactor((0, k), (0, k + 1), odo_R[k], odo_t[k],
                                     sq))
    loop_to = np.asarray([k for k in range(ring, n) if k % 2 == 0])
    loop_from = loop_to - ring
    lc_R, lc_t = noisy_batch(*rel_batch(loop_from, loop_to))
    n_loops = len(loop_to)
    for idx in range(n_loops):
        fg.add_between(BetweenFactor((0, int(loop_from[idx])),
                                     (0, int(loop_to[idx])),
                                     lc_R[idx], lc_t[idx], sq, is_loop=True))
    odom = list(zip(odo_R, odo_t))
    # initial estimates: integrate the noisy odometry (drifts badly)
    R_est = [R_gt[0]]
    t_est = [t_gt[0]]
    for (R, t) in odom:
        R_est.append(R_est[-1] @ R)
        t_est.append(R_est[-2] @ t + t_est[-1])
    for k in range(n):
        fg.add_node((0, k), R_est[k], t_est[k])
    fg.set_prior((0, 0), R_gt[0], t_gt[0])
    return fg, R_gt, t_gt, np.stack(t_est), n_loops


def main(n=2500):
    import jax
    from cslam_tpu.backend import pgo
    from cslam_tpu.utils.evaluation import ate_rmse

    platform = jax.devices()[0].platform
    fg, R_gt, t_gt, t_odom, n_loops = make_sphere_graph(n)
    print(f"sphere graph: {n} poses, {fg.num_factors} factors "
          f"({n_loops} loops) on {platform}", file=sys.stderr)
    g = fg.to_arrays()
    ate_odom = ate_rmse(t_odom, t_gt)

    results = {"n_poses": n, "n_factors": fg.num_factors,
               "platform": platform,
               "ate_odometry": ate_odom}
    for name, cfg in (
            ("plain", pgo.PGOConfig(lm_max_iters=30, cg_max_iters=100,
                                    gnc_max_outer_iters=5)),
            ("chordal", pgo.PGOConfig(lm_max_iters=30, cg_max_iters=100,
                                      gnc_max_outer_iters=5,
                                      use_chordal_init=True))):
        def solve(gv, cfg=cfg):
            # chordal init as its own program (fused faults at 50k+
            # poses — see pgo.optimize)
            if cfg.use_chordal_init:
                from cslam_tpu.backend.initialization import \
                    chordal_initialize
                R0, t0 = chordal_initialize(gv)
                gv = gv._replace(R=R0, t=t0)
                cfg = cfg._replace(use_chordal_init=False)
            return pgo.gnc_optimize(gv, cfg)

        res = solve(g)  # compile+solve
        res.t.block_until_ready()
        t0 = time.perf_counter()
        res = solve(g._replace(t=g.t + 1e-4 * (hash(name) % 7)))
        res.t.block_until_ready()
        dt = time.perf_counter() - t0
        est = np.asarray(res.t)[:n]
        ate = ate_rmse(est, t_gt)
        results[f"{name}_ate"] = ate
        results[f"{name}_solve_s"] = dt
        results[f"{name}_final_cost"] = float(res.cost)
        print(f"{name}: ATE {ate:.3f} (odom {ate_odom:.3f}), "
              f"{dt:.2f} s/solve, cost {float(res.cost):.1f}",
              file=sys.stderr)
    os.makedirs("benchmarks", exist_ok=True)
    # merge per-size records so sphere2500 and sphere10000 coexist
    path = "benchmarks/PGO_SPHERE.json"
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        merged = prev if all(k.startswith("sphere") for k in prev) else {
            f"sphere{prev['n_poses']}": prev}
    merged[f"sphere{n}"] = results
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2500)
