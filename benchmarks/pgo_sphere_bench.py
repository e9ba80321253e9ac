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
    # ground truth: spiral over the sphere, orientation = local frame
    R_gt, t_gt = [], []
    radius = 30.0
    for k in range(n):
        frac = k / n
        theta = 2 * np.pi * (k % ring) / ring        # azimuth around ring
        phi = np.pi * (frac - 0.5)                   # latitude sweep
        pos = radius * np.array([np.cos(phi) * np.cos(theta),
                                 np.cos(phi) * np.sin(theta),
                                 np.sin(phi)])
        yaw = theta + np.pi / 2
        R = np.asarray(se3.so3_exp(jnp.asarray(
            [0.0, phi * 0.3, yaw], dtype=jnp.float32)))
        R_gt.append(R.astype(np.float32))
        t_gt.append(pos.astype(np.float32))
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)

    def rel(i, j):
        R = R_gt[i].T @ R_gt[j]
        t = R_gt[i].T @ (t_gt[j] - t_gt[i])
        return R, t

    def noisy(R, t):
        xi = rng.standard_normal(6).astype(np.float32) * meas_noise
        dR, dt = se3.se3_exp(jnp.asarray(xi))
        return (R @ np.asarray(dR)).astype(np.float32), \
            (t + np.asarray(dt)).astype(np.float32)

    fg = FactorGraph()
    sq = diag_sqrt_info([meas_noise] * 3 + [meas_noise * 5] * 3)
    odom = []
    for k in range(n - 1):
        R, t = noisy(*rel(k, k + 1))
        odom.append((R, t))
        fg.add_between(BetweenFactor((0, k), (0, k + 1), R, t, sq))
    n_loops = 0
    for k in range(ring, n):
        if k % 2 == 0:  # loop closure to the previous ring
            R, t = noisy(*rel(k - ring, k))
            fg.add_between(BetweenFactor((0, k - ring), (0, k), R, t, sq,
                                         is_loop=True))
            n_loops += 1
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
    from cslam_tpu.backend import pgo
    from cslam_tpu.utils.evaluation import ate_rmse

    fg, R_gt, t_gt, t_odom, n_loops = make_sphere_graph(n)
    print(f"sphere graph: {n} poses, {fg.num_factors} factors "
          f"({n_loops} loops)", file=sys.stderr)
    g = fg.to_arrays()
    ate_odom = ate_rmse(t_odom, t_gt)

    results = {"n_poses": n, "n_factors": fg.num_factors,
               "ate_odometry": ate_odom}
    for name, cfg in (
            ("plain", pgo.PGOConfig(lm_max_iters=30, cg_max_iters=100,
                                    gnc_max_outer_iters=5)),
            ("chordal", pgo.PGOConfig(lm_max_iters=30, cg_max_iters=100,
                                      gnc_max_outer_iters=5,
                                      use_chordal_init=True))):
        res = pgo.gnc_optimize(g, cfg)  # compile+solve
        res.t.block_until_ready()
        t0 = time.perf_counter()
        res = pgo.gnc_optimize(
            g._replace(t=g.t + 1e-4 * (hash(name) % 7)), cfg)
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
    with open("benchmarks/PGO_SPHERE.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2500)
