"""8-seed ATE / inlier-recall / outlier-rejection sweep over PGOConfig
candidates — the quality gate behind any solver-default change
(VERDICT round-3 item 2: perf changes must land "at unchanged 8-seed
ATE/recall").

Each seed builds a 500-pose trajectory with noisy odometry, true loop
closures, and gross outlier closures (mixed benign -> adversarial
ratios across seeds), then solves with each candidate config:

    python benchmarks/pgo_quality_sweep.py            # default set
    python benchmarks/pgo_quality_sweep.py --poses 200 --seeds 4

Reports per config: median/max ATE, mean inlier recall (w > 0.9 on
true closures), mean outlier rejection (w < 0.1 on injected ones),
and (CPU) wall time. Timing here is NOT the perf number — that comes
from bench.py / pgo_profile.py on the chip.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

if __name__ == "__main__" and os.environ.get("CSLAM_EVAL_PLATFORM",
                                              "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    REPO, ".jax_cache", os.environ.get("CSLAM_EVAL_PLATFORM", "cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from cslam_tpu.backend import pgo  # noqa: E402
from cslam_tpu.backend.factor_graph import (BetweenFactor,  # noqa: E402
                                            FactorGraph, diag_sqrt_info)
from cslam_tpu.ops import se3  # noqa: E402


def build_problem(seed, n=500, n_loops=50, outlier_frac=None,
                  odo_noise=0.01):
    """Same construction as bench.py::bench_pgo (random-walk ground
    truth, noisy odometry composed into the measurements, odometry-
    integrated initial estimates, mixed true/gross loop closures) with
    the outlier fraction ramping across seeds (benign 10% ->
    adversarial 60%; bench.py's fixed mix is 25%)."""
    rng = np.random.default_rng(seed)
    if outlier_frac is None:
        outlier_frac = 0.1 + 0.5 * (seed % 8) / 7.0  # 10% .. 60%
    fg = FactorGraph()
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    Rs = [np.eye(3, dtype=np.float32)]
    ts = [np.zeros(3, dtype=np.float32)]
    for _ in range(n - 1):
        xi = rng.standard_normal(6).astype(np.float32) * 0.1
        dR, dt_ = se3.se3_exp(jnp.asarray(xi))
        Rs.append(np.asarray(Rs[-1] @ np.asarray(dR)))
        ts.append(ts[-1] + Rs[-2] @ np.asarray(dt_))
    Rc, tc = Rs[0], ts[0]
    fg.add_node((0, 0), Rc, tc)
    for k in range(n - 1):
        Rm = Rs[k].T @ Rs[k + 1]
        tm = Rs[k].T @ (ts[k + 1] - ts[k])
        xi = rng.standard_normal(6).astype(np.float32) * odo_noise
        dR, dt_ = se3.se3_exp(jnp.asarray(xi))
        Rm, tm = (np.asarray(a) for a in se3.compose(
            jnp.asarray(Rm), jnp.asarray(tm), dR, dt_))
        tc = Rc @ tm + tc
        Rc = Rc @ Rm
        fg.add_node((0, k + 1), Rc, tc)
        fg.add_between(BetweenFactor((0, k), (0, k + 1), Rm, tm, sq))
    inlier_keys, outlier_keys = [], []
    n_out = int(round(n_loops * outlier_frac))
    li = 0
    while li < n_loops:
        i, j = sorted(rng.integers(0, n, size=2).tolist())
        if j - i < 5:
            continue
        if li < n_out:
            xi = rng.standard_normal(6).astype(np.float32)
            xi[3:] *= 5.0
            Rm, tm = (np.asarray(a) for a in se3.se3_exp(jnp.asarray(xi)))
            outlier_keys.append(len(fg.factors))
        else:
            Rm = (Rs[i].T @ Rs[j]).astype(np.float32)
            tm = (Rs[i].T @ (ts[j] - ts[i])).astype(np.float32)
            inlier_keys.append(len(fg.factors))
        fg.add_between(BetweenFactor((0, i), (0, j), Rm, tm, sq,
                                     is_loop=True))
        li += 1
    fg.set_prior((0, 0))
    return fg, np.stack(Rs), np.stack(ts), inlier_keys, outlier_keys


def evaluate(cfg, seeds, n):
    ates, recalls, rejections, walls = [], [], [], []
    for seed in seeds:
        fg, Rs, ts, inl, outl = build_problem(seed, n=n)
        t0 = time.perf_counter()
        res = pgo.optimize(fg, cfg)
        np.asarray(res.t)
        walls.append(time.perf_counter() - t0)
        err = [np.linalg.norm(fg.t[fg.key_to_index[(0, k)]] - ts[k]) ** 2
               for k in range(n)]
        ates.append(float(np.sqrt(np.mean(err))))
        w = np.asarray(res.weights)
        if inl:
            recalls.append(float(np.mean(w[inl] > 0.9)))
        if outl:
            rejections.append(float(np.mean(w[outl] < 0.1)))
    return {
        "ate_median": float(np.median(ates)),
        "ate_max": float(np.max(ates)),
        "recall_mean": float(np.mean(recalls)),
        "rejection_mean": float(np.mean(rejections)),
        "wall_mean_s": float(np.mean(walls[1:])) if len(walls) > 1
        else walls[0],
        "ates": [round(a, 4) for a in ates],
    }


DEFAULT_CANDIDATES = [
    ("r3-jacobi50", dict(preconditioner="jacobi", cg_max_iters=50)),
    ("tridiag25", dict()),
    ("tridiag25-polish12", dict(lm_max_iters=12)),
    ("tridiag25-gnclm1", dict(gnc_lm_iters=1)),
    ("tridiag25-init5", dict(lm_init_iters=5)),
    ("tridiag12", dict(cg_max_iters=12)),
    ("gnclm1-init5", dict(gnc_lm_iters=1, lm_init_iters=5)),
    ("gnclm1-init7", dict(gnc_lm_iters=1, lm_init_iters=7)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=500)
    ap.add_argument("--seeds", type=int, default=8)
    args = ap.parse_args()
    seeds = list(range(args.seeds))
    print(f"platform={jax.devices()[0].platform} poses={args.poses} "
          f"seeds={seeds}", flush=True)
    for name, kw in DEFAULT_CANDIDATES:
        cfg = pgo.PGOConfig(**kw)
        r = evaluate(cfg, seeds, args.poses)
        print(f"{name:16s} ate_med={r['ate_median']:.4f} "
              f"ate_max={r['ate_max']:.4f} recall={r['recall_mean']:.3f} "
              f"reject={r['rejection_mean']:.3f} "
              f"wall={r['wall_mean_s']*1e3:.0f} ms", flush=True)
        print(f"{'':16s} ates={r['ates']}", flush=True)


if __name__ == "__main__":
    main()
