"""Chordal initialization: recovers a good basin from garbage initial
estimates where plain Gauss-Newton stalls."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.backend import pgo
from cslam_tpu.backend.initialization import chordal_initialize
from cslam_tpu.ops import se3

from test_pgo import ate_rmse, build_graph, make_trajectory, relative
from cslam_tpu.backend.factor_graph import BetweenFactor, FactorGraph, \
    diag_sqrt_info


def scrambled_graph(rng, n=30):
    """Exact measurements, completely random initial estimates."""
    Rs, ts = make_trajectory(rng, n, step_scale=0.5)
    fg = FactorGraph()
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    for k in range(n - 1):
        R, t = relative(Rs, ts, k, k + 1)
        fg.add_between(BetweenFactor((0, k), (0, k + 1), R, t, sq))
    for (i, j) in ((0, n // 2), (3, n - 3), (n // 4, 3 * n // 4)):
        R, t = relative(Rs, ts, i, j)
        fg.add_between(BetweenFactor((0, i), (0, j), R, t, sq,
                                     is_loop=True))
    fg.set_prior((0, 0), Rs[0], ts[0], weight=1e3)
    for k in range(n):
        if k == 0:
            fg.add_node((0, k), Rs[0], ts[0])
        else:
            # garbage init: random rotation, random position
            w = rng.standard_normal(3).astype(np.float32) * 2.0
            Rr = np.asarray(se3.so3_exp(jnp.asarray(w)))
            tr = rng.standard_normal(3).astype(np.float32) * 10.0
            fg.add_node((0, k), Rr, tr)
    return fg, Rs, ts


def test_chordal_recovers_rotations_and_translations():
    rng = np.random.default_rng(0)
    fg, Rs, ts = scrambled_graph(rng)
    g = fg.to_arrays()
    R0, t0 = chordal_initialize(g)
    # rotations close to ground truth (noise-free measurements)
    for k in range(len(ts)):
        idx = fg.key_to_index[(0, k)]
        err = se3.so3_log(jnp.asarray(Rs[k].T) @ R0[idx])
        assert float(jnp.linalg.norm(err)) < 0.1, f"kf {k}"
        np.testing.assert_allclose(np.asarray(t0[idx]), ts[k], atol=0.3)


def test_chordal_init_beats_plain_gn_from_garbage():
    rng = np.random.default_rng(1)
    cfg_plain = pgo.PGOConfig(lm_max_iters=25, cg_max_iters=80,
                              gnc_max_outer_iters=3)
    cfg_chordal = cfg_plain._replace(use_chordal_init=True)

    fg1, Rs, ts = scrambled_graph(rng)
    res_plain = pgo.gnc_optimize(fg1.to_arrays(), cfg_plain)
    fg1.update_estimates(res_plain.R, res_plain.t)
    ate_plain = ate_rmse(fg1, Rs, ts)

    fg2, _, _ = scrambled_graph(np.random.default_rng(1))
    res_chordal = pgo.gnc_optimize(fg2.to_arrays(), cfg_chordal)
    fg2.update_estimates(res_chordal.R, res_chordal.t)
    ate_chordal = ate_rmse(fg2, Rs, ts)

    assert ate_chordal < 0.05, f"chordal-initialized ATE {ate_chordal}"
    # plain GN from garbage should be clearly worse (stuck) — and never
    # better than the chordal path
    assert ate_chordal <= ate_plain + 1e-6


def test_chordal_preserves_good_init_quality():
    """On a well-initialized graph the chordal path must not hurt."""
    rng = np.random.default_rng(2)
    fg, Rs, ts = build_graph(rng, n=20, init_noise=0.1)
    cfg = pgo.PGOConfig(lm_max_iters=25, use_chordal_init=True)
    res = pgo.gnc_optimize(fg.to_arrays(), cfg)
    fg.update_estimates(res.R, res.t)
    assert ate_rmse(fg, Rs, ts) < 0.03
