"""Pose-graph optimization: Jacobian sanity, convergence on synthetic
graphs, GNC outlier rejection, gauge handling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cslam_tpu.backend.factor_graph import (BetweenFactor, FactorGraph,
                                            diag_sqrt_info)
from cslam_tpu.backend import pgo
from cslam_tpu.ops import se3


def make_trajectory(rng, n, step_scale=0.3):
    """Ground-truth poses from random odometry increments."""
    xi = rng.standard_normal((n - 1, 6)).astype(np.float32)
    xi[:, :3] *= 0.2 * step_scale
    xi[:, 3:] *= step_scale
    Rs = [np.eye(3, dtype=np.float32)]
    ts = [np.zeros(3, dtype=np.float32)]
    dR, dt = se3.se3_exp(jnp.asarray(xi))
    for k in range(n - 1):
        Rs.append(np.asarray(Rs[-1] @ dR[k]))
        ts.append(np.asarray(Rs[-2] @ np.asarray(dt[k]) + ts[-1]))
    return np.stack(Rs), np.stack(ts)


def relative(Rs, ts, i, j):
    Rij = Rs[i].T @ Rs[j]
    tij = Rs[i].T @ (ts[j] - ts[i])
    return Rij, tij


def build_graph(rng, n=20, loops=((0, 10), (5, 15)), noise=0.0,
                outliers=(), init_noise=0.1):
    Rs, ts = make_trajectory(rng, n)
    fg = FactorGraph()
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    for k in range(n - 1):
        R, t = relative(Rs, ts, k, k + 1)
        if noise > 0:
            dR, dt = se3.se3_exp(
                jnp.asarray(rng.standard_normal(6) * noise,
                            dtype=jnp.float32))
            R = np.asarray(R @ np.asarray(dR))
            t = t + np.asarray(dt)
        fg.add_between(
            BetweenFactor((0, k), (0, k + 1), R, t, sq, is_loop=False))
    for (i, j) in loops:
        R, t = relative(Rs, ts, i, j)
        fg.add_between(BetweenFactor((0, i), (0, j), R, t, sq, is_loop=True))
    for (i, j) in outliers:
        xi = rng.standard_normal(6).astype(np.float32) * 2.0
        R, t = se3.se3_exp(jnp.asarray(xi))
        fg.add_between(
            BetweenFactor((0, i), (0, j), np.asarray(R), np.asarray(t), sq,
                          is_loop=True))
    fg.set_prior((0, 0), Rs[0], ts[0], weight=1e3)
    # perturbed initial estimates (anchor stays exact)
    for k in range(n):
        if k == 0:
            fg.add_node((0, k), Rs[k], ts[k])
        else:
            dR, dt = se3.se3_exp(
                jnp.asarray(rng.standard_normal(6) * init_noise,
                            dtype=jnp.float32))
            fg.add_node((0, k), np.asarray(Rs[k] @ np.asarray(dR)),
                        ts[k] + np.asarray(dt))
    return fg, Rs, ts


def ate_rmse(fg, Rs, ts):
    err = []
    for k in range(len(ts)):
        idx = fg.key_to_index[(0, k)]
        err.append(np.linalg.norm(fg.t[idx] - ts[k]) ** 2)
    return float(np.sqrt(np.mean(err)))


def test_jacobians_finite_at_zero_residual():
    rng = np.random.default_rng(0)
    fg, _, _ = build_graph(rng, n=8, loops=((0, 5),), init_noise=0.0)
    g = fg.to_arrays()
    r = pgo.edge_residuals(g, g.R, g.t)
    Ji, Jj = pgo.edge_jacobians(g, g.R, g.t)
    assert np.all(np.isfinite(np.asarray(r)))
    assert np.all(np.isfinite(np.asarray(Ji)))
    assert np.all(np.isfinite(np.asarray(Jj)))
    # exact measurements + exact init => zero residuals
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-4)


def test_adjoint_jacobians_match_bruteforce_autodiff():
    # edge_residuals_jacobians differentiates only the 6-tangent map
    # xi -> Gamma Log(E0 exp(xi)) and derives Ji from Jj via the exact
    # adjoint identity; _edge_jac is the brute-force 12-tangent jacfwd
    # over both endpoints. They must agree to float32 precision on
    # every edge.
    rng = np.random.default_rng(7)
    fg, _, _ = build_graph(rng, n=10, loops=((0, 6), (2, 9)),
                           init_noise=0.3)
    g = fg.to_arrays()
    r, Ji, Jj = pgo.edge_residuals_jacobians(g, g.R, g.t)
    zeros = jnp.zeros((g.e_i.shape[0], 6), dtype=g.R.dtype)
    Ji_ref, Jj_ref = jax.vmap(pgo._edge_jac)(
        zeros, zeros, g.R[g.e_i], g.t[g.e_i], g.R[g.e_j], g.t[g.e_j],
        g.R_meas, g.t_meas, g.sqrt_info)
    r_ref = pgo.edge_residuals(g, g.R, g.t)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ji), np.asarray(Ji_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Jj), np.asarray(Jj_ref),
                               rtol=1e-3, atol=1e-4)


def test_jacobians_match_finite_differences():
    rng = np.random.default_rng(1)
    fg, _, _ = build_graph(rng, n=6, loops=((0, 4),), init_noise=0.2)
    g = fg.to_arrays()
    Ji, Jj = pgo.edge_jacobians(g, g.R, g.t)
    eps = 1e-3
    e = 2  # probe one edge
    for col in range(6):
        xi = np.zeros(6, dtype=np.float32)
        xi[col] = eps
        dR, dt = se3.se3_exp(jnp.asarray(xi))
        Rp = np.asarray(g.R)
        tp = np.asarray(g.t)
        i = int(g.e_i[e])
        Rp_i = Rp[i] @ np.asarray(dR)
        tp_i = Rp[i] @ np.asarray(dt) + tp[i]
        Rmod = Rp.copy()
        tmod = tp.copy()
        Rmod[i] = Rp_i
        tmod[i] = tp_i
        r0 = np.asarray(pgo.edge_residuals(g, g.R, g.t))[e]
        r1 = np.asarray(
            pgo.edge_residuals(g, jnp.asarray(Rmod), jnp.asarray(tmod)))[e]
        fd = (r1 - r0) / eps
        np.testing.assert_allclose(np.asarray(Ji)[e, :, col], fd, atol=2e-2)


def test_pgo_converges_noise_free():
    rng = np.random.default_rng(2)
    fg, Rs, ts = build_graph(rng, n=20, init_noise=0.1)
    before = ate_rmse(fg, Rs, ts)
    res = pgo.optimize(fg, pgo.PGOConfig(lm_max_iters=30, cg_max_iters=100))
    after = ate_rmse(fg, Rs, ts)
    assert float(res.cost) < float(res.initial_cost)
    assert after < before * 0.1
    assert after < 0.02


def test_pgo_gnc_rejects_outliers():
    rng = np.random.default_rng(3)
    fg, Rs, ts = build_graph(rng, n=25,
                             loops=((0, 12), (3, 20), (6, 18)),
                             outliers=((2, 22), (4, 16)),
                             init_noise=0.05)
    res = pgo.optimize(
        fg, pgo.PGOConfig(lm_max_iters=20, cg_max_iters=100,
                          gnc_max_outer_iters=20))
    after = ate_rmse(fg, Rs, ts)
    w = np.asarray(res.weights)
    g = fg.to_arrays()
    is_loop = np.asarray(g.is_loop)
    # outlier factors are the last two loop factors added
    loop_idx = np.nonzero(is_loop)[0]
    outlier_w = w[loop_idx[-2:]]
    inlier_w = w[loop_idx[:-2]]
    assert np.all(outlier_w < 0.1), f"outlier weights not rejected: {outlier_w}"
    assert np.all(inlier_w > 0.9), f"inlier weights suppressed: {inlier_w}"
    assert after < 0.05


def test_pgo_gauge_prior_anchors_first_pose():
    rng = np.random.default_rng(4)
    fg, Rs, ts = build_graph(rng, n=10, loops=((0, 8),), init_noise=0.1)
    pgo.optimize(fg, pgo.PGOConfig(lm_max_iters=20))
    idx = fg.key_to_index[(0, 0)]
    np.testing.assert_allclose(fg.t[idx], ts[0], atol=1e-2)
    np.testing.assert_allclose(fg.R[idx], Rs[0], atol=1e-2)


def test_pgo_multi_robot_keys():
    """Two robots with an inter-robot loop closure solve into one frame."""
    rng = np.random.default_rng(5)
    Rs0, ts0 = make_trajectory(rng, 8)
    Rs1, ts1 = make_trajectory(rng, 8)
    # place robot 1 relative to robot 0 via a known offset
    off_R, off_t = np.asarray(
        se3.se3_exp(jnp.asarray([0.1, 0, 0, 1.0, 0, 0],
                                dtype=jnp.float32))[0]), np.array(
                                    [1, 0, 0], dtype=np.float32)
    Rs1w = np.stack([off_R @ R for R in Rs1])
    ts1w = np.stack([off_R @ t + off_t for t in ts1])

    fg = FactorGraph()
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    for rid, (Rs, ts) in enumerate(((Rs0, ts0), (Rs1w, ts1w))):
        for k in range(7):
            R = Rs[k].T @ Rs[k + 1]
            t = Rs[k].T @ (ts[k + 1] - ts[k])
            fg.add_between(
                BetweenFactor((rid, k), (rid, k + 1), R, t, sq))
    # inter-robot loop closure between (0, 3) and (1, 3)
    R03, t03 = Rs0[3], ts0[3]
    R13, t13 = Rs1w[3], ts1w[3]
    Rrel = R03.T @ R13
    trel = R03.T @ (t13 - t03)
    fg.add_between(BetweenFactor((0, 3), (1, 3), Rrel, trel, sq,
                                 is_loop=True))
    fg.set_prior((0, 0), Rs0[0], ts0[0])
    # init: robot 0 exact, robot 1 wrong frame (identity offset)
    for k in range(8):
        fg.add_node((0, k), Rs0[k], ts0[k])
        fg.add_node((1, k), Rs1[k], ts1[k])
    pgo.optimize(fg, pgo.PGOConfig(lm_max_iters=40, cg_max_iters=150))
    # robot 1 poses recovered in robot 0's frame
    for k in range(8):
        idx = fg.key_to_index[(1, k)]
        np.testing.assert_allclose(fg.t[idx], ts1w[k], atol=0.05)


def test_pgo_batched_solve_matches_individual():
    """optimize_batch: one vmapped program over independent graphs ==
    per-graph solves (same buckets, same estimates written back)."""
    rng = np.random.default_rng(11)
    graphs, singles = [], []
    for s in range(3):
        fg, Rs, ts = build_graph(np.random.default_rng(20 + s),
                                 n=12 + 3 * s, loops=((0, 8), (3, 10)),
                                 init_noise=0.08)
        fg2, _, _ = build_graph(np.random.default_rng(20 + s),
                                n=12 + 3 * s, loops=((0, 8), (3, 10)),
                                init_noise=0.08)
        graphs.append((fg, Rs, ts))
        singles.append(fg2)
    cfg = pgo.PGOConfig(lm_max_iters=15, cg_max_iters=60,
                        gnc_max_outer_iters=4)
    results = pgo.optimize_batch([g for g, _, _ in graphs], cfg)
    assert len(results) == 3
    for (fg, Rs, ts), fg2, res in zip(graphs, singles, results):
        res_single = pgo.optimize(fg2, cfg)
        after = ate_rmse(fg, Rs, ts)
        assert after < 0.05, after
        # batched and single converge to the same optimum
        for k in range(len(ts)):
            i1 = fg.key_to_index[(0, k)]
            i2 = fg2.key_to_index[(0, k)]
            np.testing.assert_allclose(fg.t[i1], fg2.t[i2], atol=2e-3)
        assert np.all(np.isfinite(np.asarray(res.cost)))


def test_pcg_incidence_and_scatter_paths_agree(monkeypatch):
    """The one-hot incidence-matmul transpose in the PCG matvec is an
    exact reformulation of the scatter-add path; force each via the
    module threshold and check identical solves (force pcg: the graph is
    small enough that 'auto' would pick the dense Cholesky)."""
    rng = np.random.default_rng(11)
    fg, Rs, ts = build_graph(rng, n=40, noise=0.01,
                             loops=((0, 20), (10, 30)), init_noise=0.2)
    cfg = pgo.PGOConfig(linear_solver="pcg")
    g = fg.to_arrays()
    # the threshold is read at trace time and is NOT part of the jit
    # cache key — drop any executable from earlier tests or the first
    # solve would silently reuse whatever path was traced before
    pgo.gnc_optimize.clear_cache()
    monkeypatch.setattr(pgo, "_INCIDENCE_MAX_ENTRIES", 1 << 62)
    res_inc = pgo.gnc_optimize(g, cfg)
    pgo.gnc_optimize.clear_cache()
    monkeypatch.setattr(pgo, "_INCIDENCE_MAX_ENTRIES", 0)
    res_sct = pgo.gnc_optimize(g, cfg)
    pgo.gnc_optimize.clear_cache()
    np.testing.assert_allclose(np.asarray(res_inc.t), np.asarray(res_sct.t),
                               atol=1e-4)
    np.testing.assert_allclose(float(res_inc.cost), float(res_sct.cost),
                               rtol=1e-3)


def test_single_gross_outlier_does_not_reject_true_loop():
    """Convergence-criterion regression: one huge-residual outlier drags
    the unit-weight init far enough that the FIRST GNC reweighting can
    zero every loop weight; binary-only convergence then terminated the
    anneal with the true loop rejected. The stability term in `done`
    keeps annealing until weights are binary AND unchanged."""
    rng = np.random.default_rng(2)
    n = 60
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    fg = FactorGraph()
    Rk, tk = np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32)
    fg.add_node((0, 0), Rk, tk)
    xi = jnp.asarray([0, 0, 2 * np.pi / n, 1.0, 0, 0], dtype=jnp.float32)
    step, t_step = (np.asarray(a) for a in se3.se3_exp(xi))
    for k in range(n - 1):
        nR, nt = se3.se3_exp(jnp.asarray(
            rng.standard_normal(6) * 0.0005, dtype=jnp.float32))
        Rm = step @ np.asarray(nR)
        tm = t_step + np.asarray(nt)
        fg.add_between(BetweenFactor((0, k), (0, k + 1), Rm, tm, sq))
        tk = Rk @ tm + tk
        Rk = Rk @ Rm
        fg.add_node((0, k + 1), Rk, tk)
    fg.add_between(BetweenFactor((0, 0), (0, n - 1), step.T,
                                 -step.T @ t_step, sq, is_loop=True))
    fg.add_between(BetweenFactor((0, 5), (0, 40),
                                 np.eye(3, dtype=np.float32),
                                 np.asarray([9., 9., 9.], np.float32), sq,
                                 is_loop=True))
    fg.set_prior((0, 0))
    res = pgo.optimize(fg, pgo.PGOConfig())
    w = np.asarray(res.weights)[:fg.num_factors]
    assert w[-1] < 0.1, "gross outlier must be rejected"
    assert w[-2] > 0.9, "true loop must survive the anneal"
