"""g2o round-trip, quaternion conversions, ATE alignment."""

import numpy as np
import jax.numpy as jnp

from cslam_tpu.backend import g2o, pgo
from cslam_tpu.backend.factor_graph import BetweenFactor, FactorGraph, \
    diag_sqrt_info
from cslam_tpu.ops import se3
from cslam_tpu.utils.evaluation import ate_rmse, umeyama_alignment


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 3)) * 1.5, dtype=jnp.float32)
    R = se3.so3_exp(w)
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # identity and near-pi cases
    for wv in ([0, 0, 0], [np.pi - 1e-4, 0, 0], [0, np.pi - 1e-4, 0]):
        R = se3.so3_exp(jnp.asarray([wv], dtype=jnp.float32))
        q = se3.rot_to_quat(R)
        np.testing.assert_allclose(np.asarray(se3.quat_to_rot(q)),
                                   np.asarray(R), atol=1e-5)


def test_g2o_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    fg = FactorGraph()
    sq = diag_sqrt_info([0.02] * 3 + [0.1] * 3)
    R_prev, t_prev = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    fg.add_node((0, 0), R_prev, t_prev)
    for k in range(9):
        xi = rng.standard_normal(6).astype(np.float32) * 0.3
        dR, dt = se3.se3_exp(jnp.asarray(xi))
        fg.add_between(
            BetweenFactor((0, k), (0, k + 1), np.asarray(dR), np.asarray(dt),
                          sq))
        R_new = R_prev @ np.asarray(dR)
        t_new = R_prev @ np.asarray(dt) + t_prev
        fg.add_node((0, k + 1), R_new, t_new)
        R_prev, t_prev = R_new, t_new
    fg.add_between(
        BetweenFactor((0, 0), (0, 5), np.eye(3, dtype=np.float32),
                      np.ones(3, dtype=np.float32), sq, is_loop=True))

    path = tmp_path / "graph.g2o"
    g2o.write_g2o(fg, str(path))
    fg2 = g2o.read_g2o(str(path))

    assert fg2.num_nodes == fg.num_nodes
    assert fg2.num_factors == fg.num_factors
    for key, idx in fg.key_to_index.items():
        idx2 = fg2.key_to_index[key]
        np.testing.assert_allclose(fg2.t[idx2], fg.t[idx], atol=1e-5)
        np.testing.assert_allclose(fg2.R[idx2], fg.R[idx], atol=1e-5)
    # loop flag from non-consecutive ids
    loops = [f for f in fg2.factors if f.is_loop]
    assert len(loops) == 1
    # sqrt-info round-trips as information matrix
    info_a = fg.factors[0].sqrt_info.T @ fg.factors[0].sqrt_info
    info_b = fg2.factors[0].sqrt_info.T @ fg2.factors[0].sqrt_info
    np.testing.assert_allclose(info_b, info_a, rtol=1e-4, atol=1e-3)


def test_g2o_optimize_smoke(tmp_path):
    """Read-optimize-write pipeline runs end to end."""
    rng = np.random.default_rng(2)
    fg = FactorGraph()
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    n = 12
    # circle trajectory with perfect odometry, perturbed vertices
    Rs = [np.asarray(se3.so3_exp(jnp.asarray([0, 0, 2 * np.pi * k / n],
                                             dtype=jnp.float32)))
          for k in range(n)]
    ts = [np.array([np.cos(2 * np.pi * k / n), np.sin(2 * np.pi * k / n), 0],
                   dtype=np.float32) for k in range(n)]
    for k in range(n - 1):
        Rrel = Rs[k].T @ Rs[k + 1]
        trel = Rs[k].T @ (ts[k + 1] - ts[k])
        fg.add_between(BetweenFactor((0, k), (0, k + 1), Rrel, trel, sq))
    Rrel = Rs[n - 1].T @ Rs[0]
    trel = Rs[n - 1].T @ (ts[0] - ts[n - 1])
    fg.add_between(BetweenFactor((0, n - 1), (0, 0), Rrel, trel, sq,
                                 is_loop=True))
    for k in range(n):
        noise = rng.standard_normal(3).astype(np.float32) * 0.1
        fg.add_node((0, k), Rs[k], ts[k] + (noise if k else 0))
    fg.set_prior((0, 0), Rs[0], ts[0])
    path = tmp_path / "circle.g2o"
    g2o.write_g2o(fg, str(path))

    fg2 = g2o.read_g2o(str(path))
    res = pgo.optimize(fg2, pgo.PGOConfig(lm_max_iters=25))
    assert float(res.cost) < float(res.initial_cost)
    est = np.stack([fg2.t[fg2.key_to_index[(0, k)]] for k in range(n)])
    gt = np.stack(ts)
    assert ate_rmse(est, gt) < 0.03


def test_ate_alignment():
    rng = np.random.default_rng(3)
    gt = rng.standard_normal((50, 3))
    R = np.asarray(se3.so3_exp(jnp.asarray([0.3, -0.2, 1.0],
                                           dtype=jnp.float32)))
    t = np.array([5.0, -2.0, 1.0])
    est = (R @ gt.T).T + t  # rigidly displaced copy
    assert ate_rmse(est, gt, align=True) < 1e-6
    assert ate_rmse(est, gt, align=False) > 1.0
    s, R2, t2 = umeyama_alignment(est, gt)
    np.testing.assert_allclose(s, 1.0)


def test_solve_g2o_cli(tmp_path, capsys):
    """End-to-end CLI: write a noisy graph, solve it, parse the JSON."""
    import json
    from cslam_tpu.tools import solve_g2o
    rng = np.random.default_rng(5)
    fg = FactorGraph()
    sq = diag_sqrt_info([0.02] * 3 + [0.1] * 3)
    Rk, tk = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    fg.add_node((0, 0), Rk, tk)
    for k in range(19):
        xi = rng.standard_normal(6).astype(np.float32) * 0.2
        dR, dt = (np.asarray(a) for a in se3.se3_exp(jnp.asarray(xi)))
        fg.add_between(BetweenFactor((0, k), (0, k + 1), dR, dt, sq))
        tk = Rk @ dt + tk
        Rk = Rk @ dR
        # perturbed stored estimate so the solver has work to do
        nR, nt = (np.asarray(a) for a in se3.se3_exp(jnp.asarray(
            rng.standard_normal(6).astype(np.float32) * 0.05)))
        fg.add_node((0, k + 1), Rk @ nR, tk + nt)
    fg.set_prior((0, 0))
    path = tmp_path / "in.g2o"
    g2o.write_g2o(fg, str(path))
    out = tmp_path / "out.g2o"
    rc = solve_g2o.main([str(path), "-o", str(out), "--cpu"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["poses"] == fg.num_nodes
    assert summary["final_cost"] < summary["initial_cost"]
    assert out.exists()
    reread = g2o.read_g2o(str(out))
    assert reread.num_nodes == fg.num_nodes
