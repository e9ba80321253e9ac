"""Per-factor covariance plumbing end to end.

The reference propagates registration covariance into loop-closure
messages (rgbd_handler.cpp:623, :703) and builds per-factor noise models
from message covariance (decentralized_pgo.cpp:254-261 odometry,
:307-312 intra, :343-348 inter). These tests pin that no ingestion point
silently replaces a carried covariance with the default, that the wire
format round-trips it, and that heteroscedastic noise actually changes
the optimum.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.backend import pgo
from cslam_tpu.backend.decentralized_pgo import (DEFAULT_NOISE_STD,
                                                 DecentralizedPGO,
                                                 _sqrt_info_from_msg)
from cslam_tpu.backend.factor_graph import (BetweenFactor, FactorGraph,
                                            diag_sqrt_info, noise_std_of)
from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.ops import registration
from cslam_tpu.ops.matching2d import ransac_rigid3d


def test_sqrt_info_from_msg_fallback_and_use():
    default = diag_sqrt_info(DEFAULT_NOISE_STD)
    np.testing.assert_allclose(_sqrt_info_from_msg(np.zeros(6)), default)
    np.testing.assert_allclose(_sqrt_info_from_msg(None), default)
    cov = np.array([0.01, 0.01, 0.04, 0.25, 0.25, 1.0], np.float32)
    si = _sqrt_info_from_msg(cov)
    np.testing.assert_allclose(np.diag(si), 1.0 / np.sqrt(cov), rtol=1e-5)


def test_noise_std_of_inverts_diag_sqrt_info():
    std = np.array([0.02, 0.03, 0.04, 0.1, 0.2, 0.3], np.float32)
    np.testing.assert_allclose(noise_std_of(diag_sqrt_info(std)), std,
                               rtol=1e-5)


def test_lc_message_roundtrips_covariance():
    cov = np.arange(1, 7, dtype=np.float32) * 0.01
    m = msgs.InterRobotLoopClosure(
        robot0_id=0, robot0_keyframe_id=3, robot1_id=1,
        robot1_keyframe_id=5, success=True,
        pose=(np.eye(3, dtype=np.float32), np.ones(3, np.float32)),
        covariance_diag=cov)
    back = msgs.InterRobotLoopClosure.from_bytes(m.to_bytes())
    np.testing.assert_allclose(back.covariance_diag, cov)
    m2 = msgs.IntraRobotLoopClosure(
        keyframe0_id=1, keyframe1_id=2, success=True,
        pose=(np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
        covariance_diag=cov)
    back2 = msgs.IntraRobotLoopClosure.from_bytes(m2.to_bytes())
    np.testing.assert_allclose(back2.covariance_diag, cov)
    m3 = msgs.KeyframeOdom(id=4, covariance_diag=cov)
    back3 = msgs.KeyframeOdom.from_bytes(m3.to_bytes())
    np.testing.assert_allclose(back3.covariance_diag, cov)


def _make_node(robot_id=0, n_robots=2):
    router = InProcessRouter()
    bus = InProcessBus(router, robot_id)
    params = {
        "robot_id": robot_id,
        "max_nb_robots": n_robots,
        "backend.max_waiting_time_sec": 60.0,
    }
    return DecentralizedPGO(params, bus, ManualClock())


def test_ingestion_uses_message_covariance():
    node = _make_node()
    cov = np.array([0.0001, 0.0001, 0.0001, 0.01, 0.01, 0.01], np.float32)
    node.odometry_callback(msgs.KeyframeOdom(id=0))
    node.odometry_callback(msgs.KeyframeOdom(id=1, covariance_diag=cov))
    odo = node.local_factors[-1]
    np.testing.assert_allclose(np.diag(odo.sqrt_info), 1.0 / np.sqrt(cov),
                               rtol=1e-5)
    # intra LC
    node.intra_robot_loop_closure_callback(msgs.IntraRobotLoopClosure(
        keyframe0_id=0, keyframe1_id=1, success=True,
        covariance_diag=2 * cov))
    lc = node.local_factors[-1]
    np.testing.assert_allclose(np.diag(lc.sqrt_info),
                               1.0 / np.sqrt(2 * cov), rtol=1e-5)
    # inter LC
    node.inter_robot_loop_closure_callback(msgs.InterRobotLoopClosure(
        robot0_id=0, robot0_keyframe_id=1, robot1_id=1,
        robot1_keyframe_id=0, success=True, covariance_diag=3 * cov))
    inter = node.inter_robot_loop_closures[(0, 1)][-1]
    np.testing.assert_allclose(np.diag(inter.sqrt_info),
                               1.0 / np.sqrt(3 * cov), rtol=1e-5)
    # no covariance -> default model, not garbage
    node.odometry_callback(msgs.KeyframeOdom(id=2))
    np.testing.assert_allclose(
        np.diag(node.local_factors[-1].sqrt_info),
        1.0 / DEFAULT_NOISE_STD, rtol=1e-5)


def test_pose_graph_msg_carries_per_factor_noise():
    """fill_pose_graph_msg must not flatten per-factor sqrt_info back to
    the default (reference PoseGraphEdge.noise_std is per-edge,
    gtsam_utils.cpp values_msg round-trip)."""
    node = _make_node()
    cov = np.array([0.0004, 0.0004, 0.0004, 0.04, 0.04, 0.04], np.float32)
    node.odometry_callback(msgs.KeyframeOdom(id=0))
    node.odometry_callback(msgs.KeyframeOdom(id=1, covariance_diag=cov))
    pg = node.fill_pose_graph_msg([node.robot_id])
    assert len(pg.edges) == 1
    np.testing.assert_allclose(pg.edges[0].noise_std, np.sqrt(cov),
                               rtol=1e-4)
    # and a network round-trip preserves it
    back = msgs.PoseGraph.from_bytes(pg.to_bytes())
    np.testing.assert_allclose(back.edges[0].noise_std, np.sqrt(cov),
                               rtol=1e-4)


def test_heteroscedastic_noise_changes_optimum():
    """Two conflicting loop closures with different covariances: the
    optimum must move toward the confident one. With a constant noise
    model this test fails (symmetric result)."""
    def solve(std_a, std_b):
        fg = FactorGraph()
        eye = np.eye(3, dtype=np.float32)
        odo_si = diag_sqrt_info([0.05] * 6)
        # chain 0-1-2 with identity odometry
        fg.add_between(BetweenFactor((0, 0), (0, 1), eye,
                                     np.zeros(3, np.float32), odo_si))
        fg.add_between(BetweenFactor((0, 1), (0, 2), eye,
                                     np.zeros(3, np.float32), odo_si))
        # two conflicting direct 0->2 measurements
        fg.add_between(BetweenFactor((0, 0), (0, 2), eye,
                                     np.array([1.0, 0, 0], np.float32),
                                     diag_sqrt_info([0.05] * 3 +
                                                    [std_a] * 3),
                                     is_loop=True))
        fg.add_between(BetweenFactor((0, 0), (0, 2), eye,
                                     np.array([-1.0, 0, 0], np.float32),
                                     diag_sqrt_info([0.05] * 3 +
                                                    [std_b] * 3),
                                     is_loop=True))
        fg.set_prior((0, 0))
        cfg = pgo.PGOConfig(lm_max_iters=20, gnc_max_outer_iters=1,
                            barc_sq=1e9)  # plain LM, no outlier gating
        res = pgo.gnc_optimize(fg.to_arrays(), cfg)
        return float(np.asarray(res.t)[2, 0])  # x of pose 2

    x_balanced = solve(0.1, 0.1)
    x_trust_a = solve(0.01, 1.0)
    x_trust_b = solve(1.0, 0.01)
    assert abs(x_balanced) < 0.15
    assert x_trust_a > 0.5          # pulled toward +1 measurement
    assert x_trust_b < -0.5         # pulled toward -1 measurement


def test_registration_covariance_scales_with_noise():
    rng = np.random.default_rng(0)
    src = rng.uniform(-2, 2, (128, 3)).astype(np.float32)
    valid = np.ones(128, np.float32)

    def cov_at(noise):
        dst = src + rng.normal(0, noise, src.shape).astype(np.float32)
        res = ransac_rigid3d(jnp.asarray(src), jnp.asarray(dst),
                             jnp.asarray(valid),
                             inlier_threshold=0.5)
        assert bool(res.success)
        return np.asarray(res.cov_diag)

    c_low = cov_at(0.01)
    c_high = cov_at(0.1)
    assert np.all(c_low > 0) and np.all(np.isfinite(c_low))
    # noisier correspondences -> strictly larger uncertainty
    assert np.all(c_high > c_low)


def test_gnc_icp_returns_covariance():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    mask = np.ones(256, np.float32)
    res = registration.gnc_icp(jnp.asarray(pts), jnp.asarray(mask),
                               jnp.asarray(pts + 0.005), jnp.asarray(mask),
                               jnp.eye(3), jnp.zeros(3))
    cov = np.asarray(res.cov_diag)
    assert cov.shape == (6,)
    assert np.all(np.isfinite(cov)) and np.all(cov >= 0)
