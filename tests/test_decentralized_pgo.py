"""Decentralized PGO state machine: multi-robot in-process swarm —
election, pose-graph collection, aggregation, optimization, estimate
sharing — without any cluster (reference test strategy, SURVEY §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.backend import pgo
from cslam_tpu.backend.decentralized_pgo import DecentralizedPGO, \
    OptimizerState
from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.ops import se3


def make_params(robot_id, max_nb_robots):
    return {
        "robot_id": robot_id,
        "max_nb_robots": max_nb_robots,
        "backend.max_waiting_time_sec": 60.0,
        "neighbor_management.enable_neighbor_monitoring": False,
        "neighbor_management.init_delay_sec": 0.0,
        "neighbor_management.max_heartbeat_delay_sec": 5.0,
        "evaluation.enable_simulated_rendezvous": False,
        "evaluation.rendezvous_schedule_file": "",
    }


def trajectory(rng, n, offset):
    """Ground-truth world poses for one robot."""
    Rs = [np.eye(3, dtype=np.float32)]
    ts = [np.asarray(offset, dtype=np.float32)]
    for _ in range(n - 1):
        xi = rng.standard_normal(6).astype(np.float32)
        xi[:3] *= 0.05
        xi[3:] *= 0.4
        dR, dt = se3.se3_exp(jnp.asarray(xi))
        Rs.append(Rs[-1] @ np.asarray(dR))
        ts.append(Rs[-2] @ np.asarray(dt) + ts[-1])
    return np.stack(Rs), np.stack(ts)


class Swarm:
    """N robots sharing one router; ticks drive the protocol."""

    def __init__(self, n_robots, rng, n_poses=8):
        from cslam_tpu.comm.neighbors_manager import NeighborManager
        self.router = InProcessRouter()
        self.clock = ManualClock()
        self.n_robots = n_robots
        self.backends = {}
        self.managers = {}
        self.buses = {}
        self.gt = {}
        cfg = pgo.PGOConfig(lm_max_iters=15, cg_max_iters=60,
                            gnc_max_outer_iters=5)
        for rid in range(n_robots):
            bus = InProcessBus(self.router, rid)
            self.buses[rid] = bus
            params = make_params(rid, n_robots)
            self.managers[rid] = NeighborManager(bus, self.clock, params)
            self.backends[rid] = DecentralizedPGO(params, bus, self.clock,
                                                 pgo_config=cfg)
            self.gt[rid] = trajectory(rng, n_poses, [5.0 * rid, 0, 0])

    def feed_odometry(self, noise_rng=None):
        for rid in range(self.n_robots):
            Rs, ts = self.gt[rid]
            for k in range(len(ts)):
                R, t = Rs[k], ts[k].copy()
                if noise_rng is not None and k > 0:
                    t = t + noise_rng.standard_normal(3).astype(
                        np.float32) * 0.05
                self.buses[rid].publish("cslam/keyframe_odom",
                                        msgs.KeyframeOdom(id=k, pose=(R, t)))
        self.router.spin_until_idle()

    def add_inter_loop_closure(self, r0, k0, r1, k1):
        Rs0, ts0 = self.gt[r0]
        Rs1, ts1 = self.gt[r1]
        Rrel = Rs0[k0].T @ Rs1[k1]
        trel = Rs0[k0].T @ (ts1[k1] - ts0[k0])
        self.router.publish(
            "/cslam/inter_robot_loop_closure",
            msgs.InterRobotLoopClosure(
                robot0_id=r0, robot0_keyframe_id=k0, robot1_id=r1,
                robot1_keyframe_id=k1, success=True, pose=(Rrel, trel)))
        self.router.spin_until_idle()

    def tick(self, rounds=30, min_total=1):
        """Drive the protocol until `min_total` optimizations completed."""
        import time
        for _ in range(rounds):
            for be in self.backends.values():
                be.optimization_callback()
            self.router.spin_until_idle()
            for be in self.backends.values():
                be.optimization_loop_callback()
            self.router.spin_until_idle()
            # let the async optimize finish
            busy = [be for be in self.backends.values()
                    if be.optimizer_state == OptimizerState.OPTIMIZATION]
            for be in busy:
                if be._optimization_future is not None:
                    be._optimization_future.result(timeout=120)
                be.check_result_and_finish_optimization()
            self.router.spin_until_idle()
            if any(be.optimization_count >= min_total
                   for be in self.backends.values()):
                for be in self.backends.values():
                    be.optimization_loop_callback()
                self.router.spin_until_idle()
                return
        raise AssertionError("no optimization completed")


def test_single_robot_optimization():
    rng = np.random.default_rng(0)
    swarm = Swarm(1, rng)
    swarm.feed_odometry()
    swarm.tick()
    be = swarm.backends[0]
    assert be.optimization_count == 1
    assert len(be.current_pose_estimates) == 8


def test_two_robot_election_and_optimization():
    rng = np.random.default_rng(1)
    swarm = Swarm(2, rng)
    swarm.feed_odometry()
    swarm.add_inter_loop_closure(0, 3, 1, 3)
    swarm.tick()
    # robot 0 (lowest origin,id) is the optimizer
    assert swarm.backends[0].optimization_count == 1
    assert swarm.backends[1].optimization_count == 0
    # both robots received estimates for their own poses
    for rid in range(2):
        own = [k for k in swarm.backends[rid].current_pose_estimates
               if k[0] == rid]
        assert len(own) == 8, f"robot {rid} missing estimates"
    # optimizer's aggregated estimates place robot 1 consistently with gt
    est = swarm.backends[1].current_pose_estimates
    Rs1, ts1 = swarm.gt[1]
    for k in range(8):
        np.testing.assert_allclose(est[(1, k)][1], ts1[k], atol=0.15)


def test_three_robot_chain_aggregation():
    """Robot 1 connects 0 and 2; the full graph aggregates on robot 0."""
    rng = np.random.default_rng(2)
    swarm = Swarm(3, rng)
    swarm.feed_odometry()
    swarm.add_inter_loop_closure(0, 2, 1, 2)
    swarm.add_inter_loop_closure(1, 5, 2, 5)
    swarm.tick()
    be0 = swarm.backends[0]
    assert be0.optimization_count == 1
    # all three robots' estimates propagated
    for rid in range(3):
        own = [k for k in swarm.backends[rid].current_pose_estimates
               if k[0] == rid]
        assert len(own) == 8


def test_optimization_improves_noisy_odometry():
    rng = np.random.default_rng(3)
    swarm = Swarm(2, rng)
    noise_rng = np.random.default_rng(4)
    swarm.feed_odometry(noise_rng=noise_rng)
    # several loop closures tie the trajectories together
    for k in (1, 3, 5, 7):
        swarm.add_inter_loop_closure(0, k, 1, k)
    swarm.tick()
    # each robot adopts its own shared estimates (reference :683-710)
    est = swarm.backends[1].current_pose_estimates
    Rs1, ts1 = swarm.gt[1]
    errs = [np.linalg.norm(est[(1, k)][1] - ts1[k]) for k in range(8)]
    assert np.mean(errs) < 0.2


def test_waiting_timeout_returns_to_idle():
    rng = np.random.default_rng(5)
    swarm = Swarm(2, rng)
    swarm.feed_odometry()
    be = swarm.backends[0]
    be.max_waiting_time_sec = 1.0
    # put it in a waiting state with no answers (drop all traffic)
    be.optimizer_state = OptimizerState.POSEGRAPH_COLLECTION
    be.current_neighbors = msgs.RobotIdsAndOrigin(ids=[1], origins=[1])
    be.start_waiting()
    assert be.optimizer_state == \
        OptimizerState.WAITING_FOR_NEIGHBORS_POSEGRAPHS
    swarm.clock.advance(2.0)
    be.optimization_loop_callback()
    assert be.optimizer_state == OptimizerState.IDLE


def test_warm_start_mechanics():
    """_apply_warm_start: previously-solved keys take their optimized
    values exactly; new keys chain the odometry delta off the nearest
    preceding warm pose of the same robot."""
    from cslam_tpu.ops import se3 as _se3

    rng = np.random.default_rng(7)
    swarm = Swarm(1, rng, n_poses=6)
    swarm.feed_odometry()
    be = swarm.backends[0]
    fg = be.aggregate_pose_graphs()
    # pretend keys 0..3 were optimized to slightly-moved values
    warm = {}
    for k in range(4):
        idx = fg.key_to_index[(0, k)]
        warm[(0, k)] = (fg.R[idx].copy(),
                        fg.t[idx] + np.float32([0.5, -0.2, 0.1]))
    be.last_optimized_values = warm
    # odometry values before warm start (for the delta check)
    odo = {k: (fg.R[fg.key_to_index[(0, k)]].copy(),
               fg.t[fg.key_to_index[(0, k)]].copy()) for k in range(6)}
    be._apply_warm_start(fg)
    for k in range(4):
        idx = fg.key_to_index[(0, k)]
        np.testing.assert_allclose(fg.t[idx], warm[(0, k)][1], atol=1e-6)
    # keys 4, 5: warm(3) o (odom(3)^-1 o odom(k))
    Ro, to = odo[3]
    Rw, tw = warm[(0, 3)]
    for k in (4, 5):
        Rrel = Ro.T @ odo[k][0]
        trel = Ro.T @ (odo[k][1] - to)
        idx = fg.key_to_index[(0, k)]
        np.testing.assert_allclose(fg.R[idx], Rw @ Rrel, atol=1e-6)
        np.testing.assert_allclose(fg.t[idx], Rw @ trel + tw, atol=1e-6)


def test_warm_start_second_round_matches_cold():
    """Two optimization rounds with new keyframes in between: the
    warm-started second solve reaches the same quality as a cold solve
    of the identical graph (warm start changes only the init)."""
    results = {}
    for warm in (True, False):
        rng = np.random.default_rng(11)
        noise_rng = np.random.default_rng(12)
        swarm = Swarm(2, rng)
        for be in swarm.backends.values():
            be.params["backend.warm_start_optimization"] = warm
        swarm.feed_odometry(noise_rng=noise_rng)
        for k in (1, 4, 7):
            swarm.add_inter_loop_closure(0, k, 1, k)
        swarm.tick()
        assert swarm.backends[0].optimization_count == 1
        if warm:
            assert swarm.backends[0].last_optimized_values, \
                "warm snapshot missing after first solve"
        # extend both trajectories by 3 keyframes + close a new loop
        ext_rng = np.random.default_rng(13)
        for rid in range(2):
            Rs, ts = swarm.gt[rid]
            R, t = Rs[-1].copy(), ts[-1].copy()
            for k in range(8, 11):
                xi = ext_rng.standard_normal(6).astype(np.float32)
                xi[:3] *= 0.05
                xi[3:] *= 0.4
                dR, dt = _exp(xi)
                t = R @ dt + t
                R = R @ dR
                Rs = np.concatenate([Rs, R[None]])
                ts = np.concatenate([ts, t[None]])
                tn = t + ext_rng.standard_normal(3).astype(np.float32) * 0.05
                swarm.buses[rid].publish(
                    "cslam/keyframe_odom",
                    msgs.KeyframeOdom(id=k, pose=(R, tn)))
            swarm.gt[rid] = (Rs, ts)
        swarm.router.spin_until_idle()
        swarm.add_inter_loop_closure(0, 9, 1, 9)
        swarm.tick(min_total=2)
        assert swarm.backends[0].optimization_count == 2
        est = swarm.backends[1].current_pose_estimates
        Rs1, ts1 = swarm.gt[1]
        errs = [np.linalg.norm(est[(1, k)][1] - ts1[k]) for k in range(11)]
        results[warm] = float(np.mean(errs))
    assert results[True] < 0.2, results
    # same quality as cold (init-only change)
    assert results[True] <= results[False] + 0.05, results


def _exp(xi):
    dR, dt = se3.se3_exp(jnp.asarray(xi))
    return np.asarray(dR), np.asarray(dt)
