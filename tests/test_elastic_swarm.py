"""Elastic membership: a robot drops out mid-mission (rendezvous window
closes), the swarm keeps detecting and optimizing with the remaining
subset, and the returning robot rejoins — SURVEY §5 failure detection /
elastic recovery semantics (heartbeat timeouts, BFS connectivity,
proceed-with-subset)."""

import numpy as np
import pytest

from cslam_tpu.backend import pgo
from cslam_tpu.backend.decentralized_pgo import OptimizerState
from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.comm.rendezvous import SimulatedRendezVous
from cslam_tpu.frontend.sim import SimSensorHandler, SyntheticWorld
from cslam_tpu.node import SwarmNode

from test_e2e_swarm import make_params


def build_monitored_swarm(n_robots, n_poses, schedule_file, clock):
    router = InProcessRouter()
    world = SyntheticWorld(n_robots, n_poses, seed=3)
    nodes, handlers, rendezvous = {}, {}, {}
    cfg = pgo.PGOConfig(lm_max_iters=10, cg_max_iters=40,
                        gnc_max_outer_iters=3)
    for rid in range(n_robots):
        bus = InProcessBus(router, rid)
        params = make_params(rid, n_robots, budget=4)
        params["neighbor_management.enable_neighbor_monitoring"] = True
        params["neighbor_management.init_delay_sec"] = 0.5
        params["neighbor_management.max_heartbeat_delay_sec"] = 2.0
        params["backend.max_waiting_time_sec"] = 5.0

        class _Model:
            def __init__(self, rid):
                self.rid = rid

            def compute_embedding(self, kf_id):
                return world.descriptor(self.rid, kf_id)

        nodes[rid] = SwarmNode(params, bus, clock,
                               descriptor_model=_Model(rid), pgo_config=cfg)
        handlers[rid] = SimSensorHandler(params, bus, world,
                                         verification_gate=4.0)
        rendezvous[rid] = SimulatedRendezVous(clock, schedule_file, rid,
                                              enabled=True)
    return router, world, nodes, handlers, rendezvous


def heartbeat_round(nodes, rendezvous, router, clock, dt=1.0):
    for rid, node in nodes.items():
        if rendezvous[rid].is_alive():
            node.tick_heartbeat()
    router.spin_until_idle()
    clock.advance(dt)


def test_swarm_proceeds_without_dead_robot_and_rejoins(tmp_path):
    # robot 2 is only alive during [0, 6] and again from [20, 100]
    sched = tmp_path / "sched.csv"
    sched.write_text("0,0.0,1000.0\n1,0.0,1000.0\n2,0.0,6.0,20.0,100.0\n")
    clock = ManualClock()
    router, world, nodes, handlers, rendezvous = build_monitored_swarm(
        3, 12, str(sched), clock)

    # phase 1: everyone alive, ingest keyframes + establish liveness
    for _ in range(3):
        heartbeat_round(nodes, rendezvous, router, clock)
    for kf in range(world.n_poses):
        for rid, node in nodes.items():
            node.detection.add_global_descriptor_to_map(
                world.descriptor(rid, kf), kf)
            node.bus.publish(
                "cslam/keyframe_odom",
                msgs.KeyframeOdom(id=kf, pose=(
                    world.trajectories[rid][0][kf],
                    world.trajectories[rid][1][kf])))
    router.spin_until_idle()
    for node in nodes.values():
        node.tick_detection_publication()
    router.spin_until_idle()

    _, in_range = nodes[0].detection.neighbor_manager \
        .check_neighbors_in_range()
    assert in_range == [0, 1, 2]

    # phase 2: robot 2's window closes (t > 6); liveness decays past the
    # heartbeat timeout
    for _ in range(7):
        heartbeat_round(nodes, rendezvous, router, clock)
    assert not rendezvous[2].is_alive()
    _, in_range = nodes[0].detection.neighbor_manager \
        .check_neighbors_in_range()
    assert in_range == [0, 1], in_range

    # detection proceeds with the subset: broker is still robot 0 and
    # only includes robots 0/1 candidates
    selection = nodes[0].tick_inter_robot_detection()
    router.spin_until_idle(max_rounds=500)
    for e in selection:
        assert 2 not in (e.robot0_id, e.robot1_id), \
            "dead robot's candidates selected"

    # optimization proceeds with the 2-robot subset
    for node in nodes.values():
        node.tick_optimization_start()
    router.spin_until_idle()
    for _ in range(3):  # collection -> start -> optimization
        for node in nodes.values():
            node.tick_optimization_loop()
        router.spin_until_idle()
    be0 = nodes[0].backend
    assert set(be0.current_neighbors.ids) == {1}
    if be0.optimizer_state == OptimizerState.OPTIMIZATION and \
            be0._optimization_future is not None:
        be0._optimization_future.result(timeout=120)
        be0.check_result_and_finish_optimization()
    router.spin_until_idle()
    assert be0.optimization_count == 1

    # phase 3: robot 2 returns at t >= 20 and regains liveness
    while clock.now() < 20.0:
        clock.advance(1.0)
    for _ in range(3):
        heartbeat_round(nodes, rendezvous, router, clock)
    _, in_range = nodes[0].detection.neighbor_manager \
        .check_neighbors_in_range()
    assert in_range == [0, 1, 2], "returning robot not re-detected"


def test_waiting_timeout_when_neighbor_dies_mid_collection(tmp_path):
    """Optimizer waits on a robot that silently died; the C++ state
    machine times out back to IDLE instead of deadlocking
    (decentralized_pgo.cpp:580-589)."""
    sched = tmp_path / "s.csv"
    sched.write_text("0,0.0,1000.0\n1,0.0,1000.0\n")
    clock = ManualClock()
    router, world, nodes, handlers, rendezvous = build_monitored_swarm(
        2, 6, str(sched), clock)
    for _ in range(3):
        heartbeat_round(nodes, rendezvous, router, clock)
    for kf in range(6):
        nodes[0].bus.publish(
            "cslam/keyframe_odom",
            msgs.KeyframeOdom(id=kf, pose=(world.trajectories[0][0][kf],
                                           world.trajectories[0][1][kf])))
    router.spin_until_idle()
    be = nodes[0].backend
    # neighbors answered at query time, but robot 1's backend never sends
    # its pose graph (we drop it by de-registering robot 1's subscribers)
    be.current_neighbors = msgs.RobotIdsAndOrigin(ids=[1], origins=[1])
    be._sync_sm()
    be.optimizer_state = OptimizerState.POSEGRAPH_COLLECTION
    router.subscribers = [
        (t, cb) for (t, cb) in router.subscribers
        if "/r1/" not in t
    ]
    be.optimization_loop_callback()  # requests pose graphs, starts waiting
    assert be.optimizer_state == \
        OptimizerState.WAITING_FOR_NEIGHBORS_POSEGRAPHS
    router.spin_until_idle()
    clock.advance(6.0)  # > max_waiting_time_sec
    be.optimization_loop_callback()
    assert be.optimizer_state == OptimizerState.IDLE
