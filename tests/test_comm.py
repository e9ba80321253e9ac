"""Comm layer: message serialization round-trips, bus routing, neighbor
liveness (including the fixed disabled-monitor defect), broker election,
gossip watermarks, simulated rendezvous."""

import numpy as np
import pytest

from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.comm.neighbor_monitor import NeighborMonitor
from cslam_tpu.comm.neighbors_manager import NeighborManager
from cslam_tpu.comm.rendezvous import SimulatedRendezVous


def make_params(robot_id=0, max_nb_robots=3, monitoring=True):
    return {
        "robot_id": robot_id,
        "max_nb_robots": max_nb_robots,
        "neighbor_management.enable_neighbor_monitoring": monitoring,
        "neighbor_management.init_delay_sec": 1.0,
        "neighbor_management.max_heartbeat_delay_sec": 2.0,
    }


def test_message_roundtrips():
    rng = np.random.default_rng(0)
    cases = [
        msgs.GlobalDescriptor(3, 1, rng.random(16).astype(np.float32)),
        msgs.InterRobotMatch(0, 1, 2, 3, 0.5),
        msgs.LocalDescriptorsRequest(7, [1, 2], [3, 4]),
        msgs.LocalKeyframeMatch(1, 2),
        msgs.Heartbeat(2),
        msgs.RobotIds([1, 2, 3]),
        msgs.RobotIdsAndOrigin([1, 2], [0, 0]),
        msgs.KeyValue(b"nb_matches", b"17"),
    ]
    for m in cases:
        data = m.to_bytes()
        m2 = type(m).from_bytes(data)
        for (name, kind) in m._FIELDS:
            a, b = getattr(m, name), getattr(m2, name)
            if kind == "floats":
                np.testing.assert_allclose(a, b)
            else:
                assert a == b, f"{type(m).__name__}.{name}"


def test_pose_messages_roundtrip():
    rng = np.random.default_rng(1)
    R = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
    t = rng.standard_normal(3).astype(np.float32)
    lc = msgs.InterRobotLoopClosure(0, 5, 1, 9, True, (R, t))
    lc2 = msgs.InterRobotLoopClosure.from_bytes(lc.to_bytes())
    assert lc2.success and lc2.robot1_keyframe_id == 9
    np.testing.assert_allclose(lc2.pose[0], R, atol=1e-6)
    np.testing.assert_allclose(lc2.pose[1], t, atol=1e-6)

    pg = msgs.PoseGraph(
        robot_id=1, origin_robot_id=0,
        values=[msgs.PoseGraphValue(1, 0, (R, t))],
        edges=[msgs.PoseGraphEdge((1, 0), (1, 1), (R, t),
                                  np.ones(6, np.float32) * 0.1)],
        connected_robots=[0, 1])
    pg2 = msgs.PoseGraph.from_bytes(pg.to_bytes())
    assert pg2.connected_robots == [0, 1]
    np.testing.assert_allclose(pg2.edges[0].measurement[1], t, atol=1e-6)
    np.testing.assert_allclose(pg2.values[0].pose[0], R, atol=1e-6)

    descs = msgs.GlobalDescriptors(
        [msgs.GlobalDescriptor(i, 0, rng.random(8).astype(np.float32))
         for i in range(3)])
    descs2 = msgs.GlobalDescriptors.from_bytes(descs.to_bytes())
    assert len(descs2.descriptors) == 3
    np.testing.assert_allclose(descs2.descriptors[2].descriptor,
                               descs.descriptors[2].descriptor)


def test_bus_namespacing_and_delivery():
    router = InProcessRouter()
    bus0 = InProcessBus(router, 0)
    bus1 = InProcessBus(router, 1)
    got = []
    bus1.subscribe("cslam/keyframe_data", got.append)  # /r1/cslam/...
    bus0.subscribe("/r1/cslam/keyframe_data", lambda m: got.append(("x", m)))
    bus1.publish("cslam/keyframe_data", "hello")
    bus0.publish("cslam/keyframe_data", "not-for-r1")
    router.spin_until_idle()
    assert "hello" in got
    assert ("x", "hello") in got
    assert "not-for-r1" not in got


def test_neighbor_monitor_liveness_window():
    router = InProcessRouter()
    clock = ManualClock()
    bus = InProcessBus(router, 0)
    mon = NeighborMonitor(bus, clock, 1, True, init_delay_sec=1.0,
                          max_delay_sec=2.0)
    assert not mon.is_alive()  # no heartbeat yet
    bus.publish("/r1/cslam/heartbeat", msgs.Heartbeat(1))
    router.spin_until_idle()
    assert not mon.is_alive()  # init delay not elapsed
    clock.advance(1.5)
    bus.publish("/r1/cslam/heartbeat", msgs.Heartbeat(1))
    router.spin_until_idle()
    assert mon.is_alive()
    clock.advance(5.0)
    assert not mon.is_alive()  # heartbeat timed out


def test_neighbor_monitor_disabled_always_alive():
    """The reference's neighbor_monitor.py:53 defect (None when disabled)
    is fixed: disabled monitoring means always in range."""
    router = InProcessRouter()
    clock = ManualClock()
    mon = NeighborMonitor(InProcessBus(router, 0), clock, 1, False, 1.0, 2.0)
    assert mon.is_alive() is True


def test_broker_election_lowest_alive():
    router = InProcessRouter()
    clock = ManualClock()
    managers = {}
    for rid in range(3):
        bus = InProcessBus(router, rid)
        managers[rid] = NeighborManager(bus, clock, make_params(rid, 3))
    # heartbeats from all robots
    def beat_all():
        for rid in range(3):
            InProcessBus(router, rid).publish("cslam/heartbeat",
                                              msgs.Heartbeat(rid))
        router.spin_until_idle()

    beat_all()
    clock.advance(1.5)
    beat_all()
    assert managers[0].local_robot_is_broker()
    assert not managers[1].local_robot_is_broker()
    assert not managers[2].local_robot_is_broker()
    # robot 0 dies -> robot 1 becomes broker
    clock.advance(3.0)
    for rid in (1, 2):
        InProcessBus(router, rid).publish("cslam/heartbeat",
                                          msgs.Heartbeat(rid))
    router.spin_until_idle()
    assert managers[1].local_robot_is_broker()
    assert not managers[2].local_robot_is_broker()


def test_gossip_watermarks():
    router = InProcessRouter()
    clock = ManualClock()
    mgr = NeighborManager(InProcessBus(router, 0), clock,
                          make_params(0, 2, monitoring=False))
    # first send: everything from 0
    assert mgr.select_from_which_kf_to_send(4) == 0
    # watermark advanced to 4 -> next send starts at 5
    assert mgr.select_from_which_kf_to_send(9) == 5
    assert mgr.useless_descriptors(9) == 9
    # unknown-range filter
    descs = [msgs.GlobalDescriptor(i, 1, np.zeros(2, np.float32))
             for i in range(6)]
    mgr.update_received_kf_id(1, 2)
    unknown = mgr.get_unknown_range(descs)
    assert unknown == [3, 4, 5]
    assert mgr.neighbors_monitors[1].last_keyframe_received == 5


def test_simulated_rendezvous(tmp_path):
    sched = tmp_path / "sched.csv"
    sched.write_text("0,0.0,10.0,20.0,30.0\n1,5.0,15.0\n")
    clock = ManualClock()
    rv0 = SimulatedRendezVous(clock, str(sched), 0)
    rv1 = SimulatedRendezVous(clock, str(sched), 1)
    assert rv0.is_alive() and not rv1.is_alive()
    clock.advance(7.0)
    assert rv0.is_alive() and rv1.is_alive()
    clock.advance(5.0)  # t=12
    assert not rv0.is_alive() and rv1.is_alive()
    clock.advance(13.0)  # t=25
    assert rv0.is_alive() and not rv1.is_alive()
    # unreadable schedule leaves robots alive (reference semantics)
    rv_bad = SimulatedRendezVous(clock, str(tmp_path / "none.csv"), 0)
    assert rv_bad.is_alive()
