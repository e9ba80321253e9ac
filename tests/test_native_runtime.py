"""C++ native runtime: TCP bus delivery between in-process bus instances
(distinct ports = distinct 'hosts'), logger CSV output, rendezvous."""

import os
import time

import numpy as np
import pytest

from cslam_tpu.comm import messages as msgs

native = pytest.importorskip("cslam_tpu.runtime.native")


@pytest.fixture(scope="module")
def lib():
    native.build()
    return True


def _wait_for(predicate, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.01)
    return False


def test_bus_roundtrip(lib):
    base = 18100
    bus0 = native.NativeBus(0, 2, base_port=base)
    bus1 = native.NativeBus(1, 2, base_port=base)
    try:
        got = []
        bus1.subscribe("/cslam/global_descriptors", got.append,
                       msgs.GlobalDescriptors)
        descs = msgs.GlobalDescriptors([
            msgs.GlobalDescriptor(3, 0, np.arange(8, dtype=np.float32))
        ])
        bus0.publish("/cslam/global_descriptors", descs)

        def received():
            bus1.spin_once(timeout_ms=50)
            return len(got) > 0

        assert _wait_for(received), "message not delivered over TCP"
        assert got[0].descriptors[0].keyframe_id == 3
        np.testing.assert_allclose(got[0].descriptors[0].descriptor,
                                   np.arange(8))
        assert bus0.sent_bytes > 0
        assert bus1.received_bytes > 0
    finally:
        bus0.close()
        bus1.close()


def test_bus_namespacing_and_loopback(lib):
    base = 18200
    bus0 = native.NativeBus(0, 2, base_port=base)
    bus1 = native.NativeBus(1, 2, base_port=base)
    try:
        got0, got1 = [], []
        # relative topic -> own namespace; loopback delivers locally
        bus0.subscribe("cslam/heartbeat", got0.append, msgs.Heartbeat)
        bus1.subscribe("/r0/cslam/heartbeat", got1.append, msgs.Heartbeat)
        bus0.publish("cslam/heartbeat", msgs.Heartbeat(7))
        assert _wait_for(lambda: (bus0.spin_once(50), bus1.spin_once(50),
                                  got0 and got1)[-1])
        assert got0[0].origin_robot_id == 7
        assert got1[0].origin_robot_id == 7
    finally:
        bus0.close()
        bus1.close()


def test_bus_three_robots_broadcast(lib):
    base = 18300
    buses = [native.NativeBus(i, 3, base_port=base) for i in range(3)]
    try:
        received = {i: [] for i in range(3)}
        for i, b in enumerate(buses):
            b.subscribe("/cslam/inter_robot_matches", received[i].append,
                        msgs.InterRobotMatches)
        matches = msgs.InterRobotMatches(
            robot_id=1, matches=[msgs.InterRobotMatch(0, 1, 2, 3, 0.9)])
        buses[1].publish("/cslam/inter_robot_matches", matches)
        assert _wait_for(lambda: all(
            (b.spin_once(20), len(received[i]) > 0)[-1]
            for i, b in enumerate(buses)))
        for i in range(3):
            assert received[i][0].matches[0].weight == pytest.approx(0.9)
    finally:
        for b in buses:
            b.close()


def test_native_logger(lib, tmp_path):
    folder = str(tmp_path / "logs")
    logger = native.NativeLogger(folder)
    logger.log_info("nb_matches", 17)
    logger.start_timer()
    time.sleep(0.02)
    elapsed = logger.stop_timer()
    assert elapsed >= 15.0  # ms
    logger.log_pose_timestamp(0, 5, 100, 200)
    logger.write_logs()
    metrics = open(os.path.join(folder, "metrics.csv")).read()
    assert "nb_matches,17" in metrics
    assert "latest_pgo_time_ms" in metrics
    ts = open(os.path.join(folder, "pose_timestamps.csv")).read()
    assert "0,5,100,200" in ts
    logger.close()


def test_native_rendezvous(lib, tmp_path):
    sched = tmp_path / "sched.csv"
    sched.write_text("0,0.0,10.0,20.0,30.0\n1,5.0,15.0\n")
    rv0 = native.NativeRendezvous(str(sched), 0)
    rv1 = native.NativeRendezvous(str(sched), 1)
    assert rv0.is_alive(1.0) and not rv1.is_alive(1.0)
    assert rv0.is_alive(25.0) and not rv1.is_alive(25.0)
    assert not rv0.is_alive(16.0)
    assert rv1.is_alive(9.0)
    # missing schedule leaves the robot alive
    rv_bad = native.NativeRendezvous(str(tmp_path / "missing.csv"), 0)
    assert rv_bad.is_alive(100.0)
    rv0.close(); rv1.close(); rv_bad.close()


def test_bus_oversized_frame_grows_buffer(lib):
    """One frame larger than the initial poll buffer must not wedge the
    queue (bus.cpp returns -2 and keeps FIFO order; spin_once grows the
    buffer via cslam_bus_front_sizes and retries)."""
    base = 18300
    bus = native.NativeBus(0, 1, base_port=base)
    try:
        # shrink the initial buffer so a modest payload overflows it
        import ctypes
        bus._data_buf = ctypes.create_string_buffer(64)
        got = []
        bus.subscribe("/cslam/raw", got.append, None)
        big = bytes(range(256)) * 16  # 4096 B > 64 B buffer
        small = b"after"
        bus._publish_resolved("/cslam/raw", _Raw(big))
        bus._publish_resolved("/cslam/raw", _Raw(small))
        assert _wait_for(lambda: (bus.spin_once(50), len(got) >= 2)[-1])
        assert got[0] == big          # FIFO preserved, payload intact
        assert got[1] == small        # queue not wedged
        assert len(bus._data_buf) >= len(big)
    finally:
        bus.close()


class _Raw:
    def __init__(self, data):
        self._data = data

    def to_bytes(self):
        return self._data
