"""Native-runtime integration: rendezvous-gated heartbeats over the TCP
bus drive liveness and broker election across processes' bus instances
(the reference's SimulatedRendezVous + NeighborMonitor interplay,
decentralized_pgo.cpp:730-741 + neighbor_monitor.py)."""

import time

import numpy as np
import pytest

from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import WallClock
from cslam_tpu.comm.neighbor_monitor import NeighborMonitor

native = pytest.importorskip("cslam_tpu.runtime.native")


def test_rendezvous_gated_heartbeats_drive_liveness(tmp_path):
    base = 18500
    native.build()
    # schedule: robot 1 only alive during [0, 1.5] relative seconds
    sched = tmp_path / "sched.csv"
    sched.write_text("1,0.0,1.5\n")
    rdv = native.NativeRendezvous(str(sched), 1)

    bus0 = native.NativeBus(0, 2, base_port=base)
    bus1 = native.NativeBus(1, 2, base_port=base)
    try:
        clock = WallClock()
        monitor = NeighborMonitor(bus0, clock, 1, True,
                                  init_delay_sec=0.1, max_delay_sec=0.6)
        # re-register with typed deserialization (NativeBus needs types)
        bus0._subs.clear()
        bus0.subscribe("/r1/cslam/heartbeat", monitor.heartbeat_callback,
                       msgs.Heartbeat)

        t0 = time.time()
        saw_alive = False
        saw_dead_after_window = False
        while time.time() - t0 < 3.0:
            now = time.time() - t0
            if rdv.is_alive(now):  # gate exactly like the reference
                bus1.publish("cslam/heartbeat", msgs.Heartbeat(1))
            bus0.spin_once(timeout_ms=20)
            time.sleep(0.05)
            if monitor.is_alive():
                saw_alive = True
            elif saw_alive and now > 2.2:
                saw_dead_after_window = True
        assert saw_alive, "robot 1 never became alive in its window"
        assert saw_dead_after_window, \
            "robot 1 still alive after its rendezvous window closed"
    finally:
        bus0.close()
        bus1.close()
        rdv.close()
