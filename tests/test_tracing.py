"""Span tracer: chrome-trace output, nesting, bounded memory, and the
disabled-by-default fast path (beyond-reference observability — the
reference has no tracer, only wall-clock counters; SURVEY §5)."""

import json
import threading
import time

from cslam_tpu.runtime.tracing import Tracer


def test_disabled_tracer_records_nothing():
    tr = Tracer()
    with tr.span("x"):
        pass
    tr.instant("i")
    tr.counter("c", v=1)
    assert len(tr._events) == 0


def test_span_nesting_and_dump(tmp_path):
    tr = Tracer()
    tr.enable(str(tmp_path / "t.json"), pid_label="r0")
    with tr.span("outer", robot=0):
        with tr.span("inner"):
            time.sleep(0.002)
    tr.instant("marker", kind="msg")
    tr.counter("queue_depth", depth=3)
    path = tr.dump()
    doc = json.loads(open(path).read())
    evs = doc["traceEvents"]
    names = [e["name"] for e in evs]
    assert "process_name" in names  # pid label metadata
    spans = {e["name"]: e for e in evs if e.get("ph") == "X"}
    assert set(spans) == {"outer", "inner"}
    # inner is contained within outer
    o, i = spans["outer"], spans["inner"]
    assert o["ts"] <= i["ts"]
    assert i["ts"] + i["dur"] <= o["ts"] + o["dur"] + 1.0  # 1us slack
    assert i["dur"] >= 2000  # slept 2 ms
    assert spans["outer"]["args"]["robot"] == 0
    assert any(e.get("ph") == "i" for e in evs)
    assert any(e.get("ph") == "C" for e in evs)


def test_ring_capacity_counts_drops(tmp_path):
    tr = Tracer(capacity=10)
    tr.enable(str(tmp_path / "t.json"))
    for _ in range(20):
        with tr.span("s"):
            pass
    assert len(tr._events) == 10
    assert tr.n_dropped > 0
    doc = json.loads(open(tr.dump()).read())
    assert doc["otherData"]["n_dropped"] == tr.n_dropped


def test_threads_get_distinct_tids(tmp_path):
    tr = Tracer()
    tr.enable(str(tmp_path / "t.json"))

    # All workers must be alive at once: Python reuses thread idents
    # after a thread exits, so sequentially-finishing workers can share
    # a tid (observed under pytest load).
    barrier = threading.Barrier(3)

    def work():
        with tr.span("w"):
            barrier.wait(timeout=10)

    ts = [threading.Thread(target=work) for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    with tr.span("main"):
        pass
    tids = {e["tid"] for e in tr._events}
    assert len(tids) == 4


def test_node_ticks_emit_spans(tmp_path):
    """The SwarmNode tick wrappers actually record when the global
    tracer is enabled (integration, not just the class)."""
    from cslam_tpu.runtime import tracing
    from tests.test_e2e_swarm import build_swarm
    tracing.tracer.clear()
    tracing.tracer.enable(str(tmp_path / "n.json"))
    try:
        router, clock, world, nodes, handlers, odom = build_swarm(
            2, n_poses=3, drift=0.01, budget=4)
        for n in nodes.values():
            n.tick_heartbeat()
            n.tick_detection_publication()
    finally:
        tracing.tracer.disable()
    names = {e["name"] for e in tracing.tracer._events}
    assert "heartbeat" in names
    assert "detection_publication" in names
    tracing.tracer.clear()
