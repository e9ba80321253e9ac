"""ctypes bindings over the C++ native runtime (native/libcslam_native.so).

NativeBus presents the same interface as comm.bus.InProcessBus so the
whole Python stack (loop-closure detection, decentralized PGO) runs
unchanged over real TCP between robot processes/hosts — the deployment
transport the reference gets from DDS. NativeLogger / NativeRendezvous
wrap the C++ metrics sink and fault injector.

Build the library with `make -C native` (or
cslam_tpu.runtime.native.build()).
"""

import ctypes
import fnmatch
import os
import subprocess
from typing import Callable, List, Tuple

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libcslam_native.so")

_lib = None


def build(force: bool = False) -> str:
    """Compile the native library if needed; returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "native")],
                       check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cslam_bus_create.restype = ctypes.c_void_p
    lib.cslam_bus_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_char_p]
    lib.cslam_bus_publish.restype = ctypes.c_int
    lib.cslam_bus_publish.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_char_p, ctypes.c_int]
    lib.cslam_bus_poll.restype = ctypes.c_int
    lib.cslam_bus_poll.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int, ctypes.c_char_p,
                                   ctypes.c_int, ctypes.c_int]
    lib.cslam_bus_front_sizes.restype = ctypes.c_int
    lib.cslam_bus_front_sizes.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_uint32),
                                          ctypes.POINTER(ctypes.c_uint32)]
    lib.cslam_bus_sent_bytes.restype = ctypes.c_uint64
    lib.cslam_bus_sent_bytes.argtypes = [ctypes.c_void_p]
    lib.cslam_bus_received_bytes.restype = ctypes.c_uint64
    lib.cslam_bus_received_bytes.argtypes = [ctypes.c_void_p]
    lib.cslam_bus_destroy.argtypes = [ctypes.c_void_p]
    lib.cslam_logger_create.restype = ctypes.c_void_p
    lib.cslam_logger_create.argtypes = [ctypes.c_char_p]
    lib.cslam_logger_log_info.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.c_char_p]
    lib.cslam_logger_start_timer.argtypes = [ctypes.c_void_p]
    lib.cslam_logger_stop_timer.restype = ctypes.c_double
    lib.cslam_logger_stop_timer.argtypes = [ctypes.c_void_p]
    lib.cslam_logger_log_pose_timestamp.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_long,
        ctypes.c_long]
    lib.cslam_logger_log_gps.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_double, ctypes.c_double,
                                         ctypes.c_double]
    lib.cslam_logger_log_match.argtypes = [ctypes.c_void_p,
                                           ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_double]
    lib.cslam_logger_clear_matches.argtypes = [ctypes.c_void_p,
                                               ctypes.c_char_p]
    lib.cslam_logger_write_logs.restype = ctypes.c_int
    lib.cslam_logger_write_logs.argtypes = [ctypes.c_void_p]
    lib.cslam_logger_destroy.argtypes = [ctypes.c_void_p]
    lib.cslam_rendezvous_create.restype = ctypes.c_void_p
    lib.cslam_rendezvous_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                            ctypes.c_int]
    lib.cslam_rendezvous_is_alive.restype = ctypes.c_int
    lib.cslam_rendezvous_is_alive.argtypes = [ctypes.c_void_p,
                                              ctypes.c_double]
    lib.cslam_rendezvous_destroy.argtypes = [ctypes.c_void_p]
    # state machine
    lib.cslam_state_create.restype = ctypes.c_void_p
    lib.cslam_state_create.argtypes = [ctypes.c_int, ctypes.c_double]
    lib.cslam_state_destroy.argtypes = [ctypes.c_void_p]
    for name in ("cslam_state_get", "cslam_state_is_optimizer",
                 "cslam_state_is_waiting"):
        getattr(lib, name).restype = ctypes.c_int
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.cslam_state_force.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.cslam_state_set_origin.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.cslam_state_set_max_waiting.argtypes = [ctypes.c_void_p,
                                                ctypes.c_double]
    lib.cslam_state_set_has_odometry.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_int]
    lib.cslam_state_is_broker.restype = ctypes.c_int
    lib.cslam_state_is_broker.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_int),
                                          ctypes.c_int]
    lib.cslam_state_start_waiting.argtypes = [ctypes.c_void_p,
                                              ctypes.c_double]
    lib.cslam_state_end_waiting.argtypes = [ctypes.c_void_p]
    lib.cslam_state_check_timeout.restype = ctypes.c_int
    lib.cslam_state_check_timeout.argtypes = [ctypes.c_void_p,
                                              ctypes.c_double]
    lib.cslam_state_on_neighbors.argtypes = [ctypes.c_void_p,
                                             ctypes.POINTER(ctypes.c_int),
                                             ctypes.POINTER(ctypes.c_int),
                                             ctypes.c_int]
    lib.cslam_state_set_neighbors.argtypes = \
        lib.cslam_state_on_neighbors.argtypes
    lib.cslam_state_on_pose_graph.restype = ctypes.c_int
    lib.cslam_state_on_pose_graph.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.cslam_state_on_collection_tick.restype = ctypes.c_int
    lib.cslam_state_on_collection_tick.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_double]
    lib.cslam_state_on_optimization_started.argtypes = [ctypes.c_void_p]
    lib.cslam_state_on_optimization_done.argtypes = [ctypes.c_void_p]
    # sensor synchronizer
    lib.cslam_sync_create.restype = ctypes.c_void_p
    lib.cslam_sync_create.argtypes = [ctypes.c_int, ctypes.c_double,
                                      ctypes.c_int, ctypes.c_double]
    lib.cslam_sync_destroy.argtypes = [ctypes.c_void_p]
    lib.cslam_sync_push.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_double, ctypes.c_uint64]
    lib.cslam_sync_push_odom.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                         ctypes.c_uint64]
    lib.cslam_sync_take.restype = ctypes.c_int
    lib.cslam_sync_take.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint64),
                                    ctypes.POINTER(ctypes.c_double)]
    lib.cslam_sync_lookup_odom.restype = ctypes.c_int
    lib.cslam_sync_lookup_odom.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                           ctypes.POINTER(ctypes.c_uint64),
                                           ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


class _NativePublisher:
    def __init__(self, bus, topic):
        self._bus = bus
        self.topic = topic

    def publish(self, msg):
        self._bus._publish_resolved(self.topic, msg)


class NativeBus:
    """TCP full-mesh bus with the InProcessBus interface. Messages must
    implement to_bytes(); subscribe() registers (pattern, type, callback)
    and spin_once() drains the native queue, deserializing per topic."""

    _MAX_MSG = 1 << 24

    def __init__(self, robot_id: int, n_robots: int, base_port: int = 17700,
                 hosts: str = ""):
        self._lib = _load()
        self.robot_id = robot_id
        self._handle = self._lib.cslam_bus_create(
            robot_id, n_robots, base_port, hosts.encode())
        if not self._handle:
            raise RuntimeError(
                f"failed to bind bus port {base_port + robot_id}")
        self._subs: List[Tuple[str, type, Callable]] = []
        self._topic_buf = ctypes.create_string_buffer(1024)
        self._data_buf = ctypes.create_string_buffer(self._MAX_MSG)

    def resolve(self, topic: str) -> str:
        if topic.startswith("/"):
            return topic
        return f"/r{self.robot_id}/{topic}"

    def create_publisher(self, topic: str):
        return _NativePublisher(self, self.resolve(topic))

    def _publish_resolved(self, topic: str, msg):
        payload = msg if isinstance(msg, bytes) else msg.to_bytes()
        self._lib.cslam_bus_publish(self._handle, topic.encode(), payload,
                                    len(payload))

    def publish(self, topic: str, msg):
        self._publish_resolved(self.resolve(topic), msg)

    def subscribe(self, topic: str, callback: Callable, msg_type=None):
        """msg_type: Message subclass for deserialization; None delivers
        raw bytes."""
        self._subs.append((self.resolve(topic), msg_type, callback))

    def _grow_for_front(self) -> bool:
        """Resize buffers to fit the frame at the queue front (poll
        returned -2). Without this, one oversized message would wedge the
        bus forever (frames stay queued in FIFO order)."""
        tlen = ctypes.c_uint32()
        plen = ctypes.c_uint32()
        if self._lib.cslam_bus_front_sizes(
                self._handle, ctypes.byref(tlen), ctypes.byref(plen)) != 0:
            return False
        if tlen.value + 1 > len(self._topic_buf):
            self._topic_buf = ctypes.create_string_buffer(tlen.value + 1)
        if plen.value > len(self._data_buf):
            self._data_buf = ctypes.create_string_buffer(plen.value)
        return True

    def spin_once(self, timeout_ms: int = 0, max_msgs: int = 1000) -> int:
        delivered = 0
        for _ in range(max_msgs):
            n = self._lib.cslam_bus_poll(
                self._handle, self._topic_buf, len(self._topic_buf),
                self._data_buf, len(self._data_buf),
                timeout_ms if delivered == 0 else 0)
            if n == -2:
                if not self._grow_for_front():
                    break
                continue
            if n < 0:
                break
            topic = self._topic_buf.value.decode()
            raw = self._data_buf.raw[:n]
            for pattern, msg_type, callback in self._subs:
                if pattern == topic or fnmatch.fnmatch(topic, pattern):
                    callback(msg_type.from_bytes(raw)
                             if msg_type is not None else raw)
            delivered += 1
        return delivered

    @property
    def sent_bytes(self) -> int:
        return self._lib.cslam_bus_sent_bytes(self._handle)

    @property
    def received_bytes(self) -> int:
        return self._lib.cslam_bus_received_bytes(self._handle)

    def close(self):
        if self._handle:
            self._lib.cslam_bus_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeLogger:
    """C++ metrics sink (reference Logger equivalent)."""

    def __init__(self, folder: str):
        self._lib = _load()
        os.makedirs(folder, exist_ok=True)
        self._handle = self._lib.cslam_logger_create(folder.encode())
        self.folder = folder

    def log_info(self, key: str, value):
        self._lib.cslam_logger_log_info(self._handle, key.encode(),
                                        str(value).encode())

    def start_timer(self):
        self._lib.cslam_logger_start_timer(self._handle)

    def stop_timer(self) -> float:
        return self._lib.cslam_logger_stop_timer(self._handle)

    def log_pose_timestamp(self, robot_id, keyframe_id, sec, nanosec):
        self._lib.cslam_logger_log_pose_timestamp(self._handle, robot_id,
                                                  keyframe_id, sec, nanosec)

    def log_gps(self, keyframe_id, lat, lon, alt):
        self._lib.cslam_logger_log_gps(self._handle, keyframe_id, lat, lon,
                                       alt)

    def log_matches(self, stream: str, edges):
        """Replace a named match CSV stream (reference
        spectral_matches.csv, logger.cpp:174-191). `edges` are
        EdgeInterRobot-likes with robot0/robot1 ids+keyframes and a
        weight."""
        self._lib.cslam_logger_clear_matches(self._handle, stream.encode())
        for e in edges:
            self._lib.cslam_logger_log_match(
                self._handle, stream.encode(), int(e.robot0_id),
                int(e.robot0_keyframe_id), int(e.robot1_id),
                int(e.robot1_keyframe_id), float(e.weight))

    def write_logs(self):
        return self._lib.cslam_logger_write_logs(self._handle)

    # hooks used by DecentralizedPGO (graph logging stays in Python where
    # the arrays live; the C++ side persists scalar metrics)
    def add_pose_graph_log_info(self, msg):
        self.log_info("last_received_pose_graph_robot", msg.robot_id)
        self.log_info("last_received_pose_graph_edges", len(msg.edges))

    def log_initial_global_pose_graph(self, fg):
        self.log_info("initial_graph_nodes", fg.num_nodes)
        self.log_info("initial_graph_factors", fg.num_factors)

    def log_optimized_global_pose_graph(self, fg, cost, robot_id):
        self.log_info("total_error", cost)
        self.log_info("optimizer_robot_id", robot_id)

    def close(self):
        if self._handle:
            self._lib.cslam_logger_destroy(self._handle)
            self._handle = None


class NativeStateMachine:
    """C++ optimizer state machine + elections (native/swarm_state.cpp),
    the control core of the reference's C++ DecentralizedPGO."""

    IDLE = 0
    WAITING_FOR_NEIGHBORS_INFO = 1
    POSEGRAPH_COLLECTION = 2
    WAITING_FOR_NEIGHBORS_POSEGRAPHS = 3
    START_OPTIMIZATION = 4
    OPTIMIZATION = 5

    def __init__(self, robot_id: int, max_waiting_time_sec: float):
        self._lib = _load()
        self._handle = self._lib.cslam_state_create(
            robot_id, float(max_waiting_time_sec))

    @property
    def state(self) -> int:
        return self._lib.cslam_state_get(self._handle)

    def force(self, state: int):
        self._lib.cslam_state_force(self._handle, int(state))

    def set_origin(self, origin: int):
        self._lib.cslam_state_set_origin(self._handle, origin)

    def set_max_waiting(self, seconds: float):
        self._lib.cslam_state_set_max_waiting(self._handle, float(seconds))

    def set_has_odometry(self, has: bool):
        self._lib.cslam_state_set_has_odometry(self._handle, 1 if has else 0)

    def is_optimizer(self) -> bool:
        return bool(self._lib.cslam_state_is_optimizer(self._handle))

    def is_broker(self, alive_other_ids) -> bool:
        arr = (ctypes.c_int * len(alive_other_ids))(*alive_other_ids)
        return bool(self._lib.cslam_state_is_broker(self._handle, arr,
                                                    len(alive_other_ids)))

    def start_waiting(self, now: float):
        self._lib.cslam_state_start_waiting(self._handle, now)

    def end_waiting(self):
        self._lib.cslam_state_end_waiting(self._handle)

    def is_waiting(self) -> bool:
        return bool(self._lib.cslam_state_is_waiting(self._handle))

    def check_timeout(self, now: float) -> bool:
        return bool(self._lib.cslam_state_check_timeout(self._handle, now))

    def on_neighbors(self, ids, origins):
        ids_arr = (ctypes.c_int * len(ids))(*ids)
        org_arr = (ctypes.c_int * len(origins))(*origins)
        self._lib.cslam_state_on_neighbors(self._handle, ids_arr, org_arr,
                                           len(ids))

    def set_neighbors(self, ids, origins):
        ids_arr = (ctypes.c_int * len(ids))(*ids)
        org_arr = (ctypes.c_int * len(origins))(*origins)
        self._lib.cslam_state_set_neighbors(self._handle, ids_arr, org_arr,
                                            len(ids))

    def on_pose_graph(self, robot_id: int) -> bool:
        return bool(self._lib.cslam_state_on_pose_graph(self._handle,
                                                        robot_id))

    def on_collection_tick(self, now: float) -> int:
        return self._lib.cslam_state_on_collection_tick(self._handle, now)

    def on_optimization_started(self):
        self._lib.cslam_state_on_optimization_started(self._handle)

    def on_optimization_done(self):
        self._lib.cslam_state_on_optimization_done(self._handle)

    def close(self):
        if self._handle:
            self._lib.cslam_state_destroy(self._handle)
            self._handle = None


class NativeSensorSync:
    """C++ approximate-time synchronizer + odometry cache
    (native/sensor_sync.cpp — the rgbd/stereo handler's C++ sync core).
    Payloads are tracked as integer handles; the caller owns the data."""

    def __init__(self, n_streams: int = 2, slop: float = 0.02,
                 max_queue: int = 10, odom_slop: float = 0.03):
        self._lib = _load()
        self.n_streams = n_streams
        self._handle = self._lib.cslam_sync_create(n_streams, slop,
                                                   max_queue, odom_slop)

    def push(self, stream: int, stamp: float, payload_id: int):
        self._lib.cslam_sync_push(self._handle, stream, stamp, payload_id)

    def push_odom(self, stamp: float, payload_id: int):
        self._lib.cslam_sync_push_odom(self._handle, stamp, payload_id)

    def take(self):
        """Returns (stamp, [payload ids]) or None."""
        handles = (ctypes.c_uint64 * self.n_streams)()
        stamp = ctypes.c_double()
        if self._lib.cslam_sync_take(self._handle, handles,
                                     ctypes.byref(stamp)):
            return stamp.value, list(handles)
        return None

    def lookup_odom(self, stamp: float):
        """Nearest odom (payload_id, stamp) within the slop, else None."""
        payload = ctypes.c_uint64()
        out_stamp = ctypes.c_double()
        if self._lib.cslam_sync_lookup_odom(self._handle, stamp,
                                            ctypes.byref(payload),
                                            ctypes.byref(out_stamp)):
            return payload.value, out_stamp.value
        return None

    def close(self):
        if self._handle:
            self._lib.cslam_sync_destroy(self._handle)
            self._handle = None


class NativeRendezvous:
    """C++ schedule-driven liveness (reference SimulatedRendezVous)."""

    def __init__(self, schedule_file: str, robot_id: int,
                 enabled: bool = True):
        self._lib = _load()
        self._handle = self._lib.cslam_rendezvous_create(
            schedule_file.encode(), robot_id, 1 if enabled else 0)

    def is_alive(self, now: float) -> bool:
        return bool(self._lib.cslam_rendezvous_is_alive(self._handle, now))

    def close(self):
        if self._handle:
            self._lib.cslam_rendezvous_destroy(self._handle)
            self._handle = None
