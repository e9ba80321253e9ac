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

    def spin_once(self, timeout_ms: int = 0, max_msgs: int = 1000) -> int:
        delivered = 0
        for _ in range(max_msgs):
            n = self._lib.cslam_bus_poll(
                self._handle, self._topic_buf, len(self._topic_buf),
                self._data_buf, self._MAX_MSG,
                timeout_ms if delivered == 0 else 0)
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
