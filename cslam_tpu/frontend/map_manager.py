"""Map manager: periodic driver for sensor handlers.

Capability parity with the reference MapManager<T>
(/root/reference/src/front_end/map_manager.cpp:6-27 — a timer calling
process_new_sensor_data() at frontend.map_manager_process_period_ms, with
the component dispatching on sensor type,
map_manager_component.cpp:18-58). The handler interface is
ISensorHandler-shaped (sensor_handler_interface.h:10-23):
process_new_sensor_data() is the only required hook.
"""

from typing import Dict


class MapManager:
    """Drives one sensor handler; the host runtime calls tick() at the
    configured period."""

    def __init__(self, handler, params: Dict):
        self.handler = handler
        self.period_ms = params.get("frontend.map_manager_process_period_ms",
                                    100)
        self.processed = 0

    def tick(self):
        result = self.handler.process_new_sensor_data()
        if result is not None:
            self.processed += 1
        return result


def make_sensor_handler(params: Dict, bus, clock):
    """Sensor-type dispatch (map_manager_component.cpp:29-43):
    stereo / rgbd -> RGBD-family handler, lidar -> LidarHandler."""
    sensor_type = params.get("frontend.sensor_type", "stereo").lower()
    if sensor_type == "lidar":
        from cslam_tpu.frontend.lidar_handler import LidarHandler
        return LidarHandler(params, bus, clock)
    from cslam_tpu.frontend.rgbd_handler import RGBDHandler, StereoHandler
    cls = StereoHandler if sensor_type == "stereo" else RGBDHandler
    return cls(params, bus, clock)
