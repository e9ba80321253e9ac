"""Global-descriptor component (batched CNN stage) + MapManager dispatch."""

import numpy as np
import pytest

from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.frontend.global_descriptor_component import \
    GlobalDescriptorComponent
from cslam_tpu.frontend.map_manager import MapManager, make_sensor_handler


def test_global_descriptor_component_batches():
    router = InProcessRouter()
    bus = InProcessBus(router, 0)
    received = []
    bus.subscribe("cslam/processed_global_descriptor", received.append)

    class CountingModel:
        def __init__(self):
            self.batch_calls = 0

        def compute_embeddings_batch(self, images):
            self.batch_calls += 1
            return np.tile(
                np.arange(len(images), dtype=np.float32)[:, None], (1, 4))

    model = CountingModel()
    comp = GlobalDescriptorComponent({"robot_id": 2}, bus, model=model,
                                     batch_size=3)
    for i in range(5):
        img = np.zeros((8, 8, 1), dtype=np.uint8)
        bus.publish("cslam/keyframe_data", msgs.KeyframeRGB.from_image(i, img))
    router.spin_until_idle()
    # batch of 3 flushed automatically; 2 pending flushed by tick
    assert model.batch_calls == 1
    comp.tick()
    router.spin_until_idle()
    assert model.batch_calls == 2
    assert [m.keyframe_id for m in received] == [0, 1, 2, 3, 4]
    assert all(m.robot_id == 2 for m in received)


def test_map_manager_dispatch_and_tick():
    router = InProcessRouter()
    clock = ManualClock()
    params = {
        "robot_id": 0, "max_nb_robots": 1,
        "frontend.sensor_type": "lidar",
        "frontend.map_manager_process_period_ms": 50,
        "frontend.kf_distance_threshold": 0.5,
        "frontend.voxel_size": 0.5,
    }
    handler = make_sensor_handler(params, InProcessBus(router, 0), clock)
    from cslam_tpu.frontend.lidar_handler import LidarHandler
    assert isinstance(handler, LidarHandler)
    mm = MapManager(handler, params)
    assert mm.tick() is None  # no data
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((200, 3)).astype(np.float32) * 10
    handler.add_sensor_data(pts, (np.eye(3, dtype=np.float32),
                                  np.zeros(3, dtype=np.float32)))
    assert mm.tick() == 0
    assert mm.processed == 1

    params["frontend.sensor_type"] = "rgbd"
    from cslam_tpu.frontend.rgbd_handler import RGBDHandler, StereoHandler
    h2 = make_sensor_handler(params, InProcessBus(router, 0), clock)
    assert isinstance(h2, RGBDHandler) and not isinstance(h2, StereoHandler)
    params["frontend.sensor_type"] = "stereo"
    h3 = make_sensor_handler(params, InProcessBus(router, 0), clock)
    assert isinstance(h3, StereoHandler)


def test_keyframe_odom_gps_roundtrip():
    odom = msgs.KeyframeOdom(id=3, gps=np.array([45.5, -73.6, 12.0],
                                                dtype=np.float32))
    out = msgs.KeyframeOdom.from_bytes(odom.to_bytes())
    np.testing.assert_allclose(out.gps, [45.5, -73.6, 12.0], atol=1e-4)
    assert out.id == 3
