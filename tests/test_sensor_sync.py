"""C++ approximate-time synchronizer: pairing under slop, odometry
alignment, integration with the RGBD handler's timestamped path."""

import numpy as np
import pytest

native = pytest.importorskip("cslam_tpu.runtime.native")

from test_rgbd_handler import INTR, make_handler, make_pose, render_scene


@pytest.fixture(scope="module")
def lib():
    native.build()
    return True


def test_sync_pairs_within_slop(lib):
    sync = native.NativeSensorSync(n_streams=2, slop=0.02, max_queue=10,
                                   odom_slop=0.03)
    sync.push(0, 1.000, 11)
    assert sync.take() is None  # depth missing
    sync.push(1, 1.005, 21)  # within slop
    stamp, handles = sync.take()
    assert handles == [11, 21]
    assert abs(stamp - 1.000) < 1e-9
    sync.close()


def test_sync_drops_unmatchable_pivot(lib):
    sync = native.NativeSensorSync(n_streams=2, slop=0.02, max_queue=10,
                                   odom_slop=0.03)
    sync.push(0, 1.0, 1)
    sync.push(1, 2.0, 2)  # too new: pivot 1.0 can never match
    sync.push(0, 2.001, 3)
    stamp, handles = sync.take()
    assert handles == [3, 2]
    sync.close()


def test_odom_lookup_window(lib):
    sync = native.NativeSensorSync(2, 0.02, 10, odom_slop=0.03)
    sync.push_odom(5.0, 50)
    sync.push_odom(5.1, 51)
    assert sync.lookup_odom(5.02) == (50, 5.0)
    assert sync.lookup_odom(5.09) == (51, 5.1)
    assert sync.lookup_odom(6.0) is None  # beyond 30 ms
    sync.close()


def test_rgbd_handler_timestamped_path(lib):
    rng = np.random.default_rng(0)
    handler, router, bus = make_handler()
    pose = make_pose(0.0)
    img, depth = render_scene(pose, rng)
    handler.add_odometry(10.000, pose)
    handler.add_image(10.001, img, INTR)
    handler.add_depth(10.004, depth)  # within sync slop
    kf_id = handler.process_new_sensor_data()
    assert kf_id == 0
    # frame without nearby odometry is dropped
    img2, depth2 = render_scene(make_pose(1.0), rng)
    handler.add_image(20.0, img2, INTR)
    handler.add_depth(20.0, depth2)
    assert handler.process_new_sensor_data() is None
