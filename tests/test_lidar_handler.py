"""Lidar handler over the bus: distance-gated keyframes, voxel
downsampling, descriptor request/response, SC-yaw-seeded GNC-ICP
verification producing loop closures (SURVEY §3.4 call stack)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.frontend.lidar_handler import LidarHandler
from cslam_tpu.ops import se3

from test_fpfh import structured_cloud


def make_params(robot_id=0, n_robots=1):
    return {
        "robot_id": robot_id,
        "max_nb_robots": n_robots,
        "frontend.kf_distance_threshold": 1.0,
        "frontend.voxel_size": 0.3,
    }


def world_cloud(rng):
    """A fixed structured world observed from different sensor poses."""
    return structured_cloud(rng, n=360) * 2.0


def observe(world, pose):
    """Points in the sensor frame at `pose` (world->sensor = pose^-1)."""
    R, t = pose
    return ((world - t) @ R).astype(np.float32)


def make_pose(x, y=0.0, yaw=0.0):
    R = np.asarray(se3.so3_exp(jnp.asarray([0, 0, yaw], dtype=jnp.float32)))
    return (R.astype(np.float32), np.array([x, y, 0], dtype=np.float32))


def test_keyframe_distance_gate_and_publication():
    rng = np.random.default_rng(0)
    router = InProcessRouter()
    bus = InProcessBus(router, 0)
    handler = LidarHandler(make_params(), bus, ManualClock())
    kfs, odoms = [], []
    bus.subscribe("cslam/keyframe_data", kfs.append)
    bus.subscribe("cslam/keyframe_odom", odoms.append)
    world = world_cloud(rng)
    # first frame -> keyframe; +0.5 m -> gated; +1.5 m -> keyframe
    for x, expect in ((0.0, 0), (0.5, None), (1.6, 1)):
        pose = make_pose(x)
        handler.add_sensor_data(observe(world, pose), pose)
        assert handler.process_new_sensor_data() == expect
    router.spin_until_idle()
    assert [k.id for k in kfs] == [0, 1]
    assert [o.id for o in odoms] == [0, 1]
    # voxel downsampling reduced the cloud
    assert 0 < len(handler.local_keyframes[0]) < 360


def test_intra_lidar_loop_closure_verification():
    rng = np.random.default_rng(1)
    router = InProcessRouter()
    bus = InProcessBus(router, 0)
    handler = LidarHandler(make_params(), bus, ManualClock())
    results = []
    bus.subscribe("cslam/intra_robot_loop_closure", results.append)
    world = world_cloud(rng)
    pose0 = make_pose(0.0)
    pose1 = make_pose(1.5, 0.3, 0.25)
    for pose in (pose0, pose1):
        handler.add_sensor_data(observe(world, pose), pose)
        handler.process_new_sensor_data()
    bus.publish("cslam/local_keyframe_match",
                msgs.LocalKeyframeMatch(keyframe0_id=0, keyframe1_id=1))
    router.spin_until_idle()
    assert len(results) == 1
    lc = results[0]
    assert lc.success
    # the published measurement MUST be between(kf0, kf1) = X_0^-1 X_1
    # (the backend convention) — direction matters: an inverted loop
    # closure actively corrupts the optimum (the original either-
    # direction tolerance here masked exactly that bug, caught by
    # benchmarks/lidar_mission_bench.py degrading ATE 0.77x)
    R_rel = pose0[0].T @ pose1[0]
    t_rel = pose0[0].T @ (pose1[1] - pose0[1])
    np.testing.assert_allclose(lc.pose[0], R_rel, atol=0.08)
    assert np.linalg.norm(lc.pose[1] - t_rel) < 0.2, (lc.pose[1], t_rel)


def test_inter_robot_lidar_pipeline():
    rng = np.random.default_rng(2)
    router = InProcessRouter()
    h0 = LidarHandler(make_params(0, 2), InProcessBus(router, 0),
                      ManualClock())
    h1 = LidarHandler(make_params(1, 2), InProcessBus(router, 1),
                      ManualClock())
    results = []
    router.subscribe("/cslam/inter_robot_loop_closure", results.append)
    world = world_cloud(rng)
    pose0 = make_pose(0.0)
    pose1 = make_pose(1.0, -0.5, -0.2)
    h0.add_sensor_data(observe(world, pose0), pose0)
    h0.process_new_sensor_data()
    h1.add_sensor_data(observe(world, pose1), pose1)
    h1.process_new_sensor_data()
    # broker requests robot 0's kf 0, matched against robot 1's kf 0
    InProcessBus(router, 0).publish(
        "cslam/local_descriptors_request",
        msgs.LocalDescriptorsRequest(keyframe_id=0, matches_robot_id=[1],
                                     matches_keyframe_id=[0]))
    router.spin_until_idle()
    assert len(results) == 1
    lc = results[0]
    assert (lc.robot0_id, lc.robot1_id) == (0, 1)
    assert lc.success
    # wire convention: pose = X_robot0^-1 X_robot1, direction checked
    R_rel = pose0[0].T @ pose1[0]
    t_rel = pose0[0].T @ (pose1[1] - pose0[1])
    np.testing.assert_allclose(lc.pose[0], R_rel, atol=0.08)
    assert np.linalg.norm(lc.pose[1] - t_rel) < 0.2, (lc.pose[1], t_rel)


def test_unknown_keyframe_request_ignored():
    router = InProcessRouter()
    bus = InProcessBus(router, 0)
    handler = LidarHandler(make_params(), bus, ManualClock())
    sent = []
    bus.subscribe("/cslam/local_descriptors", sent.append)
    bus.publish("cslam/local_descriptors_request",
                msgs.LocalDescriptorsRequest(keyframe_id=99))
    router.spin_until_idle()
    assert sent == []
