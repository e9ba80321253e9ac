"""RGBD handler: synthetic textured scene observed from multiple poses;
keyframe pipeline + intra/inter verification over the bus."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.frontend.rgbd_handler import CameraIntrinsics, RGBDHandler
from cslam_tpu.ops import se3

INTR = CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0, baseline=0.1)
H, W = 120, 160


def render_scene(pose, rng, n_blobs=60, seed=0):
    """Toy renderer: textured fronto-parallel plane at z=5 in world,
    projected into the camera at `pose` (world->camera = pose^-1)."""
    blob_rng = np.random.default_rng(seed)
    pts_w = np.stack([
        blob_rng.uniform(-6, 6, n_blobs),
        blob_rng.uniform(-4, 4, n_blobs),
        np.full(n_blobs, 5.0),
    ], axis=1).astype(np.float32)
    # unique texture patch per blob so descriptors are distinguishable
    textures = blob_rng.uniform(0.2, 1.0, (n_blobs, 7, 7)).astype(np.float32)
    R, t = pose
    pts_c = (pts_w - t) @ R  # R^T (p - t)
    img = np.zeros((H, W), dtype=np.float32)
    depth = np.zeros((H, W), dtype=np.float32)
    for p, tex in zip(pts_c, textures):
        if p[2] < 0.5:
            continue
        u = int(INTR.fx * p[0] / p[2] + INTR.cx)
        v = int(INTR.fy * p[1] / p[2] + INTR.cy)
        if 4 <= u < W - 4 and 4 <= v < H - 4:
            img[v - 3:v + 4, u - 3:u + 4] = tex
            depth[v - 4:v + 5, u - 4:u + 5] = p[2]
    img += rng.standard_normal((H, W)).astype(np.float32) * 0.01
    return (img * 255).clip(0, 255).astype(np.uint8), depth


def make_pose(x, y=0.0, yaw=0.0):
    R = np.asarray(se3.so3_exp(jnp.asarray([0, 0, yaw], dtype=jnp.float32)))
    return (R.astype(np.float32), np.array([x, y, 0], dtype=np.float32))


def make_handler(robot_id=0, n_robots=1, router=None, **extra):
    router = router or InProcessRouter()
    params = {
        "robot_id": robot_id,
        "max_nb_robots": n_robots,
        "frontend.max_queue_size": 5,
        "frontend.keyframe_generation_ratio_threshold": 1.0,
        "frontend.pnp_min_inliers": 6,
    }
    params.update(extra)
    bus = InProcessBus(router, robot_id)
    return RGBDHandler(params, bus, ManualClock()), router, bus


def test_keyframe_pipeline_publishes():
    rng = np.random.default_rng(0)
    handler, router, bus = make_handler()
    keyframes, odoms = [], []
    bus.subscribe("cslam/keyframe_data", keyframes.append)
    bus.subscribe("cslam/keyframe_odom", odoms.append)
    pose = make_pose(0.0)
    img, depth = render_scene(pose, rng)
    handler.add_sensor_data(img, depth, INTR, pose)
    kf_id = handler.process_new_sensor_data()
    router.spin_until_idle()
    assert kf_id == 0
    assert len(keyframes) == 1 and keyframes[0].id == 0
    assert keyframes[0].image.shape == (H, W, 1)
    assert len(odoms) == 1
    kf = handler.local_keyframes[0]
    assert kf.mask.sum() > 10  # found featured keypoints with depth


def test_intra_robot_verification():
    rng = np.random.default_rng(1)
    handler, router, bus = make_handler()
    results = []
    bus.subscribe("cslam/intra_robot_loop_closure", results.append)
    pose0 = make_pose(0.0)
    pose1 = make_pose(0.4, 0.1, 0.03)
    for pose in (pose0, pose1):
        img, depth = render_scene(pose, rng)
        handler.add_sensor_data(img, depth, INTR, pose)
        handler.process_new_sensor_data()
    bus.publish("cslam/local_keyframe_match",
                msgs.LocalKeyframeMatch(keyframe0_id=0, keyframe1_id=1))
    router.spin_until_idle()
    assert len(results) == 1
    lc = results[0]
    assert lc.success
    # measurement approximates X_0^-1 X_1
    R_rel = pose0[0].T @ pose1[0]
    t_rel = pose0[0].T @ (pose1[1] - pose0[1])
    np.testing.assert_allclose(lc.pose[0], R_rel, atol=0.05)
    np.testing.assert_allclose(lc.pose[1], t_rel, atol=0.15)


def test_inter_robot_verification_roundtrip():
    rng = np.random.default_rng(2)
    router = InProcessRouter()
    h0, _, bus0 = make_handler(0, 2, router)
    h1, _, bus1 = make_handler(1, 2, router)
    results = []
    router.subscribe("/cslam/inter_robot_loop_closure", results.append)
    pose0 = make_pose(0.0)
    pose1 = make_pose(0.5, -0.1, -0.04)
    img0, depth0 = render_scene(pose0, rng)
    img1, depth1 = render_scene(pose1, rng)
    h0.add_sensor_data(img0, depth0, INTR, pose0)
    h0.process_new_sensor_data()
    h1.add_sensor_data(img1, depth1, INTR, pose1)
    h1.process_new_sensor_data()
    # broker asks robot 0 to transmit kf 0, matched against robot1 kf 0
    bus0.publish("cslam/local_descriptors_request",
                 msgs.LocalDescriptorsRequest(
                     keyframe_id=0, matches_robot_id=[1],
                     matches_keyframe_id=[0]))
    router.spin_until_idle()
    assert h0.log_local_descriptors_cumulative_communication > 0
    assert len(results) == 1
    lc = results[0]
    assert lc.success
    assert (lc.robot0_id, lc.robot1_id) == (0, 1)
    R_rel = pose0[0].T @ pose1[0]
    t_rel = pose0[0].T @ (pose1[1] - pose0[1])
    np.testing.assert_allclose(lc.pose[0], R_rel, atol=0.05)
    np.testing.assert_allclose(lc.pose[1], t_rel, atol=0.15)


def test_verification_rejects_different_places():
    rng = np.random.default_rng(3)
    handler, router, bus = make_handler()
    results = []
    bus.subscribe("cslam/intra_robot_loop_closure", results.append)
    pose0 = make_pose(0.0)
    img0, depth0 = render_scene(pose0, rng, seed=0)
    handler.add_sensor_data(img0, depth0, INTR, pose0)
    handler.process_new_sensor_data()
    # different scene content entirely (different blob seed)
    img1, depth1 = render_scene(pose0, rng, seed=99)
    handler.add_sensor_data(img1, depth1, INTR, pose0)
    handler.process_new_sensor_data()
    bus.publish("cslam/local_keyframe_match",
                msgs.LocalKeyframeMatch(keyframe0_id=0, keyframe1_id=1))
    router.spin_until_idle()
    assert len(results) == 1
    assert not results[0].success


def test_keyframe_gating_skips_redundant_frames():
    rng = np.random.default_rng(4)
    handler, router, bus = make_handler(
        **{"frontend.keyframe_generation_ratio_threshold": 0.5})
    pose = make_pose(0.0)
    img, depth = render_scene(pose, rng)
    handler.add_sensor_data(img, depth, INTR, pose)
    assert handler.process_new_sensor_data() == 0
    # identical frame again: tracking is perfect -> no new keyframe
    handler.add_sensor_data(img, depth, INTR, pose)
    assert handler.process_new_sensor_data() is None
    # facing away from the scene: tracking collapses -> new keyframe
    pose_far = make_pose(50.0, 0.0, np.pi)
    img2, depth2 = render_scene(pose_far, rng)
    handler.add_sensor_data(img2, depth2, INTR, pose_far)
    assert handler.process_new_sensor_data() == 1


def test_stereo_depth_from_disparity():
    from cslam_tpu.frontend.rgbd_handler import StereoHandler
    rng = np.random.default_rng(5)
    router = InProcessRouter()
    params = {
        "robot_id": 0, "max_nb_robots": 1,
        "frontend.keyframe_generation_ratio_threshold": 1.0,
        "frontend.pnp_min_inliers": 6,
    }
    handler = StereoHandler(params, InProcessBus(router, 0), ManualClock())
    pose = make_pose(0.0)
    img, depth = render_scene(pose, rng)
    with np.errstate(divide="ignore"):
        disparity = np.where(depth > 0, INTR.fx * INTR.baseline /
                             np.maximum(depth, 0.1), 0.0)
    handler.add_stereo_data(img, disparity.astype(np.float32), INTR, pose)
    kf_id = handler.process_new_sensor_data()
    assert kf_id == 0
    kf = handler.local_keyframes[0]
    # recovered depths match the rendered ones
    valid = kf.mask > 0
    assert valid.sum() > 10
    assert np.all(np.abs(kf.points3d[valid][:, 2] - 5.0) < 0.3)


def test_batched_inter_robot_verification_multi_target():
    """One LocalDescriptorsRequest targeting several of my keyframes
    exercises the batched verify path (ops/matching2d.
    verify_keyframe_pairs): every pair verifies in ONE program and
    each published closure carries the per-pair relative pose."""
    rng = np.random.default_rng(7)
    router = InProcessRouter()
    h0, _, bus0 = make_handler(0, 2, router)
    h1, _, bus1 = make_handler(1, 2, router)
    results = []
    router.subscribe("/cslam/inter_robot_loop_closure", results.append)
    pose0 = make_pose(0.0)
    img0, depth0 = render_scene(pose0, rng)
    h0.add_sensor_data(img0, depth0, INTR, pose0)
    h0.process_new_sensor_data()
    # three keyframes on robot 1 near the same place + one far away
    poses1 = [make_pose(0.3, 0.05, 0.02), make_pose(0.5, -0.1, -0.04),
              make_pose(0.2, 0.15, 0.0), make_pose(60.0, 0.0, np.pi)]
    for p in poses1:
        img, depth = render_scene(p, rng)
        h1.add_sensor_data(img, depth, INTR, p)
        h1.process_new_sensor_data()
    # robot 0 transmits kf 0, matched against ALL of robot 1's frames
    bus0.publish("cslam/local_descriptors_request",
                 msgs.LocalDescriptorsRequest(
                     keyframe_id=0, matches_robot_id=[1, 1, 1, 1],
                     matches_keyframe_id=[0, 1, 2, 3]))
    router.spin_until_idle()
    assert len(results) == 4
    by_kf = {lc.robot1_keyframe_id: lc for lc in results}
    for k, pose1 in enumerate(poses1[:3]):
        lc = by_kf[k]
        assert lc.success, f"pair {k} failed to verify"
        R_rel = pose0[0].T @ pose1[0]
        t_rel = pose0[0].T @ (pose1[1] - pose0[1])
        np.testing.assert_allclose(lc.pose[0], R_rel, atol=0.05)
        np.testing.assert_allclose(lc.pose[1], t_rel, atol=0.15)
    assert not by_kf[3].success  # the far-away frame must not verify
