"""Stereo pipeline: batched scan-line correspondence kernel, camera
model construction with the reference's sanity checks
(stereo_handler.cpp:85-176), encoding validation, 4-way sync, and a
stereo keyframe mission."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.frontend.rgbd_handler import (CameraInfo, CameraIntrinsics,
                                             StereoHandler)
from cslam_tpu.ops import stereo

H, W = 96, 192
FX, FY, CX, CY = 100.0, 100.0, 96.0, 48.0
BASELINE = 0.2


def _texture(seed=0):
    """Smooth random texture with enough gradient for ZNCC."""
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((H, W)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25], dtype=np.float32)
    for axis in (0, 1):
        img = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), axis, img)
    img -= img.min()
    return (img / img.max()).astype(np.float32)


def _shift(img, d):
    """Right view of a fronto-parallel plane at disparity d (subpixel by
    linear interpolation): right[y, x] = left[y, x + d]."""
    x = np.arange(W, dtype=np.float32) + d
    x0 = np.clip(np.floor(x).astype(int), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    f = (x - x0).astype(np.float32)
    return img[:, x0] * (1 - f) + img[:, x1] * f


def _grid_keypoints(margin=12, step=16):
    xs, ys = np.meshgrid(np.arange(margin, W - margin, step),
                         np.arange(margin, H - margin, step))
    xy = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float32)
    return xy, np.ones(len(xy), dtype=np.float32)


def test_correspondences_integer_shift():
    left = _texture()
    right = _shift(left, 7.0)
    xy, mask = _grid_keypoints()
    disp, valid = stereo.stereo_correspondences(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(xy),
        jnp.asarray(mask), max_disparity=32)
    disp, valid = np.asarray(disp), np.asarray(valid)
    assert valid.sum() > 0.8 * len(xy)
    assert np.allclose(disp[valid > 0], 7.0, atol=0.3)


def test_correspondences_subpixel():
    left = _texture(seed=3)
    right = _shift(left, 5.4)
    xy, mask = _grid_keypoints()
    disp, valid = stereo.stereo_correspondences(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(xy),
        jnp.asarray(mask), max_disparity=32)
    disp, valid = np.asarray(disp), np.asarray(valid)
    assert valid.sum() > 0.5 * len(xy)
    err = np.abs(disp[valid > 0] - 5.4)
    assert np.median(err) < 0.25, np.median(err)


def test_correspondences_reject_textureless():
    left = np.zeros((H, W), np.float32)
    right = np.zeros((H, W), np.float32)
    xy, mask = _grid_keypoints()
    _, valid = stereo.stereo_correspondences(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(xy),
        jnp.asarray(mask), max_disparity=32)
    # flat patches: ZNCC is ill-defined, nothing should pass as a
    # confident unique match at an interior disparity
    assert np.asarray(valid).sum() <= 0.1 * len(xy)


def test_depth_from_disparity():
    d = jnp.asarray([4.0, 0.0, 8.0])
    v = jnp.asarray([1.0, 0.0, 1.0])
    z = np.asarray(stereo.depth_from_disparity(d, v, FX, BASELINE))
    assert np.allclose(z, [FX * BASELINE / 4.0, 0.0, FX * BASELINE / 8.0])


# ----------------------------------------------------------------------
def _make_handler(**extra):
    params = {
        "robot_id": 0,
        "max_nb_robots": 1,
        "frontend.max_queue_size": 5,
        "frontend.keyframe_generation_ratio_threshold": 1.0,
        "frontend.pnp_min_inliers": 6,
        "frontend.stereo_max_disparity": 32,
    }
    params.update(extra)
    router = InProcessRouter()
    bus = InProcessBus(router, 0)
    return StereoHandler(params, bus, ManualClock()), router, bus


LINFO = CameraInfo(fx=FX, fy=FY, cx=CX, cy=CY, tx=0.0)
RINFO = CameraInfo(fx=FX, fy=FY, cx=CX, cy=CY, tx=-FX * BASELINE)


def test_camera_model_from_infos():
    h, _, _ = _make_handler()
    model = h.stereo_camera_model(LINFO, RINFO)
    assert model is not None
    assert model.baseline == pytest.approx(BASELINE)
    assert model.fx == FX and model.cy == CY


def test_camera_model_rejects_nonpositive_baseline(capsys):
    h, _, _ = _make_handler()
    bad = CameraInfo(fx=FX, fy=FY, cx=CX, cy=CY, tx=+FX * BASELINE)
    assert h.stereo_camera_model(LINFO, bad) is None
    assert "should be positive" in capsys.readouterr().out


def test_camera_model_fallback_baseline_warns_once(capsys):
    h, _, _ = _make_handler(**{"frontend.stereo_baseline_fallback": 0.12})
    no_tx = CameraInfo(fx=FX, fy=FY, cx=CX, cy=CY, tx=0.0)
    m1 = h.stereo_camera_model(LINFO, no_tx)
    m2 = h.stereo_camera_model(LINFO, no_tx)
    assert m1.baseline == pytest.approx(0.12)
    assert m2.baseline == pytest.approx(0.12)
    assert capsys.readouterr().out.count("only printed once") == 1


def test_camera_model_large_baseline_warns_once(capsys):
    h, _, _ = _make_handler()
    wide = CameraInfo(fx=FX, fy=FY, cx=CX, cy=CY, tx=-FX * 12.0)
    assert h.stereo_camera_model(LINFO, wide) is not None
    assert h.stereo_camera_model(LINFO, wide) is not None
    assert capsys.readouterr().out.count("quite large") == 1


def test_encoding_validation_drops_bad_frames(capsys):
    h, _, _ = _make_handler()
    pose = (np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32))
    h.add_stereo_pair(np.zeros((4, 4, 2), np.float32),
                      np.zeros((4, 4), np.float32), pose,
                      left_info=LINFO, right_info=RINFO)
    assert h.log_dropped_frames == 1
    assert "Input type must be" in capsys.readouterr().out
    # int32 payload also rejected
    h.add_stereo_pair(np.zeros((4, 4), np.int32),
                      np.zeros((4, 4), np.float32), pose,
                      left_info=LINFO, right_info=RINFO)
    assert h.log_dropped_frames == 2


def test_stereo_keyframe_depth():
    """Full path: pair -> keypoints -> correspondence -> backprojected
    keyframe whose 3-D points sit at the plane's true depth."""
    h, router, bus = _make_handler()
    z_true = 4.0
    d = FX * BASELINE / z_true  # 5 px
    left = _texture(seed=5)
    right = _shift(left, d)
    pose = (np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32))
    odoms = []
    bus.subscribe("cslam/keyframe_odom", odoms.append)
    h.add_stereo_pair(left, right, pose, left_info=LINFO,
                      right_info=RINFO)
    kf_id = h.process_new_sensor_data()
    router.spin_until_idle()
    assert kf_id == 0 and odoms
    kf = h.local_keyframes[0]
    z = kf.points3d[np.asarray(kf.mask) > 0, 2]
    assert len(z) >= 10
    assert np.median(np.abs(z - z_true)) < 0.15 * z_true


def test_four_way_sync_alignment():
    """Left/right/infos arrive unsynced with jitter; only complete
    4-tuples with nearby odometry reach the queue."""
    h, router, _ = _make_handler()
    left = _texture(seed=7)
    right = _shift(left, 6.0)
    pose = (np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32))
    h.add_odometry(1.0, pose)
    h.add_odometry(2.0, pose)
    # t=1.0: full tuple, slightly jittered stamps
    h.add_left_image(1.000, left)
    h.add_camera_info_left(1.004, LINFO)
    h.add_camera_info_right(1.006, RINFO)
    assert not h.received_queue  # right image still missing
    h.add_right_image(1.008, right)
    assert len(h.received_queue) == 1
    # t=2.0: missing right camera info -> never synchronized
    h.add_left_image(2.0, left)
    h.add_right_image(2.0, right)
    h.add_camera_info_left(2.0, LINFO)
    assert len(h.received_queue) == 1
    assert h.process_new_sensor_data() == 0
