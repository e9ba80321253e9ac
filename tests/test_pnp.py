"""2D-3D (PnP) verification: the Grunert grid-bisection P3P RANSAC
(ops/pnp.py) and its integration as a depth-free verification mode in
the RGBD handler (reference RegistrationVis PnP semantics,
rgbd_handler.cpp:696-726)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import se3
from cslam_tpu.ops.pnp import (normalize_keypoints, ransac_pnp,
                               verify_keyframe_pair_pnp)
from cslam_tpu.ops.matching2d import verify_keyframe_pair


def make_scene(rng, N=96, planar=False, pose_scale=0.3):
    if planar:
        pts = np.stack([rng.uniform(-3, 3, N), rng.uniform(-3, 3, N),
                        np.full(N, 5.0)], 1).astype(np.float32)
    else:
        pts = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
        pts[:, 2] += 6
    xi = rng.standard_normal(6).astype(np.float32) * pose_scale
    R, t = (np.asarray(a) for a in se3.se3_exp(jnp.asarray(xi)))
    t = t + np.array([0, 0, 1], np.float32)
    X = pts @ R.T + t
    rays = (X[:, :2] / X[:, 2:3]).astype(np.float32)
    return pts, rays, R, t


def rot_err_deg(Ra, Rb):
    return np.degrees(np.arccos(np.clip(
        (np.trace(Ra @ Rb.T) - 1) / 2, -1, 1)))


@pytest.mark.parametrize("planar", [False, True])
def test_ransac_pnp_exact_recovery(planar):
    rng = np.random.default_rng(1 + planar)
    pts, rays, R, t = make_scene(rng, planar=planar)
    res = ransac_pnp(jnp.asarray(pts), jnp.asarray(rays),
                     jnp.ones(len(pts), jnp.float32))
    assert bool(res.success)
    assert rot_err_deg(np.asarray(res.R), R) < 0.2
    assert np.linalg.norm(np.asarray(res.t) - t) < 5e-3
    assert float(res.num_inliers) == len(pts)


def test_ransac_pnp_rejects_outliers_and_noise():
    rng = np.random.default_rng(3)
    pts, rays, R, t = make_scene(rng)
    rays = rays + rng.standard_normal(rays.shape).astype(np.float32) * 1e-3
    bad = rng.choice(len(pts), 30, replace=False)
    rays[bad] += (rng.uniform(0.1, 0.5, (30, 2)).astype(np.float32) *
                  np.sign(rng.standard_normal((30, 2))).astype(np.float32))
    res = ransac_pnp(jnp.asarray(pts), jnp.asarray(rays),
                     jnp.ones(len(pts), jnp.float32))
    assert bool(res.success)
    assert rot_err_deg(np.asarray(res.R), R) < 0.5
    assert np.linalg.norm(np.asarray(res.t) - t) < 0.03
    inl = np.asarray(res.inliers) > 0
    assert not inl[bad].any()


def test_ransac_pnp_fails_on_garbage():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    pts[:, 2] += 6
    rays = rng.uniform(-0.5, 0.5, (64, 2)).astype(np.float32)
    res = ransac_pnp(jnp.asarray(pts), jnp.asarray(rays),
                     jnp.ones(64, jnp.float32))
    assert float(res.num_inliers) < 10


def test_pnp_parity_with_3d3d_where_both_apply():
    """Where the query side HAS depth, the PnP pose must agree with
    the 3D-3D path's (round-4 verdict item 8: parity-tested)."""
    rng = np.random.default_rng(5)
    pts, rays, R, t = make_scene(rng, N=96)
    D = 64
    desc = rng.standard_normal((96, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    # frame-b observations: full 3D (for 3d3d) and rays (for pnp)
    X = pts @ R.T + t
    mask = np.ones(96, np.float32)
    res3d, n3d = verify_keyframe_pair(
        jnp.asarray(desc), jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray(desc), jnp.asarray(X), jnp.asarray(mask))
    respnp, npnp = verify_keyframe_pair_pnp(
        jnp.asarray(desc), jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray(desc), jnp.asarray(rays), jnp.asarray(mask))
    assert bool(res3d.success) and bool(respnp.success)
    assert rot_err_deg(np.asarray(res3d.R), np.asarray(respnp.R)) < 0.3
    assert np.linalg.norm(np.asarray(res3d.t) -
                          np.asarray(respnp.t)) < 0.02


def test_handler_verifies_depthless_query_frame():
    """End-to-end: a received frame with NO valid depth still produces
    a successful verified loop closure through the PnP mode (the exact
    frames the 3D-3D path loses)."""
    from cslam_tpu.comm import messages as msgs
    from cslam_tpu.comm.bus import InProcessBus, InProcessRouter
    from cslam_tpu.frontend.rgbd_handler import (LocalKeyframe,
                                                 RGBDHandler)

    rng = np.random.default_rng(6)
    params = {"robot_id": 1, "max_nb_robots": 2,
              "frontend.verification_mode": "auto"}
    router = InProcessRouter()
    bus = InProcessBus(router, 1)
    handler = RGBDHandler(params, bus, clock=None)
    handler._intrinsics = (200.0, 200.0, 80.0, 60.0)

    pts, rays, R, t = make_scene(rng, N=96)
    D = 64
    desc = rng.standard_normal((96, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    mask = np.ones(96, np.float32)
    kf = LocalKeyframe(0, np.zeros((96, 2), np.float32), desc, pts, mask,
                       (np.eye(3, dtype=np.float32),
                        np.zeros(3, np.float32)), feat_mask=mask)
    handler.local_keyframes[0] = kf

    fx, fy, cx, cy = 200.0, 200.0, 80.0, 60.0
    keypoints = np.stack([rays[:, 0] * fx + cx,
                          rays[:, 1] * fy + cy], 1).astype(np.float32)
    received = []
    bus.subscribe("/cslam/inter_robot_loop_closure",
                  lambda m: received.append(m))
    msg = msgs.LocalImageDescriptors(
        robot_id=0, keyframe_id=7, matches_robot_id=[1],
        matches_keyframe_id=[0], keypoints=keypoints,
        descriptors=desc.astype(np.float16),
        points3d=np.zeros((96, 3), np.float32),
        valid3d=np.zeros(96, np.float32),  # NO depth on the query side
        valid2d=mask, intrinsics=(fx, fy, cx, cy))
    # wire round-trip (exercises the appended fields)
    msg = msgs.LocalImageDescriptors.from_bytes(msg.to_bytes())
    assert msg.intrinsics[0] == pytest.approx(fx)
    handler.receive_local_image_descriptors(msg)
    router.spin_until_idle()
    assert len(received) == 1
    lc = received[0]
    assert lc.success
    # robot0 = sender(0): pose = X_sender^-1 X_mine = T (maps my
    # points into sender frame) — must match the ground-truth (R, t)
    np.testing.assert_allclose(np.asarray(lc.pose[0]), R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(lc.pose[1]), t, atol=2e-2)


def test_legacy_message_roundtrip_still_parses():
    """A payload truncated at points3d (legacy sender) must parse with
    default masks/intrinsics."""
    from cslam_tpu.comm import messages as msgs
    msg = msgs.LocalImageDescriptors(
        robot_id=2, keyframe_id=3, matches_robot_id=[0],
        matches_keyframe_id=[1],
        keypoints=np.ones((4, 2), np.float32),
        descriptors=np.ones((4, 8), np.float16),
        points3d=np.ones((4, 3), np.float32))
    full = msg.to_bytes()
    # strip the appended section (empty masks: 4 + 0 + 4 + 0 + 16)
    legacy = full[:-(4 + 4 + 16)]
    parsed = msgs.LocalImageDescriptors.from_bytes(legacy)
    assert parsed.robot_id == 2 and parsed.keyframe_id == 3
    assert len(parsed.valid3d) == 0 and parsed.intrinsics[0] == 0.0
    assert parsed.points3d.shape == (4, 3)


def test_normalize_keypoints():
    rays = normalize_keypoints(np.array([[80.0, 60.0], [280.0, 260.0]]),
                               (200.0, 200.0, 80.0, 60.0))
    np.testing.assert_allclose(rays, [[0.0, 0.0], [1.0, 1.0]])
