"""Dataset format loaders: KITTI/TUM round-trips, multi-robot splits,
keyframe streams."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import se3
from cslam_tpu.utils import datasets


@pytest.fixture
def traj(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    Rs = [np.eye(3, dtype=np.float32)]
    ts = [np.zeros(3, dtype=np.float32)]
    for _ in range(n - 1):
        xi = rng.standard_normal(6).astype(np.float32) * 0.2
        dR, dt = se3.se3_exp(jnp.asarray(xi))
        Rs.append(Rs[-1] @ np.asarray(dR))
        ts.append(Rs[-2] @ np.asarray(dt) + ts[-1])
    return np.stack(Rs), np.stack(ts)


def test_kitti_roundtrip(tmp_path, traj):
    R, t = traj
    path = tmp_path / "poses.txt"
    datasets.save_kitti_poses(str(path), R, t)
    R2, t2 = datasets.load_kitti_poses(str(path))
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_tum_roundtrip(tmp_path, traj):
    R, t = traj
    stamps = np.arange(len(t)) * 0.1
    path = tmp_path / "traj.txt"
    datasets.save_tum_trajectory(str(path), stamps, R, t)
    stamps2, R2, t2 = datasets.load_tum_trajectory(str(path))
    np.testing.assert_allclose(stamps2, stamps, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-5)
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_split_trajectory(traj):
    R, t = traj
    segments = datasets.split_trajectory(R, t, 3)
    assert len(segments) == 3
    assert sum(len(seg[1]) for seg in segments) == len(t)
    for Rs, ts in segments:
        # re-anchored: first pose is identity
        np.testing.assert_allclose(Rs[0], np.eye(3), atol=1e-5)
        np.testing.assert_allclose(ts[0], 0.0, atol=1e-6)
        # rigid re-anchoring preserves within-segment distances
    seg_R, seg_t = segments[1]
    orig = t[len(t) // 3: 2 * len(t) // 3 + 1]
    d_orig = np.linalg.norm(orig[1] - orig[0])
    d_new = np.linalg.norm(seg_t[1] - seg_t[0])
    np.testing.assert_allclose(d_new, d_orig, rtol=1e-4)


def test_keyframe_stream(traj):
    R, t = traj
    kfs = datasets.to_keyframe_stream(R, t, min_distance=1.0)
    assert 1 < len(kfs) <= len(t)
    assert [k.id for k in kfs] == list(range(len(kfs)))
    # consecutive keyframes are at least min_distance apart
    for a, b in zip(kfs[:-1], kfs[1:]):
        assert np.linalg.norm(b.pose[1] - a.pose[1]) >= 0.999
