"""Utils: misc chunking, pointcloud codec, visualization artifacts."""

import numpy as np
import pytest

from cslam_tpu.utils.misc import clamp, dict_to_list_chunks
from cslam_tpu.utils.pointcloud import create_cloud, \
    read_points_numpy_filtered
from cslam_tpu.utils.visualization import depth_to_colored_pointcloud, \
    pose_graph_to_ply


def test_clamp_and_chunks():
    assert clamp(5, 0, 3) == 3
    assert clamp(-1, 0, 3) == 0
    d = {i: i * 10 for i in range(7)}
    chunks = dict_to_list_chunks(d, 2, 2)
    assert chunks == [[20, 30], [40, 50], [60]]
    assert dict_to_list_chunks(d, -5, 3)[0] == [0, 10, 20]


def test_pointcloud_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((100, 4)).astype(np.float32)
    blob = create_cloud(pts, ("x", "y", "z", "intensity"))
    out = read_points_numpy_filtered(blob, ("x", "y", "z"))
    np.testing.assert_allclose(out, pts[:, :3])
    # NaN filtering
    pts[3, 1] = np.nan
    blob = create_cloud(pts, ("x", "y", "z", "intensity"))
    out = read_points_numpy_filtered(blob, ("x", "y", "z"), skip_nans=True)
    assert out.shape == (99, 3)
    # field reordering
    out2 = read_points_numpy_filtered(blob, ("intensity", "x"),
                                      skip_nans=False)
    np.testing.assert_allclose(out2[:, 0], pts[:, 3])


def test_depth_to_colored_pointcloud():
    depth = np.zeros((10, 10), dtype=np.uint16)
    depth[5, 5] = 2000  # 2 m
    color = np.full((10, 10, 3), 128, dtype=np.uint8)
    cloud = depth_to_colored_pointcloud(depth, color, 100, 100, 5, 5)
    assert cloud.shape == (1, 6)
    np.testing.assert_allclose(cloud[0, :3], [0, 0, 2.0], atol=1e-6)
    # float depth in meters
    depthf = np.zeros((4, 4), dtype=np.float32)
    depthf[1, 2] = 3.0
    cloud = depth_to_colored_pointcloud(depthf, np.ones((4, 4, 3)), 10, 10,
                                        2, 2)
    np.testing.assert_allclose(cloud[0, 2], 3.0)


def test_pose_graph_ply(tmp_path):
    est = {(0, 0): (np.eye(3), np.array([0.0, 0, 0])),
           (1, 0): (np.eye(3), np.array([1.0, 2, 3]))}
    path = tmp_path / "graph.ply"
    pose_graph_to_ply(est, str(path))
    text = path.read_text()
    assert "element vertex 2" in text
    assert "1.0000 2.0000 3.0000" in text
