"""TUM RGB-D layout ingestion: real color + real metric depth files.

The reference RGBDHandler consumes independently-stamped image and depth
streams through an ApproximateTimeSynchronizer
(/root/reference/src/front_end/rgbd_handler.cpp:180-186). TumRgbdSequence
is the dataset-directory form of that contract: rgb/ + depth/ PNG streams
with listings, nearest-stamp association, uint16 depth decoded to meters.

The fixture re-encodes the checked-in REAL photographic sequence
(tests/data/real_seq, see test_real_pixels.py) into the TUM layout —
including a genuine uint16 depth image per frame and deliberately
offset depth stamps — so these tests exercise real pixels and the
association logic, then run the full handler verification through the
TUM path.
"""

import os

import numpy as np
import pytest

from cslam_tpu.models import zoo
from cslam_tpu.utils.image_sequence import (KittiOdometrySequence,
                                            TumRgbdSequence, open_sequence)

SEQ_DIR = os.path.join(os.path.dirname(__file__), "data", "real_seq")
Z = 2.0  # matches real_seq meta scene_depth_m


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """real_seq re-encoded as a TUM RGB-D directory."""
    from PIL import Image

    from cslam_tpu.utils.datasets import save_tum_trajectory

    src = KittiOdometrySequence(SEQ_DIR)
    root = tmp_path_factory.mktemp("tum_seq")
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rgb_rows, depth_rows = [], []
    base = 1311868164.0  # epoch-style stamps, the TUM convention
    for i in range(len(src)):
        stamp = base + 0.1 * i
        # depth stamped 8 ms off rgb: association must still pair them
        dstamp = stamp + 0.008
        rgb_name = f"rgb/{stamp:.6f}.png"
        depth_name = f"depth/{dstamp:.6f}.png"
        Image.fromarray(src.frame(i)).save(root / rgb_name)
        h, w = src.frame(i).shape[:2]
        depth_u16 = np.full((h, w), int(Z * 5000), np.uint16)
        depth_u16[0, 0] = 0  # TUM invalid-depth convention
        Image.fromarray(depth_u16).save(root / depth_name)
        rgb_rows.append(f"{stamp:.6f} {rgb_name}")
        depth_rows.append(f"{dstamp:.6f} {depth_name}")
    (root / "rgb.txt").write_text(
        "# color images\n# timestamp filename\n" + "\n".join(rgb_rows))
    (root / "depth.txt").write_text(
        "# depth images\n# timestamp filename\n" + "\n".join(depth_rows))
    R, t = src.poses
    save_tum_trajectory(str(root / "groundtruth.txt"),
                        base + 0.1 * np.arange(len(src)), R, t)
    return str(root)


def test_tum_reader_parses_and_associates(tum_dir):
    seq = open_sequence(tum_dir)
    assert isinstance(seq, TumRgbdSequence)
    assert len(seq) == 16  # every rgb frame found its depth within 20 ms
    assert seq.stamp(1) - seq.stamp(0) == pytest.approx(0.1)
    img = seq.frame(0)
    assert img.shape == (192, 256, 3) and img.dtype == np.uint8
    d = seq.depth(0)
    assert d.dtype == np.float32
    assert d[5, 5] == pytest.approx(Z, abs=1e-3)  # uint16/5000 -> meters
    assert d[0, 0] == 0.0  # invalid stays 0
    intr = seq.intrinsics()
    assert intr.fx == 525.0 and intr.cx == 319.5  # Freiburg default
    stamps, R, t = seq.trajectory
    assert len(stamps) == 16 and R.shape == (16, 3, 3)


def test_tum_association_drops_unmatched(tum_dir):
    # a tight window keeps nothing (depth is 8 ms off on every frame)
    with pytest.raises(ValueError):
        TumRgbdSequence(tum_dir, max_dt=0.005)
    # a 10 ms window keeps everything
    assert len(TumRgbdSequence(tum_dir, max_dt=0.010)) == 16


@pytest.mark.skipif(not zoo.shipped_checkpoint("superpoint_synth.npz"),
                    reason="no shipped weights")
def test_handler_revisit_through_tum_path(tum_dir):
    """Real frames + TUM-decoded real depth images -> verified revisit
    with the metrically correct pose (frame 14 revisits frame 0 at a
    [0.04, 0.04, 0] m offset; see test_real_pixels.py)."""
    from cslam_tpu.comm import messages as msgs
    from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
    from cslam_tpu.frontend.rgbd_handler import RGBDHandler

    seq = TumRgbdSequence(tum_dir)
    src = KittiOdometrySequence(SEQ_DIR)  # poses + calibrated intrinsics
    R, t = src.poses
    router = InProcessRouter()
    bus = InProcessBus(router, 0)
    handler = RGBDHandler({"robot_id": 0, "max_nb_robots": 1,
                           "frontend.features": "learned",
                           "frontend.pnp_min_inliers": 30},
                          bus, ManualClock(), max_keypoints=128)
    for i in range(len(seq)):
        handler.add_sensor_data(seq.frame(i), seq.depth(i),
                                src.intrinsics(), (R[i], t[i]))
        assert handler.process_new_sensor_data() == i
    results = []
    bus.subscribe("cslam/intra_robot_loop_closure", results.append)
    bus.publish("cslam/local_keyframe_match",
                msgs.LocalKeyframeMatch(keyframe0_id=0, keyframe1_id=14))
    router.spin_until_idle()
    assert len(results) == 1 and results[0].success
    Rr = R[0].T @ R[14]
    tr = R[0].T @ (t[14] - t[0])
    Re = np.asarray(results[0].pose[0]) @ Rr.T
    angle = np.arccos(np.clip((np.trace(Re) - 1.0) / 2.0, -1.0, 1.0))
    assert angle < 0.05
    assert np.linalg.norm(np.asarray(results[0].pose[1]) - tr) < 0.08
