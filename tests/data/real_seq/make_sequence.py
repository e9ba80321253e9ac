#!/usr/bin/env python
"""Generate the checked-in miniature real-image KITTI-layout sequence.

Source imagery: matplotlib's bundled `grace_hopper.jpg` — the official
1984 US Navy portrait of RADM Grace Hopper, a PUBLIC DOMAIN photograph
(work of a US federal employee; the same image ships in Pillow's and
TensorFlow's test suites). REAL pixels: the point of this sequence is
exercising the perception stack on real photographic statistics rather
than the synthetic_shapes rendering distribution it was trained on.

Camera model: a camera translating parallel to a planar scene at
constant depth Z observes pure image translation — so sliding a
256x192 crop window across the photograph IS the exact image formation
for that motion (shift dx_px = fx * t_x / Z). The trajectory is a
rectangular loop whose last two frames revisit the first two (4 px
offset), giving ground-truth loop closures. Everything a consumer
needs (frames, times.txt, calib.txt with a P2/P3 rectified pair,
ground-truth poses.txt, constant scene depth) is written in KITTI
odometry layout.

Run from the repo root:  python tests/data/real_seq/make_sequence.py
"""

import json
import os

import numpy as np
from PIL import Image

OUT = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(os.path.dirname(np.__file__), "..", "matplotlib",
                   "mpl-data", "sample_data", "grace_hopper.jpg")

W, H = 256, 192          # crop / frame size
FX = FY = 200.0          # pinhole focal (px)
CX, CY = W / 2.0, H / 2.0
Z = 2.0                  # scene plane depth (m)
BASELINE = 0.1           # synthetic rectified-pair baseline (m)
FPS = 10.0

# crop-window origins (x, y) in the full image; rectangular loop with a
# 4 px-offset revisit of frames 0/1 at the end
TRAJ = [(20, 100), (60, 100), (100, 100), (140, 100), (180, 100),
        (220, 100), (220, 180), (220, 260), (180, 260), (140, 260),
        (100, 260), (60, 260), (20, 260), (20, 180),
        (24, 104), (64, 104)]

# Robot B (written to ../real_seq_b, SAME world frame anchored at
# TRAJ[0]): retraces robot A's bottom row in the opposite direction at
# a 4 px offset (inter-robot loop-closure overlap), explores an
# exclusive row the A-loop never sees, then revisits its own first two
# frames (intra-robot closures). Powers the 2-robot real-pixel mission
# (benchmarks/real_seq_mission_bench.py).
TRAJ_B = [(224, 264), (184, 264), (144, 264), (104, 264), (64, 264),
          (24, 264),
          (24, 340), (64, 340), (104, 340), (144, 340), (184, 340),
          (224, 340),
          (228, 268), (188, 268)]


def write_sequence(out_dir, traj, full, revisits):
    """One KITTI-layout sequence from crop origins `traj`. Poses are in
    the COMMON world frame anchored at TRAJ[0] so multi-robot missions
    can evaluate ATE without alignment."""
    img_dir = os.path.join(out_dir, "image_2")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i, (x, y) in enumerate(traj):
        crop = full[y:y + H, x:x + W]
        # JPEG q92: ~8x smaller than PNG for photographic content; each
        # sequence stays well under 200 kB checked in
        Image.fromarray(crop).save(
            os.path.join(img_dir, f"{i:06d}.jpg"), quality=92)
        # camera pose (camera-to-world, world = camera A0's frame):
        # identity rotation, t = ((x - x0)/fx * Z, (y - y0)/fy * Z, 0)
        tx = (x - TRAJ[0][0]) / FX * Z
        ty = (y - TRAJ[0][1]) / FY * Z
        rows.append([1, 0, 0, tx, 0, 1, 0, ty, 0, 0, 1, 0])

    np.savetxt(os.path.join(out_dir, "poses.txt"), np.asarray(rows),
               fmt="%.6e")
    np.savetxt(os.path.join(out_dir, "times.txt"),
               np.arange(len(traj)) / FPS, fmt="%.6f")
    with open(os.path.join(out_dir, "calib.txt"), "w") as f:
        for label, tx_p in (("P0", 0.0), ("P1", -FX * BASELINE),
                            ("P2", 0.0), ("P3", -FX * BASELINE)):
            P = [FX, 0.0, CX, tx_p, 0.0, FY, CY, 0.0, 0.0, 0.0, 1.0, 0.0]
            f.write(label + ": " + " ".join(f"{v:.6e}" for v in P) + "\n")
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"source": "matplotlib grace_hopper.jpg (public "
                             "domain, 1984 US Navy portrait)",
                   "scene_depth_m": Z, "frame_size": [W, H],
                   "revisits": revisits,
                   "crop_origins": traj}, f, indent=2)
    print(f"wrote {len(traj)} frames to {img_dir}")


def main():
    full = np.asarray(Image.open(SRC).convert("RGB"), dtype=np.uint8)
    write_sequence(OUT, TRAJ, full, {"14": 0, "15": 1})
    write_sequence(os.path.join(os.path.dirname(OUT), "real_seq_b"),
                   TRAJ_B, full, {"12": 0, "13": 1})


if __name__ == "__main__":
    main()
