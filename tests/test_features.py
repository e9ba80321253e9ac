"""Visual feature pipeline: corner detection, patch descriptors,
mutual matching, RANSAC verification."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import features, matching2d, se3


def checkerboard_image(rng, H=120, W=160, n_squares=8):
    """Textured image with strong corners + noise."""
    img = np.zeros((H, W), dtype=np.float32)
    sq_h, sq_w = H // n_squares, W // n_squares
    for i in range(n_squares):
        for j in range(n_squares):
            if (i + j) % 2 == 0:
                img[i * sq_h:(i + 1) * sq_h, j * sq_w:(j + 1) * sq_w] = 1.0
    img += rng.standard_normal((H, W)).astype(np.float32) * 0.02
    return img


def test_detect_keypoints_on_checkerboard():
    rng = np.random.default_rng(0)
    img = checkerboard_image(rng)
    xy, scores, mask = features.detect_keypoints(jnp.asarray(img),
                                                 max_keypoints=128)
    n = int(mask.sum())
    assert n > 20
    xy = np.asarray(xy)[np.asarray(mask) > 0]
    # corners land near checkerboard grid intersections
    on_grid = 0
    for x, y in xy:
        if (abs((x % 20)) < 3 or abs((x % 20) - 20) < 3) and \
           (abs((y % 15)) < 3 or abs((y % 15) - 15) < 3):
            on_grid += 1
    assert on_grid > len(xy) * 0.5


def test_descriptors_match_same_content():
    rng = np.random.default_rng(1)
    img = checkerboard_image(rng)
    # translated copy
    shift = 6
    img2 = np.roll(img, shift, axis=1)
    xy0, d0, s0, m0 = features.extract_features(jnp.asarray(img))
    xy1, d1, s1, m1 = features.extract_features(jnp.asarray(img2))
    idx1, valid = matching2d.mutual_match(d0, m0, d1, m1,
                                          ratio_threshold=0.95)
    valid = np.asarray(valid)
    assert valid.sum() > 10
    # matched keypoints should be displaced by ~shift in x
    xy0 = np.asarray(xy0)
    xy1 = np.asarray(xy1)
    idx1 = np.asarray(idx1)
    dx = xy1[idx1[valid > 0], 0] - xy0[valid > 0, 0]
    frac_correct = np.mean(np.abs(dx - shift) < 2)
    assert frac_correct > 0.6, f"only {frac_correct:.2f} correct shifts"


def test_ransac_rigid3d_recovers_pose():
    rng = np.random.default_rng(2)
    N = 128
    pts0 = rng.standard_normal((N, 3)).astype(np.float32) * 3.0
    R = np.asarray(se3.so3_exp(jnp.asarray([0.1, -0.2, 0.3],
                                           dtype=jnp.float32)))
    t = np.array([0.5, 1.0, -0.2], dtype=np.float32)
    pts1 = pts0 @ R.T + t
    # corrupt 30% of matches
    n_bad = 38
    pts1_corrupt = pts1.copy()
    pts1_corrupt[:n_bad] += rng.standard_normal((n_bad, 3)) * 5.0
    valid = np.ones(N, dtype=np.float32)
    res = matching2d.ransac_rigid3d(jnp.asarray(pts0),
                                    jnp.asarray(pts1_corrupt),
                                    jnp.asarray(valid),
                                    inlier_threshold=0.2)
    assert bool(res.success)
    assert int(res.num_inliers) >= N - n_bad - 5
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-2)


def test_ransac_fails_on_garbage():
    rng = np.random.default_rng(3)
    pts0 = rng.standard_normal((64, 3)).astype(np.float32)
    pts1 = rng.standard_normal((64, 3)).astype(np.float32) * 4
    res = matching2d.ransac_rigid3d(jnp.asarray(pts0), jnp.asarray(pts1),
                                    jnp.ones(64), inlier_threshold=0.05,
                                    min_inliers=10)
    assert not bool(res.success)


def test_verify_keyframe_pair_end_to_end():
    """Synthetic 'RGBD' pair: same 3D scene observed from two poses with
    shared descriptors + noise."""
    rng = np.random.default_rng(4)
    K = 160
    scene = rng.standard_normal((K, 3)).astype(np.float32) * 2 + \
        np.array([0, 0, 5], dtype=np.float32)
    desc_dim = 64
    descs = rng.standard_normal((K, desc_dim)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)

    R01 = np.asarray(se3.so3_exp(jnp.asarray([0.05, 0.1, -0.05],
                                             dtype=jnp.float32)))
    t01 = np.array([0.3, -0.1, 0.2], dtype=np.float32)
    pts0 = scene
    pts1 = scene @ R01.T + t01  # frame-1 coordinates
    # observation noise on descriptors
    d0 = descs + rng.standard_normal(descs.shape).astype(np.float32) * 0.05
    d1 = descs + rng.standard_normal(descs.shape).astype(np.float32) * 0.05
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    # shuffle image-1 keypoints (matching must recover correspondence)
    perm = rng.permutation(K)
    mask = np.ones(K, dtype=np.float32)
    result, n_matches = matching2d.verify_keyframe_pair(
        jnp.asarray(d0), jnp.asarray(pts0), jnp.asarray(mask),
        jnp.asarray(d1[perm]), jnp.asarray(pts1[perm]), jnp.asarray(mask),
        ratio_threshold=0.99, inlier_threshold=0.1)
    assert int(n_matches) > K * 0.5
    assert bool(result.success)
    np.testing.assert_allclose(np.asarray(result.R), R01, atol=2e-2)
    np.testing.assert_allclose(np.asarray(result.t), t01, atol=5e-2)
