"""Batched sparse stereo correspondence on TPU.

The reference's StereoHandler feeds rectified left/right pairs to
rtabmap, which computes keypoint depth by searching stereo
correspondences along the epipolar (scan) line
(/root/reference/src/front_end/stereo_handler.cpp:196-199 constructs the
stereo SensorData; rtabmap's Stereo::computeCorrespondences does the
per-keypoint disparity search). The TPU-native equivalent is one fused
batched program: every keypoint scores every candidate disparity with
ZNCC in a single (K, D, P) einsum on the VPU/MXU — no per-keypoint host
loop, static shapes throughout.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit,
                   static_argnames=("max_disparity", "patch_radius"))
def stereo_correspondences(left, right, xy, mask, max_disparity=64,
                           patch_radius=4, min_zncc=0.6):
    """Per-keypoint disparity by exhaustive scan-line ZNCC matching.

    Args:
      left, right: (H, W) float32 rectified images (same exposure
        assumed; ZNCC is invariant to affine intensity changes anyway).
      xy: (K, 2) float32 keypoint coordinates (x, y) in the LEFT image.
      mask: (K,) validity of each keypoint.
      max_disparity: static disparity search range [0, max_disparity).
      patch_radius: static half-size of the matching window.
      min_zncc: acceptance threshold on the best normalized correlation.

    Returns:
      disparity: (K,) float32 subpixel disparities (parabola-refined).
      valid: (K,) float32 — 1.0 where the match is accepted (keypoint
        valid, ZNCC above threshold, disparity strictly inside the
        search range, window inside both images).
    """
    H, W = left.shape
    K = xy.shape[0]
    r = patch_radius
    D = max_disparity

    xs = jnp.round(xy[:, 0]).astype(jnp.int32)
    ys = jnp.round(xy[:, 1]).astype(jnp.int32)

    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                          indexing="ij")
    dy = dy.reshape(-1)
    dx = dx.reshape(-1)
    P = dy.shape[0]

    # left patches: (K, P)
    ly = jnp.clip(ys[:, None] + dy[None, :], 0, H - 1)
    lx = jnp.clip(xs[:, None] + dx[None, :], 0, W - 1)
    lp = left[ly, lx]
    lp = lp - jnp.mean(lp, axis=1, keepdims=True)
    ln = jnp.maximum(jnp.linalg.norm(lp, axis=1, keepdims=True), 1e-6)
    lp = lp / ln

    # right candidate patches at x - d: (K, D, P)
    ds = jnp.arange(D, dtype=jnp.int32)
    ry = jnp.clip(ys[:, None, None] + dy[None, None, :], 0, H - 1)
    rx_raw = xs[:, None, None] - ds[None, :, None] + dx[None, None, :]
    rx = jnp.clip(rx_raw, 0, W - 1)
    rp = right[jnp.broadcast_to(ry, (K, D, P)), rx]
    rp = rp - jnp.mean(rp, axis=2, keepdims=True)
    rn = jnp.maximum(jnp.linalg.norm(rp, axis=2, keepdims=True), 1e-6)
    rp = rp / rn

    # ZNCC scores (K, D); candidates whose window leaves the image get -1
    scores = jnp.einsum("kp,kdp->kd", lp, rp)
    window_ok = (rx_raw.min(axis=2) >= 0)
    scores = jnp.where(window_ok, scores, -1.0)

    best = jnp.argmax(scores, axis=1)
    s_best = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]

    # subpixel parabola on (d-1, d, d+1)
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    sm1 = jnp.take_along_axis(scores, bm1[:, None], axis=1)[:, 0]
    sp1 = jnp.take_along_axis(scores, bp1[:, None], axis=1)[:, 0]
    denom = sm1 - 2.0 * s_best + sp1
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (sm1 - sp1) / denom, 0.0)
    disparity = best.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)

    left_window_ok = ((xs - r >= 0) & (xs + r < W) &
                      (ys - r >= 0) & (ys + r < H))
    valid = (mask > 0) & (s_best >= min_zncc) & left_window_ok & \
        (best >= 1) & (best <= D - 2) & (disparity > 0.5)
    return disparity, valid.astype(jnp.float32)


def depth_from_disparity(disparity, valid, fx, baseline):
    """z = fx * b / d, zeroed where the correspondence was rejected."""
    d = jnp.maximum(disparity, 1e-3)
    return jnp.where(valid > 0, fx * baseline / d, 0.0)
