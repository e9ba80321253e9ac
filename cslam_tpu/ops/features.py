"""Visual local features: batched corner detection + patch descriptors.

The reference extracts SuperPoint keypoints + descriptors via ONNX and
matches with LightGlue (rgbd_handler.cpp:263-315, SURVEY §3.5 hot loop
3). Two TPU-native paths here:

- this module: a classical, weight-free pipeline — Shi-Tomasi corner
  response, grid NMS top-k, and orientation-agnostic normalized patch
  descriptors — all as batched convolutions/gathers that jit onto the
  MXU/VPU. It is the hardware-free default (works with no checkpoint,
  like the reference's `nn_checkpoint: disable` test mode) and the
  correspondence generator for geometric verification;
- models/superpoint.py: the SuperPoint CNN architecture in Flax for the
  learned path (checkpoint-loadable).

Static shapes: a fixed keypoint budget per image with validity masks.
"""

import functools

import jax
import jax.numpy as jnp


def _sobel(img):
    """(H, W) -> (gx, gy) via Sobel filters."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
                   dtype=jnp.float32) / 8.0
    ky = kx.T
    img4 = img[None, :, :, None]

    def conv(kernel):
        return jax.lax.conv_general_dilated(
            img4, kernel[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]

    return conv(kx), conv(ky)


def _box_filter(x, radius):
    k = 2 * radius + 1
    kernel = jnp.ones((k, k, 1, 1), dtype=jnp.float32) / (k * k)
    return jax.lax.conv_general_dilated(
        x[None, :, :, None], kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def shi_tomasi_response(img, radius=2):
    """Min-eigenvalue corner response of the structure tensor."""
    gx, gy = _sobel(img.astype(jnp.float32))
    axx = _box_filter(gx * gx, radius)
    ayy = _box_filter(gy * gy, radius)
    axy = _box_filter(gx * gy, radius)
    tr = axx + ayy
    det = axx * ayy - axy * axy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    return tr / 2.0 - disc  # lambda_min


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius",
                                             "border"))
def detect_keypoints(img, max_keypoints=256, nms_radius=4, border=8,
                     min_response=1e-4):
    """Top-k corners after local-max NMS.

    Returns (xy, scores, mask): (K, 2) float32 pixel coordinates (x, y),
    (K,) responses, (K,) validity (padded slots 0)."""
    H, W = img.shape
    resp = shi_tomasi_response(img)
    # non-max suppression via max-pool equality
    k = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (k, k),
                                   (1, 1), "SAME")
    is_max = (resp >= pooled) & (resp > min_response)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (ys >= border) & (ys < H - border) & \
        (xs >= border) & (xs < W - border)
    scores = jnp.where(is_max & in_border, resp, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(scores, max_keypoints)
    yy = (top_idx // W).astype(jnp.float32)
    xx = (top_idx % W).astype(jnp.float32)
    mask = (top_scores > -jnp.inf).astype(jnp.float32)
    xy = jnp.stack([xx, yy], axis=-1)
    return xy, jnp.where(mask > 0, top_scores, 0.0), mask


@functools.partial(jax.jit, static_argnames=("patch_radius",))
def patch_descriptors(img, xy, mask, patch_radius=7):
    """Mean/std-normalized intensity patches as descriptors.

    (K, (2r+1)^2) float32, L2-normalized. Gathers are batched; invalid
    keypoints produce zero descriptors."""
    img = img.astype(jnp.float32)
    H, W = img.shape
    r = patch_radius
    dy = jnp.arange(-r, r + 1)
    dx = jnp.arange(-r, r + 1)
    offy, offx = jnp.meshgrid(dy, dx, indexing="ij")
    ys = jnp.clip(xy[:, 1].astype(jnp.int32)[:, None, None] + offy[None], 0,
                  H - 1)
    xs = jnp.clip(xy[:, 0].astype(jnp.int32)[:, None, None] + offx[None], 0,
                  W - 1)
    patches = img[ys, xs].reshape(xy.shape[0], -1)
    mu = jnp.mean(patches, axis=1, keepdims=True)
    sd = jnp.std(patches, axis=1, keepdims=True)
    desc = (patches - mu) / jnp.maximum(sd, 1e-6)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True),
                              1e-6)
    return desc * mask[:, None]


def extract_features(img, max_keypoints=256):
    """Convenience: keypoints + descriptors in one call."""
    xy, scores, mask = detect_keypoints(img, max_keypoints=max_keypoints)
    desc = patch_descriptors(img, xy, mask)
    return xy, desc, scores, mask


@functools.partial(jax.jit, static_argnames=())
def backproject(xy, depth_at_kp, fx, fy, cx, cy):
    """Pixel + depth -> 3D camera-frame points (rgbd_handler's
    generateKeypoints3D equivalent)."""
    x = (xy[:, 0] - cx) / fx * depth_at_kp
    y = (xy[:, 1] - cy) / fy * depth_at_kp
    return jnp.stack([x, y, depth_at_kp], axis=-1)
