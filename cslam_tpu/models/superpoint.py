"""SuperPoint-architecture keypoint detector + descriptor in Flax.

The reference extracts local features with a SuperPoint ONNX model inside
the LightGlue matcher (rgbd_handler.cpp:292, lightglue_onnx external
package). This is the same architecture TPU-native: VGG-style shared
encoder, detector head (65-way cell softmax incl. dustbin), descriptor
head (256-d, bicubic-upsample-free: descriptors are sampled at keypoint
cells and L2-normalized). Checkpointable; with random weights it still
produces well-formed (if uninformative) features, so the pipeline is
testable without downloads — the classical path (ops/features.py) is the
default when no checkpoint is configured.
"""

from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class SuperPointNet(nn.Module):
    dtype: Any = jnp.bfloat16
    descriptor_dim: int = 256

    @nn.compact
    def __call__(self, image):  # (B, H, W, 1) in [0, 1]
        x = image.astype(self.dtype)
        widths = (64, 64, 128, 128)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype)(x)
            x = nn.relu(x)
            if i < len(widths) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # detector head: 65 = 8x8 cell positions + dustbin
        det = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype)(x)
        det = nn.relu(det)
        det = nn.Conv(65, (1, 1), dtype=jnp.float32)(det)
        # descriptor head
        desc = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype)(x)
        desc = nn.relu(desc)
        desc = nn.Conv(self.descriptor_dim, (1, 1), dtype=jnp.float32)(desc)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return det, desc


def _cell_scores_to_heatmap(det):
    """(B, Hc, Wc, 65) logits -> (B, Hc*8, Wc*8) keypoint probabilities."""
    probs = jax.nn.softmax(det, axis=-1)[..., :64]  # drop dustbin
    B, Hc, Wc, _ = probs.shape
    probs = probs.reshape(B, Hc, Wc, 8, 8)
    probs = jnp.transpose(probs, (0, 1, 3, 2, 4))
    return probs.reshape(B, Hc * 8, Wc * 8)


@partial(jax.jit, static_argnames=("model_apply", "max_keypoints",
                                   "nms_radius"))
def extract(variables, model_apply, image, max_keypoints=256, nms_radius=4,
            score_threshold=0.005):
    """Keypoints + descriptors from a (H, W) grayscale image.

    Returns (xy, desc, scores, mask) with the same contract as
    ops/features.extract_features, so the RGBD handler can swap the
    learned extractor in behind one flag."""
    H, W = image.shape
    det, desc_map = model_apply(variables, image[None, :, :, None])
    heat = _cell_scores_to_heatmap(det)[0, :H, :W]
    k = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(heat, -jnp.inf, jax.lax.max, (k, k),
                                   (1, 1), "SAME")
    is_max = (heat >= pooled) & (heat > score_threshold)
    scores_flat = jnp.where(is_max, heat, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(scores_flat, max_keypoints)
    yy = top_idx // W
    xx = top_idx % W
    mask = (top_scores > -jnp.inf).astype(jnp.float32)
    xy = jnp.stack([xx, yy], axis=-1).astype(jnp.float32)
    # sample descriptors at the keypoint cells (stride 8)
    cy = jnp.clip(yy // 8, 0, desc_map.shape[1] - 1)
    cx = jnp.clip(xx // 8, 0, desc_map.shape[2] - 1)
    desc = desc_map[0, cy, cx]
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True),
                              1e-12)
    return xy, desc * mask[:, None], jnp.where(mask > 0, top_scores, 0.0), \
        mask


class SuperPoint:
    """Runtime wrapper mirroring the classical extractor interface."""

    def __init__(self, checkpoint: str = "", max_keypoints: int = 256,
                 rng_seed: int = 0):
        self.model = SuperPointNet()
        self.max_keypoints = max_keypoints
        key = jax.random.PRNGKey(rng_seed)
        dummy = jnp.zeros((1, 64, 64, 1), dtype=jnp.float32)
        if checkpoint and checkpoint != "disable":
            from flax.traverse_util import unflatten_dict
            if checkpoint.endswith(".onnx"):
                # the checkpoints the reference distributes
                # (models/download.sh -> lightglue_onnx superpoint.onnx)
                from cslam_tpu.models.onnx_import import \
                    convert_superpoint_onnx
                flat = {k: jnp.asarray(v)
                        for k, v in convert_superpoint_onnx(checkpoint).items()}
            elif checkpoint.endswith((".pth", ".pt", ".tar")):
                from cslam_tpu.models.convert import convert_torch_checkpoint
                import tempfile, os
                with tempfile.TemporaryDirectory() as d:
                    npz = os.path.join(d, "w.npz")
                    flat = {k: jnp.asarray(v) for k, v in
                            convert_torch_checkpoint(
                                checkpoint, npz, model="superpoint").items()}
            else:
                with np.load(checkpoint, allow_pickle=True) as data:
                    flat = {k: jnp.asarray(v) for k, v in data.items()}
            self.variables = unflatten_dict(
                {tuple(k.split("/")): v for k, v in flat.items()})
        else:
            self.variables = self.model.init(key, dummy)
        self._apply = lambda v, x: self.model.apply(v, x)

    def extract_features(self, image, max_keypoints=None):
        image = jnp.asarray(
            np.asarray(image, dtype=np.float32) / 255.0
            if np.asarray(image).dtype == np.uint8 else image,
            dtype=jnp.float32)
        if image.ndim == 3:
            image = jnp.mean(image, axis=-1)
        return extract(self.variables, self._apply, image,
                       max_keypoints=max_keypoints or self.max_keypoints)
