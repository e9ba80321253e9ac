"""CosPlace-style global-descriptor CNN in Flax — the flagship visual
place-recognition model.

Capability parity with the reference's GeoLocalizationNet
(/root/reference/cslam/vpr/cosplace_utils/network.py:30-45: backbone ->
L2Norm -> GeM pooling -> Flatten -> Linear(fc_output_dim) -> L2Norm,
layers.py:12-38) and its runtime wrapper
(/root/reference/cslam/vpr/cosplace.py: center-crop + resize-224 +
ImageNet normalization, random descriptor when the checkpoint is
"disable" — kept for hardware-free tests, cosplace.py:99-101).

TPU-native design: ResNet-18 backbone written in Flax with bfloat16
compute / float32 params (MXU-friendly), fused GeM pooling, one jit for
arbitrary batch sizes. The reference runs ONNX/TensorRT inference per
keyframe on GPU (global_descriptor_component.cpp:63-78); here descriptor
extraction batches across keyframes in a single XLA program.
"""

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class GeM(nn.Module):
    """Generalized-mean pooling with learnable exponent p (layers.py:12-19)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        p = self.param("p", lambda key: jnp.ones((1,)) * 3.0)
        x = jnp.clip(x.astype(jnp.float32), self.eps, None) ** p
        x = jnp.mean(x, axis=(1, 2))
        return x ** (1.0 / p)


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class BasicBlock(nn.Module):
    channels: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, dtype=jnp.float32)
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.strides,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape[-1] != self.channels or self.strides != 1:
            residual = nn.Conv(self.channels, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet18Backbone(nn.Module):
    """ResNet-18 feature extractor (through conv4_x, matching the
    reference's layers_to_crop=[layer4-optional] CosPlace convention of
    keeping a 256/512-dim feature map)."""
    dtype: Any = jnp.bfloat16
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, dtype=jnp.float32)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, width) in enumerate(
                zip(self.stage_sizes, self.widths)):
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = BasicBlock(width, strides, dtype=self.dtype)(x, train)
        return x


class GeoLocalizationNet(nn.Module):
    """backbone -> L2Norm -> GeM -> Linear(fc_output_dim) -> L2Norm."""
    fc_output_dim: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, train: bool = False):
        x = ResNet18Backbone(dtype=self.dtype)(image, train)
        x = l2_normalize(x.astype(jnp.float32), axis=-1)
        x = GeM()(x)
        x = nn.Dense(self.fc_output_dim, dtype=jnp.float32)(x)
        return l2_normalize(x, axis=-1)


def preprocess(images: np.ndarray, crop_size: int = 224) -> np.ndarray:
    """Center-crop to square, resize to 224, ImageNet-normalize
    (reference cosplace.py:68-74 transform). images: (B, H, W, 3) uint8
    or float in [0, 255]."""
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[None]
    b, h, w, _ = images.shape
    side = min(h, w)
    y0 = (h - side) // 2
    x0 = (w - side) // 2
    images = images[:, y0:y0 + side, x0:x0 + side, :].astype(np.float32)
    # nearest-neighbor style strided resize to crop_size (jit-free, host)
    idx_y = np.linspace(0, side - 1, crop_size).astype(np.int32)
    idx_x = np.linspace(0, side - 1, crop_size).astype(np.int32)
    images = images[:, idx_y][:, :, idx_x]
    images = images / 255.0
    return (images - IMAGENET_MEAN) / IMAGENET_STD


class CosPlace:
    """Runtime wrapper with the reference's interface:
    compute_embedding(image) -> np.ndarray descriptor
    (reference cosplace.py:40-101)."""

    def __init__(self, params: dict, node=None, rng_seed: int = 0):
        self.params_dict = params
        self.node = node
        self.fc_output_dim = params.get("frontend.global_descriptor_dim", 64)
        self.crop_size = params.get("frontend.image_crop_size", 224)
        self.checkpoint = params.get("frontend.nn_checkpoint", "disable")
        if self.checkpoint == "shipped":
            # self-trained weights under models/weights/ (zoo docstring);
            # resolves to "" (-> disabled) when the file is absent
            from cslam_tpu.models import zoo
            self.checkpoint = zoo.shipped_checkpoint("cosplace_synth.npz")
        self.enabled = self.checkpoint not in ("", "disable", None)
        self._rng = np.random.default_rng(rng_seed)
        self.model = GeoLocalizationNet(fc_output_dim=self.fc_output_dim)
        if self.enabled:
            self.variables = self._load_checkpoint(self.checkpoint)
        else:
            # random-weight init still allows shape-correct inference
            key = jax.random.PRNGKey(rng_seed)
            dummy = jnp.zeros((1, 224, 224, 3), dtype=jnp.float32)
            self.variables = self.model.init(key, dummy)
        self._apply = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False))

    def _load_checkpoint(self, path):
        with np.load(path, allow_pickle=True) as data:
            flat = {k: jnp.asarray(v) for k, v in data.items()}
        from flax.traverse_util import unflatten_dict
        return unflatten_dict({tuple(k.split("/")): v
                               for k, v in flat.items()})

    def compute_embedding(self, image: np.ndarray) -> np.ndarray:
        """Single-image descriptor. Random unit vector when disabled
        ("only for testing", reference cosplace.py:99-101)."""
        if not self.enabled:
            v = self._rng.standard_normal(self.fc_output_dim)
            return (v / np.linalg.norm(v)).astype(np.float32)
        batch = preprocess(image, self.crop_size)
        out = self._apply(self.variables, jnp.asarray(batch))
        return np.asarray(out[0])

    def compute_embeddings_batch(self, images: np.ndarray) -> np.ndarray:
        """Batched descriptors — the TPU-native path: one XLA program over
        all pending keyframes."""
        if not self.enabled:
            v = self._rng.standard_normal(
                (len(images), self.fc_output_dim))
            return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
                np.float32)
        batch = preprocess(images, self.crop_size)
        return np.asarray(self._apply(self.variables, jnp.asarray(batch)))
