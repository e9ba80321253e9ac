"""Shipped model checkpoints.

The reference downloads pre-trained ONNX checkpoints at install time
(/root/reference/models/download.sh). This repo instead ships compact
self-trained weights (models/train_superpoint.py,
models/train_lightglue.py — trained on synthetic geometry, see those
modules) under models/weights/ so `frontend.features: learned` is
functional out of the box. Externally trained checkpoints (official
SuperPoint/LightGlue .pth or .onnx) always take precedence when
configured explicitly.
"""

import os

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "weights")

# the shipped lightglue_synth.npz is trained at this depth; configs that
# point at an external checkpoint use their own frontend.lightglue_layers
SHIPPED_LIGHTGLUE_LAYERS = 3


def shipped_checkpoint(name: str) -> str:
    """Absolute path of a shipped weights file, or "" when absent."""
    path = os.path.join(WEIGHTS_DIR, name)
    return path if os.path.exists(path) else ""
