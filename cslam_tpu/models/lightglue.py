"""LightGlue learned feature matcher in Flax — official-architecture
weight-compatible.

The reference fork's signature component: SuperPoint + LightGlue ONNX
matching drives keyframe gating and geometric verification
(rgbd_handler.cpp:317-412 setMatches; the external lightglue_onnx
package). This is the LightGlue architecture (Lindenberger et al. 2023,
cvg/LightGlue) reproduced module-for-module so the officially
distributed checkpoints convert 1:1 (models/convert.convert_lightglue):

- learnable Fourier positional encoding of normalized keypoints applied
  as rotary embedding to q/k in self-attention (posenc.Wr);
- per layer, ONE SelfBlock and ONE CrossBlock shared by both images
  (fused Wqkv with the official (heads, head_dim, 3) unflatten; shared
  to_qk in cross-attention; ffn = Linear(2d,2d) -> LayerNorm -> GELU
  (exact, not tanh-approx) -> Linear(2d,d));
- assignment: final_proj similarity / d^0.25 + per-point matchability,
  combined by sigmoid-log-double-softmax; mutual-argmax extraction with
  the official filter threshold.

Static shapes: fixed keypoint budgets with masks (padded slots are
masked out of every softmax and zeroed in messages; with all-ones masks
the numerics match the official model). Early-exit/pruning heads
(token_confidence) are inference-time optimizations for GPUs with
dynamic shapes — intentionally not used (XLA static shapes; all layers
always run).

With random weights the classical mutual matcher (ops/matching2d.py)
remains the default verification path; `frontend.features: learned`
switches the RGBD handler onto SuperPoint + LightGlue.
"""

from functools import partial
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def normalize_keypoints(kpts, size):
    """Official normalize_keypoints: center at size/2, scale by
    max-extent/2 -> roughly [-1, 1]."""
    size = jnp.asarray(size, jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (kpts - shift[None, :]) / scale


def _rotate_half(x):
    """Interleaved-pair rotation: (x0, x1) -> (-x1, x0)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x1.shape[:-1], -1)


def _apply_rotary(t, cos_rep, sin_rep):
    """t * cos + rotate_half(t) * sin (official apply_cached_rotary_emb).
    t: (K, h, hd); cos_rep/sin_rep: (K, hd) broadcast over heads."""
    return t * cos_rep[:, None, :] + _rotate_half(t) * sin_rep[:, None, :]


class SelfBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, cos_rep, sin_rep, mask):
        d, h = self.dim, self.num_heads
        hd = d // h
        K = x.shape[0]
        qkv = nn.Dense(3 * d, name="Wqkv")(x)
        # official layout: unflatten(-1, (heads, head_dim, 3))
        qkv = qkv.reshape(K, h, hd, 3)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]  # (K, h, hd)
        q = _apply_rotary(q, cos_rep, sin_rep)
        k = _apply_rotary(k, cos_rep, sin_rep)
        logits = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(hd)
        logits = jnp.where(mask[None, None, :] > 0, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        context = jnp.einsum("hqk,khd->qhd", attn, v).reshape(K, d)
        message = nn.Dense(d, name="out_proj")(context)
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * d, name="ffn_0")(y)
        y = nn.LayerNorm(epsilon=1e-5, name="ffn_1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, name="ffn_3")(y)
        return x + y * mask[:, None]


class CrossBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x0, x1, m0, m1):
        d, h = self.dim, self.num_heads
        hd = d // h
        to_qk = nn.Dense(d, name="to_qk")
        to_v = nn.Dense(d, name="to_v")
        to_out = nn.Dense(d, name="to_out")
        ffn_0 = nn.Dense(2 * d, name="ffn_0")
        ffn_1 = nn.LayerNorm(epsilon=1e-5, name="ffn_1")
        ffn_3 = nn.Dense(d, name="ffn_3")

        def heads(t):
            return t.reshape(t.shape[0], h, hd)

        qk0, qk1 = heads(to_qk(x0)), heads(to_qk(x1))
        v0, v1 = heads(to_v(x0)), heads(to_v(x1))
        sim = jnp.einsum("ihd,jhd->hij", qk0, qk1) / jnp.sqrt(hd)
        sim01 = jnp.where(m1[None, None, :] > 0, sim, -1e9)
        sim10 = jnp.where(m0[None, :, None] > 0, sim, -1e9)
        attn01 = jax.nn.softmax(sim01, axis=-1)          # (h, K0, K1)
        attn10 = jax.nn.softmax(sim10, axis=1)           # over K0
        msg0 = jnp.einsum("hij,jhd->ihd", attn01, v1).reshape(-1, d)
        msg1 = jnp.einsum("hij,ihd->jhd", attn10, v0).reshape(-1, d)
        msg0, msg1 = to_out(msg0), to_out(msg1)

        def ffn(x, msg, m):
            y = jnp.concatenate([x, msg], axis=-1)
            y = ffn_3(nn.gelu(ffn_1(ffn_0(y)), approximate=False))
            return x + y * m[:, None]

        return ffn(x0, msg0, m0), ffn(x1, msg1, m1)


class MatchAssignment(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x0, x1, m0, m1, with_aux=False):
        final_proj = nn.Dense(self.dim, name="final_proj")
        matchability = nn.Dense(1, name="matchability")
        mdesc0, mdesc1 = final_proj(x0), final_proj(x1)
        sim = jnp.einsum("id,jd->ij", mdesc0 / self.dim ** 0.25,
                         mdesc1 / self.dim ** 0.25)
        z0 = matchability(x0)[:, 0]
        z1 = matchability(x1)[:, 0]
        valid = (m0[:, None] > 0) & (m1[None, :] > 0)
        sim = jnp.where(valid, sim, -1e9)
        # sigmoid_log_double_softmax (official): log P(match ij)
        certainties = jax.nn.log_sigmoid(z0)[:, None] + \
            jax.nn.log_sigmoid(z1)[None, :]
        scores0 = jax.nn.log_softmax(sim, axis=1)
        scores1 = jax.nn.log_softmax(sim, axis=0)
        scores = scores0 + scores1 + certainties
        scores = jnp.where(valid, scores, -jnp.inf)
        if with_aux:
            # raw matchability logits, for the training loss
            # (unmatched-point supervision needs sigmoid(z) directly)
            return scores, z0, z1
        return scores


class LightGlueNet(nn.Module):
    """Official-topology LightGlue. input_dim == dim -> input_proj is
    identity (as in the superpoint_lightglue checkpoint)."""
    dim: int = 256
    num_layers: int = 9      # official n_layers for superpoint_lightglue
    num_heads: int = 4
    input_dim: int = 256

    @nn.compact
    def __call__(self, desc0, xy0, m0, desc1, xy1, m1, with_aux=False):
        d, h = self.dim, self.num_heads
        hd = d // h
        if self.input_dim != d:
            proj = nn.Dense(d, name="input_proj")
            x0, x1 = proj(desc0), proj(desc1)
        else:
            x0, x1 = desc0, desc1
        # learnable Fourier positional encoding -> rotary cos/sin,
        # repeat_interleave(2) to interleaved-pair layout
        Wr = nn.Dense(hd // 2, use_bias=False, name="posenc_Wr")

        def encode(xy):
            proj = Wr(xy)                      # (K, hd/2)
            cos, sin = jnp.cos(proj), jnp.sin(proj)
            rep = lambda t: jnp.repeat(t, 2, axis=-1)  # (K, hd)
            return rep(cos), rep(sin)

        cos0, sin0 = encode(xy0)
        cos1, sin1 = encode(xy1)
        for i in range(self.num_layers):
            self_blk = SelfBlock(d, h, name=f"transformers_{i}_self_attn")
            cross_blk = CrossBlock(d, h, name=f"transformers_{i}_cross_attn")
            x0 = self_blk(x0, cos0, sin0, m0)
            x1 = self_blk(x1, cos1, sin1, m1)
            x0, x1 = cross_blk(x0, x1, m0, m1)
        return MatchAssignment(d, name="log_assignment")(
            x0, x1, m0, m1, with_aux=with_aux)


class LightGlue:
    """Runtime wrapper exposing mutual_match-compatible matching."""

    def __init__(self, checkpoint: str = "", dim: int = 256,
                 num_layers: int = 9, score_threshold: float = 0.1,
                 input_dim: int = 256, rng_seed: int = 0):
        self.model = LightGlueNet(dim=dim, num_layers=num_layers,
                                  input_dim=input_dim)
        self.score_threshold = score_threshold
        key = jax.random.PRNGKey(rng_seed)
        K = 8
        dummy = (jnp.zeros((K, input_dim)), jnp.zeros((K, 2)), jnp.ones(K),
                 jnp.zeros((K, input_dim)), jnp.zeros((K, 2)), jnp.ones(K))
        if checkpoint and checkpoint != "disable":
            from flax.traverse_util import unflatten_dict
            if checkpoint.endswith((".pth", ".pt", ".tar")):
                # official cvg/LightGlue checkpoint
                import torch
                blob = torch.load(checkpoint, map_location="cpu",
                                  weights_only=False)
                state = blob.get("state_dict", blob) \
                    if isinstance(blob, dict) else blob
                state = {k: v.numpy() if hasattr(v, "numpy") else v
                         for k, v in state.items()}
                from cslam_tpu.models.convert import convert_lightglue
                flat = {k: jnp.asarray(v) for k, v in
                        convert_lightglue(state,
                                          num_layers=num_layers).items()}
            else:
                with np.load(checkpoint, allow_pickle=True) as data:
                    flat = {k: jnp.asarray(v) for k, v in data.items()}
            self.variables = unflatten_dict(
                {tuple(k.split("/")): v for k, v in flat.items()})
        else:
            self.variables = self.model.init(key, *dummy)
        self._apply = jax.jit(
            lambda v, *args: self.model.apply(v, *args))

    def match(self, desc0, xy0, m0, desc1, xy1, m1,
              size: Optional[Any] = None):
        """(idx1_for_0, valid) like ops.matching2d.mutual_match.

        xy are pixel coordinates; `size` (W, H) normalizes them as the
        official model expects. Without a size, keypoint bounds are used.
        """
        xy0 = jnp.asarray(xy0, jnp.float32)
        xy1 = jnp.asarray(xy1, jnp.float32)
        if size is None:
            hi = jnp.maximum(jnp.max(jnp.concatenate([xy0, xy1]), axis=0),
                             1.0)
            size = hi
        xy0 = normalize_keypoints(xy0, size)
        xy1 = normalize_keypoints(xy1, size)
        scores = self._apply(self.variables, jnp.asarray(desc0), xy0,
                             jnp.asarray(m0), jnp.asarray(desc1), xy1,
                             jnp.asarray(m1))
        p = jnp.exp(scores)  # (K0, K1) match probabilities
        best1 = jnp.argmax(p, axis=1)
        best0 = jnp.argmax(p, axis=0)
        mutual = best0[best1] == jnp.arange(p.shape[0])
        top = jnp.max(p, axis=1)
        valid = mutual & (top > self.score_threshold) & \
            (jnp.asarray(m0) > 0)
        return np.asarray(best1, dtype=np.int32), \
            np.asarray(valid, dtype=np.float32)
