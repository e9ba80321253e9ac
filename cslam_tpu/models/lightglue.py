"""LightGlue-style learned feature matcher in Flax.

The reference fork's signature component: SuperPoint + LightGlue ONNX
matching drives keyframe gating and geometric verification
(rgbd_handler.cpp:317-412 setMatches; the external lightglue_onnx
package). This is the LightGlue architecture (Lindenberger et al. 2023)
TPU-native:

- 2D rotary positional encoding of keypoint locations applied to
  queries/keys in self-attention;
- alternating self- and cross-attention blocks over the two keypoint
  sets, residual MLPs on the concatenated message;
- final assignment: dual-softmax similarity scaled by per-point
  matchability, mutual-argmax extraction with a score threshold.

Checkpoint-loadable; with random weights the classical mutual matcher
(ops/matching2d.py) remains the default verification path — the
interfaces are interchangeable (match(desc0, xy0, mask0, ...) returns
(idx1, valid) like mutual_match).

All shapes static: fixed keypoint budgets with masks; attention masks
padded slots to -inf.
"""

from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def rotary_2d(xy, dim, theta_max=1000.0):
    """2D rotary embedding angles: (K, dim/4) per coordinate."""
    n_freq = dim // 4
    freqs = theta_max ** (-jnp.arange(n_freq) / max(n_freq - 1, 1))
    ang_x = xy[..., 0:1] * freqs[None, :]
    ang_y = xy[..., 1:2] * freqs[None, :]
    return jnp.concatenate([ang_x, ang_y], axis=-1)  # (K, dim/2)


def apply_rotary(x, angles):
    """Rotate feature pairs by angles: x (..., K, dim), angles (K, dim/2)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    out = jnp.empty_like(x)
    out = out.at[..., 0::2].set(x1 * cos - x2 * sin)
    out = out.at[..., 1::2].set(x1 * sin + x2 * cos)
    return out


class Attention(nn.Module):
    dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x_q, x_kv, mask_q, mask_kv, angles_q=None,
                 angles_kv=None):
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, name="q")(x_q)
        k = nn.Dense(self.dim, name="k")(x_kv)
        v = nn.Dense(self.dim, name="v")(x_kv)
        if angles_q is not None:
            q = apply_rotary(q, angles_q)
            k = apply_rotary(k, angles_kv)
        Kq, Kk = q.shape[0], k.shape[0]
        q = q.reshape(Kq, self.num_heads, head_dim)
        k = k.reshape(Kk, self.num_heads, head_dim)
        v = v.reshape(Kk, self.num_heads, head_dim)
        logits = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(head_dim)
        logits = jnp.where(mask_kv[None, None, :] > 0, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hqk,khd->qhd", attn, v).reshape(Kq, self.dim)
        return nn.Dense(self.dim, name="proj")(out) * mask_q[:, None]


class GlueBlock(nn.Module):
    """One LightGlue layer: self-attention then cross-attention, each
    followed by a residual MLP on [x | message]."""
    dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x0, x1, xy0, xy1, m0, m1):
        ang0 = rotary_2d(xy0, self.dim)
        ang1 = rotary_2d(xy1, self.dim)
        # self attention (with positions)
        s0 = Attention(self.dim, self.num_heads, name="self_attn0")(
            x0, x0, m0, m0, ang0, ang0)
        s1 = Attention(self.dim, self.num_heads, name="self_attn1")(
            x1, x1, m1, m1, ang1, ang1)
        x0 = x0 + nn.Dense(self.dim, name="self_mlp0_out")(nn.gelu(
            nn.Dense(2 * self.dim, name="self_mlp0_in")(
                jnp.concatenate([x0, s0], axis=-1))))
        x1 = x1 + nn.Dense(self.dim, name="self_mlp1_out")(nn.gelu(
            nn.Dense(2 * self.dim, name="self_mlp1_in")(
                jnp.concatenate([x1, s1], axis=-1))))
        # cross attention (no positions)
        c0 = Attention(self.dim, self.num_heads, name="cross_attn0")(
            x0, x1, m0, m1)
        c1 = Attention(self.dim, self.num_heads, name="cross_attn1")(
            x1, x0, m1, m0)
        x0 = x0 + nn.Dense(self.dim, name="cross_mlp0_out")(nn.gelu(
            nn.Dense(2 * self.dim, name="cross_mlp0_in")(
                jnp.concatenate([x0, c0], axis=-1))))
        x1 = x1 + nn.Dense(self.dim, name="cross_mlp1_out")(nn.gelu(
            nn.Dense(2 * self.dim, name="cross_mlp1_in")(
                jnp.concatenate([x1, c1], axis=-1))))
        return x0, x1


class LightGlueNet(nn.Module):
    dim: int = 256
    num_layers: int = 6
    num_heads: int = 4

    @nn.compact
    def __call__(self, desc0, xy0, m0, desc1, xy1, m1):
        x0 = nn.Dense(self.dim, name="input_proj0")(desc0)
        x1 = nn.Dense(self.dim, name="input_proj1")(desc1)
        for layer in range(self.num_layers):
            x0, x1 = GlueBlock(self.dim, self.num_heads,
                               name=f"layer_{layer}")(x0, x1, xy0, xy1,
                                                      m0, m1)
        # assignment head
        f0 = nn.Dense(self.dim, name="final_proj0")(x0)
        f1 = nn.Dense(self.dim, name="final_proj1")(x1)
        sim = jnp.einsum("id,jd->ij", f0, f1) / jnp.sqrt(self.dim)
        sim = jnp.where((m0[:, None] > 0) & (m1[None, :] > 0), sim, -1e9)
        z0 = jax.nn.sigmoid(nn.Dense(1, name="match0")(x0))[:, 0]
        z1 = jax.nn.sigmoid(nn.Dense(1, name="match1")(x1))[:, 0]
        # dual softmax scaled by matchability (LightGlue eq. 8)
        scores = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=0)
        scores = scores * z0[:, None] * z1[None, :]
        return scores


class LightGlue:
    """Runtime wrapper exposing mutual_match-compatible matching."""

    def __init__(self, checkpoint: str = "", dim: int = 256,
                 num_layers: int = 6, score_threshold: float = 0.1,
                 rng_seed: int = 0):
        self.model = LightGlueNet(dim=dim, num_layers=num_layers)
        self.score_threshold = score_threshold
        key = jax.random.PRNGKey(rng_seed)
        K = 8
        dummy = (jnp.zeros((K, 256)), jnp.zeros((K, 2)), jnp.ones(K),
                 jnp.zeros((K, 256)), jnp.zeros((K, 2)), jnp.ones(K))
        if checkpoint and checkpoint != "disable":
            from flax.traverse_util import unflatten_dict
            with np.load(checkpoint, allow_pickle=True) as data:
                flat = {k: jnp.asarray(v) for k, v in data.items()}
            self.variables = unflatten_dict(
                {tuple(k.split("/")): v for k, v in flat.items()})
        else:
            self.variables = self.model.init(key, *dummy)
        self._apply = jax.jit(
            lambda v, *args: self.model.apply(v, *args))

    def match(self, desc0, xy0, m0, desc1, xy1, m1):
        """(idx1_for_0, valid) like ops.matching2d.mutual_match."""
        scores = self._apply(self.variables, jnp.asarray(desc0),
                             jnp.asarray(xy0), jnp.asarray(m0),
                             jnp.asarray(desc1), jnp.asarray(xy1),
                             jnp.asarray(m1))
        best1 = jnp.argmax(scores, axis=1)
        best0 = jnp.argmax(scores, axis=0)
        mutual = best0[best1] == jnp.arange(scores.shape[0])
        top = jnp.max(scores, axis=1)
        valid = mutual & (top > self.score_threshold) & \
            (jnp.asarray(m0) > 0)
        return np.asarray(best1, dtype=np.int32), \
            np.asarray(valid, dtype=np.float32)
