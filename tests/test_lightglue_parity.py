"""LightGlueNet weight-compatibility with the official cvg/LightGlue
layout: a torch clone using the official module names and forward math
(the same structure torch.load gives for the distributed checkpoints) is
converted via convert_lightglue and must produce the same assignment
scores. This is the offline stand-in for loading the real
superpoint_lightglue checkpoint (reference rgbd_handler.cpp:317-412)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import unflatten_dict  # noqa: E402

from cslam_tpu.models import convert  # noqa: E402
from cslam_tpu.models.lightglue import (LightGlue, LightGlueNet,  # noqa: E402
                                        normalize_keypoints)

DIM, HEADS, LAYERS, K = 64, 4, 2, 12
HD = DIM // HEADS


def rotate_half(x):
    x = x.unflatten(-1, (-1, 2))
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).flatten(start_dim=-2)


def apply_rot(freqs, t):
    return t * freqs[0] + rotate_half(t) * freqs[1]


class Posenc(nn.Module):
    def __init__(self):
        super().__init__()
        self.Wr = nn.Linear(2, HD // 2, bias=False)

    def forward(self, x):
        projected = self.Wr(x)
        cosines, sines = torch.cos(projected), torch.sin(projected)
        emb = torch.stack([cosines, sines], 0).unsqueeze(-3)
        return emb.repeat_interleave(2, dim=-1)


def make_ffn():
    return nn.Sequential(nn.Linear(2 * DIM, 2 * DIM),
                         nn.LayerNorm(2 * DIM, elementwise_affine=True),
                         nn.GELU(), nn.Linear(2 * DIM, DIM))


class SelfBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.Wqkv = nn.Linear(DIM, 3 * DIM)
        self.out_proj = nn.Linear(DIM, DIM)
        self.ffn = make_ffn()

    def forward(self, x, encoding):
        qkv = self.Wqkv(x)
        qkv = qkv.unflatten(-1, (HEADS, -1, 3)).transpose(1, 2)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q = apply_rot(encoding, q)
        k = apply_rot(encoding, k)
        attn = torch.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(HD)
        attn = F.softmax(attn, dim=-1)
        context = torch.einsum("bhij,bhjd->bhid", attn, v)
        message = self.out_proj(
            context.transpose(1, 2).flatten(start_dim=-2))
        return x + self.ffn(torch.cat([x, message], -1))


class CrossBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.to_qk = nn.Linear(DIM, DIM)
        self.to_v = nn.Linear(DIM, DIM)
        self.to_out = nn.Linear(DIM, DIM)
        self.ffn = make_ffn()

    def forward(self, x0, x1):
        def heads(t):
            return t.unflatten(-1, (HEADS, -1)).transpose(1, 2)

        qk0, qk1 = heads(self.to_qk(x0)), heads(self.to_qk(x1))
        v0, v1 = heads(self.to_v(x0)), heads(self.to_v(x1))
        sim = torch.einsum("bhid,bhjd->bhij", qk0, qk1) / math.sqrt(HD)
        attn01 = F.softmax(sim, dim=-1)
        attn10 = F.softmax(sim.transpose(-2, -1).contiguous(), dim=-1)
        m0 = torch.einsum("bhij,bhjd->bhid", attn01, v1)
        m1 = torch.einsum("bhji,bhjd->bhid", attn10.transpose(-2, -1), v0)
        m0 = self.to_out(m0.transpose(1, 2).flatten(start_dim=-2))
        m1 = self.to_out(m1.transpose(1, 2).flatten(start_dim=-2))
        x0 = x0 + self.ffn(torch.cat([x0, m0], -1))
        x1 = x1 + self.ffn(torch.cat([x1, m1], -1))
        return x0, x1


class Transformer(nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = SelfBlock()
        self.cross_attn = CrossBlock()

    def forward(self, x0, x1, enc0, enc1):
        x0 = self.self_attn(x0, enc0)
        x1 = self.self_attn(x1, enc1)
        return self.cross_attn(x0, x1)


class MatchAssignment(nn.Module):
    def __init__(self):
        super().__init__()
        self.matchability = nn.Linear(DIM, 1)
        self.final_proj = nn.Linear(DIM, DIM)

    def forward(self, d0, d1):
        m0 = self.final_proj(d0) / DIM ** 0.25
        m1 = self.final_proj(d1) / DIM ** 0.25
        sim = torch.einsum("bmd,bnd->bmn", m0, m1)
        z0, z1 = self.matchability(d0), self.matchability(d1)
        cert = F.logsigmoid(z0) + F.logsigmoid(z1).transpose(1, 2)
        s0 = F.log_softmax(sim, 2)
        s1 = F.log_softmax(sim.transpose(-1, -2).contiguous(),
                           2).transpose(-1, -2)
        return s0 + s1 + cert


class TorchLightGlue(nn.Module):
    """Official topology + names (cvg/LightGlue, input_proj=identity)."""

    def __init__(self):
        super().__init__()
        self.posenc = Posenc()
        self.transformers = nn.ModuleList(
            [Transformer() for _ in range(LAYERS)])
        self.log_assignment = nn.ModuleList(
            [MatchAssignment() for _ in range(LAYERS)])

    def forward(self, desc0, kpts0, desc1, kpts1):
        enc0, enc1 = self.posenc(kpts0), self.posenc(kpts1)
        x0, x1 = desc0, desc1
        for layer in self.transformers:
            x0, x1 = layer(x0, x1, enc0, enc1)
        return self.log_assignment[-1](x0, x1)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    desc0 = rng.standard_normal((K, DIM)).astype(np.float32)
    desc1 = rng.standard_normal((K, DIM)).astype(np.float32)
    xy0 = rng.uniform(-1, 1, (K, 2)).astype(np.float32)
    xy1 = rng.uniform(-1, 1, (K, 2)).astype(np.float32)
    return desc0, xy0, desc1, xy1


def test_scores_match_official_torch(pair):
    desc0, xy0, desc1, xy1 = pair
    torch.manual_seed(3)
    ref = TorchLightGlue().eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(desc0)[None],
                   torch.from_numpy(xy0)[None],
                   torch.from_numpy(desc1)[None],
                   torch.from_numpy(xy1)[None])[0].numpy()

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    flat = convert.convert_lightglue(state, num_layers=LAYERS)
    variables = unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
    model = LightGlueNet(dim=DIM, num_layers=LAYERS, num_heads=HEADS,
                         input_dim=DIM)
    got = np.asarray(model.apply(
        variables, jnp.asarray(desc0), jnp.asarray(xy0), jnp.ones(K),
        jnp.asarray(desc1), jnp.asarray(xy1), jnp.ones(K)))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_padding_mask_does_not_change_valid_scores(pair):
    """Padded keypoint slots must not perturb real slots' scores —
    the static-shape contract."""
    desc0, xy0, desc1, xy1 = pair
    model = LightGlueNet(dim=DIM, num_layers=LAYERS, num_heads=HEADS,
                         input_dim=DIM)
    import jax
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(desc0),
                           jnp.asarray(xy0), jnp.ones(K),
                           jnp.asarray(desc1), jnp.asarray(xy1),
                           jnp.ones(K))
    full = np.asarray(model.apply(
        variables, jnp.asarray(desc0), jnp.asarray(xy0), jnp.ones(K),
        jnp.asarray(desc1), jnp.asarray(xy1), jnp.ones(K)))
    # pad each side with garbage rows, masked out
    pad = 5
    rng = np.random.default_rng(7)
    d0p = np.concatenate([desc0, 100 * rng.standard_normal(
        (pad, DIM)).astype(np.float32)])
    d1p = np.concatenate([desc1, 100 * rng.standard_normal(
        (pad, DIM)).astype(np.float32)])
    xy0p = np.concatenate([xy0, np.zeros((pad, 2), np.float32)])
    xy1p = np.concatenate([xy1, np.zeros((pad, 2), np.float32)])
    m = np.concatenate([np.ones(K), np.zeros(pad)]).astype(np.float32)
    padded = np.asarray(model.apply(
        variables, jnp.asarray(d0p), jnp.asarray(xy0p), jnp.asarray(m),
        jnp.asarray(d1p), jnp.asarray(xy1p), jnp.asarray(m)))
    np.testing.assert_allclose(padded[:K, :K], full, atol=1e-4)


def test_match_wrapper_finds_identity_with_converted_weights(pair):
    """End-to-end wrapper: with converted (random) weights, matching a
    descriptor set against itself must return the identity under mutual
    argmax — structural sanity that survives any weights."""
    desc0, xy0, _, _ = pair
    torch.manual_seed(5)
    ref = TorchLightGlue().eval()
    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    flat = convert.convert_lightglue(state, num_layers=LAYERS)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "lg.npz")
        convert.save_npz(flat, path)
        lg = LightGlue(checkpoint=path, dim=DIM, num_layers=LAYERS,
                       input_dim=DIM, score_threshold=0.0)
        idx, valid = lg.match(desc0, xy0, np.ones(K), desc0, xy0,
                              np.ones(K))
    assert valid.sum() > 0
    np.testing.assert_array_equal(idx[valid > 0],
                                  np.arange(K)[valid > 0])


def test_normalize_keypoints():
    kpts = np.array([[0, 0], [640, 480]], np.float32)
    out = np.asarray(normalize_keypoints(jnp.asarray(kpts),
                                         jnp.asarray([640.0, 480.0])))
    np.testing.assert_allclose(out[0], [-1.0, -0.75])
    np.testing.assert_allclose(out[1], [1.0, 0.75])


def _warped_pair(rng, n=64, dim=64, noise=0.05, outliers=8):
    """Synthetic correspondence problem: image-1 keypoints are a warped
    permutation of image-0's with descriptor noise; last `outliers` of
    image 1 are unrelated."""
    desc0 = rng.standard_normal((n, dim)).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=1, keepdims=True)
    perm = rng.permutation(n)
    desc1 = desc0[perm] + noise * rng.standard_normal(
        (n, dim)).astype(np.float32)
    desc1 /= np.linalg.norm(desc1, axis=1, keepdims=True)
    out_rows = rng.standard_normal((outliers, dim)).astype(np.float32)
    desc1[n - outliers:] = out_rows / np.linalg.norm(out_rows, axis=1,
                                                     keepdims=True)
    xy0 = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    # similarity warp of the true correspondences
    th = 0.3
    R = np.array([[math.cos(th), -math.sin(th)],
                  [math.sin(th), math.cos(th)]], np.float32)
    xy1 = xy0[perm] @ R.T * 1.1 + np.array([5.0, -3.0], np.float32)
    gt = np.full(n, -1, np.int64)
    for j, i in enumerate(perm):          # desc1[j] corresponds to desc0[i]
        if j < n - outliers:
            gt[i] = j
    return desc0, xy0, desc1, xy1, gt


def _precision_recall(idx, valid, gt):
    pred = np.flatnonzero(valid > 0)
    if len(pred) == 0:
        return 0.0, 0.0
    correct = sum(1 for i in pred if gt[i] == idx[i])
    recall = correct / max((gt >= 0).sum(), 1)
    return correct / len(pred), recall


def test_matcher_quality_harness_on_warped_pairs():
    """Quality harness (VERDICT round-1 #3): mutual-NN matching must be
    near-perfect on distinctive warped pairs; the same harness runs the
    LightGlue path so trained weights can be regression-checked the day
    they are provided (random weights carry no quality expectation —
    their numbers are only reported)."""
    from cslam_tpu.ops.matching2d import mutual_match
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    desc0, xy0, desc1, xy1, gt = _warped_pair(rng)
    n = len(desc0)
    idx, valid = mutual_match(jnp.asarray(desc0), jnp.ones(n),
                              jnp.asarray(desc1), jnp.ones(n),
                              ratio_threshold=1.0)
    p, r = _precision_recall(np.asarray(idx), np.asarray(valid), gt)
    assert p > 0.95 and r > 0.9, f"mutual matcher degraded: P={p} R={r}"

    lg = LightGlue(dim=DIM, num_layers=2, input_dim=DIM,
                   score_threshold=0.0)
    idx_lg, valid_lg = lg.match(desc0, xy0, np.ones(n), desc1, xy1,
                                np.ones(n))
    p_lg, r_lg = _precision_recall(idx_lg, valid_lg, gt)
    # random weights: structural output only; record, don't gate
    print(f"lightglue(random) P={p_lg:.2f} R={r_lg:.2f} "
          f"vs mutual P={p:.2f} R={r:.2f}")
    assert idx_lg.shape == (n,) and valid_lg.shape == (n,)
