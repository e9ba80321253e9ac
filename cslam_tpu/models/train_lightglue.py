"""Self-training of the LightGlue matcher on synthetic correspondence
problems.

The reference fetches a pre-trained superpoint_lightglue ONNX checkpoint
(/root/reference/models/download.sh); with no network access, a compact
LightGlue (same architecture, fewer layers) is trained here on synthetic
matching tasks:

- two views share n_inlier true points; each view sees a noisy copy of
  the point's unit descriptor plus independent outlier points;
- view-1 keypoints are view-0 keypoints through a random homography
  (so positional consensus carries signal for the rotary self-attention),
  outliers are placed uniformly;
- supervision is the official LightGlue loss: NLL of the ground-truth
  assignment under the sigmoid-log-double-softmax scores plus
  matchability BCE on unmatched points.

The trained weights sharpen mutual-argmax matching far beyond raw
descriptor cosine similarity at high descriptor-noise levels, which is
exactly the regime geometric verification cares about (weak single-view
descriptors, strong joint consensus).

Run:
    python -m cslam_tpu.models.train_lightglue \
        --steps 1200 --batch 16 --layers 3 \
        --out cslam_tpu/models/weights/lightglue_synth.npz

Load with LightGlue(checkpoint=<path>, num_layers=3) or via config
`frontend.lightglue_checkpoint` + `frontend.lightglue_layers: 3`.
"""

import argparse
import os
import sys
import time

import numpy as np


def make_match_batch(rng, batch, K=96, D=256, H=120, W=160,
                     noise_lo=0.4, noise_hi=0.95):
    """Synthetic matching problems.

    Descriptor corruption: d = unit(sqrt(1-s^2) z + s u) with unit noise
    u, so two noisy copies of the same point have expected cosine
    ~(1-s^2) regardless of D. s near 1 puts matched-pair similarity at
    the random-pair noise floor (~1/sqrt(D)) — the regime where joint
    consensus (what LightGlue learns) beats per-pair cosine.

    Returns (desc0, xy0, m0, desc1, xy1, m1, gt1_for_0, matched0,
    matched1): gt1_for_0[i] = index in view 1 matched to view-0 point i
    (or -1), matched* are {0,1} masks.
    """
    from cslam_tpu.models.synthetic_shapes import (apply_homography,
                                                   random_homography)
    desc0 = np.zeros((batch, K, D), np.float32)
    desc1 = np.zeros((batch, K, D), np.float32)
    xy0 = np.zeros((batch, K, 2), np.float32)
    xy1 = np.zeros((batch, K, 2), np.float32)
    gt = np.full((batch, K), -1, np.int32)

    def unit(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True),
                              1e-9)

    for b in range(batch):
        n_in = int(rng.integers(K // 4, 3 * K // 4))
        sigma = rng.uniform(noise_lo, noise_hi)
        z = unit(rng.standard_normal((n_in, D)).astype(np.float32))
        p0 = np.stack([rng.uniform(5, W - 5, K),
                       rng.uniform(5, H - 5, K)], axis=1).astype(np.float32)
        Hm = random_homography(rng, H, W)
        p1_in = apply_homography(Hm, p0[:n_in]) + \
            rng.normal(0, 0.5, (n_in, 2)).astype(np.float32)
        # inliers whose warp leaves the frame become unmatched outliers
        inside = (p1_in[:, 0] >= 0) & (p1_in[:, 0] < W) & \
                 (p1_in[:, 1] >= 0) & (p1_in[:, 1] < H)
        p1 = np.stack([rng.uniform(5, W - 5, K),
                       rng.uniform(5, H - 5, K)], axis=1).astype(np.float32)
        # scatter the surviving inliers into random view-1 slots
        slots = rng.permutation(K)[: int(inside.sum())]
        p1[slots] = p1_in[inside]
        d0 = unit(rng.standard_normal((K, D)).astype(np.float32))
        d1 = unit(rng.standard_normal((K, D)).astype(np.float32))
        signal = np.sqrt(max(1.0 - sigma ** 2, 0.0))

        def noisy(base):
            u = unit(rng.standard_normal(base.shape).astype(np.float32))
            return unit(signal * base + sigma * u)

        d0[:n_in] = noisy(z)
        d1[slots] = noisy(z[inside])
        gt[b, np.nonzero(inside)[0]] = slots
        desc0[b], desc1[b], xy0[b], xy1[b] = d0, d1, p0, p1
    m = np.ones((batch, K), np.float32)
    matched0 = (gt >= 0).astype(np.float32)
    matched1 = np.zeros((batch, K), np.float32)
    for b in range(batch):
        matched1[b, gt[b][gt[b] >= 0]] = 1.0
    return desc0, xy0, m, desc1, xy1, m, gt, matched0, matched1


def build_real_match_pool(superpoint, rng, n_pairs=256, K=96, H=120,
                          W=160, match_px=3.0):
    """Real-patch homography matching problems (round-4 verdict item 4):
    crops of the offline real photographs and their homography warps,
    featurized by the DEPLOYED SuperPoint — so LightGlue continues on
    the true descriptor distribution it sees at runtime instead of the
    abstract unit-vector noise model. Ground-truth matches = mutual
    nearest under the homography within match_px.

    Returns a tuple of stacked arrays in make_match_batch's exact
    layout, to be sampled as training batches."""
    from cslam_tpu.models.homographic_adaptation import \
        default_source_images
    from cslam_tpu.models.synthetic_shapes import (apply_homography,
                                                   random_homography,
                                                   warp_image)
    images = [im for im in default_source_images()
              if im.shape[0] >= H + 8 and im.shape[1] >= W + 8]
    out = {k: [] for k in ("d0", "p0", "m0", "d1", "p1", "m1", "gt",
                           "mt0", "mt1")}
    while len(out["d0"]) < n_pairs:
        img = images[int(rng.integers(len(images)))]
        y0 = int(rng.integers(0, img.shape[0] - H + 1))
        x0 = int(rng.integers(0, img.shape[1] - W + 1))
        crop = np.ascontiguousarray(img[y0:y0 + H, x0:x0 + W])
        crop = np.clip(crop * rng.uniform(0.85, 1.15) +
                       rng.uniform(-0.06, 0.06), 0, 1).astype(np.float32)
        Hm = random_homography(rng, H, W)
        warped, _ = warp_image(crop, Hm)
        warped = np.clip(warped * rng.uniform(0.8, 1.2) +
                         rng.uniform(-0.08, 0.08) +
                         0.02 * rng.standard_normal((H, W)),
                         0, 1).astype(np.float32)
        xy0, d0, _, m0 = (np.asarray(a) for a in
                          superpoint.extract_features(crop,
                                                      max_keypoints=K))
        xy1, d1, _, m1 = (np.asarray(a) for a in
                          superpoint.extract_features(warped,
                                                      max_keypoints=K))
        if m0.sum() < K // 4 or m1.sum() < K // 4:
            continue
        w0 = apply_homography(Hm, xy0)
        dist = np.linalg.norm(w0[:, None] - xy1[None], axis=-1)
        dist = np.where((m0[:, None] > 0) & (m1[None] > 0), dist, np.inf)
        nn1 = dist.argmin(1)
        nn0 = dist.argmin(0)
        gt = np.full(K, -1, np.int32)
        for i in range(K):
            j = nn1[i]
            if dist[i, j] < match_px and nn0[j] == i:
                gt[i] = j
        if (gt >= 0).sum() < 8:
            continue
        mt0 = (gt >= 0).astype(np.float32)
        mt1 = np.zeros(K, np.float32)
        mt1[gt[gt >= 0]] = 1.0
        for k, v in zip(("d0", "p0", "m0", "d1", "p1", "m1", "gt",
                         "mt0", "mt1"),
                        (d0, xy0, m0, d1, xy1, m1, gt, mt0, mt1)):
            out[k].append(v)
    return tuple(np.stack(out[k]) for k in
                 ("d0", "p0", "m0", "d1", "p1", "m1", "gt", "mt0",
                  "mt1"))


def sample_pool_batch(pool, rng, batch):
    idx = rng.integers(0, len(pool[0]), size=batch)
    return tuple(arr[idx] for arr in pool)


def build_train_step(model, lr, steps, H=120, W=160):
    import jax
    import jax.numpy as jnp
    import optax
    from cslam_tpu.models.lightglue import normalize_keypoints

    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    size = jnp.asarray([W, H], jnp.float32)

    def pair_loss(params, d0, p0, m0, d1, p1, m1, gt, mt0, mt1):
        scores, z0, z1 = model.apply(
            params, d0, normalize_keypoints(p0, size), m0,
            d1, normalize_keypoints(p1, size), m1, with_aux=True)
        # NLL of GT matches: gather scores[i, gt[i]] where gt >= 0
        gt_safe = jnp.maximum(gt, 0)
        ll = jnp.take_along_axis(scores, gt_safe[:, None], axis=1)[:, 0]
        n_pos = jnp.maximum(jnp.sum(mt0), 1.0)
        loss_pos = -jnp.sum(ll * mt0) / n_pos
        # matchability BCE on unmatched points: want sigmoid(z) -> 0
        un0 = (1.0 - mt0) * m0
        un1 = (1.0 - mt1) * m1
        loss_un = -(jnp.sum(jax.nn.log_sigmoid(-z0) * un0) +
                    jnp.sum(jax.nn.log_sigmoid(-z1) * un1)) / \
            jnp.maximum(jnp.sum(un0) + jnp.sum(un1), 1.0)
        return loss_pos + 0.5 * loss_un

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            losses = jax.vmap(
                lambda *args: pair_loss(p, *args))(*batch)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, train_step


def eval_matching(model, params, rng, n_pairs=32, K=96, sigma=0.6,
                  H=120, W=160, threshold=0.1):
    """Precision/recall of mutual-argmax matches at one noise level,
    compared with raw-descriptor mutual matching."""
    import jax
    import jax.numpy as jnp
    from cslam_tpu.models.lightglue import normalize_keypoints
    size = jnp.asarray([W, H], jnp.float32)
    batch = make_match_batch(rng, n_pairs, K=K, noise_lo=sigma,
                             noise_hi=sigma, H=H, W=W)
    d0, p0, m0, d1, p1, m1, gt, mt0, mt1 = map(jnp.asarray, batch)

    @jax.jit
    def run(d0, p0, m0, d1, p1, m1):
        return jax.vmap(lambda a, b, c, x, y, z: model.apply(
            params, a, normalize_keypoints(b, size), c,
            x, normalize_keypoints(y, size), z))(d0, p0, m0, d1, p1, m1)

    scores = np.asarray(run(d0, p0, m0, d1, p1, m1))
    p = np.exp(scores)
    gt = np.asarray(gt)
    stats = {"tp": 0, "fp": 0, "pos": int((gt >= 0).sum())}
    raw = {"tp": 0, "fp": 0}
    for b in range(n_pairs):
        best1 = p[b].argmax(axis=1)
        best0 = p[b].argmax(axis=0)
        mutual = best0[best1] == np.arange(p.shape[1])
        conf = p[b].max(axis=1) > threshold
        sel = mutual & conf
        stats["tp"] += int((sel & (best1 == gt[b]) & (gt[b] >= 0)).sum())
        stats["fp"] += int((sel & (best1 != gt[b])).sum())
        # raw-descriptor mutual matching baseline
        sim = np.asarray(d0[b]) @ np.asarray(d1[b]).T
        rb1 = sim.argmax(axis=1)
        rb0 = sim.argmax(axis=0)
        rmut = rb0[rb1] == np.arange(sim.shape[0])
        raw["tp"] += int((rmut & (rb1 == gt[b]) & (gt[b] >= 0)).sum())
        raw["fp"] += int((rmut & (rb1 != gt[b])).sum())
    out = {}
    for name, s in (("lightglue", stats), ("raw", raw)):
        n_sel = s["tp"] + s["fp"]
        out[name] = {"precision": s["tp"] / max(n_sel, 1),
                     "recall": s["tp"] / max(stats["pos"], 1)}
    return out


def save_params(params, path):
    from flax.traverse_util import flatten_dict
    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(params).items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--keypoints", type=int, default=96)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--init-from", default="",
                    help="warm-start from an existing .npz checkpoint")
    ap.add_argument("--noise-lo", type=float, default=0.4)
    ap.add_argument("--noise-hi", type=float, default=0.95)
    ap.add_argument("--real-mix", type=float, default=0.0,
                    help="fraction of batches drawn from the real-patch "
                         "SuperPoint pair pool")
    ap.add_argument("--real-pairs", type=int, default=256,
                    help="pool size of precomputed real pairs")
    ap.add_argument("--superpoint", default="",
                    help="SuperPoint checkpoint used to featurize the "
                         "real pairs (default: shipped)")
    ap.add_argument("--out", default="cslam_tpu/models/weights/"
                                     "lightglue_synth.npz")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache", "train"))
    import jax.numpy as jnp
    from cslam_tpu.models.lightglue import LightGlueNet

    model = LightGlueNet(num_layers=args.layers)
    rng = np.random.default_rng(args.seed)
    K = args.keypoints
    dummy = (jnp.zeros((K, 256)), jnp.zeros((K, 2)), jnp.ones(K),
             jnp.zeros((K, 256)), jnp.zeros((K, 2)), jnp.ones(K))
    params = model.init(jax.random.PRNGKey(args.seed), *dummy)
    if args.init_from:
        from flax.traverse_util import unflatten_dict
        with np.load(args.init_from) as data:
            params = unflatten_dict({tuple(k.split("/")): jnp.asarray(v)
                                     for k, v in data.items()})
        print("warm-started from", args.init_from, flush=True)
    pool = None
    if args.real_mix > 0:
        from cslam_tpu.models import zoo
        from cslam_tpu.models.superpoint import SuperPoint
        sp_ckpt = args.superpoint or \
            zoo.shipped_checkpoint("superpoint_synth.npz")
        sp = SuperPoint(checkpoint=sp_ckpt, max_keypoints=K)
        print(f"building {args.real_pairs} real SuperPoint pairs from "
              f"{sp_ckpt}...", flush=True)
        pool = build_real_match_pool(sp, rng, n_pairs=args.real_pairs,
                                     K=K)
        print(f"pool ready: mean matches/pair "
              f"{float(pool[7].sum(1).mean()):.1f}", flush=True)
    tx, train_step = build_train_step(model, args.lr, args.steps)
    opt_state = tx.init(params)

    t0 = time.time()
    for step in range(args.steps):
        if pool is not None and rng.random() < args.real_mix:
            batch = sample_pool_batch(pool, rng, args.batch)
        else:
            batch = make_match_batch(rng, args.batch, K=K,
                                     noise_lo=args.noise_lo,
                                     noise_hi=args.noise_hi)
        jb = tuple(map(jnp.asarray, batch))
        params, opt_state, loss = train_step(params, opt_state, jb)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if step % 300 == 299 or step == args.steps - 1:
            for sig in (0.6, 0.85):
                ev = eval_matching(model, params,
                                   np.random.default_rng(1234), K=K,
                                   sigma=sig)
                print(f"  eval@sigma={sig}: "
                      f"lg P={ev['lightglue']['precision']:.3f} "
                      f"R={ev['lightglue']['recall']:.3f} | raw "
                      f"P={ev['raw']['precision']:.3f} "
                      f"R={ev['raw']['recall']:.3f}", flush=True)
    save_params(params, args.out)
    print("saved", args.out, flush=True)


if __name__ == "__main__":
    sys.exit(main())
