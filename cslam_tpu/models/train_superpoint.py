"""Self-training of the SuperPoint detector/descriptor on synthetic
shapes (models/synthetic_shapes.py).

The reference distributes pre-trained SuperPoint ONNX weights
(/root/reference/models/download.sh); with no network access the
equivalent functional capability is trained here from scratch:

- detector head: 65-way per-cell cross-entropy against exact corner
  positions of rendered primitives (the MagicPoint stage of DeTone et
  al. 2018);
- descriptor head: InfoNCE over cell pairs of a homography-warped image
  pair — each corner cell's descriptor must pick out its warped
  counterpart against every other valid cell (cells within 8 px of the
  target are excluded from the negative set as near-duplicates). This
  replaces the paper's hinge loss, which plateaued without producing
  distinctive descriptors at this step budget.

Run (CPU is fine for the small config; TPU trains the full one in
minutes):

    python -m cslam_tpu.models.train_superpoint \
        --steps 1500 --batch 16 --height 64 --width 96 \
        --out cslam_tpu/models/weights/superpoint_synth.npz

The output .npz loads directly via SuperPoint(checkpoint=<path>)
(models/superpoint.py flat "params/..." key scheme).
"""

import argparse
import functools
import os
import sys
import time

import numpy as np


def _batch(rng, n, H, W, background="gradient", real_ds=None,
           real_mix=0.0):
    """Host-side batch: images, cell labels for both views, the warp
    grid correspondence (cell-center positions of view 0 mapped into
    view 1), and a validity mask for view-1 cells.

    real_ds/real_mix: blend homographic-adaptation pseudo-labeled REAL
    image pairs (models/homographic_adaptation.RealPseudoDataset) into
    the synthetic stream — the self-supervised route that avoids the
    measured 'synthetic labels suppress real corners' trap (round 4)."""
    from cslam_tpu.models.synthetic_shapes import make_pair_sample
    im0 = np.zeros((n, H, W, 1), np.float32)
    im1 = np.zeros((n, H, W, 1), np.float32)
    Hc, Wc = H // 8, W // 8
    lab0 = np.zeros((n, Hc, Wc), np.int32)
    lab1 = np.zeros((n, Hc, Wc), np.int32)
    warped_centers = np.zeros((n, Hc * Wc, 2), np.float32)
    valid1 = np.zeros((n, Hc, Wc), np.float32)
    # detector-loss weights: 1 everywhere except dustbin-labeled cells
    # whose BACKGROUND has its own (unlabeled) corner structure — those
    # must not teach suppression (synthetic_shapes.background_corner_cells)
    det_w0 = np.ones((n, Hc, Wc), np.float32)
    det_w1 = np.ones((n, Hc, Wc), np.float32)
    cy, cx = np.mgrid[0:Hc, 0:Wc]
    centers = np.stack([cx.ravel() * 8 + 4, cy.ravel() * 8 + 4],
                       axis=1).astype(np.float32)
    from cslam_tpu.models.synthetic_shapes import apply_homography
    for i in range(n):
        if real_ds is not None and rng.random() < real_mix:
            s = real_ds.sample_pair(rng, H, W)
        else:
            s = make_pair_sample(rng, H, W, background=background)
        im0[i, :, :, 0] = s["img0"]
        im1[i, :, :, 0] = s["img1"]
        lab0[i] = s["labels0"]
        lab1[i] = s["labels1"]
        warped_centers[i] = apply_homography(s["H"], centers)
        # a view-1 cell is usable when its center came from inside the
        # source image (warp validity map, subsampled at cell centers)
        v = s["valid1"][4::8, 4::8]
        valid1[i] = v[:Hc, :Wc]
        ig0 = s["ignore0"][:Hc, :Wc]
        ig1 = s["ignore1"][:Hc, :Wc]
        det_w0[i] = np.where((lab0[i] >= 64) & ig0, 0.0, 1.0)
        det_w1[i] = np.where((lab1[i] >= 64) & ig1, 0.0, 1.0)
    return im0, im1, lab0, lab1, warped_centers, valid1, det_w0, det_w1


def build_train_step(model, lr, steps, desc_weight=1.0):
    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))

    def detector_loss(det_logits, labels, cell_valid, pos_weight=2.0):
        # (B, Hc, Wc, 65) vs (B, Hc, Wc); dustbin-heavy, so corner cells
        # get a modest extra weight
        logp = jax.nn.log_softmax(det_logits, axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None],
                                 axis=-1)[..., 0]
        w = jnp.where(labels < 64, pos_weight, 1.0) * cell_valid
        return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def descriptor_loss(desc0, desc1, labels0, warped_centers, valid1,
                        temp=0.1):
        # desc*: (B, Hc, Wc, D) already L2-normalized by the model.
        # InfoNCE with corner cells of view 0 as anchors: the positive is
        # the view-1 cell whose center is nearest the warped anchor
        # center; other cells within 8 px of the target are ambiguous
        # near-duplicates and masked out of the negative set.
        B, Hc, Wc, D = desc0.shape
        C = Hc * Wc
        d0 = desc0.reshape(B, C, D)
        d1 = desc1.reshape(B, C, D)
        sim = jnp.einsum("bid,bjd->bij", d0, d1) / temp     # (B, C, C)
        cy, cx = jnp.mgrid[0:Hc, 0:Wc]
        centers1 = jnp.stack([cx.ravel() * 8 + 4, cy.ravel() * 8 + 4],
                             axis=1).astype(jnp.float32)     # (C, 2)
        dist = jnp.linalg.norm(
            warped_centers[:, :, None, :] - centers1[None, None, :, :],
            axis=-1)                                          # (B, C, C)
        j_star = jnp.argmin(dist, axis=2)                     # (B, C)
        d_min = jnp.min(dist, axis=2)
        v1 = valid1.reshape(B, C)
        is_pos = jax.nn.one_hot(j_star, C, dtype=bool)        # (B, C, C)
        # anchor usable: a corner cell whose warp target is a valid,
        # nearby view-1 cell
        corner0 = (labels0.reshape(B, C) < 64)
        pos_ok = corner0 & (d_min <= 6.0) & \
            (jnp.take_along_axis(v1, j_star, axis=1) > 0)
        # denominator: the positive + every valid cell farther than 8 px
        keep = is_pos | ((dist > 8.0) & (v1[:, None, :] > 0))
        logits = jnp.where(keep, sim, -1e9)
        ll = jnp.take_along_axis(sim, j_star[:, :, None],
                                 axis=2)[..., 0] - \
            jax.nn.logsumexp(logits, axis=2)
        w = pos_ok.astype(jnp.float32)
        return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)

    @jax.jit
    def train_step(params, opt_state, batch):
        im0, im1, lab0, lab1, wc, v1, dw0, dw1 = batch

        def loss_fn(p):
            det0, desc0 = model.apply(p, im0)
            det1, desc1 = model.apply(p, im1)
            ld = detector_loss(det0, lab0, dw0) + \
                detector_loss(det1, lab1, v1 * dw1)
            ldesc = descriptor_loss(desc0, desc1, lab0, wc, v1)
            return ld + desc_weight * ldesc, (ld, ldesc)

        (loss, (ld, ldesc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, ld, ldesc

    return tx, train_step


def save_params(params, path):
    from flax.traverse_util import flatten_dict
    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(params).items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--desc-weight", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--init-from", default="",
                    help="warm-start from an existing .npz checkpoint")
    ap.add_argument("--background", default="gradient",
                    choices=["gradient", "black", "texture", "photo",
                             "mixed"],
                    help="background distribution (round-4 domain "
                         "widening: 'mixed' adds black/texture/real-"
                         "photo canvases to the original gradient)")
    ap.add_argument("--real-mix", type=float, default=0.0,
                    help="fraction of each batch drawn from homographic-"
                         "adaptation pseudo-labeled REAL images")
    ap.add_argument("--real-warps", type=int, default=48,
                    help="homography warps aggregated per pseudo-label")
    ap.add_argument("--out", default="cslam_tpu/models/weights/"
                                     "superpoint_synth.npz")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache", "train"))
    import jax.numpy as jnp
    from cslam_tpu.models.superpoint import SuperPointNet

    model = SuperPointNet(dtype=jnp.float32)
    rng = np.random.default_rng(args.seed)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((1, args.height, args.width, 1)))
    if args.init_from:
        from flax.traverse_util import unflatten_dict
        with np.load(args.init_from) as data:
            params = unflatten_dict({tuple(k.split("/")): jnp.asarray(v)
                                     for k, v in data.items()})
        print("warm-started from", args.init_from, flush=True)
    real_ds = None
    if args.real_mix > 0:
        from cslam_tpu.models.homographic_adaptation import \
            RealPseudoDataset
        print("building homographic-adaptation pseudo-labels "
              f"({args.real_warps} warps/image)...", flush=True)
        real_ds = RealPseudoDataset(model.apply, params, rng=rng,
                                    n_warps=args.real_warps)
        print("pseudo-corner counts per source image:",
              real_ds.corner_counts(), flush=True)
    tx, train_step = build_train_step(model, args.lr, args.steps,
                                      desc_weight=args.desc_weight)
    opt_state = tx.init(params)

    t0 = time.time()
    for step in range(args.steps):
        batch = _batch(rng, args.batch, args.height, args.width,
                       background=args.background, real_ds=real_ds,
                       real_mix=args.real_mix)
        params, opt_state, loss, ld, ldesc = train_step(
            params, opt_state, tuple(map(jnp.asarray, batch)))
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step} loss {float(loss):.4f} det "
                  f"{float(ld):.4f} desc {float(ldesc):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    save_params(params, args.out)
    print("saved", args.out, flush=True)


if __name__ == "__main__":
    sys.exit(main())
