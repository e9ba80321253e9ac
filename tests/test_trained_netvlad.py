"""Quality gates for the shipped self-trained NetVLAD weights
(models/weights/netvlad_synth.npz + netvlad_pca_synth.npz, produced by
models/train_netvlad.py) — the NetVLAD counterpart of
test_trained_cosplace.py.

NetVLAD is the alternative place-recognition technique
(frontend.global_descriptor_technique: netvlad; reference
/root/reference/cslam/vpr/netvlad.py downloads a Pittsburgh-trained
checkpoint + WPCA). Note the random-init bar is HIGH here: VLAD pooling
over random VGG features is already a strong descriptor (measured
recall@1 ~0.85), so the gates require near-perfect recall rather than a
large margin over random init."""

import numpy as np
import pytest

from cslam_tpu.models import zoo

NV_CKPT = zoo.shipped_checkpoint("netvlad_synth.npz")
NV_PCA = zoo.shipped_checkpoint("netvlad_pca_synth.npz")

needs_nv = pytest.mark.skipif(not NV_CKPT,
                              reason="no shipped netvlad weights")


@pytest.fixture(scope="module")
def netvlad():
    from cslam_tpu.models.netvlad import NetVLAD
    return NetVLAD({"frontend.nn_checkpoint": "shipped"})


@needs_nv
def test_wrapper_resolves_shipped_checkpoint_and_pca(netvlad):
    assert netvlad.enabled
    assert netvlad.checkpoint.endswith("netvlad_synth.npz")
    assert netvlad.pca_components is not None, \
        "shipped PCA projection not picked up"


@needs_nv
def test_recall_at_1_on_held_out_world(netvlad):
    """Both views of every held-out place must retrieve each other
    through the FULL deploy path (preprocess -> VGG -> VLAD -> PCA)."""
    from cslam_tpu.models.train_cosplace import make_batch, make_world

    hits = total = 0
    for w in range(3):
        rng = np.random.default_rng(31337 + w)
        world = make_world(31337 + 17 * w, n=160)
        # raw uint8-style renders; the wrapper does its own preprocess
        from cslam_tpu.models.train_netvlad import eval_recall  # noqa: F401
        imgs, labels = [], []
        from cslam_tpu.models.train_cosplace import (render_view,
                                                     sample_places)
        places = sample_places(rng, 16)
        for pid, xy in enumerate(places):
            for _ in range(2):
                g = int(rng.integers(2**31))
                im = render_view(world, xy, np.random.default_rng(g),
                                 jitter_t=0.35, jitter_yaw=0.06)
                imgs.append(np.broadcast_to(im[..., None],
                                            im.shape + (3,)))
                labels.append(pid)
        emb = netvlad.compute_embeddings_batch(np.stack(imgs))
        labels = np.asarray(labels)
        sim = emb @ emb.T
        np.fill_diagonal(sim, -np.inf)
        top1 = sim.argmax(axis=1)
        hits += int((labels[top1] == labels).sum())
        total += len(labels)
    recall = hits / total
    assert recall >= 0.9, f"recall@1 {recall:.3f}"


@needs_nv
def test_pca_preserves_ranking(netvlad):
    """The shipped 128-d PCA projection must keep revisit ranking: the
    projected descriptor's nearest neighbor matches the full 32768-d
    descriptor's for >=80% of queries."""
    import jax
    import jax.numpy as jnp
    from cslam_tpu.models.cosplace import preprocess
    from cslam_tpu.models.train_cosplace import (make_world, make_batch)

    rng = np.random.default_rng(777)
    world = make_world(888, n=160)
    batch, labels = make_batch(rng, world, 12, 2, 0.3, 0.05,
                               netvlad.crop_size)
    full = np.asarray(jax.jit(
        lambda v, x: netvlad.model.apply(v, x))(
            netvlad.variables, jnp.asarray(batch)))
    proj = (full - netvlad.pca_mean) @ netvlad.pca_components.T
    proj = proj / np.maximum(
        np.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
    for emb_name, emb in (("full", full), ("proj", proj)):
        sim = emb @ emb.T
        np.fill_diagonal(sim, -np.inf)
        if emb_name == "full":
            full_top1 = sim.argmax(axis=1)
        else:
            proj_top1 = sim.argmax(axis=1)
    agree = float((full_top1 == proj_top1).mean())
    assert agree >= 0.8, f"PCA changed top-1 for {1-agree:.2f} of queries"
