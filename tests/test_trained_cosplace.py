"""Quality gates for the shipped self-trained CosPlace weights
(models/weights/cosplace_synth.npz, produced by
models/train_cosplace.py).

The reference's place recognition quality comes from a downloaded
EigenPlaces/CosPlace checkpoint
(/root/reference/cslam/vpr/cosplace.py, models/download.sh); these tests
pin that the shipped self-trained equivalent actually recognizes places
— held-out revisits retrieve the right keyframe, with a real margin over
the untrained network — not just that shapes are right (test_models)."""

import numpy as np
import pytest

from cslam_tpu.models import zoo

CP_CKPT = zoo.shipped_checkpoint("cosplace_synth.npz")

needs_cp = pytest.mark.skipif(not CP_CKPT,
                              reason="no shipped cosplace weights")


@pytest.fixture(scope="module")
def cosplace():
    from cslam_tpu.models.cosplace import CosPlace
    return CosPlace({"frontend.nn_checkpoint": "shipped"})


@needs_cp
def test_wrapper_resolves_shipped_checkpoint(cosplace):
    assert cosplace.enabled
    assert cosplace.checkpoint.endswith("cosplace_synth.npz")


@needs_cp
def test_recall_at_1_on_held_out_world(cosplace):
    """Two displaced views per place on a NEVER-TRAINED world seed: the
    query view's nearest neighbor must be its revisit, and the trained
    model must clearly beat random init on the same probe."""
    from cslam_tpu.models.cosplace import CosPlace, GeoLocalizationNet
    from cslam_tpu.models.train_cosplace import eval_recall

    model = GeoLocalizationNet(fc_output_dim=cosplace.fc_output_dim)
    trained = eval_recall(model, cosplace.variables, seed=31337,
                          n_places=24)
    rand = CosPlace({"frontend.nn_checkpoint": "disable"}, rng_seed=3)
    # build true random-init variables for the same architecture
    baseline = eval_recall(model, rand.variables, seed=31337, n_places=24)
    assert trained >= 0.85, f"recall@1 {trained:.3f}"
    assert trained >= baseline + 0.2, \
        f"trained {trained:.3f} vs random-init {baseline:.3f}"


@needs_cp
def test_same_place_margin(cosplace):
    """Descriptor similarity of a revisit must clearly exceed the best
    wrong-place similarity (the gating criterion loop-closure detection
    applies, frontend/loop_closure_detection.py)."""
    from cslam_tpu.models.train_cosplace import (make_batch, make_world)
    rng = np.random.default_rng(4242)
    world = make_world(777, n=160)
    batch, labels = make_batch(rng, world, 12, 2, 0.3, 0.05, 224)
    # embed through the runtime wrapper path (preprocess already applied
    # by make_batch -> use the raw model apply instead)
    import jax
    import jax.numpy as jnp
    emb = np.asarray(jax.jit(
        lambda v, x: cosplace.model.apply(v, x, train=False))(
            cosplace.variables, jnp.asarray(batch)))
    sim = emb @ emb.T
    np.fill_diagonal(sim, -np.inf)
    same = labels[:, None] == labels[None, :]
    np.fill_diagonal(same, False)
    pos = sim[same].reshape(len(labels), -1).max(axis=1)
    neg = np.where(same, -np.inf, sim).max(axis=1)
    # median margin: positives above hardest negative for most queries
    frac = float((pos > neg).mean())
    assert frac >= 0.8, f"revisit ranked first for only {frac:.2f}"


@needs_cp
def test_loop_closure_detection_with_trained_descriptors(cosplace):
    """E2E: descriptors from the trained CNN drive the actual
    loop-closure detector — a revisit keyframe must match its original
    keyframe, not any other."""
    from cslam_tpu.matching.descriptor_db import DescriptorDatabase
    from cslam_tpu.models.train_cosplace import make_world, render_view

    world = make_world(555, n=160)
    rng = np.random.default_rng(1)
    # trajectory: 6 distinct places, then revisit place 0 displaced
    xys = [(-2.4, -1.8), (-1.2, 0.9), (0.0, -0.6), (1.2, 1.5),
           (2.4, -1.2), (-2.0, 1.8)]
    imgs = [render_view(world, xy, np.random.default_rng(100 + i))
            for i, xy in enumerate(xys)]
    revisit = render_view(world, (-2.32, -1.72), np.random.default_rng(7),
                          jitter_t=0.0, jitter_yaw=0.0)
    embs = cosplace.compute_embeddings_batch(
        np.stack([np.broadcast_to(im[..., None], im.shape + (3,))
                  for im in imgs + [revisit]]))
    db = DescriptorDatabase(dim=embs.shape[1])
    for i, e in enumerate(embs[:-1]):
        db.add_item(e, (0, i))
    best, sim = db.search_best(embs[-1])
    assert best == (0, 0), f"revisit matched keyframe {best} (sim {sim})"


@needs_cp
def test_global_descriptor_component_config_path():
    """The config-driven construction (no explicit model object) must
    build CosPlace from frontend.* params, pick up the shipped weights,
    and publish real CNN descriptors for incoming keyframes — the path
    a YAML-configured deployment takes (config/example.yaml)."""
    from cslam_tpu.comm import messages as msgs
    from cslam_tpu.comm.bus import InProcessBus, InProcessRouter
    from cslam_tpu.frontend.global_descriptor_component import \
        GlobalDescriptorComponent
    from cslam_tpu.models.train_cosplace import make_world, render_view

    router = InProcessRouter()
    bus = InProcessBus(router, 0)
    got = []
    router.subscribe("/r0/cslam/processed_global_descriptor", got.append)
    gdc = GlobalDescriptorComponent(
        {"robot_id": 0, "max_nb_robots": 1,
         "frontend.global_descriptor_technique": "cosplace",
         "frontend.nn_checkpoint": "shipped"}, bus, batch_size=2)
    assert gdc.model.enabled, "config path did not load shipped weights"

    world = make_world(99, n=160)
    rng = np.random.default_rng(0)
    for kid, xy in enumerate([(-1.0, 0.0), (1.5, 1.0)]):
        im = render_view(world, xy, rng)
        bus.publish("cslam/keyframe_data",
                    msgs.KeyframeRGB.from_image(kid, im))
    router.spin_until_idle()
    assert len(got) == 2
    d0, d1 = (np.asarray(m.descriptor) for m in got)
    assert d0.shape == (gdc.model.fc_output_dim,)
    np.testing.assert_allclose(np.linalg.norm(d0), 1.0, atol=1e-4)
    # different places must not collapse to the same descriptor
    assert float(d0 @ d1) < 0.99
