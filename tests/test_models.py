"""Model smoke tests: CosPlace, NetVLAD, SuperPoint — shapes, norms,
disable-mode random descriptors (hardware-free contract)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_cosplace_forward_shape_and_norm():
    from cslam_tpu.models.cosplace import GeoLocalizationNet
    model = GeoLocalizationNet(fc_output_dim=32)
    x = jnp.zeros((2, 64, 64, 3), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0,
                               atol=1e-5)


def test_cosplace_disabled_returns_random_unit():
    from cslam_tpu.models.cosplace import CosPlace
    cp = CosPlace({"frontend.nn_checkpoint": "disable",
                   "frontend.global_descriptor_dim": 16})
    d1 = cp.compute_embedding(np.zeros((10, 10, 3)))
    d2 = cp.compute_embedding(np.zeros((10, 10, 3)))
    assert d1.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(d1), 1.0, atol=1e-5)
    assert not np.allclose(d1, d2)  # random per call (reference semantics)


def test_cosplace_preprocess():
    from cslam_tpu.models.cosplace import preprocess
    img = np.random.default_rng(0).integers(
        0, 255, (100, 140, 3)).astype(np.uint8)
    out = preprocess(img, crop_size=224)
    assert out.shape == (1, 224, 224, 3)
    assert np.abs(out).max() < 5  # normalized


def test_netvlad_layer_shape():
    from cslam_tpu.models.netvlad import NetVLADLayer
    layer = NetVLADLayer(num_clusters=8, dim=16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4, 16)),
                    dtype=jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (2, 8 * 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0,
                               atol=1e-5)


def test_netvlad_disabled_random():
    from cslam_tpu.models.netvlad import NetVLAD
    nv = NetVLAD({"frontend.nn_checkpoint": "disable",
                  "frontend.global_descriptor_dim": 8})
    d = nv.compute_embedding(np.zeros((10, 10, 3)))
    assert d.shape == (8,)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-5)


def test_superpoint_extract_contract():
    from cslam_tpu.models.superpoint import SuperPoint
    sp = SuperPoint(max_keypoints=64)
    img = np.random.default_rng(2).integers(
        0, 255, (96, 128)).astype(np.uint8)
    xy, desc, scores, mask = sp.extract_features(img)
    assert xy.shape == (64, 2) and desc.shape[0] == 64
    n = int(np.asarray(mask).sum())
    if n:
        valid_desc = np.asarray(desc)[np.asarray(mask) > 0]
        np.testing.assert_allclose(np.linalg.norm(valid_desc, axis=1), 1.0,
                                   atol=1e-4)
        xy_np = np.asarray(xy)[np.asarray(mask) > 0]
        assert np.all(xy_np[:, 0] < 128) and np.all(xy_np[:, 1] < 96)
