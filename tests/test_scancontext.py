"""Scan Context: descriptor semantics vs a NumPy re-derivation of the
reference algorithm, rotation-invariant matching."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import scancontext as sc_ops
from cslam_tpu.matching.scancontext_matching import ScanContextMatching


def reference_sc(ptcloud, shape=(20, 60), max_length=80.0):
    """Straight NumPy port of ptcloud2sc semantics for verification."""
    num_ring, num_sector = shape
    gap_ring = max_length / num_ring
    gap_sector = 360.0 / num_sector
    sc = np.zeros(shape)
    for p in ptcloud:
        if np.any(np.isnan(p)):
            continue
        x, y, z = p
        if x == 0.0:
            x = 0.001
        if y == 0.0:
            y = 0.001
        theta = np.degrees(np.arctan2(y, x)) % 360.0
        r = np.sqrt(x * x + y * y)
        ring = min(int(r // gap_ring), num_ring - 1)
        sector = min(int(theta // gap_sector), num_sector - 1)
        sc[ring, sector] = max(sc[ring, sector], z + 2.0)
    return sc


def random_cloud(rng, n=500):
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    pts[:, :2] *= 20.0
    pts[:, 2] *= 2.0
    return pts


def test_sc_matches_reference_semantics():
    rng = np.random.default_rng(0)
    pts = random_cloud(rng)
    mask = np.ones(len(pts), dtype=np.float32)
    ours = np.asarray(
        sc_ops.pointcloud_to_scancontext(jnp.asarray(pts),
                                         jnp.asarray(mask)))
    ref = reference_sc(pts)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sc_handles_nan_and_padding():
    rng = np.random.default_rng(1)
    pts = random_cloud(rng, 100)
    pts[10] = np.nan
    padded = np.concatenate([pts, np.full((28, 3), 7.0, dtype=np.float32)])
    mask = np.concatenate([np.ones(100), np.zeros(28)]).astype(np.float32)
    ours = np.asarray(
        sc_ops.pointcloud_to_scancontext(jnp.asarray(padded),
                                         jnp.asarray(mask)))
    ref = reference_sc(pts)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_distance_zero_for_identical():
    rng = np.random.default_rng(2)
    pts = random_cloud(rng)
    sc = sc_ops.pointcloud_to_scancontext(
        jnp.asarray(pts), jnp.ones(len(pts), dtype=jnp.float32))
    dists, yaws = sc_ops.scancontext_distances(sc, sc[None])
    assert float(dists[0]) < 1e-5
    assert int(yaws[0]) == 60  # full-cycle shift == aligned


def test_rotation_invariance():
    """A yaw-rotated scan matches its original with low distance and the
    correct recovered shift."""
    rng = np.random.default_rng(3)
    pts = random_cloud(rng, 2000)
    angle = np.deg2rad(90.0)  # 15 sectors
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    pts_rot = pts @ rot.T
    mask = jnp.ones(len(pts), dtype=jnp.float32)
    sc0 = sc_ops.pointcloud_to_scancontext(jnp.asarray(pts), mask)
    sc1 = sc_ops.pointcloud_to_scancontext(jnp.asarray(pts_rot), mask)
    dists, yaws = sc_ops.scancontext_distances(sc0, sc1[None])
    assert float(dists[0]) < 0.15
    # reference convention rolls the *candidate* forward, so a scene
    # rotated by +90 deg reports 360 - 90 = 270 (mod 360), +- one sector
    yaw_deg = int(yaws[0]) * (360 / 60)
    assert yaw_deg % 360 in (270, 276, 264)


def test_matching_database():
    rng = np.random.default_rng(4)
    db = ScanContextMatching()
    assert db.search_best(np.zeros((20, 60))) == (None, None)
    clouds = [random_cloud(rng, 800) for _ in range(12)]
    scs = []
    for i, pts in enumerate(clouds):
        sc = np.asarray(sc_ops.pointcloud_to_scancontext(
            jnp.asarray(pts), jnp.ones(len(pts), dtype=jnp.float32)))
        scs.append(sc)
        db.add_item(sc, i)
    # query with a slightly perturbed copy of scan 7
    noisy = clouds[7] + rng.standard_normal(clouds[7].shape).astype(
        np.float32) * 0.05
    q = np.asarray(sc_ops.pointcloud_to_scancontext(
        jnp.asarray(noisy), jnp.ones(len(noisy), dtype=jnp.float32)))
    items, sims = db.search(q, 1)
    assert items[0] == 7
    assert sims[0] > 0.85


def test_capacity_growth():
    rng = np.random.default_rng(5)
    db = ScanContextMatching(capacity=4)
    for i in range(10):
        sc = rng.random((20, 60)).astype(np.float32)
        db.add_item(sc, i)
    assert len(db) == 10
    item, sim = db.search_best(np.asarray(db._scs[3]))
    assert item == 3 and sim > 0.999
