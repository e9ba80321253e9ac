"""Unrolled batched tiny-matrix inverse vs jnp.linalg.inv."""

import numpy as np
import jax.numpy as jnp

from cslam_tpu.ops.batched_linalg import batched_inv_small


def test_matches_linalg_inv_on_spd_blocks():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((64, 6, 6)).astype(np.float32)
    H = np.einsum("pij,pkj->pik", A, A) + 1e-2 * np.eye(6, dtype=np.float32)
    got = np.asarray(batched_inv_small(jnp.asarray(H)))
    ref = np.linalg.inv(H)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_identity_blocks_stay_exact():
    H = jnp.tile(jnp.eye(6, dtype=jnp.float32), (8, 1, 1))
    got = np.asarray(batched_inv_small(H))
    np.testing.assert_allclose(got, np.tile(np.eye(6), (8, 1, 1)), atol=1e-6)


def test_3x3_and_batch_dims():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((4, 5, 3, 3)).astype(np.float32)
    H = np.einsum("bpij,bpkj->bpik", A, A) + 0.1 * np.eye(3, dtype=np.float32)
    got = np.asarray(batched_inv_small(jnp.asarray(H)))
    ref = np.linalg.inv(H)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
