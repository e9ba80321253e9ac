"""Block cyclic reduction: exactness vs dense solve, SPD chain Hessians,
and the edge-list off-diagonal extraction."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops.block_tridiag import (bcr_factor, bcr_solve,
                                         chain_offdiag_from_edges)


def random_spd_tridiag(n, s, seed=0, diag_boost=4.0):
    """Random SPD block tridiagonal system, built as A^T A + boost*I of a
    banded A so the tridiagonal structure is exact."""
    rng = np.random.default_rng(seed)
    D = np.zeros((n, s, s), np.float32)
    O = np.zeros((n, s, s), np.float32)
    # chain-factor style: each "edge" (i-1, i) contributes Ji, Jj
    for i in range(1, n):
        Ji = rng.standard_normal((s, s)).astype(np.float32)
        Jj = rng.standard_normal((s, s)).astype(np.float32)
        D[i - 1] += Ji.T @ Ji
        D[i] += Jj.T @ Jj
        O[i] += Jj.T @ Ji
    for i in range(n):
        D[i] += diag_boost * np.eye(s, dtype=np.float32)
    return D, O


def dense_from_blocks(D, O):
    n, s, _ = D.shape
    M = np.zeros((n * s, n * s), np.float32)
    for i in range(n):
        M[i * s:(i + 1) * s, i * s:(i + 1) * s] = D[i]
        if i > 0:
            M[i * s:(i + 1) * s, (i - 1) * s:i * s] = O[i]
            M[(i - 1) * s:i * s, i * s:(i + 1) * s] = O[i].T
    return M


@pytest.mark.parametrize("n", [8, 16, 64, 256])
def test_bcr_matches_dense_solve(n):
    s = 6
    D, O = random_spd_tridiag(n, s, seed=n)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((n, s)).astype(np.float32)
    fac = bcr_factor(jnp.asarray(D), jnp.asarray(O))
    x = np.asarray(bcr_solve(fac, jnp.asarray(b)))
    M = dense_from_blocks(D, O)
    x_ref = np.linalg.solve(M.astype(np.float64),
                            b.reshape(-1).astype(np.float64)).reshape(n, s)
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < 5e-4, rel


def test_bcr_decoupled_padding():
    """Padded blocks (lam*I diagonal, zero couplings) solve to b/lam and
    do not perturb real blocks."""
    n, s = 16, 6
    D, O = random_spd_tridiag(n, s, seed=3)
    # blocks 10.. are padding
    D[10:] = 2.0 * np.eye(s, dtype=np.float32)
    O[10:] = 0.0
    b = np.random.default_rng(0).standard_normal((n, s)).astype(np.float32)
    fac = bcr_factor(jnp.asarray(D), jnp.asarray(O))
    x = np.asarray(bcr_solve(fac, jnp.asarray(b)))
    np.testing.assert_allclose(x[10:], b[10:] / 2.0, rtol=1e-5, atol=1e-6)
    M = dense_from_blocks(D[:10], O[:10])
    x_ref = np.linalg.solve(M.astype(np.float64),
                            b[:10].reshape(-1).astype(np.float64))
    rel = np.linalg.norm(x[:10].ravel() - x_ref) / np.linalg.norm(x_ref)
    assert rel < 5e-4


def test_chain_offdiag_extraction():
    """Chain edges land in O with the right orientation; loop edges and
    masked edges contribute nothing."""
    P, s = 8, 6
    rng = np.random.default_rng(2)
    # edges: fwd chain (1,2), rev chain (4,3), loop (0,5), masked (5,6)
    e_i = jnp.asarray([1, 4, 0, 5])
    e_j = jnp.asarray([2, 3, 5, 6])
    Ji = rng.standard_normal((4, s, s)).astype(np.float32)
    Jj = rng.standard_normal((4, s, s)).astype(np.float32)
    Ji[3] = 0.0  # "masked" edge arrives pre-scaled to zero
    Jj[3] = 0.0
    O = np.asarray(chain_offdiag_from_edges(e_i, e_j, jnp.asarray(Ji),
                                            jnp.asarray(Jj), P))
    # fwd edge (1,2): H[2,1] += Jj^T Ji -> O[2]
    np.testing.assert_allclose(O[2], Jj[0].T @ Ji[0], rtol=1e-6)
    # rev edge (4,3): H[4,3] += Ji^T Jj -> O[4]
    np.testing.assert_allclose(O[4], Ji[1].T @ Jj[1], rtol=1e-6)
    # loop edge (0,5): NOT tridiagonal -> nothing anywhere
    np.testing.assert_allclose(O[5], 0.0, atol=1e-7)
    np.testing.assert_allclose(O[6], 0.0, atol=1e-7)
    assert np.allclose(O[0], 0.0) and np.allclose(O[1], 0.0)
    np.testing.assert_allclose(O[3], 0.0, atol=1e-7)


@pytest.mark.parametrize("n,s,m", [(16, 3, 3), (256, 3, 3), (64, 6, 2)])
def test_bcr_solve_multi_matches_per_rhs(n, s, m):
    """bcr_solve_multi (rhs-first flat layout) must agree with m
    independent bcr_solve calls to float tolerance."""
    from cslam_tpu.ops.block_tridiag import bcr_solve_multi
    D, O = random_spd_tridiag(n, s, seed=7 * n + s)
    rng = np.random.default_rng(3)
    b = rng.standard_normal((n, m, s)).astype(np.float32)
    fac = bcr_factor(jnp.asarray(D), jnp.asarray(O))
    x_multi = np.asarray(bcr_solve_multi(fac, jnp.asarray(b)))
    for r in range(m):
        x_single = np.asarray(bcr_solve(fac, jnp.asarray(b[:, r, :])))
        np.testing.assert_allclose(x_multi[:, r, :], x_single,
                                   rtol=2e-5, atol=2e-6)
