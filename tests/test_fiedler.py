"""Fiedler solvers: dense (deflated eigh) vs matrix-free LOBPCG, and the
Laplacian assembly ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import fiedler, laplacian
from cslam_tpu.sparsification.mac import _fiedler_dense


def random_connected_graph(rng, n, extra_edges=20):
    e_i = list(range(n - 1))
    e_j = list(range(1, n))
    w = [1.0] * (n - 1)
    for _ in range(extra_edges):
        a, b = rng.choice(n, 2, replace=False)
        e_i.append(int(a))
        e_j.append(int(b))
        w.append(float(rng.random()) + 0.1)
    return (np.array(e_i, np.int32), np.array(e_j, np.int32),
            np.array(w, np.float32))


def test_laplacian_assembly_matches_numpy():
    rng = np.random.default_rng(0)
    n = 16
    e_i, e_j, w = random_connected_graph(rng, n, 10)
    L = np.asarray(laplacian.laplacian_dense(jnp.asarray(e_i),
                                             jnp.asarray(e_j),
                                             jnp.asarray(w), n))
    ref = np.zeros((n, n))
    for a, b, ww in zip(e_i, e_j, w):
        ref[a, a] += ww
        ref[b, b] += ww
        ref[a, b] -= ww
        ref[b, a] -= ww
    np.testing.assert_allclose(L, ref, atol=1e-6)
    # matvec consistency
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(laplacian.laplacian_matvec(jnp.asarray(e_i),
                                              jnp.asarray(e_j),
                                              jnp.asarray(w),
                                              jnp.asarray(x)))
    np.testing.assert_allclose(y, ref @ x, atol=1e-4)


def test_dense_fiedler_matches_scipy_style_reference():
    rng = np.random.default_rng(1)
    n, P = 24, 32
    e_i, e_j, w = random_connected_graph(rng, n, 15)
    L = np.zeros((P, P), dtype=np.float32)
    for a, b, ww in zip(e_i, e_j, w):
        L[a, a] += ww
        L[b, b] += ww
        L[a, b] -= ww
        L[b, a] -= ww
    mask = np.zeros(P, np.float32)
    mask[:n] = 1.0
    lam2, v = _fiedler_dense(jnp.asarray(L), jnp.asarray(mask))
    # reference: full eigh of the unpadded Laplacian
    vals, vecs = np.linalg.eigh(L[:n, :n].astype(np.float64))
    np.testing.assert_allclose(float(lam2), vals[1], rtol=1e-3, atol=1e-5)
    v = np.asarray(v)
    # padded entries ~ 0; eigenvector matches up to sign
    np.testing.assert_allclose(v[n:], 0.0, atol=1e-4)
    vn = v[:n] / np.linalg.norm(v[:n])
    ref = vecs[:, 1]
    assert min(np.linalg.norm(vn - ref), np.linalg.norm(vn + ref)) < 1e-2


def test_lobpcg_fiedler_matches_dense():
    rng = np.random.default_rng(2)
    n, P = 48, 64
    e_i, e_j, w = random_connected_graph(rng, n, 30)
    E = len(w)
    mask = np.zeros(P, np.float32)
    mask[:n] = 1.0
    lam2_l, v_l = fiedler.fiedler_pair_lobpcg(
        jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(w),
        jnp.asarray(mask), num_iters=200)
    L = np.zeros((n, n))
    for a, b, ww in zip(e_i, e_j, w):
        L[a, a] += ww
        L[b, b] += ww
        L[a, b] -= ww
        L[b, a] -= ww
    vals, vecs = np.linalg.eigh(L)
    np.testing.assert_allclose(float(lam2_l), vals[1], rtol=5e-2)


def test_inverse_iteration_gates_fire_and_stay_accurate():
    """The invit/CG convergence gates (round-4 verdict: the fixed 12x24
    budget had no gate at all) must actually FIRE — a warm-started call
    exits at the 2-iteration floor with far fewer total CG trips — and
    the gated result must stay accurate against a float64 eigh
    reference."""
    rng = np.random.default_rng(3)
    n = 512  # long chain: slowest spectrum, the hard case
    e_i = np.arange(n - 1, dtype=np.int32)
    e_j = np.arange(1, n, dtype=np.int32)
    w = np.ones(n - 1, np.float32)
    for _ in range(12):
        a, b = rng.choice(n, 2, replace=False)
        e_i = np.append(e_i, np.int32(a))
        e_j = np.append(e_j, np.int32(b))
        w = np.append(w, np.float32(0.5 + rng.random()))
    mask = np.ones(n, np.float32)

    lam_cold, v_cold, it_cold, cg_cold = fiedler.fiedler_pair_inverse(
        jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(w),
        jnp.asarray(mask), invit_iters=12, cg_iters=24,
        return_iters=True)
    # warm start from the converged vector: the gate must exit at the
    # 2-iteration floor with a fraction of the CG work
    lam_warm, _, it_warm, cg_warm = fiedler.fiedler_pair_inverse(
        jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(w),
        jnp.asarray(mask), v0=v_cold, invit_iters=12, cg_iters=24,
        return_iters=True)
    assert int(it_warm) == 2, int(it_warm)
    assert int(cg_warm) < int(cg_cold), (int(cg_warm), int(cg_cold))

    # accuracy vs float64 eigh
    L = np.zeros((n, n))
    for a, b, ww in zip(e_i, e_j, w):
        L[a, a] += ww
        L[b, b] += ww
        L[a, b] -= ww
        L[b, a] -= ww
    vals = np.linalg.eigh(L)[0]
    for lam in (float(lam_cold), float(lam_warm)):
        assert abs(lam - vals[1]) / vals[1] < 2e-3, (lam, vals[1])


def test_fiedler_dense_squaring_matches_eigh():
    """The LAPACK-free matrix-squaring Fiedler evaluation agrees with
    the eigh path on MAC-shaped graphs (chains + random candidates —
    chains are the slowest-converging spectra), one-sided within ~1e-3."""
    import numpy as np
    import jax.numpy as jnp
    from cslam_tpu.sparsification.mac import (_fiedler_dense,
                                              _fiedler_dense_squaring)

    rng = np.random.default_rng(0)
    for trial in range(12):
        P = int(rng.choice([64, 128, 512]))
        n_real = P - int(rng.integers(0, P // 4))
        mask = np.zeros(P, np.float32)
        mask[:n_real] = 1.0
        L = np.zeros((P, P), np.float32)

        def add(i, j, w):
            L[i, i] += w
            L[j, j] += w
            L[i, j] -= w
            L[j, i] -= w

        for i in range(n_real - 1):
            add(i, i + 1, 1.0)
        for _ in range(int(rng.integers(3, 60))):
            i, j = rng.integers(0, n_real, 2)
            if i != j:
                add(i, j, float(rng.random()))
        l_sq, v_sq = _fiedler_dense_squaring(jnp.asarray(L),
                                             jnp.asarray(mask))
        l_eig, _ = _fiedler_dense(jnp.asarray(L), jnp.asarray(mask))
        l_sq, l_eig = float(l_sq), float(l_eig)
        assert l_sq >= l_eig - 2e-6, (trial, l_sq, l_eig)  # one-sided
        assert l_sq <= l_eig * 1.002 + 1e-6, (trial, l_sq, l_eig)
        assert float(jnp.linalg.norm(v_sq)) == pytest.approx(1.0, abs=1e-4)
