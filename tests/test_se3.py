"""SE(3) op correctness: exp/log round trips, compose/between identities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import se3


def random_xi(rng, n, scale=1.0):
    return jnp.asarray(rng.standard_normal((n, 6)) * scale, dtype=jnp.float32)


def test_so3_exp_orthonormal():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 3)), dtype=jnp.float32)
    R = se3.so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), (64, 3, 3))
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5, 2.0])
def test_so3_log_roundtrip(scale):
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((128, 3)) * scale, dtype=jnp.float32)
    # keep |w| < pi for uniqueness of the log
    norms = jnp.linalg.norm(w, axis=-1, keepdims=True)
    w = jnp.where(norms > 3.0, w * (3.0 / norms), w)
    w2 = se3.so3_log(se3.so3_exp(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w),
                               atol=2e-4 + 1e-3 * scale)


def test_so3_log_near_pi():
    rng = np.random.default_rng(2)
    axes = rng.standard_normal((32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    for theta in [np.pi - 1e-4, np.pi - 1e-6]:
        w = jnp.asarray(axes * theta, dtype=jnp.float32)
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        # log may return the antipodal representative; compare rotations
        R2 = se3.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    xi = random_xi(rng, 256, scale=0.8)
    R, t = se3.se3_exp(xi)
    xi2 = se3.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-4)


def test_compose_inverse_between():
    rng = np.random.default_rng(4)
    Ra, ta = se3.se3_exp(random_xi(rng, 32))
    Rb, tb = se3.se3_exp(random_xi(rng, 32))
    # between(a, b) composed onto a equals b
    Rab, tab = se3.between(Ra, ta, Rb, tb)
    Rb2, tb2 = se3.compose(Ra, ta, Rab, tab)
    np.testing.assert_allclose(np.asarray(Rb2), np.asarray(Rb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tb2), np.asarray(tb), atol=1e-5)
    # a * a^-1 = I
    Ri, ti = se3.inverse(Ra, ta)
    Re, te = se3.compose(Ra, ta, Ri, ti)
    np.testing.assert_allclose(np.asarray(Re),
                               np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)


def test_adjoint_identity():
    # Ad_T xi = Log(T Exp(xi) T^-1) for small xi
    rng = np.random.default_rng(5)
    R, t = se3.se3_exp(random_xi(rng, 16))
    xi = random_xi(rng, 16, scale=1e-3)
    Ad = se3.adjoint(R, t)
    lhs = jnp.einsum("nij,nj->ni", Ad, xi)
    Re, te = se3.se3_exp(xi)
    Rc, tc = se3.compose(R, t, Re, te)
    Ri, ti = se3.inverse(R, t)
    Rf, tf = se3.compose(Rc, tc, Ri, ti)
    rhs = se3.se3_log(Rf, tf)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               atol=1e-5, rtol=1e-3)


def test_jit_and_vmap():
    rng = np.random.default_rng(6)
    xi = random_xi(rng, 8, scale=0.5)  # keep |w| < pi so log is principal
    f = jax.jit(lambda x: se3.se3_log(*se3.se3_exp(x)))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=5e-4)
