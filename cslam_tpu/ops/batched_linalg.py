"""Batched tiny-matrix inverses as unrolled VPU arithmetic.

`jnp.linalg.inv` on a (P, 6, 6) batch lowers to a LAPACK-style batched
LU on TPU and costs ~730 us for P=512 (measured v5e) — it was the single
most expensive op in the PGO Levenberg-Marquardt body, dwarfing the
residual/Jacobian evaluation it sits next to. For fixed tiny n the same
inverse is 6 unrolled Gauss-Jordan pivot steps of elementwise/broadcast
arithmetic over the whole batch: ~50 us for the same shape (~14x).

No pivoting: intended for SPD(+lam*I) blocks (block-Jacobi
preconditioners, Hessian diagonals) whose diagonal stays well away from
zero; `eps` guards exact zeros so padded identity blocks stay exact.
"""

import jax.numpy as jnp


def inv3x3_adjugate(M, eps=1e-30):
    """Closed-form inverse of (..., 3, 3) batches via the adjugate.

    No pivoting needed for ANY well-conditioned matrix (unlike the
    Gauss-Jordan path, which requires a nonzero diagonal — a 90-degree
    rotation breaks it). ~30 elementwise ops, batched on the VPU.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, eps)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def det3x3(M):
    """Determinant of (..., 3, 3) batches, closed form."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return (a * (e * i - f * h) - b * (d * i - f * g)
            + c * (d * h - e * g))


def polar_rotation3x3(M, iters=8):
    """Nearest-ish rotation to (..., 3, 3) M by scaled Newton polar
    iteration X <- (X + X^-T)/2 — pure batched arithmetic.

    Replaces batched jnp.linalg.svd, whose TPU QR custom-call demands
    O(batch) VMEM scratch (21 MB at a 65536-pose graph — over the 16 MB
    budget) and runs at LAPACK-loop speed. Quadratic convergence once
    near-orthogonal; the Frobenius pre-scaling gives fast global
    convergence for any well-conditioned input. For det(M) < 0 the polar
    factor is an improper rotation; M is sign-flipped first (odd
    dimension), which yields a proper rotation near |M| — fine for the
    initialization/hygiene uses, NOT the exact nearest rotation in that
    degenerate case.
    """
    sign = jnp.sign(det3x3(M))
    sign = jnp.where(sign == 0, 1.0, sign)
    X = M * sign[..., None, None]
    norm = jnp.sqrt(jnp.sum(X * X, axis=(-2, -1), keepdims=True))
    X = X * (jnp.sqrt(3.0) / jnp.maximum(norm, 1e-12))
    for _ in range(iters):
        # Higham determinant scaling: drives badly-spread singular
        # values together so the plain iteration's quadratic phase
        # starts immediately (ill-conditioned chordal blocks converged
        # to only ~5e-3 orthogonality in 8 unscaled steps)
        mu = jnp.abs(det3x3(X)) ** (-1.0 / 3.0)
        mu = jnp.clip(mu, 0.1, 10.0)[..., None, None]
        Xs = X * mu
        X = 0.5 * (Xs + jnp.swapaxes(inv3x3_adjugate(Xs), -2, -1))
    return X


def smallest_eigvec_sym3x3(M, squarings=10):
    """Unit eigenvector of the smallest eigenvalue of symmetric PSD
    (..., 3, 3) batches — pure batched arithmetic, no LAPACK.

    The smallest eigenvector of M is the LARGEST eigenvector of
    B = tr(M) I - M (PSD, since tr >= lambda_max for PSD M). B is
    renormalized and squared `squarings` times: B^(2^k) collapses to the
    rank-1 dominant subspace, whose largest column is the eigenvector
    (same extraction as registration.horn_rotation). A batched
    jnp.linalg.eigh over per-point normal covariances was ~90% of the
    FPFH kernel's device time (the batched-small-LAPACK pathology, see
    module docstring). Eigengap caveat: for a locally planar
    neighborhood the gap ratio is ~0.5 and convergence is crushing; for
    a degenerate (linear/isotropic) neighborhood the normal is
    ill-defined either way and the result is an arbitrary stable unit
    vector, like eigh's."""
    tr = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    B = tr[..., None, None] * jnp.eye(3, dtype=M.dtype) - M
    norm = jnp.sqrt(jnp.sum(B * B, axis=(-2, -1), keepdims=True))
    B = B / jnp.maximum(norm, 1e-30)
    # small identity shift keeps the all-zero (padded) case returning a
    # unit vector instead of 0/0
    B = B + 0.1 * jnp.eye(3, dtype=M.dtype)
    for _ in range(squarings):
        B = B @ B
        n2 = jnp.sqrt(jnp.sum(B * B, axis=(-2, -1), keepdims=True))
        B = B / jnp.maximum(n2, 1e-30)
    colnorm = jnp.sum(B * B, axis=-2)                     # (..., 3)
    # argmax one-hot, NOT equality-tie averaging: for rank-1 B ~ u u^T
    # the tied max-norm columns are u_i*u and u_j*u, ANTI-parallel when
    # u_i = -u_j (normals along (1,-1,0)/sqrt(2) on grid-aligned
    # clouds) — their sum cancels to ~0 and the clamped normalization
    # returns noise. Same extraction as horn_rotation.
    onehot = (colnorm >= jnp.max(colnorm, axis=-1,
                                 keepdims=True)).astype(M.dtype)
    first = jnp.cumsum(onehot, axis=-1) <= 1.0
    onehot = onehot * first.astype(M.dtype)
    v = jnp.einsum("...ij,...j->...i", B, onehot)
    return v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def batched_inv_small(H, eps=1e-30):
    """Inverse of a (..., n, n) batch of small matrices, unrolled.

    Gauss-Jordan without pivoting, n static and small (<= ~8). Exact for
    diagonally-dominant / SPD-shifted blocks; NOT a general replacement
    for jnp.linalg.inv (no row swaps).
    """
    n = H.shape[-1]
    A = H
    Inv = jnp.broadcast_to(jnp.eye(n, dtype=H.dtype), H.shape)
    rows = jnp.arange(n)
    for i in range(n):
        piv = A[..., i:i + 1, i:i + 1]                     # (..., 1, 1)
        inv_piv = 1.0 / jnp.where(jnp.abs(piv) > eps, piv, eps)
        row_a = A[..., i:i + 1, :] * inv_piv               # (..., 1, n)
        row_inv = Inv[..., i:i + 1, :] * inv_piv
        col = A[..., :, i:i + 1]                           # (..., n, 1)
        is_i = (rows == i)[:, None]                        # (n, 1)
        A = jnp.where(is_i, row_a, A - col * row_a)
        Inv = jnp.where(is_i, row_inv, Inv - col * row_inv)
    return Inv
