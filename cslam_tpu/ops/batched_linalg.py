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
