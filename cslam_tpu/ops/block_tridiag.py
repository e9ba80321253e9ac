"""Exact block-tridiagonal solves by cyclic reduction — the PGO chain
preconditioner.

A pose graph's Gauss-Newton Hessian is an odometry CHAIN (block
tridiagonal, condition ~P^2) plus a few loop-closure couplings. Block-
Jacobi PCG ignores the chain entirely and burns its full iteration
budget on every LM step (measured: 50/50 iterations at 1000 poses,
round 4). The classical fix — block Thomas/LDL factorization — is a
SEQUENTIAL scan over P blocks, the worst possible shape for a TPU.

Cyclic reduction does the same exact solve in log2(P) LEVELS of fully
batched 6x6 arithmetic: each level eliminates all odd-indexed blocks at
once (batched inverses via Gauss-Jordan + batched matmuls — VPU/MXU
work, no LAPACK loops), halving the system. With M = the block-
tridiagonal part of H (all diagonal contributions including loop edges
and lam, chain couplings off-diagonal), PCG sees only the loop-closure
corrections and converges in a handful of iterations.

Reference analog: GTSAM solves the full system by sparse Cholesky on
the CPU (decentralized_pgo.cpp:861-886); this is the TPU-native
equivalent of exploiting the same chain structure.

Conventions: system M x = b with n (power-of-two) blocks of size s;
D: (n, s, s) diagonal blocks; O: (n, s, s) with O[j] = M[j, j-1]
(O[0] must be zero). Padded blocks: put identity-ish diagonals (e.g.
lam*I) and zero couplings — they decouple exactly.
"""

import jax
import jax.numpy as jnp

from cslam_tpu.ops.batched_linalg import batched_inv_small

# Below this many blocks the remaining system is assembled dense and
# Cholesky-factored once. The tail is deliberately LARGE: every
# reduction level costs ~6 tiny ops in BOTH the down and up phase of
# every solve, and at op-floor sizes those dominate (measured: tail=8
# made the preconditioner apply as expensive as ~4 block-Jacobi
# applies at P=512, erasing the iteration savings). A 64-block tail is
# one (384, 384) Cholesky per factorization and two triangular solves
# per apply — 3 ops replacing 3 levels x 12 ops.
_DENSE_TAIL_BLOCKS = 64


def bcr_factor(D, O):
    """Factor the block-tridiagonal system for repeated solves.

    Returns an opaque pytree of per-level reduction operators plus a
    Cholesky factor of the dense tail. All static shapes: n is halved
    per level (Python loop, unrolled into the XLA program).
    """
    n, s, _ = D.shape
    assert n & (n - 1) == 0, "block count must be a power of two"
    levels = []
    while n > _DENSE_TAIL_BLOCKS:
        D_even, D_odd = D[0::2], D[1::2]
        O_even, O_odd = O[0::2], O[1::2]
        Dinv_odd = batched_inv_small(D_odd)
        # left-neighbor operators for even i=2k: L_k = O_even[k] @
        # Dinv_odd[k-1] (zero at k=0 — O_even[0] is the global O[0]=0
        # only at level 0, so shift explicitly)
        Dinv_left = jnp.concatenate(
            [jnp.zeros_like(Dinv_odd[:1]), Dinv_odd[:-1]], axis=0)
        L = jnp.einsum("kij,kjl->kil", O_even, Dinv_left)
        # right-neighbor operators: R_k = O_odd[k]^T @ Dinv_odd[k]
        R = jnp.einsum("kji,kjl->kil", O_odd, Dinv_odd)
        D_new = (D_even
                 - jnp.einsum("kij,klj->kil", L, O_even)
                 - jnp.einsum("kij,kjl->kil", R, O_odd))
        O_prev = jnp.concatenate(
            [jnp.zeros_like(O_odd[:1]), O_odd[:-1]], axis=0)
        O_new = -jnp.einsum("kij,kjl->kil", L, O_prev)
        O_new = O_new.at[0].set(0.0)
        levels.append({"Dinv_odd": Dinv_odd, "O_even": O_even,
                       "O_odd": O_odd, "L": L, "R": R})
        D, O = D_new, O_new
        n //= 2
    # dense tail: assemble (n*s, n*s), Cholesky once, and store the
    # explicit INVERSE — each preconditioner application then costs one
    # matvec instead of two TPU triangular solves (which lower to slow
    # sequential custom calls and were ~the whole apply cost at tail=64)
    tail = jnp.zeros((n, n, s, s), dtype=D.dtype)
    idx = jnp.arange(n)
    tail = tail.at[idx, idx].set(D)
    if n > 1:
        tail = tail.at[idx[1:], idx[:-1]].set(O[1:])
        tail = tail.at[idx[:-1], idx[1:]].set(
            jnp.swapaxes(O[1:], -2, -1))
    dense = jnp.transpose(tail, (0, 2, 1, 3)).reshape(n * s, n * s)
    chol = jnp.linalg.cholesky(dense)
    inv = jax.scipy.linalg.cho_solve(
        (chol, True), jnp.eye(n * s, dtype=D.dtype))
    return {"levels": levels, "tail_inv": inv, "tail_n": n, "s": s}


def bcr_solve(factor, b):
    """Solve M x = b using a factor from bcr_factor. b: (n, s)."""
    levels = factor["levels"]
    s = factor["s"]
    rhs_stack = []
    for lv in levels:
        b_even, b_odd = b[0::2], b[1::2]
        b_odd_prev = jnp.concatenate(
            [jnp.zeros_like(b_odd[:1]), b_odd[:-1]], axis=0)
        b_new = (b_even
                 - jnp.einsum("kij,kj->ki", lv["L"], b_odd_prev)
                 - jnp.einsum("kij,kj->ki", lv["R"], b_odd))
        rhs_stack.append(b_odd)
        b = b_new
    n_tail = factor["tail_n"]
    x = (factor["tail_inv"] @ b.reshape(n_tail * s)).reshape(n_tail, s)
    for lv, b_odd in zip(reversed(levels), reversed(rhs_stack)):
        # x currently holds the even-indexed solution of this level
        x_next = jnp.concatenate(
            [x[1:], jnp.zeros_like(x[:1])], axis=0)
        O_even_next = jnp.concatenate(
            [lv["O_even"][1:], jnp.zeros_like(lv["O_even"][:1])], axis=0)
        rhs_odd = (b_odd
                   - jnp.einsum("kij,kj->ki", lv["O_odd"], x)
                   - jnp.einsum("kji,kj->ki", O_even_next, x_next))
        x_odd = jnp.einsum("kij,kj->ki", lv["Dinv_odd"], rhs_odd)
        full = jnp.zeros((2 * x.shape[0], s), dtype=x.dtype)
        x = full.at[0::2].set(x).at[1::2].set(x_odd)
    return x


def bcr_solve_multi(factor, b):
    """Solve M x = b for m right-hand sides at once. b: (n, m, s) —
    rhs axis FIRST, so b[p] is an (m, s) row-major block and the flat
    (n, m*s) view is contiguous.

    Layout rules this encodes (measured on v5e, P=16384, s=m=3):
    - arrays with a trailing 2-D minor shape like (n, 3, 3) are tile-
      padded per block: a strided .at[0::2].set or index scatter on
      them costs 6.5x the same op on the flat (n, 9) view (1.69 vs
      0.26 ms). ALL data movement here (slices, sets, tail reshape)
      happens on the flat view; the (m, s) structure exists only
      inside einsums.
    - a vmap over the rhs axis re-traces nothing but strides
      everything: measured 9x a single solve. This routine is the
      fix — every op simply widens by m.
    """
    levels = factor["levels"]
    s = factor["s"]
    n, m, _ = b.shape
    b = b.reshape(n, m * s)

    def bmul(A, bflat):
        # block-apply on the last axis: out[k, r, i] = A[k] @ b[k, r]
        blk = bflat.reshape(-1, m, s)
        out = jnp.einsum("kij,krj->kri", A, blk)
        return out.reshape(-1, m * s)

    def bmul_t(A, bflat):
        blk = bflat.reshape(-1, m, s)
        out = jnp.einsum("kji,krj->kri", A, blk)
        return out.reshape(-1, m * s)

    rhs_stack = []
    for lv in levels:
        b_even, b_odd = b[0::2], b[1::2]
        b_odd_prev = jnp.concatenate(
            [jnp.zeros_like(b_odd[:1]), b_odd[:-1]], axis=0)
        b_new = (b_even
                 - bmul(lv["L"], b_odd_prev)
                 - bmul(lv["R"], b_odd))
        rhs_stack.append(b_odd)
        b = b_new
    n_tail = factor["tail_n"]
    # tail wants (n_tail*s, m): (n_tail, m, s) -> transpose the tiny
    # tail block only
    tail_b = b.reshape(n_tail, m, s).transpose(0, 2, 1).reshape(
        n_tail * s, m)
    x = (factor["tail_inv"] @ tail_b).reshape(n_tail, s, m)
    x = x.transpose(0, 2, 1).reshape(n_tail, m * s)
    for lv, b_odd in zip(reversed(levels), reversed(rhs_stack)):
        x_next = jnp.concatenate(
            [x[1:], jnp.zeros_like(x[:1])], axis=0)
        O_even_next = jnp.concatenate(
            [lv["O_even"][1:], jnp.zeros_like(lv["O_even"][:1])], axis=0)
        rhs_odd = (b_odd
                   - bmul(lv["O_odd"], x)
                   - bmul_t(O_even_next, x_next))
        x_odd = bmul(lv["Dinv_odd"], rhs_odd)
        full = jnp.zeros((2 * x.shape[0], m * s), dtype=x.dtype)
        x = full.at[0::2].set(x).at[1::2].set(x_odd)
    return x.reshape(-1, m, s)


def chain_offdiag_from_edges(e_i, e_j, Ji, Jj, P):
    """(P, 6, 6) sub-diagonal blocks O[m] = H[m, m-1] from the CHAIN
    edges (|e_i - e_j| == 1) of a stacked edge list; O[0] = 0.

    Ji/Jj must already carry the sqrt(weight)*mask scaling, so masked
    or non-chain edges contribute nothing. Loop edges are EXCLUDED from
    the off-diagonal (their diagonal contributions live in D via Hii),
    keeping M = tridiag(D, O) symmetric positive definite: M is the
    full GN Hessian of chain factors + lam*I + prior plus a PSD
    block-diagonal of loop contributions.
    """
    s = Ji.shape[-1]
    fwd = (e_j == e_i + 1)
    rev = (e_i == e_j + 1)
    # H[e_j, e_i] += Jj^T Ji   (fwd: e_j = e_i + 1 -> row m = e_j)
    cross_ji = jnp.einsum("eoi,eoj->eij", Jj, Ji).reshape(-1, s * s)
    # H[e_i, e_j] += Ji^T Jj   (rev: e_i = e_j + 1 -> row m = e_i)
    cross_ij = jnp.einsum("eoi,eoj->eij", Ji, Jj).reshape(-1, s * s)
    # flat (P, s*s) scatter: trailing 2-D minors scatter ~6.5x slower
    # (see bcr_solve_multi's layout notes)
    O = jnp.zeros((P, s * s), dtype=Ji.dtype)
    O = O.at[e_j].add(jnp.where(fwd[:, None], cross_ji, 0.0))
    O = O.at[e_i].add(jnp.where(rev[:, None], cross_ij, 0.0))
    return O.reshape(P, s, s).at[0].set(0.0)
