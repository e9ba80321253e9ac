"""Fiedler pair (algebraic connectivity + eigenvector) on TPU.

Replaces the reference's networkx TRACEMIN-LU sparse eigensolve
(/root/reference/cslam/mac/mac.py:35-59) with dense-blocked spectral
computation suited to TPU (SURVEY.md §3.5 hot loop 2):

- `fiedler_pair_dense`: full `eigh` of the padding-augmented Laplacian.
  Padded nodes get a large diagonal shift, making the augmented matrix
  block-diagonal: its spectrum is the true spectrum plus a cluster at BIG,
  so eigenpair #1 (ascending) is exactly (lambda_2, v_2) of the real graph.
  Exact, batched, O(P^3) — the right trade for P <= ~2k on the MXU.
- `fiedler_pair_lobpcg`: matrix-free LOBPCG on a spectrum-flipped operator
  for larger graphs, deflating the constant vector analytically.

Disconnection shows up as lambda_2 ~ 0 (the reference surfaces it as a
"singular matrix" exception from TRACEMIN; callers here test the returned
value — see sparsification/mac.py retry semantics).
"""

import functools

import jax
import jax.numpy as jnp

from cslam_tpu.ops.laplacian import laplacian_matvec


def _augment(L, node_mask):
    """Add BIG to padded diagonal entries; returns (L_aug, BIG)."""
    # lambda_max(L) <= 2 * max_degree <= 2 * trace(L); +1 margin.
    big = 2.0 * jnp.trace(L) + 1.0
    pad = (1.0 - node_mask) * big
    return L + jnp.diag(pad), big


def fiedler_pair_dense(L, node_mask):
    """(lambda_2, v_2) of the Laplacian restricted to node_mask==1 nodes.

    Args:
      L: (P, P) dense Laplacian (padded rows/cols must be all-zero).
      node_mask: (P,) float32 — 1.0 for real nodes, 0.0 for padding.

    Returns:
      (lam2, v): scalar Fiedler value and (P,) Fiedler vector (zero on
      padded entries up to eigensolver noise).
    """
    L_aug, _ = _augment(L, node_mask)
    vals, vecs = jnp.linalg.eigh(L_aug)
    # Ascending: index 0 is the zero mode (constant over the connected
    # component), index 1 is the Fiedler pair.
    return vals[1], vecs[:, 1]


@functools.partial(jax.jit, static_argnames=("num_iters", "block_size",
                                             "return_block"))
def fiedler_pair_lobpcg(e_i, e_j, weights, node_mask, num_iters=100,
                        block_size=4, X0=None, return_block=False):
    """Matrix-free Fiedler pair via LOBPCG on B = sigma*I_real - L.

    The largest eigenvalues of B (on the subspace orthogonal to the
    constant vector over real nodes) correspond to the smallest of L.
    We deflate the constant vector analytically by projecting every
    candidate block, and give padded nodes eigenvalue -sigma in B so they
    never surface. Suitable for P beyond the dense-eigh crossover.

    X0: optional (P, block_size) warm-start block — a converged block
    from a one-edge-different graph cuts the iterations needed ~3-6x
    (eigenvector continuity; used by MAC's matfree swap refinement).
    return_block: also return the converged (P, block_size) block for
    warm-starting the next call.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    P = node_mask.shape[0]
    n_real = jnp.maximum(jnp.sum(node_mask), 1.0)
    degs = jnp.zeros((P,), jnp.float32).at[e_i].add(weights).at[e_j].add(weights)
    sigma = 2.0 * jnp.max(degs) + 1.0
    ones = node_mask / jnp.sqrt(n_real)

    def matvec(X):
        # X: (P, B) block. Project out the constant mode, apply B.
        X = X - ones[:, None] * (ones @ X)[None, :]
        LX = jax.vmap(lambda x: laplacian_matvec(e_i, e_j, weights, x),
                      in_axes=1, out_axes=1)(X)
        BX = sigma * X * node_mask[:, None] - LX
        return BX - ones[:, None] * (ones @ BX)[None, :]

    if X0 is None:
        key = jax.random.PRNGKey(7)
        X0 = jax.random.normal(key, (P, block_size), dtype=jnp.float32)
    X0 = X0 * node_mask[:, None]
    X0 = X0 - ones[:, None] * (ones @ X0)[None, :]
    theta, U, _ = lobpcg_standard(matvec, X0, m=num_iters)
    lam2 = sigma - theta[0]
    if return_block:
        return lam2, U[:, 0], U
    return lam2, U[:, 0]
