"""Batched cosine-similarity k-nearest-neighbor search ops.

TPU-native replacement for the reference's torch/CUDA brute-force kNN
(/root/reference/cslam/nns_matching.py:44-63): similarities are one matmul
that lands on the MXU, top-k runs on-device, and the database is a padded
static-shape buffer (capacity doubling = next power-of-two bucket +
recompile, replacing the reference's torch.concat doubling realloc at
nns_matching.py:33-38).

All functions are pure and jit-compatible; invalid (padded) rows are
masked to -inf similarity.
"""

import functools

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk(data, n_valid, queries, k, data_norms=None):
    """Top-k cosine similarity of each query against data[:n_valid].

    Args:
      data: (N_cap, D) float32 descriptor database (rows >= n_valid are
        padding and are excluded from results).
      n_valid: scalar int — number of valid rows.
      queries: (B, D) float32 query descriptors.
      k: static int — number of neighbors.
      data_norms: optional (N_cap,) precomputed row norms. Passing them
        (DescriptorDatabase maintains them incrementally) removes the
        second full database read per search — the search becomes a
        single HBM pass over the matrix.

    Returns:
      (indices, sims): (B, k) int32 row indices into data and (B, k)
      float32 cosine similarities, sorted descending. Entries past
      min(k, n_valid) have sims == -inf.
    """
    # data keeps its storage dtype (bf16 halves HBM traffic, the binding
    # resource; the MXU accumulates in f32 via preferred_element_type)
    queries = queries.astype(data.dtype)
    if data_norms is None:
        # Computed OUTSIDE the fused similarity computation on purpose:
        # letting XLA fuse the row-norm into the matmul consumer makes it
        # recompute norms per output tile — measured 280x slower on TPU.
        # optimization_barrier forces materialization.
        data_norms = jax.lax.optimization_barrier(
            jnp.linalg.norm(data.astype(jnp.float32), axis=-1))
    q_norm = jnp.linalg.norm(queries.astype(jnp.float32), axis=-1)
    # MXU matmul: (B, D) @ (D, N) -> (B, N)
    dots = jnp.dot(queries, data.T, preferred_element_type=jnp.float32)
    denom = jnp.maximum(
        q_norm[:, None] * data_norms.astype(jnp.float32)[None, :], 1e-12)
    sims = dots / denom
    row_ids = jnp.arange(data.shape[0], dtype=jnp.int32)
    sims = jnp.where(row_ids[None, :] < n_valid, sims, NEG_INF)
    top_sims, top_idx = jax.lax.top_k(sims, k)
    return top_idx.astype(jnp.int32), top_sims


@functools.partial(jax.jit, static_argnames=("k", "block"))
def cosine_topk_blocked(data, n_valid, queries, k, data_norms=None,
                        block=8192):
    """Exact top-k via two-stage blocked selection.

    lax.top_k over the full (B, N) row is the latency bottleneck of
    cosine_topk at large N; selecting top-k within N/block column blocks
    first (embarrassingly parallel) and then over the (B, blocks*k)
    survivors is exact (every global top-k element is a within-block
    top-k element) and much cheaper.
    """
    N = data.shape[0]
    B = queries.shape[0]
    if N % block != 0 or N <= block:
        return cosine_topk(data, n_valid, queries, k, data_norms=data_norms)
    queries = queries.astype(data.dtype)
    if data_norms is None:
        data_norms = jax.lax.optimization_barrier(
            jnp.linalg.norm(data.astype(jnp.float32), axis=-1))
    q_norm = jnp.linalg.norm(queries.astype(jnp.float32), axis=-1)
    dots = jnp.dot(queries, data.T, preferred_element_type=jnp.float32)
    denom = jnp.maximum(
        q_norm[:, None] * data_norms.astype(jnp.float32)[None, :], 1e-12)
    sims = dots / denom
    row_ids = jnp.arange(N, dtype=jnp.int32)
    sims = jnp.where(row_ids[None, :] < n_valid, sims, NEG_INF)
    G = N // block
    blk_sims, blk_idx = jax.lax.top_k(sims.reshape(B * G, block), k)
    offs = (jnp.arange(G, dtype=jnp.int32) * block).repeat(k)
    cand_idx = blk_idx.reshape(B, G * k) + offs[None, :]
    cand_sims = blk_sims.reshape(B, G * k)
    top_sims, pos = jax.lax.top_k(cand_sims, k)
    top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return top_idx.astype(jnp.int32), top_sims


@functools.partial(jax.jit, static_argnames=("k", "block"))
def cosine_topk_streamed(data, n_valid, queries, k, data_norms=None,
                         block=16384):
    """Exact top-k that never materializes the full (B, N) similarity
    matrix.

    cosine_topk writes the (B, N) sims to HBM and reads it back through
    lax.top_k — ~3 HBM passes over N. Here a lax.scan walks the database
    in (block, D) slabs: per step one MXU matmul produces a (B, block)
    tile that is consumed immediately by a within-tile top_k and a
    (B, 2k) merge, so the only O(N) HBM traffic is the single read of
    the database itself.

    Measured reality (v5e, 131072x512, B=256, slope-timed): 2.57
    ms/batch — SLOWER than the dense path's 1.63 ms. The search is not
    bandwidth-bound; lax.top_k's cost dominates and scales with the
    number of rows it runs over, so G sequential scan steps of
    (B, block) top_k cost more than one (B, N) call. Kept for its O(B*k)
    memory profile (streaming over databases whose sims matrix would
    not fit); for raw speed use cosine_topk (exact) or
    cosine_topk_approx (production: ~8x faster, recall ~0.95).
    """
    N, D = data.shape
    if N % block != 0 or N <= block:
        return cosine_topk(data, n_valid, queries, k, data_norms=data_norms)
    B = queries.shape[0]
    queries = queries.astype(data.dtype)
    if data_norms is None:
        data_norms = jax.lax.optimization_barrier(
            jnp.linalg.norm(data.astype(jnp.float32), axis=-1))
    q_norm = jnp.linalg.norm(queries.astype(jnp.float32), axis=-1)
    G = N // block
    data_blocks = data.reshape(G, block, D)
    norm_blocks = data_norms.astype(jnp.float32).reshape(G, block)
    offsets = jnp.arange(G, dtype=jnp.int32) * block
    col = jnp.arange(block, dtype=jnp.int32)

    def body(carry, inp):
        best_s, best_i = carry
        blk, nb, off = inp
        dots = jnp.dot(queries, blk.T, preferred_element_type=jnp.float32)
        sims = dots / jnp.maximum(q_norm[:, None] * nb[None, :], 1e-12)
        ids = off + col
        sims = jnp.where(ids[None, :] < n_valid, sims, NEG_INF)
        s, i = jax.lax.top_k(sims, k)
        gi = jnp.take(ids, i)
        cs = jnp.concatenate([best_s, s], axis=1)
        ci = jnp.concatenate([best_i, gi], axis=1)
        s2, pos = jax.lax.top_k(cs, k)
        i2 = jnp.take_along_axis(ci, pos, axis=1)
        return (s2, i2), None

    init = (jnp.full((B, k), NEG_INF, jnp.float32),
            jnp.zeros((B, k), jnp.int32))
    (top_sims, top_idx), _ = jax.lax.scan(
        body, init, (data_blocks, norm_blocks, offsets))
    return top_idx.astype(jnp.int32), top_sims


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def cosine_topk_approx(data, n_valid, queries, k, data_norms=None,
                       recall_target=0.95):
    """TPU-native approximate top-k (jax.lax.approx_max_k — the
    hardware-optimized partial reduction). Loop-closure candidates feed
    a geometric-verification stage, so per-element recall ~0.95 costs
    essentially nothing end to end while cutting the selection pass."""
    queries = queries.astype(data.dtype)
    if data_norms is None:
        data_norms = jax.lax.optimization_barrier(
            jnp.linalg.norm(data.astype(jnp.float32), axis=-1))
    q_norm = jnp.linalg.norm(queries.astype(jnp.float32), axis=-1)
    dots = jnp.dot(queries, data.T, preferred_element_type=jnp.float32)
    denom = jnp.maximum(
        q_norm[:, None] * data_norms.astype(jnp.float32)[None, :], 1e-12)
    sims = dots / denom
    row_ids = jnp.arange(data.shape[0], dtype=jnp.int32)
    sims = jnp.where(row_ids[None, :] < n_valid, sims, NEG_INF)
    top_sims, top_idx = jax.lax.approx_max_k(
        sims, k, recall_target=recall_target)
    return top_idx.astype(jnp.int32), top_sims


@functools.partial(jax.jit, donate_argnums=0)
def set_row(data, row, vector):
    """In-place (donated) row write for the device-resident database."""
    return data.at[row].set(vector.astype(data.dtype))


@functools.partial(jax.jit, static_argnames=("new_capacity",))
def grow(data, new_capacity):
    """Copy into a larger zero-padded buffer (capacity-doubling)."""
    pad = new_capacity - data.shape[0]
    return jnp.concatenate(
        [data, jnp.zeros((pad, data.shape[1]), dtype=data.dtype)], axis=0)


def cross_similarity(data_a, n_a, data_b, n_b):
    """Full (N_a, N_b) cosine-similarity matrix with padding masked to -inf.

    Used by the batched cross-robot matching path: every stored descriptor
    of robot A against every stored descriptor of robot B in one MXU call.
    """
    a = data_a.astype(jnp.float32)
    b = data_b.astype(jnp.float32)
    # barriers prevent per-tile norm recomputation (see cosine_topk)
    an = jax.lax.optimization_barrier(jnp.linalg.norm(a, axis=-1))
    bn = jax.lax.optimization_barrier(jnp.linalg.norm(b, axis=-1))
    dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    sims = dots / jnp.maximum(an[:, None] * bn[None, :], 1e-12)
    rows = jnp.arange(a.shape[0], dtype=jnp.int32)
    cols = jnp.arange(b.shape[0], dtype=jnp.int32)
    mask = (rows[:, None] < n_a) & (cols[None, :] < n_b)
    return jnp.where(mask, sims, NEG_INF)
