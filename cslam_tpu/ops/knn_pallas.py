"""Fused cosine-similarity top-k kNN as a Pallas TPU kernel.

The XLA path (ops/knn.py) materializes the full (B, N) similarity matrix
in HBM before top-k. This kernel streams database tiles through VMEM,
computes each tile's similarities on the MXU, and maintains a running
top-k per query in VMEM scratch — HBM traffic drops from
O(N*D + B*N) to O(N*D + B*k): for large databases the search becomes
purely database-bandwidth-bound (the speed-of-light for brute-force
search). SURVEY §2 #4: the per-chip kNN kernel target.

Requirements: D and the row-tile size aligned to lanes (pad the
descriptor dim to a multiple of 128); queries pre-normalized or
normalized here; N_cap a multiple of the tile.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")  # python scalar: not captured as a traced const


def _knn_kernel(n_valid_ref, data_ref, norms_ref, queries_ref, idx_out_ref,
                val_out_ref, best_vals, best_idx, *, tile_rows, k,
                num_tiles):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        best_vals[:] = jnp.full_like(best_vals, NEG_INF)
        best_idx[:] = jnp.zeros_like(best_idx)

    n_valid = n_valid_ref[0]
    row0 = i * tile_rows
    # (B, T) similarities on the MXU. Queries are pre-normalized by the
    # host wrapper; database rows are divided by their cached norms HERE
    # so the database itself is streamed untouched (no normalized copy —
    # that pre-pass cost two extra full HBM passes per call).
    sims = jax.lax.dot_general(
        queries_ref[:], data_ref[:].astype(jnp.float32)
        if data_ref.dtype != jnp.float32 else data_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    sims = sims / jnp.maximum(norms_ref[:], 1e-12)  # norms: (1, T)
    rows = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + row0
    sims = jnp.where(rows < n_valid, sims, NEG_INF)

    # merge the tile's k best into the running top-k
    def merge(j, sims):
        del j
        m = jnp.max(sims, axis=1, keepdims=True)            # (B, 1)
        am = jnp.argmax(sims, axis=1)                       # (B,)
        cur = best_vals[:]                                  # (B, k)
        cur_min = jnp.min(cur, axis=1, keepdims=True)
        cur_amin = jnp.argmin(cur, axis=1)
        better = m > cur_min                                # (B, 1)
        slot = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 1)
        hit = (slot == cur_amin[:, None]) & better
        best_vals[:] = jnp.where(hit, m, cur)
        best_idx[:] = jnp.where(hit, (am + row0)[:, None].astype(jnp.int32),
                                best_idx[:])
        # knock the taken element out of the tile
        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
        return jnp.where(col == am[:, None], NEG_INF, sims)

    jax.lax.fori_loop(0, k, merge, sims, unroll=True)

    @pl.when(i == num_tiles - 1)
    def _():
        # sort the k winners descending (k is tiny: selection sort)
        vals = best_vals[:]
        idxs = best_idx[:]

        def select(j, carry):
            vals, idxs, out_v, out_i = carry
            m = jnp.max(vals, axis=1, keepdims=True)
            am = jnp.argmax(vals, axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
            winner = col == am[:, None]
            # gather-free take_along_axis: masked sum over the k lane
            taken_idx = jnp.sum(jnp.where(winner, idxs, 0), axis=1,
                                keepdims=True)
            out_slot = col == j
            out_v = jnp.where(out_slot, m, out_v)
            out_i = jnp.where(out_slot, taken_idx, out_i)
            vals = jnp.where(winner, NEG_INF, vals)
            return vals, idxs, out_v, out_i

        init = (vals, idxs, jnp.zeros_like(vals),
                jnp.zeros_like(idxs))
        _, _, out_v, out_i = jax.lax.fori_loop(0, k, select, init,
                                               unroll=True)
        val_out_ref[:] = out_v
        idx_out_ref[:] = out_i


@functools.partial(jax.jit, static_argnames=("k", "tile_rows"))
def cosine_topk_pallas(data, n_valid, queries, k, tile_rows=1024,
                       data_norms=None):
    """Fused streaming top-k cosine search.

    Args:
      data: (N_cap, D) float32 or bfloat16 (bf16 halves the database's
        HBM traffic — the binding resource); N_cap % tile_rows == 0,
        D % 128 == 0 preferred.
      n_valid: scalar int32 valid-row count.
      queries: (B, D), normalized internally (cheap: B rows).
      k: static neighbor count.
      data_norms: optional (N_cap,) cached row norms (DescriptorDatabase
        maintains them incrementally). When absent they are computed
        here in one extra read pass; either way the database is never
        copied — rows are un-normalized inside the kernel tile.

    Returns (indices, sims) like ops.knn.cosine_topk.
    """
    N, D = data.shape
    B = queries.shape[0]
    assert N % tile_rows == 0, (N, tile_rows)
    num_tiles = N // tile_rows

    if data_norms is None:
        # barrier: keep the norm computation a separate materialized pass
        # (XLA otherwise recomputes row norms per consumer tile)
        data_norms = jax.lax.optimization_barrier(
            jnp.linalg.norm(data.astype(jnp.float32), axis=1))
    norms_row = data_norms.astype(jnp.float32).reshape(1, N)
    queries_n = queries.astype(jnp.float32)
    queries_n = queries_n / jnp.maximum(
        jnp.linalg.norm(queries_n, axis=1, keepdims=True), 1e-12)

    kernel = functools.partial(_knn_kernel, tile_rows=tile_rows, k=k,
                               num_tiles=num_tiles)
    idx, vals = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k), jnp.int32),
            jax.ShapeDtypeStruct((B, k), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, k), jnp.float32),
            pltpu.VMEM((B, k), jnp.int32),
        ],
    )(jnp.asarray([n_valid], dtype=jnp.int32), data, norms_row, queries_n)
    return idx, vals
