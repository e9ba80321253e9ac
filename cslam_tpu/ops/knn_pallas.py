"""Fused cosine-similarity top-k kNN as a Pallas TPU kernel.

The XLA path (ops/knn.py) materializes the full (B, N) similarity matrix
in HBM before top-k. This kernel streams database tiles through VMEM,
computes each tile's similarities on the MXU, and maintains a running
top-k per query in VMEM scratch — HBM traffic drops from
O(N*D + B*N) to O(N*D + B*k): for large databases the search becomes
purely database-bandwidth/MXU-bound (the speed-of-light for brute-force
search). SURVEY §2 #4: the per-chip kNN kernel target.

Two design points that make it actually reach that bound (the first
version lost to plain XLA top_k by 20%):

- **Early-exit merge.** A tile only contributes to a query's top-k when
  some tile similarity beats the query's current k-th best. After the
  first few tiles that is rare (for i.i.d. data the expected number of
  top-k updates over the whole stream is ~k ln(num_tiles)), so the
  merge is a while_loop whose condition is one (B, T) row-max away:
  almost every tile pays matmul + 2 cheap VPU passes and skips the
  k-pass selection entirely. Each merge trip consumes the tile argmax
  per improvable query, so the loop runs at most k trips on the tiles
  that do have candidates.
- **Fused normalize+mask.** Instead of dividing by norms and building a
  validity mask from iota per tile (4 extra (B, T) VPU passes), the
  wrapper precomputes masked inverse norms and an additive -inf-like
  bias once per call ((N,)-sized, one cheap pass), and the kernel does
  a single fused multiply-add.

Requirements: D and the row-tile size aligned to lanes (pad the
descriptor dim to a multiple of 128); queries pre-normalized or
normalized here; N_cap a multiple of the tile.

Merge-restructure attempts that LOST on real v5e (r2, 131072x512 B=256;
keep for the record before trying "obvious" improvements again). The
matmul+rowmax floor is 0.20 ms bf16 / 0.36 ms f32 (measured
matmul-only), this kernel runs 0.55-0.59 ms, so the merge costs
~0.2-0.35 ms — but:
- segment-granular gating (gate + while-loop per 128/256/512-row slice
  instead of per tile, to scan fewer bytes per trip): 1.0-1.6 ms, 2-3x
  WORSE. Per-gate scalar branching and narrow-slice reductions dwarf
  the saved bytes.
- two-level group-summary merge (lane-strided per-group max/argmax
  summary built in the fma pass; serve 2-8 candidates per trip from the
  (B, 256) summary; fused knockout+rebuild pass): 0.75-1.5 ms, worse,
  and degrades as serve grows — (B, G) small-pass extraction overhead
  exceeds the full-tile passes it replaces.
- row-major vs column-major database layout for the tile matmul:
  identical (Mosaic handles the contraction either way).
With a 256-query batch every tile contains some query's next top-k
candidate (P ~ 1-(1-k/t)^B), so merge work is irreducible at roughly
one update per query per tile; the simple full-tile argmax trip is the
cheapest per-update structure of the four designs measured.

Round-4 addendum (1M rows x 512, bf16, B=256 — the regime where exact
sits at ~2.4x the HBM floor): query_groups=4 (merge gated/looped per
64-query slice) measured 2.93 ms/batch vs 3.06 at G=1 — a real but
marginal 4% (BENCH_DETAIL knn_1m pallas_exact_g4). The remaining gap
is irreducible merge updates, not gating: at 1M rows each query
expects ~k*ln(512) ~ 60 updates and they spread over most tiles at any
grouping. The threshold-certificate two-pass was already measured
LOSING at 100k (r2); with the per-update floor above it cannot win at
1M either (candidate tiles are ~all tiles for any whole-batch
threshold). approx_max_k (1.57 ms, recall 0.95) remains the documented
pick when 1M-row throughput matters more than exactness.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -3.0e38  # finite "-inf": avoids 0 * inf = NaN in the fma


def _knn_kernel(data_ref, inv_ref, bias_ref, queries_ref, idx_out_ref,
                val_out_ref, best_vals, best_idx, sims_ref, *, tile_rows, k,
                num_tiles, query_groups=1):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        best_vals[:] = jnp.full_like(best_vals, NEG_LARGE)
        best_idx[:] = jnp.zeros_like(best_idx)

    row0 = i * tile_rows
    # (B, T) similarities on the MXU. Queries are pre-normalized by the
    # host wrapper; database rows are un-normalized HERE via the masked
    # inverse norms so the database itself is streamed untouched (no
    # normalized copy — that pre-pass cost two extra HBM passes per
    # call). Invalid rows get inv=0 and bias=NEG_LARGE in one fma.
    # bf16 tiles feed the MXU's native bf16 path (f32 accumulation):
    # half the HBM traffic AND ~2x the matmul rate vs f32 — an explicit
    # up-cast before the dot would forfeit both.
    sims = jax.lax.dot_general(
        queries_ref[:], data_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    sims = sims * inv_ref[:] + bias_ref[:]  # inv/bias: (1, T)

    rm0 = jnp.max(sims, axis=1)                        # (B,)
    cmin0 = jnp.min(best_vals[:], axis=1)              # (B,)

    # Tiles with no candidate beating any query's current k-th best (the
    # overwhelming majority once the stream is warm) skip the merge
    # entirely. Inside, the while_loop carries only (B,)-sized values —
    # the tile similarities live in a VMEM scratch ref; a big (B, T)
    # loop carry measured ~2x slower. Each trip consumes the tile argmax
    # of every still-improvable query, so <= k trips.
    #
    # query_groups > 1 slices the merge along the QUERY axis: each
    # group gates and loops over its own (B/G, T) slice, so one
    # query's candidate no longer drags the full (B, T) scan through
    # every trip. Meant for the 1M-row regime where merge trips are
    # the whole gap to the HBM floor; at 100k (the headline) G=1 stays
    # best. (B-axis analog of the T-axis segment gating that LOST —
    # module docstring — but with 4x-larger slices and 4x-fewer gates.)
    B = best_vals.shape[0]
    group_rows = B // query_groups
    for g in range(query_groups):
        lo = g * group_rows

        def _merge_group(lo=lo):
            rm0_g = rm0[lo:lo + group_rows]
            cmin0_g = cmin0[lo:lo + group_rows]

            @pl.when(jnp.any(rm0_g > cmin0_g))
            def _():
                sims_ref[lo:lo + group_rows, :] = \
                    sims[lo:lo + group_rows, :]

                def cond(carry):
                    rm, cmin, trips = carry
                    return jnp.any(rm > cmin) & (trips < k)

                def body(carry):
                    rm, cmin, trips = carry
                    s = sims_ref[lo:lo + group_rows, :]
                    am = jnp.argmax(s, axis=1)
                    better = rm > cmin
                    bv = best_vals[lo:lo + group_rows, :]
                    cam = jnp.argmin(bv, axis=1)
                    slot = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 1)
                    hit = (slot == cam[:, None]) & better[:, None]
                    best_vals[lo:lo + group_rows, :] = jnp.where(
                        hit, rm[:, None], bv)
                    best_idx[lo:lo + group_rows, :] = jnp.where(
                        hit, (am + row0)[:, None].astype(jnp.int32),
                        best_idx[lo:lo + group_rows, :])
                    # knock the taken element out of the tile
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col == am[:, None], NEG_LARGE, s)
                    sims_ref[lo:lo + group_rows, :] = s
                    return (jnp.max(s, axis=1),
                            jnp.min(best_vals[lo:lo + group_rows, :],
                                    axis=1),
                            trips + 1)

                jax.lax.while_loop(cond, body,
                                   (rm0_g, cmin0_g, jnp.int32(0)))

        _merge_group()

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
            vals = jnp.where(winner, NEG_LARGE, vals)
            return vals, idxs, out_v, out_i

        init = (vals, idxs, jnp.zeros_like(vals),
                jnp.zeros_like(idxs))
        _, _, out_v, out_i = jax.lax.fori_loop(0, k, select, init,
                                               unroll=True)
        val_out_ref[:] = out_v
        idx_out_ref[:] = out_i


@functools.partial(jax.jit, static_argnames=("k", "tile_rows",
                                             "query_groups"))
def cosine_topk_pallas(data, n_valid, queries, k, tile_rows=None,
                       data_norms=None, query_groups=1):
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

    Returns (indices, sims) like ops.knn.cosine_topk (invalid/missing
    slots carry ~-3e38 instead of -inf).
    """
    N, D = data.shape
    B = queries.shape[0]
    if tile_rows is None:
        # 2048-row tiles amortize per-tile merge checks best on v5e
        # (measured: 1024 tiles have ~2x the N-independent overhead);
        # small databases fall back to a single tile.
        tile_rows = 2048 if N % 2048 == 0 else N
    assert N % tile_rows == 0, (N, tile_rows)
    num_tiles = N // tile_rows

    if data_norms is None:
        # barrier: keep the norm computation a separate materialized pass
        # (XLA otherwise recomputes row norms per consumer tile)
        data_norms = jax.lax.optimization_barrier(
            jnp.linalg.norm(data.astype(jnp.float32), axis=1))
    valid = jnp.arange(N) < n_valid
    inv_row = jnp.where(
        valid, 1.0 / jnp.maximum(data_norms.astype(jnp.float32), 1e-12),
        0.0).reshape(1, N)
    bias_row = jnp.where(valid, 0.0, NEG_LARGE).astype(
        jnp.float32).reshape(1, N)
    queries_n = queries.astype(jnp.float32)
    queries_n = queries_n / jnp.maximum(
        jnp.linalg.norm(queries_n, axis=1, keepdims=True), 1e-12)
    # match the database dtype so the MXU runs its native mixed path
    queries_n = queries_n.astype(data.dtype)

    assert B % query_groups == 0, (B, query_groups)
    kernel = functools.partial(_knn_kernel, tile_rows=tile_rows, k=k,
                               num_tiles=num_tiles,
                               query_groups=query_groups)
    idx, vals = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i),
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
            pltpu.VMEM((B, tile_rows), jnp.float32),
        ],
    )(data, inv_row, bias_row, queries_n)
    return idx, vals
