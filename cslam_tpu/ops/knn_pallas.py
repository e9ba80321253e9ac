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
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -3.0e38  # finite "-inf": avoids 0 * inf = NaN in the fma


def _knn_kernel(data_ref, inv_ref, bias_ref, queries_ref, idx_out_ref,
                val_out_ref, best_vals, best_idx, sims_ref, *, tile_rows, k,
                num_tiles, seg_rows=None):
    if seg_rows is None:
        # Tile-granular merging is the measured optimum: seg_rows <
        # tile_rows looked attractive (scan 8x fewer bytes per trip) but
        # measured 2-3x SLOWER on v5e (0.58 -> 1.0-1.6 ms at
        # seg=128..512) — per-gate scalar branching and narrow-slice
        # reductions cost more than the saved bytes. Kept as a parameter
        # for the record; see _knn_kernel_two_level for the approach
        # that actually beats this one.
        seg_rows = tile_rows
    num_segs = tile_rows // seg_rows
    assert tile_rows % seg_rows == 0, (tile_rows, seg_rows)
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
    sims_ref[:] = sims * inv_ref[:] + bias_ref[:]  # inv/bias: (1, T)

    # Per-SEGMENT row maxes in one pass over the tile. The merge below
    # then touches only (B, seg_rows)-wide slices: with a large query
    # batch nearly every 2048-row tile contains SOME query's next top-k
    # candidate (P ~ 1 - (1 - k/t)^B), so a tile-granular gate never
    # skips and every merge trip paid full-tile VPU passes — measured
    # 0.35 ms of a 0.55 ms bf16 call (matmul+rowmax floor: 0.20 ms).
    # Segment granularity keeps the matmul big (MXU) while the selection
    # scans ~8x fewer bytes per trip.
    seg_maxes = [
        jnp.max(sims_ref[:, s * seg_rows:(s + 1) * seg_rows], axis=1)
        for s in range(num_segs)]

    cmin0 = jnp.min(best_vals[:], axis=1)              # (B,)

    for s in range(num_segs):  # static unroll: num_segs is small
        rm_s = seg_maxes[s]
        # Gate per segment; cmin0 is a snapshot — merges in earlier
        # segments only RAISE the true k-th best, so a stale (lower)
        # cmin can only admit extra no-op trips, never skip a needed
        # one: inside the loop `better` re-reads the live best_vals.
        @pl.when(jnp.any(rm_s > cmin0))
        def _(s=s, rm_s=rm_s):
            lo = s * seg_rows

            def cond(carry):
                rm, cmin, trips = carry
                return jnp.any(rm > cmin) & (trips < k)

            def body(carry):
                rm, cmin, trips = carry
                seg = sims_ref[:, lo:lo + seg_rows]
                am = jnp.argmax(seg, axis=1)
                better = rm > cmin
                cam = jnp.argmin(best_vals[:], axis=1)
                slot = jax.lax.broadcasted_iota(jnp.int32, best_vals.shape,
                                                1)
                hit = (slot == cam[:, None]) & better[:, None]
                best_vals[:] = jnp.where(hit, rm[:, None], best_vals[:])
                best_idx[:] = jnp.where(
                    hit, (am + (row0 + lo))[:, None].astype(jnp.int32),
                    best_idx[:])
                # knock the taken element out of the segment
                col = jax.lax.broadcasted_iota(jnp.int32, seg.shape, 1)
                seg = jnp.where(col == am[:, None], NEG_LARGE, seg)
                sims_ref[:, lo:lo + seg_rows] = seg
                return (jnp.max(seg, axis=1),
                        jnp.min(best_vals[:], axis=1), trips + 1)

            jax.lax.while_loop(
                cond, body,
                (rm_s, jnp.min(best_vals[:], axis=1), jnp.int32(0)))

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


def _sort_winners(best_vals, best_idx, val_out_ref, idx_out_ref, k):
    """Write the (B, k) running winners to the outputs, sorted
    descending (k is tiny: unrolled selection sort, gather-free)."""
    vals = best_vals[:]
    idxs = best_idx[:]

    def select(j, carry):
        vals, idxs, out_v, out_i = carry
        m = jnp.max(vals, axis=1, keepdims=True)
        am = jnp.argmax(vals, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        winner = col == am[:, None]
        taken_idx = jnp.sum(jnp.where(winner, idxs, 0), axis=1,
                            keepdims=True)
        out_slot = col == j
        out_v = jnp.where(out_slot, m, out_v)
        out_i = jnp.where(out_slot, taken_idx, out_i)
        vals = jnp.where(winner, NEG_LARGE, vals)
        return vals, idxs, out_v, out_i

    init = (vals, idxs, jnp.zeros_like(vals), jnp.zeros_like(idxs))
    _, _, out_v, out_i = jax.lax.fori_loop(0, k, select, init, unroll=True)
    val_out_ref[:] = out_v
    idx_out_ref[:] = out_i


def _knn_kernel_two_level(data_ref, inv_ref, bias_ref, queries_ref,
                          idx_out_ref, val_out_ref, best_vals, best_idx,
                          sims_ref, gmax_ref, warg_ref, *, tile_rows, k,
                          num_tiles, lanes=None, serve=4):
    """Two-level streaming top-k merge (the fast exact kernel).

    The tile-granular kernel's merge cost is 3 full (B, T) VPU passes
    per trip, one candidate consumed per trip — with a 256-query batch
    every tile triggers it, and it dominates the call (0.35 ms of
    0.55 ms bf16; matmul floor 0.20 ms). This kernel restructures the
    merge around a (B, G) GROUP-MAX summary (G = lane count, groups are
    lane-strided so group reductions are J elementwise slice ops, never
    a reshape):

    - build: the fma pass that masks/normalizes the tile also builds
      gmax (per-group max) and warg (which of the J strided slices holds
      it) — the summary costs no extra traversal.
    - trip: extract the top-`serve` groups per query from (B, G) (small
      passes), insert them into the (B, k) winners sequentially
      (descending, so one argmin replacement each), then ONE fused
      (B, T) pass knocks all taken elements out AND rebuilds gmax/warg.
      A trip consumes up to `serve` candidates per query for ~1 full
      pass instead of 3 per candidate.

    Exactness: all candidates flow through group maxes; a knocked-out
    group rebuilds to its next-best member, so a group holding several
    of a query's true top-k yields them across trips. Non-inserted
    extractions (value <= current k-th best) are dead by monotonicity —
    the k-th best only rises — so knocking them out too is safe. The
    <= k trip bound holds: any improvable query consumes >= 1 candidate
    per trip.
    """
    if lanes is None:
        lanes = min(256, tile_rows)
    G = lanes
    J = tile_rows // G
    assert tile_rows % G == 0, (tile_rows, G)
    serve = min(serve, k)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        best_vals[:] = jnp.full_like(best_vals, NEG_LARGE)
        best_idx[:] = jnp.zeros_like(best_idx)

    row0 = i * tile_rows
    sims = jax.lax.dot_general(
        queries_ref[:], data_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # fused fma + scratch write + group-summary build. Group g holds the
    # lane-strided columns {g, G+g, ..., (J-1)G+g}: slice j is
    # sims[:, jG:(j+1)G], so the "reduction over the group" is J
    # elementwise maxes of lane-aligned slices.
    gm = None
    wa = None
    for j in range(J):
        lo = j * G
        s_j = (sims[:, lo:lo + G] * inv_ref[:, lo:lo + G]
               + bias_ref[:, lo:lo + G])
        sims_ref[:, lo:lo + G] = s_j
        if gm is None:
            gm = s_j
            wa = jnp.zeros(s_j.shape, jnp.int32)
        else:
            upd = s_j > gm
            gm = jnp.where(upd, s_j, gm)
            wa = jnp.where(upd, j, wa)
    gmax_ref[:] = gm
    warg_ref[:] = wa

    rm0 = jnp.max(gm, axis=1)                          # (B,)
    cmin0 = jnp.min(best_vals[:], axis=1)              # (B,)

    @pl.when(jnp.any(rm0 > cmin0))
    def _():
        def cond(carry):
            rm, cmin, trips = carry
            return jnp.any(rm > cmin) & (trips < k)

        def body(carry):
            rm, cmin, trips = carry
            g = gmax_ref[:]
            lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
            slot = jax.lax.broadcasted_iota(jnp.int32, best_vals.shape, 1)

            # extract the top-`serve` group maxes per query (descending
            # by construction) and insert each into the winners
            taken_cols = []
            for c in range(serve):
                mv = jnp.max(g, axis=1)                # (B,)
                am = jnp.argmax(g, axis=1)             # (B,)
                hitl = lane == am[:, None]
                g = jnp.where(hitl, NEG_LARGE, g)
                # which strided slice holds this group's max
                wj = jnp.sum(jnp.where(hitl, warg_ref[:], 0), axis=1)
                better = mv > cmin
                cam = jnp.argmin(best_vals[:], axis=1)
                hit = (slot == cam[:, None]) & better[:, None]
                tcol = wj * G + am                     # flat tile column
                best_vals[:] = jnp.where(hit, mv[:, None], best_vals[:])
                best_idx[:] = jnp.where(
                    hit, (tcol + row0)[:, None].astype(jnp.int32),
                    best_idx[:])
                cmin = jnp.min(best_vals[:], axis=1)
                taken_cols.append(tcol[:, None])       # (B, 1)

            # ONE fused pass: knock every taken element out of the tile
            # and rebuild the group summary. Dead test = one compare per
            # candidate against the flat column index.
            gm = None
            wa = None
            for j in range(J):
                lo = j * G
                s_j = sims_ref[:, lo:lo + G]
                col_flat = lane + lo
                dead = col_flat == taken_cols[0]
                for c in range(1, serve):
                    dead = dead | (col_flat == taken_cols[c])
                s_j = jnp.where(dead, NEG_LARGE, s_j)
                sims_ref[:, lo:lo + G] = s_j
                if gm is None:
                    gm = s_j
                    wa = jnp.zeros(s_j.shape, jnp.int32)
                else:
                    upd = s_j > gm
                    gm = jnp.where(upd, s_j, gm)
                    wa = jnp.where(upd, j, wa)
            gmax_ref[:] = gm
            warg_ref[:] = wa
            return jnp.max(gm, axis=1), cmin, trips + 1

        jax.lax.while_loop(cond, body, (rm0, cmin0, jnp.int32(0)))

    @pl.when(i == num_tiles - 1)
    def _():
        _sort_winners(best_vals, best_idx, val_out_ref, idx_out_ref, k)


@functools.partial(jax.jit, static_argnames=("k", "tile_rows", "seg_rows",
                                             "algo", "serve"))
def cosine_topk_pallas(data, n_valid, queries, k, tile_rows=None,
                       data_norms=None, seg_rows=None, algo="tile",
                       serve=4):
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

    scratch = [
        pltpu.VMEM((B, k), jnp.float32),
        pltpu.VMEM((B, k), jnp.int32),
        pltpu.VMEM((B, tile_rows), jnp.float32),
    ]
    if algo == "two_level":
        G = min(256, tile_rows)
        kernel = functools.partial(_knn_kernel_two_level,
                                   tile_rows=tile_rows, k=k,
                                   num_tiles=num_tiles, lanes=G,
                                   serve=serve)
        scratch += [pltpu.VMEM((B, G), jnp.float32),
                    pltpu.VMEM((B, G), jnp.int32)]
    else:
        kernel = functools.partial(_knn_kernel, tile_rows=tile_rows, k=k,
                                   num_tiles=num_tiles, seg_rows=seg_rows)
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
        scratch_shapes=scratch,
    )(data, inv_row, bias_row, queries_n)
    return idx, vals
