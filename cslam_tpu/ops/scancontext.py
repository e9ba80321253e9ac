"""Scan Context ops: polar descriptor extraction + rotation-invariant
matching, batched for TPU.

Replaces the reference's per-point Python loops
(/root/reference/cslam/lidar_pr/scancontext_utils.py):

- `pointcloud_to_scancontext`: ptcloud2sc semantics (:44-72) — ring index
  from planar radius, sector from azimuth in degrees, cell value =
  max(point z + 2.0, 0) with empty cells 0 — via one segment_max over
  flattened (ring, sector) bins instead of a Python point loop.
- `scancontext_distances`: distance_sc semantics (:78-114) — per-column
  cosine similarity averaged over mutually-engaged columns, maximized
  over all 60 cyclic sector shifts — as one batched einsum over
  (candidates x shifts x rings x sectors); the reference's 60-iteration
  np.roll loop becomes a gather. SURVEY §3.5 hot loop 5.

Static shapes: point clouds are padded with a validity mask.
"""

import functools

import jax
import jax.numpy as jnp

NUM_RING = 20
NUM_SECTOR = 60
MAX_LENGTH = 80.0


@functools.partial(jax.jit,
                   static_argnames=("num_ring", "num_sector"))
def pointcloud_to_scancontext(points, mask, num_ring=NUM_RING,
                              num_sector=NUM_SECTOR, max_length=MAX_LENGTH):
    """(N, 3) padded points + (N,) mask -> (num_ring, num_sector) SC.

    Matches ptcloud2sc: height = z + 2.0 ("ground roughly zero"),
    ring = floor(r / gap_ring) clipped to the outermost ring, sector from
    azimuth degrees in [0, 360). Cells with no points (or only negative
    heights) are 0, reproducing the reference's zeros-initialized
    max-pool storage."""
    pts = points.astype(jnp.float32)
    x = jnp.where(pts[:, 0] == 0.0, 1e-3, pts[:, 0])
    y = jnp.where(pts[:, 1] == 0.0, 1e-3, pts[:, 1])
    z = pts[:, 2]
    valid = mask.astype(bool) & jnp.isfinite(x) & jnp.isfinite(y) & \
        jnp.isfinite(z)
    theta = jnp.degrees(jnp.arctan2(y, x))
    theta = jnp.where(theta < 0, theta + 360.0, theta)
    radius = jnp.sqrt(x * x + y * y)
    gap_ring = max_length / num_ring
    gap_sector = 360.0 / num_sector
    ring = jnp.clip((radius // gap_ring).astype(jnp.int32), 0, num_ring - 1)
    sector = jnp.clip((theta // gap_sector).astype(jnp.int32), 0,
                      num_sector - 1)
    height = z + 2.0
    bins = ring * num_sector + sector
    bins = jnp.where(valid, bins, num_ring * num_sector)  # overflow bin
    flat = jax.ops.segment_max(
        jnp.where(valid, height, -jnp.inf), bins,
        num_segments=num_ring * num_sector + 1)
    sc = jnp.maximum(flat[:num_ring * num_sector], 0.0)  # empty/neg -> 0
    return sc.reshape(num_ring, num_sector)


def ring_key(sc):
    """Rotation-invariant ring key = row mean (sc2rk, :75-76)."""
    return jnp.mean(sc, axis=-1)


@jax.jit
def scancontext_distances(query_sc, candidate_scs):
    """Min-over-shifts SC distance of a query against a batch.

    Args:
      query_sc: (R, S).
      candidate_scs: (N, R, S).

    Returns:
      (dists, yaws): (N,) distance = 1 - best mean column cosine, and
      (N,) int32 yaw shift (argmax + 1, reference :110).
    """
    R, S = query_sc.shape
    # rolled_q[i] = query rolled so it compares against candidates rolled
    # by +(i+1) columns (reference rolls the candidate cumulatively).
    shifts = jnp.arange(1, S + 1)
    cols = jnp.arange(S)
    gather_idx = (cols[None, :] + shifts[:, None]) % S  # (S_shift, S)
    rolled_q = query_sc[:, gather_idx]               # (R, S_shift, S)
    rolled_q = jnp.transpose(rolled_q, (1, 0, 2))    # (S_shift, R, S)

    dots = jnp.einsum("irj,crj->cij", rolled_q, candidate_scs,
                      preferred_element_type=jnp.float32)
    q_norm = jnp.linalg.norm(rolled_q, axis=1)       # (S_shift, S)
    c_norm = jnp.linalg.norm(candidate_scs, axis=1)  # (N, S)
    engaged = (q_norm[None, :, :] > 0) & (c_norm[:, None, :] > 0)
    denom = jnp.maximum(q_norm[None, :, :] * c_norm[:, None, :], 1e-12)
    cossim = jnp.where(engaged, dots / denom, 0.0)
    counts = jnp.sum(engaged, axis=-1)
    sims = jnp.where(counts > 0,
                     jnp.sum(cossim, axis=-1) / jnp.maximum(counts, 1), 0.0)
    best = jnp.argmax(sims, axis=-1)
    return 1.0 - jnp.max(sims, axis=-1), (best + 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def ringkey_topk(ringkeys, n_valid, query_rk, k):
    """Brute-force L2 nearest ring keys (replaces the scipy KDTree stage,
    scancontext_matching.py:59-65) — one matmul-sized op on TPU."""
    diff = ringkeys - query_rk[None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    rows = jnp.arange(ringkeys.shape[0])
    d2 = jnp.where(rows < n_valid, d2, jnp.inf)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg_top
