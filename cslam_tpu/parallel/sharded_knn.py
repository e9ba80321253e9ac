"""Descriptor kNN sharded over a device mesh.

The database rows are sharded across chips; queries are replicated.
Each chip computes cosine top-k over its shard (one MXU matmul), the
per-shard winners are all-gathered (k*n_shards rows, tiny) and reduced to
the global top-k — an O(N/d) per-chip workload with O(k*d) ICI traffic,
the TPU mapping of SURVEY §5's "sharded descriptor database with
all-gathered queries".
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cslam_tpu.ops import knn


def sharded_cosine_topk(mesh: Mesh, data, n_valid, queries, k,
                        axis_name: str = "shard"):
    """Top-k cosine similarity over a row-sharded database.

    Args:
      mesh: 1-D device mesh.
      data: (N_cap, D) database; N_cap divisible by mesh size. Will be
        sharded over rows (if not already placed).
      n_valid: scalar int — valid rows in [0, N_cap) counted globally
        (rows are valid in order, shard boundaries handled per-shard).
      queries: (B, D) replicated queries.
      k: static top-k.

    Returns:
      (indices, sims): (B, k) global row indices and similarities.
    """
    n_shards = mesh.shape[axis_name]
    shard_rows = data.shape[0] // n_shards

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis_name, None), P(), P()),
        out_specs=(P(), P()), check_vma=False)
    def _local(data_shard, n_valid_g, queries_rep):
        shard_id = jax.lax.axis_index(axis_name)
        row0 = shard_id * shard_rows
        # valid rows within this shard
        local_valid = jnp.clip(n_valid_g - row0, 0, shard_rows)
        idx, sims = knn.cosine_topk(data_shard, local_valid, queries_rep, k)
        idx = idx + row0
        # gather winners from every shard and reduce to global top-k
        all_idx = jax.lax.all_gather(idx, axis_name, axis=1)  # (B, d, k)
        all_sims = jax.lax.all_gather(sims, axis_name, axis=1)
        all_idx = all_idx.reshape(queries_rep.shape[0], n_shards * k)
        all_sims = all_sims.reshape(queries_rep.shape[0], n_shards * k)
        top_sims, pos = jax.lax.top_k(all_sims, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        return top_idx, top_sims

    data = jax.device_put(data, NamedSharding(mesh, P(axis_name, None)))
    queries = jax.device_put(queries, NamedSharding(mesh, P()))
    return _local(data, jnp.asarray(n_valid, dtype=jnp.int32), queries)
