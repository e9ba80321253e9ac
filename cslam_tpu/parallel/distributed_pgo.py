"""Pose-graph optimization distributed over a device mesh.

Factor-parallel decomposition: between-factors shard across chips (each
robot's factor block lands contiguously, so the robot axis maps onto the
shard axis); pose estimates replicate. Every Gauss-Newton matvec is

    local gather -> batched (E/d, 6, 6) einsum -> scatter-add -> psum,

so the reduced normal equations are formed collectively (the TPU
equivalent of the reference's "aggregate everything on the elected
optimizer then solve", decentralized_pgo.cpp:602-681 + :853-886 — here
the solve itself is the collective). ICI traffic per CG iteration is one
psum of the (P, 6) state — independent of edge count.

The solver IS the single-chip solver: backend/pgo.py's
gnc_optimize_core runs inside a shard_map with an EdgeReduce of
psum/pmax over the mesh axis. Every round-4 single-chip win — BCR
chain preconditioner built once per LM solve (factored REPLICATED per
chip from psum'ed Hii/O blocks, zero extra ICI in the CG loop),
single-eval LM steps (the candidate evaluation doubles as accept cost
and next linearization), lambda/warm-start carry across GNC rounds —
applies here by construction; there is no separate algorithm to drift
out of date. Per-solve extra ICI beyond the per-CG-iteration (P, 6)
psums: two (P, 36) psums per LM solve for the preconditioner blocks.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cslam_tpu.backend.factor_graph import FactorGraph, GraphArrays
from cslam_tpu.backend import pgo as pgo_mod


def _shard_graph(mesh: Mesh, g: GraphArrays, axis_name: str):
    """Place edge arrays sharded, node arrays replicated."""
    eshard = NamedSharding(mesh, P(axis_name))
    eshard2 = NamedSharding(mesh, P(axis_name, None))
    eshard3 = NamedSharding(mesh, P(axis_name, None, None))
    rep = NamedSharding(mesh, P())
    return GraphArrays(
        R=jax.device_put(g.R, rep), t=jax.device_put(g.t, rep),
        node_mask=jax.device_put(g.node_mask, rep),
        e_i=jax.device_put(g.e_i, eshard),
        e_j=jax.device_put(g.e_j, eshard),
        R_meas=jax.device_put(g.R_meas, eshard3),
        t_meas=jax.device_put(g.t_meas, eshard2),
        sqrt_info=jax.device_put(g.sqrt_info, eshard3),
        edge_mask=jax.device_put(g.edge_mask, eshard),
        is_loop=jax.device_put(g.is_loop, eshard),
        prior_idx=jax.device_put(g.prior_idx, rep),
        prior_R=jax.device_put(g.prior_R, rep),
        prior_t=jax.device_put(g.prior_t, rep),
        prior_weight=jax.device_put(g.prior_weight, rep))


def distributed_gnc_optimize(mesh: Mesh, g: GraphArrays,
                             cfg: pgo_mod.PGOConfig = pgo_mod.PGOConfig(),
                             axis_name: str = "shard"):
    """GNC-LM solve with factors sharded over `mesh`.

    The shard_map body is exactly backend/pgo.gnc_optimize_core on the
    local factor shard with psum/pmax reductions. Poses stay replicated
    (identical on every chip by construction — all updates are computed
    from psum-reduced quantities).
    """
    n_shards = mesh.shape[axis_name]
    assert g.e_i.shape[0] % n_shards == 0

    # Chordal init needs the FULL edge set; run it replicated, before
    # sharding (same split as the single-chip optimize() entry).
    if cfg.use_chordal_init:
        from cslam_tpu.backend.initialization import chordal_initialize
        R0, t0 = chordal_initialize(g)
        g = g._replace(R=R0, t=t0)
        cfg = cfg._replace(use_chordal_init=False)

    g_sharded = _shard_graph(mesh, g, axis_name)

    edge_specs = GraphArrays(
        R=P(), t=P(), node_mask=P(),
        e_i=P(axis_name), e_j=P(axis_name),
        R_meas=P(axis_name, None, None), t_meas=P(axis_name, None),
        sqrt_info=P(axis_name, None, None),
        edge_mask=P(axis_name), is_loop=P(axis_name),
        prior_idx=P(), prior_R=P(), prior_t=P(), prior_weight=P())
    result_specs = pgo_mod.PGOResult(
        R=P(), t=P(), cost=P(), initial_cost=P(), gnc_iters=P(),
        weights=P(axis_name))

    red = pgo_mod.EdgeReduce(
        sum=lambda x: jax.lax.psum(x, axis_name),
        max=lambda x: jax.lax.pmax(x, axis_name))

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(edge_specs,),
                       out_specs=result_specs, check_vma=False)
    def _solve(gl: GraphArrays):
        return pgo_mod.gnc_optimize_core(gl, cfg, red=red)

    return _solve(g_sharded)


def optimize(mesh: Mesh, fg: FactorGraph,
             cfg: pgo_mod.PGOConfig = pgo_mod.PGOConfig()):
    n = mesh.shape[list(mesh.shape.keys())[0]]
    # robot-contiguous factor blocks: robots map onto the shard axis
    g = fg.to_arrays(edge_bucket_multiple=n, sort_by_robot=True)
    result = distributed_gnc_optimize(mesh, g, cfg)
    fg.update_estimates(result.R, result.t)
    return result
