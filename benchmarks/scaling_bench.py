#!/usr/bin/env python
"""Multi-chip scaling benchmark: sharded kNN + distributed PGO throughput
vs mesh size (BASELINE.md: >= 0.8 scaling efficiency at 4 shards).

IMPORTANT: meaningful throughput/efficiency numbers require REAL
multi-chip hardware (set CSLAM_SCALING_REAL=1). On a single-chip or
chip-less environment this falls back to N virtual CPU devices, where
collectives serialize through one host — those runs validate that the
sharded programs compile and execute at every mesh size (correctness /
compile-coverage), not performance. Writes benchmarks/SCALING.json with
a `virtual_devices` flag so downstream consumers don't misread proxy
numbers as chip scaling.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache", "cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # scaling needs a multi-device mesh: unless CSLAM_SCALING_REAL is set
    # (real multichip hardware), use the virtual CPU pool — the backend
    # must be chosen before any device query.
    if not os.environ.get("CSLAM_SCALING_REAL"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cslam_tpu.parallel import make_swarm_mesh
    from cslam_tpu.parallel.sharded_knn import sharded_cosine_topk
    from cslam_tpu.parallel import distributed_pgo
    from cslam_tpu.backend import pgo
    from cslam_tpu.backend.factor_graph import (BetweenFactor, FactorGraph,
                                                diag_sqrt_info)
    from cslam_tpu.ops import se3

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", file=sys.stderr)
    rng = np.random.default_rng(0)

    results = {"platform": jax.devices()[0].platform,
               "virtual_devices": not os.environ.get("CSLAM_SCALING_REAL"),
               "knn": {}, "pgo": {}}

    # virtual-device runs only need compile/exec coverage: tiny workloads
    if results["virtual_devices"]:
        knn_iters, pgo_iters = 2, 1
    else:
        knn_iters, pgo_iters = 20, 3

    # ---- sharded kNN scaling ----
    N, D, B, k = 32768, 256, 64, 10
    data = jnp.asarray(rng.standard_normal((N, D)), dtype=jnp.float32)
    queries = jnp.asarray(rng.standard_normal((B, D)), dtype=jnp.float32)
    for shards in [1, 2, 4, 8]:
        if shards > n_dev:
            continue
        mesh = make_swarm_mesh(shards)
        idx, _ = sharded_cosine_topk(mesh, data, N, queries, k)
        idx.block_until_ready()
        t0 = time.perf_counter()
        iters = knn_iters
        for _ in range(iters):
            idx, _ = sharded_cosine_topk(mesh, data, N, queries, k)
        idx.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        results["knn"][shards] = B / dt
        print(f"knn shards={shards}: {B/dt:,.0f} q/s", file=sys.stderr)

    # ---- distributed PGO scaling ----
    n_poses = 256
    fg = FactorGraph()
    sq = diag_sqrt_info([0.01] * 3 + [0.05] * 3)
    for kk in range(n_poses - 1):
        xi = rng.standard_normal(6).astype(np.float32) * 0.1
        dR, dt_ = se3.se3_exp(jnp.asarray(xi))
        fg.add_between(BetweenFactor((0, kk), (0, kk + 1), np.asarray(dR),
                                     np.asarray(dt_), sq))
    for _ in range(64):
        i, j = sorted(rng.integers(0, n_poses, size=2).tolist())
        if j - i < 2:
            continue
        fg.add_between(BetweenFactor((0, i), (0, j),
                                     np.eye(3, dtype=np.float32),
                                     np.zeros(3, dtype=np.float32), sq,
                                     is_loop=True))
    fg.set_prior((0, 0))
    cfg = pgo.PGOConfig(lm_max_iters=3, cg_max_iters=15,
                        gnc_max_outer_iters=2)
    # distributed-PGO compiles are minutes each on CPU; two points give
    # the scaling slope
    for shards in [1, 8]:
        if shards > n_dev:
            continue
        mesh = make_swarm_mesh(shards)
        g = fg.to_arrays(edge_bucket_multiple=shards)
        res = distributed_pgo.distributed_gnc_optimize(mesh, g, cfg)
        res.t.block_until_ready()
        t0 = time.perf_counter()
        iters = pgo_iters
        for _ in range(iters):
            res = distributed_pgo.distributed_gnc_optimize(mesh, g, cfg)
        res.t.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        results["pgo"][shards] = 1.0 / dt
        print(f"pgo shards={shards}: {dt*1e3:.1f} ms/solve", file=sys.stderr)

    # Publish efficiency ONLY on real multi-device hardware: virtual
    # CPU devices serialize every collective through one host, so an
    # "efficiency" column there measures the serialization, not the
    # kernel (round-2 verdict: the 0.10@8 figure invited misreading
    # even flagged). The raw per-shard numbers stay for
    # compile-coverage; benchmarks/HOST_SCALING.json carries the
    # measured protocol-layer scaling.
    if results["virtual_devices"]:
        results["knn_scaling_efficiency"] = None
        results["efficiency_note"] = (
            "not meaningful on virtual (single-host) devices — "
            "collectives serialize through one CPU; run on a real "
            "multi-chip mesh for efficiency numbers")
    else:
        base = min(results["knn"])
        results["knn_scaling_efficiency"] = {
            s: results["knn"][s] / (results["knn"][base] * s / base)
            for s in results["knn"]
        }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/SCALING.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["knn_scaling_efficiency"]))


if __name__ == "__main__":
    main()
