"""Padded, static-shape factor-graph containers for TPU PGO.

The reference back-end builds a gtsam::NonlinearFactorGraph of Pose3
BetweenFactors keyed by LabeledSymbol('g', 'A'+robot_id, keyframe_id)
(/root/reference/src/back_end/decentralized_pgo.cpp:250-367,
gtsam_utils.h:19-21). Here the graph is arrays:

- nodes: (P, 3, 3) rotations + (P, 3) translations + validity mask, with a
  parallel (P, 2) table of (robot_id, keyframe_id) labels for the
  multi-robot key scheme;
- between factors: endpoint indices, SE(3) measurements, 6x6 sqrt-info
  whitening blocks, masks, and an is-loop flag (GNC applies to loop
  closures; odometry/prior factors are trusted);
- one gauge prior (reference adds a prior on the optimizer's first pose,
  decentralized_pgo.cpp:902-904).

P and E are padded to power-of-two buckets so recompilation only happens
on capacity growth. Padded edges have endpoints (0, 0), identity
measurement, zero mask — they contribute exactly nothing.
"""

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class BetweenFactor(NamedTuple):
    """Host-side factor description: key_from/key_to are (robot_id, kf_id)."""
    key_from: Tuple[int, int]
    key_to: Tuple[int, int]
    R: np.ndarray  # (3, 3)
    t: np.ndarray  # (3,)
    sqrt_info: np.ndarray  # (6, 6), whitening, [omega, v] ordering
    is_loop: bool = False


class GraphArrays(NamedTuple):
    """Device-side pytree consumed by the jitted optimizer."""
    R: jnp.ndarray          # (P, 3, 3)
    t: jnp.ndarray          # (P, 3)
    node_mask: jnp.ndarray  # (P,)
    e_i: jnp.ndarray        # (E,)
    e_j: jnp.ndarray        # (E,)
    R_meas: jnp.ndarray     # (E, 3, 3)
    t_meas: jnp.ndarray     # (E, 3)
    sqrt_info: jnp.ndarray  # (E, 6, 6)
    edge_mask: jnp.ndarray  # (E,)
    is_loop: jnp.ndarray    # (E,)
    prior_idx: jnp.ndarray  # () int32
    prior_R: jnp.ndarray    # (3, 3)
    prior_t: jnp.ndarray    # (3,)
    prior_weight: jnp.ndarray  # ()


def _next_pow2(n: int, minimum: int = 16) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def diag_sqrt_info(noise_std: Sequence[float]) -> np.ndarray:
    """sqrt-information from a 6-vector of noise sigmas ([omega, v] order),
    the reference's PoseGraphEdge noise_std encoding (gtsam_utils.cpp)."""
    std = np.asarray(noise_std, dtype=np.float32)
    return np.diag(1.0 / np.maximum(std, 1e-12))


def noise_std_of(sqrt_info: np.ndarray) -> np.ndarray:
    """Inverse of diag_sqrt_info: per-axis sigmas from a sqrt-information
    matrix. The wire format carries only the 6 diagonal sigmas (matching
    the reference's PoseGraphEdge.noise_std[6]); off-diagonal information
    is dropped at serialization, exactly as in the reference."""
    d = np.abs(np.diag(np.asarray(sqrt_info, dtype=np.float32)))
    return (1.0 / np.maximum(d, 1e-12)).astype(np.float32)


class FactorGraph:
    """Host-side builder mapping (robot_id, keyframe_id) keys to padded
    arrays. Append-only; `to_arrays()` produces the jit input."""

    def __init__(self):
        self.key_to_index: Dict[Tuple[int, int], int] = {}
        self.keys: List[Tuple[int, int]] = []
        self.R: List[np.ndarray] = []
        self.t: List[np.ndarray] = []
        self.factors: List[BetweenFactor] = []
        self.prior_key: Optional[Tuple[int, int]] = None
        self.prior_R = np.eye(3, dtype=np.float32)
        self.prior_t = np.zeros(3, dtype=np.float32)
        self.prior_weight = 1e4
        # incremental to_arrays cache: mission solves call to_arrays
        # once per optimization round on a graph that only appended a
        # few nodes/factors since the last round — rebuilding all 13
        # arrays (an O(E) python loop) and re-uploading every one of
        # them (each jnp.asarray upload is its own ~30 ms relay
        # roundtrip on the axon backend, CLAUDE.md) dominated the
        # wall-device gap. The cache keeps the padded numpy mirrors
        # plus the device arrays and re-uploads only fields whose rows
        # actually changed.
        self._cache = None
        self._estimates_dirty = True
        self._prior_dirty = True

    def add_node(self, key: Tuple[int, int], R=None, t=None) -> int:
        if key in self.key_to_index:
            idx = self.key_to_index[key]
            if R is not None:
                self.R[idx] = np.asarray(R, dtype=np.float32)
                self.t[idx] = np.asarray(t, dtype=np.float32)
                self._estimates_dirty = True
            return idx
        idx = len(self.keys)
        self.key_to_index[key] = idx
        self.keys.append(key)
        self.R.append(
            np.eye(3, dtype=np.float32) if R is None else np.asarray(
                R, dtype=np.float32))
        self.t.append(
            np.zeros(3, dtype=np.float32) if t is None else np.asarray(
                t, dtype=np.float32))
        return idx

    def add_between(self, factor: BetweenFactor):
        self.add_node(factor.key_from)
        self.add_node(factor.key_to)
        self.factors.append(factor)

    def set_prior(self, key: Tuple[int, int], R=None, t=None,
                  weight: float = 1e4):
        self.add_node(key)
        self.prior_key = key
        if R is not None:
            self.prior_R = np.asarray(R, dtype=np.float32)
            self.prior_t = np.asarray(t, dtype=np.float32)
        self.prior_weight = weight
        self._prior_dirty = True

    @property
    def num_nodes(self):
        return len(self.keys)

    @property
    def num_factors(self):
        return len(self.factors)

    def to_arrays(self, edge_bucket_multiple: int = 1,
                  sort_by_robot: bool = False,
                  min_node_capacity: int = 0,
                  min_edge_capacity: int = 0) -> GraphArrays:
        """edge_bucket_multiple: round the edge bucket up so it divides
        evenly over a device mesh of that size (factor-parallel PGO).

        sort_by_robot: stable-sort factors by owning robot (min robot id
        of the endpoints) so each robot's factor block lands contiguously
        — under the distributed solver's equal-split sharding, robots then
        map onto the mesh shard axis (SURVEY §2 'robot-level data
        decomposition' -> mesh axis).

        min_node_capacity / min_edge_capacity: force at least this much
        padding (batched solves stack graphs into shared buckets)."""
        P = max(_next_pow2(max(self.num_nodes, 2)), min_node_capacity)
        E = max(_next_pow2(max(self.num_factors, 1)), min_edge_capacity)
        if edge_bucket_multiple > 1 and E % edge_bucket_multiple:
            E = ((E + edge_bucket_multiple - 1) // edge_bucket_multiple
                 ) * edge_bucket_multiple
        cache_key = (P, E, edge_bucket_multiple, sort_by_robot)
        c = self._cache
        # sort_by_robot re-orders existing rows whenever factors arrive,
        # so only the unsorted layout is cached incrementally
        if (c is None or c["key"] != cache_key or sort_by_robot or
                c["n_nodes"] > self.num_nodes or
                c["n_factors"] > self.num_factors):
            return self._build_arrays_full(P, E, sort_by_robot, cache_key)
        np_arr, dev = c["np"], c["dev"]
        changed = set()
        if self._estimates_dirty or c["n_nodes"] < self.num_nodes:
            n0 = c["n_nodes"] if not self._estimates_dirty else 0
            if self.num_nodes > n0:
                np_arr["R"][n0:self.num_nodes] = np.stack(self.R[n0:])
                np_arr["t"][n0:self.num_nodes] = np.stack(self.t[n0:])
            np_arr["node_mask"][c["n_nodes"]:self.num_nodes] = 1.0
            changed |= {"R", "t"}
            if c["n_nodes"] < self.num_nodes:
                changed.add("node_mask")
            c["n_nodes"] = self.num_nodes
            self._estimates_dirty = False
        if c["n_factors"] < self.num_factors:
            for k in range(c["n_factors"], self.num_factors):
                f = self.factors[k]
                np_arr["e_i"][k] = self.key_to_index[f.key_from]
                np_arr["e_j"][k] = self.key_to_index[f.key_to]
                np_arr["R_meas"][k] = f.R
                np_arr["t_meas"][k] = f.t
                np_arr["sqrt_info"][k] = f.sqrt_info
                np_arr["edge_mask"][k] = 1.0
                np_arr["is_loop"][k] = 1.0 if f.is_loop else 0.0
            changed |= {"e_i", "e_j", "R_meas", "t_meas", "sqrt_info",
                        "edge_mask", "is_loop"}
            c["n_factors"] = self.num_factors
        for name in changed:
            # .copy(): jnp.asarray of an aligned numpy array can alias
            # its buffer on the CPU backend; later in-place mutation of
            # the mirror would corrupt the "device" array
            dev[name] = jnp.asarray(np_arr[name].copy())
        if self._prior_dirty:
            prior_idx = self.key_to_index.get(
                self.prior_key, 0) if self.prior_key is not None else 0
            dev["prior_idx"] = jnp.asarray(prior_idx, dtype=jnp.int32)
            dev["prior_R"] = jnp.asarray(self.prior_R)
            dev["prior_t"] = jnp.asarray(self.prior_t)
            dev["prior_weight"] = jnp.asarray(self.prior_weight,
                                              dtype=jnp.float32)
            self._prior_dirty = False
        return GraphArrays(**dev)

    def _build_arrays_full(self, P, E, sort_by_robot, cache_key):
        factors = self.factors
        if sort_by_robot:
            factors = sorted(
                factors,
                key=lambda f: min(f.key_from[0], f.key_to[0]))
        R = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
        t = np.zeros((P, 3), dtype=np.float32)
        R[:self.num_nodes] = np.stack(self.R) if self.R else R[:0]
        t[:self.num_nodes] = np.stack(self.t) if self.t else t[:0]
        node_mask = np.zeros(P, dtype=np.float32)
        node_mask[:self.num_nodes] = 1.0

        e_i = np.zeros(E, dtype=np.int32)
        e_j = np.zeros(E, dtype=np.int32)
        R_meas = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        t_meas = np.zeros((E, 3), dtype=np.float32)
        sqrt_info = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))
        edge_mask = np.zeros(E, dtype=np.float32)
        is_loop = np.zeros(E, dtype=np.float32)
        for k, f in enumerate(factors):
            e_i[k] = self.key_to_index[f.key_from]
            e_j[k] = self.key_to_index[f.key_to]
            R_meas[k] = f.R
            t_meas[k] = f.t
            sqrt_info[k] = f.sqrt_info
            edge_mask[k] = 1.0
            is_loop[k] = 1.0 if f.is_loop else 0.0

        prior_idx = self.key_to_index.get(
            self.prior_key, 0) if self.prior_key is not None else 0

        np_arr = {"R": R, "t": t, "node_mask": node_mask, "e_i": e_i,
                  "e_j": e_j, "R_meas": R_meas, "t_meas": t_meas,
                  "sqrt_info": sqrt_info, "edge_mask": edge_mask,
                  "is_loop": is_loop}
        dev = {name: jnp.asarray(a.copy()) for name, a in np_arr.items()}
        dev.update(
            prior_idx=jnp.asarray(prior_idx, dtype=jnp.int32),
            prior_R=jnp.asarray(self.prior_R),
            prior_t=jnp.asarray(self.prior_t),
            prior_weight=jnp.asarray(self.prior_weight, dtype=jnp.float32))
        if not sort_by_robot:
            self._cache = {"key": cache_key, "np": np_arr, "dev": dev,
                           "n_nodes": self.num_nodes,
                           "n_factors": self.num_factors}
            self._estimates_dirty = False
            self._prior_dirty = False
        return GraphArrays(**dev)

    def update_estimates(self, R, t):
        """Write optimized estimates back into the host-side store.

        Accepts device or host arrays; pulls both in ONE device_get
        (two separate np.asarray calls are two relay roundtrips)."""
        import jax
        R, t = jax.device_get((R, t))
        R = np.asarray(R)
        t = np.asarray(t)
        for idx in range(self.num_nodes):
            self.R[idx] = R[idx]
            self.t[idx] = t[idx]
        self._estimates_dirty = True

    def estimates_for_robot(self, robot_id: int):
        """Per-robot extraction by key label (reference
        share_optimized_estimates, decentralized_pgo.cpp:712-728)."""
        out = {}
        for key, idx in self.key_to_index.items():
            if key[0] == robot_id:
                out[key] = (self.R[idx], self.t[idx])
        return out
