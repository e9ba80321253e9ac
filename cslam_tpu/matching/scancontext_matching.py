"""Scan Context database: two-stage rotation-invariant matching.

Capability parity with the reference `ScanContextMatching`
(/root/reference/cslam/lidar_pr/scancontext_matching.py): add_item /
search / search_best, stage 1 = ring-key nearest neighbors (KDTree ->
brute-force TPU top-k), stage 2 = full 60-shift circular cosine distance
over the shortlisted candidates, returning the single best item and
similarity = 1 - distance.
"""

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from cslam_tpu.ops import scancontext as sc_ops

_INITIAL_CAPACITY = 1024


class ScanContextMatching:

    def __init__(self, shape=(20, 60), num_candidates: int = 10,
                 threshold: float = 0.15,
                 capacity: int = _INITIAL_CAPACITY):
        self.shape = tuple(shape)
        self.num_candidates = num_candidates
        self.threshold = threshold
        self._capacity = capacity
        self.nb_items = 0
        self.items: Dict[int, Any] = {}
        self._scs = jnp.zeros((capacity,) + self.shape, dtype=jnp.float32)
        self._ringkeys = jnp.zeros((capacity, self.shape[0]),
                                   dtype=jnp.float32)

    def __len__(self):
        return self.nb_items

    @property
    def data(self):
        """Flattened descriptor view (parity with DescriptorDatabase.data)."""
        return self._scs.reshape(self._capacity, -1)

    def add_item(self, descriptor, item):
        sc = jnp.asarray(np.asarray(descriptor, dtype=np.float32).reshape(
            self.shape))
        if self.nb_items >= self._capacity:
            grow = self._capacity
            self._scs = jnp.concatenate(
                [self._scs,
                 jnp.zeros((grow,) + self.shape, dtype=jnp.float32)])
            self._ringkeys = jnp.concatenate(
                [self._ringkeys,
                 jnp.zeros((grow, self.shape[0]), dtype=jnp.float32)])
            self._capacity *= 2
        rk = sc_ops.ring_key(sc)
        self._scs = self._scs.at[self.nb_items].set(sc)
        self._ringkeys = self._ringkeys.at[self.nb_items].set(rk)
        self.items[self.nb_items] = item
        self.nb_items += 1

    def search(self, query, k):
        """Best match via ring-key shortlist + full SC distance.

        Returns ([item], [similarity]) like the reference (which returns
        only the single best regardless of k, scancontext_matching.py:87)."""
        if self.nb_items < 1:
            return [None], [None]
        query_sc = jnp.asarray(
            np.asarray(query, dtype=np.float32).reshape(self.shape))
        query_rk = sc_ops.ring_key(query_sc)
        n_cand = min(self.num_candidates, self.nb_items,
                     self._capacity)
        idx, _ = sc_ops.ringkey_topk(self._ringkeys, self.nb_items, query_rk,
                                     min(self.num_candidates,
                                         self._capacity))
        idx = np.asarray(idx)[:n_cand]
        cands = self._scs[jnp.asarray(idx)]
        dists, _yaws = sc_ops.scancontext_distances(query_sc, cands)
        dists = np.asarray(dists)
        best = int(np.argmin(dists))
        nn_dist = float(dists[best])
        if nn_dist >= 1.0:  # reference: nn_dist initialized to 1.0
            return [self.items[0]], [0.0]
        return [self.items[int(idx[best])]], [1.0 - nn_dist]

    def search_best(self, query):
        if self.nb_items < 1:
            return None, None
        idxs, sims = self.search(query, 1)
        return idxs[0], sims[0]
