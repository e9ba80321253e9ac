"""Device-resident global-descriptor database with cosine kNN search.

Capability parity with the reference's `NearestNeighborsMatching`
(/root/reference/cslam/nns_matching.py): add_item / search / search_best
with identical return semantics (items sorted by descending cosine
similarity; min(k, n) results). The implementation is TPU-native:

- fixed-capacity device buffer, padded rows masked; capacity growth is a
  power-of-two re-bucket (one recompile per bucket) instead of the
  reference's torch.concat doubling (nns_matching.py:33-38);
- search is one MXU matmul + on-device top-k (ops/knn.py), so arbitrary
  query batches cost one kernel launch.
"""

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from cslam_tpu.ops import knn

_INITIAL_CAPACITY = 1024


class DescriptorDatabase:
    """Append-only descriptor store with brute-force cosine kNN."""

    def __init__(self, dim: Optional[int] = None,
                 capacity: int = _INITIAL_CAPACITY, method: str = "auto",
                 storage: str = "float32"):
        """method: "exact" (lax.top_k; deterministic, matches the
        reference's torch.topk semantics) or "approx"
        (lax.approx_max_k, recall ~0.95; measured 8x faster on v5e at
        100k x 512 because the hardware partial reduction fuses with
        the similarity matmul while exact top_k costs ~8x the matmul —
        the right choice when results feed geometric verification, as
        loop-closure candidates do), "pallas" (the fused streaming
        kernel ops/knn_pallas.py: exact results, 2.8x the XLA exact
        throughput on v5e; TPU-only — it has no CPU lowering), or
        "auto" (default: "pallas" when the default JAX backend is a
        TPU, else "exact" — so the same code is fast in production and
        deterministic-portable in CPU tests).

        storage: "float32" or "bfloat16". bf16 halves the database's HBM
        footprint/traffic and lets the Pallas kernel's matmul run the
        MXU's native bf16 path (~2x) — brute-force search is then exact
        over bf16-rounded descriptors (cosine error ~0.3%, top-k recall
        vs f32 ~1.0 at CNN-descriptor separations). Norms are kept in
        f32, computed from the rounded values actually stored."""
        if method not in ("auto", "exact", "approx", "pallas"):
            raise ValueError(f"unknown search method: {method!r}")
        if storage not in ("float32", "bfloat16"):
            raise ValueError(f"unknown storage dtype: {storage!r}")
        self.n = 0
        self.dim = dim
        self.method = method
        self._dtype = jnp.dtype(storage)
        self.items: Dict[int, Any] = {}
        self._capacity = capacity
        self._data = None
        if dim is not None:
            self._alloc(dim)

    def _topk(self, queries, k):
        if self.method == "auto":
            import jax
            self.method = ("pallas" if jax.default_backend() == "tpu"
                           else "exact")
        if self.method == "pallas":
            from cslam_tpu.ops.knn_pallas import cosine_topk_pallas
            return cosine_topk_pallas(self._data, self.n, queries, k,
                                      data_norms=self._norms)
        fn = (knn.cosine_topk if self.method == "exact"
              else knn.cosine_topk_approx)
        return fn(self._data, self.n, queries, k, data_norms=self._norms)

    def _alloc(self, dim: int):
        self.dim = dim
        self._data = jnp.zeros((self._capacity, dim), dtype=self._dtype)
        # row norms maintained incrementally: searches become a single
        # HBM pass (and avoid XLA's per-tile norm-recompute pathology,
        # ops/knn.py)
        self._norms = jnp.zeros((self._capacity,), dtype=jnp.float32)

    def __len__(self):
        return self.n

    @property
    def data(self):
        """Device array view (including padding rows)."""
        return self._data

    def add_item(self, vector, item):
        """Add a descriptor with its identification info (e.g. keyframe id)."""
        vector = np.asarray(vector, dtype=np.float32).reshape(-1)
        if self._data is None:
            self._alloc(vector.shape[0])
        if vector.shape[0] != self.dim:
            raise ValueError(
                f"descriptor dim {vector.shape[0]} != database dim {self.dim}")
        if self.n >= self._capacity:
            self._capacity *= 2
            self._data = knn.grow(self._data, self._capacity)
            self._norms = jnp.concatenate(
                [self._norms,
                 jnp.zeros((self._capacity // 2,), dtype=jnp.float32)])
        stored = vector.astype(self._dtype).astype(np.float32)
        self._data = knn.set_row(self._data, self.n,
                                 jnp.asarray(vector, dtype=self._dtype))
        # norm of the values as stored (bf16-rounded when applicable)
        self._norms = self._norms.at[self.n].set(
            float(np.linalg.norm(stored)))
        self.items[self.n] = item
        self.n += 1

    def search(self, query, k: int) -> Tuple[List[Any], np.ndarray]:
        """k nearest items by cosine similarity, descending.

        Returns ([], []) when empty, otherwise (items, similarities) of
        length min(k, n) — matching nns_matching.py:44-63.
        """
        if self.n == 0:
            return [], np.array([])
        query = np.asarray(query, dtype=np.float32).reshape(1, self.dim)
        k_eff = min(k, self.n)
        idx, sims = self._topk(jnp.asarray(query), min(k, self._capacity))
        idx = np.asarray(idx[0][:k_eff])
        sims = np.asarray(sims[0][:k_eff])
        return [self.items[int(i)] for i in idx], sims

    def search_best(self, query):
        """Single nearest item; (None, None) when empty."""
        if self.n == 0:
            return None, None
        items, sims = self.search(query, 1)
        return items[0], sims[0]

    def batch_search(self, queries, k: int):
        """Batched search: (B, dim) queries -> (B, k') indices/items/sims."""
        if self.n == 0:
            return [], np.zeros((0, 0))
        queries = np.asarray(queries, dtype=np.float32).reshape(-1, self.dim)
        k_eff = min(k, self.n)
        idx, sims = self._topk(jnp.asarray(queries), min(k, self._capacity))
        idx = np.asarray(idx[:, :k_eff])
        sims = np.asarray(sims[:, :k_eff])
        items = [[self.items[int(i)] for i in row] for row in idx]
        return items, sims
