"""MAC matrix-free (LOBPCG) path for large graphs: consistency with the
dense path and end-to-end selection on a >2048-node graph."""

import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.sparsification import mac as mac_mod
from cslam_tpu.sparsification.mac import MAC
from cslam_tpu.utils.edges import Edge


def chain_with_candidates(rng, n_poses, n_cand):
    fixed = [Edge(i, i + 1, 1.0) for i in range(n_poses - 1)]
    cand = []
    seen = set()
    while len(cand) < n_cand:
        i, j = sorted(rng.integers(0, n_poses, 2).tolist())
        if j - i < 2 or (i, j) in seen:
            continue
        seen.add((i, j))
        cand.append(Edge(i, j, float(rng.random()) + 0.1))
    return fixed, cand


def test_lobpcg_path_matches_dense_selection():
    """Force both paths on the same medium graph; selections should
    agree (the FW trajectory is identical up to eigensolver noise)."""
    rng = np.random.default_rng(0)
    fixed, cand = chain_with_candidates(rng, 120, 40)
    k = 6
    mac = MAC(fixed, cand, 120)
    assert not mac.use_lobpcg
    w0 = np.zeros(len(cand), np.float32)
    w0[np.argsort([e.weight for e in cand])[-k:]] = 1.0
    res_dense = mac.fw_subset(w0, k, max_iters=10)

    mac.use_lobpcg = True  # force the matrix-free path
    res_lobpcg = mac.fw_subset(w0, k, max_iters=10)
    assert int(res_lobpcg.w.sum()) == k
    # objective of the lobpcg selection is close to the dense one
    mac.use_lobpcg = False
    obj_dense = mac.evaluate_objective(res_dense.w)
    obj_lobpcg = mac.evaluate_objective(res_lobpcg.w)
    assert obj_lobpcg >= obj_dense * 0.8


def test_large_graph_uses_lobpcg_and_selects():
    rng = np.random.default_rng(1)
    n_poses = 3000  # > _LOBPCG_NODE_THRESHOLD
    fixed, cand = chain_with_candidates(rng, n_poses, 64)
    k = 8
    mac = MAC(fixed, cand, n_poses)
    assert mac.use_lobpcg
    w0 = np.zeros(len(cand), np.float32)
    w0[np.argsort([e.weight for e in cand])[-k:]] = 1.0
    res = mac.fw_subset(w0, k, max_iters=5)
    assert int(res.w.sum()) == k
    assert np.isfinite(res.upper_bound)


def test_warm_lobpcg_matches_eigh_quality():
    """The default warm-started LOBPCG Fiedler tracking must reach
    selections at least as connective as the exact eigh path."""
    rng = np.random.default_rng(7)
    fixed, cand = chain_with_candidates(rng, 200, 60)
    k = 8
    mac = MAC(fixed, cand, 200)
    assert mac.fiedler_method == "warm-lobpcg"
    w0 = np.zeros(len(cand), np.float32)
    w0[np.argsort([e.weight for e in cand])[-k:]] = 1.0
    res_warm = mac.fw_subset(w0, k, max_iters=20)
    mac.fiedler_method = "eigh"
    res_eigh = mac.fw_subset(w0, k, max_iters=20)
    assert int(res_warm.w.sum()) == k
    obj_warm = mac.evaluate_objective(res_warm.w)
    obj_eigh = mac.evaluate_objective(res_eigh.w)
    assert obj_warm >= obj_eigh * 0.9, (obj_warm, obj_eigh)


def test_reference_defaults_pinned():
    """Defaults must match the reference: fw_subset max_iters resolves
    to 20, duality-gap tol 1e-8 (reference mac.py:191, a_c_m.py:39).
    max_iters defaults to a None sentinel so an EXPLICIT caller budget
    is always honored while the default can take the measured-better
    matfree cap at map scale."""
    import inspect
    sig = inspect.signature(MAC.fw_subset)
    assert sig.parameters["max_iters"].default is None
    assert sig.parameters["duality_gap_tol"].default == 1e-8


def test_explicit_max_iters_honored_on_matfree():
    """An explicit max_iters must NOT be clamped to fw_matfree_iters
    (advisor round-4 finding): the caller owns the budget."""
    rng = np.random.default_rng(5)
    n = 40
    fixed = [Edge(i, i + 1, 1.0) for i in range(n - 1)]
    cand = [Edge(int(a), int(b), float(w)) for a, b, w in zip(
        rng.integers(0, n, 30), rng.integers(0, n, 30),
        rng.uniform(0.2, 1.0, 30)) if a != b]
    mac = MAC(fixed, cand, n)
    mac.fiedler_method = "matfree"
    mac.fw_matfree_iters = 1
    seen = {}
    orig = mac.__class__.fw_subset

    w0 = np.zeros(len(cand), np.float32)
    w0[: min(4, len(cand))] = 1.0
    # trace through _fw_subset's max_iters by monkeypatching the jitted
    # entry is invasive; instead assert via the resolution logic itself:
    # default -> capped only at map scale (small P here, so 20), explicit
    # deep budget -> passed through.
    import cslam_tpu.sparsification.mac as mac_mod
    calls = []
    real_fw = mac_mod._fw_subset

    def spy(*args, **kwargs):
        calls.append(kwargs.get("max_iters"))
        return real_fw(*args, **kwargs)

    mac_mod._fw_subset = spy
    try:
        mac.fw_subset(w0, 4, max_iters=17)
        mac.fw_subset(w0, 4)
    finally:
        mac_mod._fw_subset = real_fw
    assert calls[0] == 17
    assert calls[1] == 20  # small P: no matfree cap on the default
