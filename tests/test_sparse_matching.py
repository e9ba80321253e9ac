"""Sparse-matching semantics (mirrors the reference's
tests/test_sparse_matching.py correctness contract)."""

from collections import namedtuple

import numpy as np
import pytest

from cslam_tpu.matching.descriptor_db import DescriptorDatabase
from cslam_tpu.matching.sparse_matching import LoopClosureSparseMatching

GlobalDescriptor = namedtuple("GlobalDescriptor",
                              ["keyframe_id", "robot_id", "descriptor"])


def set_params(**over):
    params = {
        "robot_id": 0,
        "max_nb_robots": 2,
        "frontend.sensor_type": "stereo",
        "frontend.similarity_threshold": 0.0,
        "frontend.enable_sparsification": True,
        "frontend.nb_best_matches": 10,
        "frontend.intra_loop_min_inbetween_keyframes": 10,
        "evaluation.enable_sparsification_comparison": False,
    }
    params.update(over)
    return params


def unit(rng, d):
    v = rng.random(d)
    return v / np.linalg.norm(v)


def test_add_local_global_descriptor():
    rng = np.random.default_rng(0)
    lcsm = LoopClosureSparseMatching(set_params())
    descriptor = unit(rng, 10)
    lcsm.add_local_global_descriptor(descriptor, 1)
    np.testing.assert_allclose(np.asarray(lcsm.local_nnsm.data[0]),
                               descriptor, atol=1e-6)


def test_add_other_robot_global_descriptor():
    rng = np.random.default_rng(1)
    lcsm = LoopClosureSparseMatching(set_params())
    descriptor = unit(rng, 10)
    msg = GlobalDescriptor(0, 1, descriptor.tolist())
    lcsm.add_other_robot_global_descriptor(msg)
    np.testing.assert_allclose(np.asarray(lcsm.other_robots_nnsm[1].data[0]),
                               descriptor, atol=1e-6)


def test_similarity_ordering_matches_euclidean():
    """Cosine-similarity ordering == euclidean ordering on normalized
    vectors (reference test_similarity)."""
    rng = np.random.default_rng(2)
    db = DescriptorDatabase()
    stored = []
    for i in range(100):
        v = unit(rng, 100)
        stored.append(v)
        db.add_item(v, i)
    stored = np.stack(stored)
    for _ in range(20):
        query = unit(rng, 100)
        ds = np.linalg.norm(query[None, :] - stored, axis=1)
        ns_dist = np.argsort(ds)
        items, sims = db.search(query, 100)
        assert np.all(sims[:-1] >= sims[1:])  # sorted descending
        for j in range(100):
            if ns_dist[j] != items[j]:
                # ties in either metric make the order arbitrary
                if (abs(sims[ns_dist[j]] - sims[items[j]]) < 1e-6
                        or abs(ds[ns_dist[j]] - ds[items[j]]) < 1e-6):
                    continue
            assert ns_dist[j] == items[j]
        best_item, _ = db.search_best(query)
        assert best_item == ns_dist[0]


def test_search_returns_min_k_n():
    rng = np.random.default_rng(3)
    db = DescriptorDatabase()
    assert db.search(np.ones(4), 5) == ([], []) or len(db.search(np.ones(4), 5)[0]) == 0
    for i in range(3):
        db.add_item(unit(rng, 4), i)
    items, sims = db.search(unit(rng, 4), 10)
    assert len(items) == 3 and len(sims) == 3


def test_capacity_growth():
    rng = np.random.default_rng(4)
    db = DescriptorDatabase(dim=8, capacity=4)
    for i in range(20):
        db.add_item(unit(rng, 8), i)
    assert len(db) == 20
    q = unit(rng, 8)
    items, sims = db.search(q, 5)
    # brute-force check
    data = np.stack([np.asarray(db.data[i]) for i in range(20)])
    ref = np.argsort(-(data @ q))[:5]
    assert list(items) == [int(i) for i in ref]


def test_matches_cross_robot_bookkeeping():
    """Cross-robot candidate bookkeeping (reference test_matches)."""
    rng = np.random.default_rng(5)
    lcsm = LoopClosureSparseMatching(set_params())
    d0 = unit(rng, 10)
    lcsm.add_local_global_descriptor(d0, 2)
    d1 = 1 - d0
    d1 = d1 / np.linalg.norm(d1)
    lcsm.add_other_robot_global_descriptor(GlobalDescriptor(3, 1, d1.tolist()))
    d2 = d0.copy()
    d2[0] = 0.0
    d2[1] = 0.0
    d2 = d2 / np.linalg.norm(d2)
    lcsm.add_other_robot_global_descriptor(GlobalDescriptor(4, 1, d2.tolist()))

    assert (0, 2, 1, 4) in lcsm.candidate_selector.candidate_edges
    rid = lcsm.candidate_selector.candidate_edges[(0, 2, 1, 4)].robot1_id
    np.testing.assert_allclose(
        np.asarray(lcsm.other_robots_nnsm[rid].data[0]), d1, atol=1e-6)


@pytest.mark.parametrize("max_nb_robots,robot_id,other_ids", [
    (3, 0, (1, 2)),
    (4, 0, (2, 3)),  # robot 1 never seen
    (4, 1, (2, 3)),  # robot 0 never seen
])
def test_select_candidates_budget(max_nb_robots, robot_id, other_ids):
    """Budgeted selection returns exactly the budget when enough
    candidates exist (reference test_select_candidates0/1/2)."""
    rng = np.random.default_rng(6)
    params = set_params(max_nb_robots=max_nb_robots, robot_id=robot_id)
    lcsm = LoopClosureSparseMatching(params)
    for i in range(60):
        lcsm.add_local_global_descriptor(unit(rng, 10), i)
    for rid in other_ids:
        for i in range(60):
            lcsm.add_other_robot_global_descriptor(
                GlobalDescriptor(i, rid, unit(rng, 10).tolist()))
    nb_candidates = 20
    is_robot_considered = {i: True for i in range(max_nb_robots)}
    selection = lcsm.select_candidates(nb_candidates, is_robot_considered)
    assert len(selection) == nb_candidates
    # all selected candidates are removed from the pool and not reselected
    selection2 = lcsm.select_candidates(nb_candidates, is_robot_considered)
    for e in selection2:
        assert e not in selection


def test_match_local_loop_closures_gating():
    """Intra-robot matching skips nearby keyframes and sub-threshold
    similarities (reference match_local_loop_closures semantics)."""
    rng = np.random.default_rng(7)
    params = set_params(**{
        "frontend.similarity_threshold": 0.5,
        "frontend.intra_loop_min_inbetween_keyframes": 5,
    })
    lcsm = LoopClosureSparseMatching(params)
    base = unit(rng, 16)
    lcsm.add_local_global_descriptor(base, 0)
    # nearby keyframe: identical descriptor but too close in id
    lcsm.add_local_global_descriptor(base, 3)
    kf, _ = lcsm.match_local_loop_closures(base, 6)
    assert kf == 0  # keyframe 3 is within min_inbetween, 0 is not
    # orthogonal query: no match above threshold
    q = np.zeros(16)
    q[0] = 1.0
    q = q - np.dot(q, base) * base
    q = q / np.linalg.norm(q)
    kf2, _ = lcsm.match_local_loop_closures(q, 50)
    assert kf2 is None


def test_nns_method_param_selects_approx_db():
    """frontend.nns_method wires DescriptorDatabase(method=...) through
    the matching layer (production throughput config, CLAUDE.md kNN
    notes); search semantics are unchanged for small databases where
    approx_max_k degenerates to exact."""
    rng = np.random.default_rng(3)
    lcsm = LoopClosureSparseMatching(
        set_params(**{"frontend.nns_method": "approx"}))
    assert lcsm.local_nnsm.method == "approx"
    assert all(db.method == "approx"
               for db in lcsm.other_robots_nnsm.values())
    d = unit(rng, 32)
    lcsm.add_other_robot_global_descriptor(GlobalDescriptor(7, 1, d))
    matches = lcsm.add_local_global_descriptor(d, 1)
    assert matches
    assert matches[0].robot1_keyframe_id == 7


def test_bf16_storage_matches_f32_results():
    """DescriptorDatabase(storage="bfloat16"): same top-k items as f32
    storage on separable descriptors, half the device footprint; the
    frontend.nns_storage param wires it through the matching layer."""
    rng = np.random.default_rng(11)
    db32 = DescriptorDatabase(method="exact")
    db16 = DescriptorDatabase(method="exact", storage="bfloat16")
    import jax.numpy as jnp
    for i in range(64):
        v = unit(rng, 64)
        db32.add_item(v, i)
        db16.add_item(v, i)
    assert db16.data.dtype == jnp.bfloat16
    q = unit(rng, 64)
    items32, sims32 = db32.search(q, 5)
    items16, sims16 = db16.search(q, 5)
    assert items32 == items16
    np.testing.assert_allclose(sims16, sims32, atol=2e-2)

    lcsm = LoopClosureSparseMatching(
        set_params(**{"frontend.nns_storage": "bfloat16"}))
    assert lcsm.local_nnsm.data is None  # allocated lazily on first add
    d = unit(rng, 32)
    lcsm.add_other_robot_global_descriptor(GlobalDescriptor(7, 1, d))
    assert lcsm.other_robots_nnsm[1].data.dtype == jnp.bfloat16
    matches = lcsm.add_local_global_descriptor(d, 1)
    assert matches and matches[0].robot1_keyframe_id == 7
