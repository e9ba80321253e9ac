"""Algebraic-connectivity maximization semantics.

Mirrors the correctness contract of the reference's
tests/test_algebraic_connectivity.py: selection cardinality, greedy init,
incremental add/fix/remove, candidate->fixed migration, disconnection
handling, rekey offsets with missing robots, key round-trips, multi-robot
bounds, duplicate-match max-weight dedup.
"""

import random

import numpy as np
import pytest

from cslam_tpu.sparsification.acm import AlgebraicConnectivityMaximization
from cslam_tpu.sparsification.mac import MAC, DisconnectedGraphError
from cslam_tpu.utils.edges import Edge, EdgeInterRobot


def build_simple_graph(nb_poses, nb_candidate_edges, rng):
    fixed_edges_list = []
    candidate_edges = {}
    while len(candidate_edges) < nb_candidate_edges:
        a, b = rng.choice(nb_poses), rng.choice(nb_poses)
        edge = EdgeInterRobot(0, int(a), 0, int(b), 1.0)
        candidate_edges[(edge.robot0_keyframe_id,
                         edge.robot1_keyframe_id)] = edge
    return fixed_edges_list, list(candidate_edges.values())


def build_multi_robot_graph(nb_poses, nb_candidate_edges, max_nb_robots, rng):
    fixed_edges_list = [
        EdgeInterRobot(i, nb_poses - 1, i + 1, nb_poses - 1, 1.0)
        for i in range(max_nb_robots - 1)
    ]
    candidate_edges = {}
    while len(candidate_edges) < nb_candidate_edges:
        r0 = int(rng.choice(max_nb_robots))
        r1 = int(rng.choice(sorted(set(range(max_nb_robots)) - {r0})))
        e = EdgeInterRobot(r0, int(rng.choice(nb_poses)), r1,
                           int(rng.choice(nb_poses)), 1.0)
        if e.robot0_id < e.robot1_id:
            key = (e.robot0_id, e.robot0_keyframe_id, e.robot1_id,
                   e.robot1_keyframe_id)
        else:
            key = (e.robot1_id, e.robot1_keyframe_id, e.robot0_id,
                   e.robot0_keyframe_id)
        candidate_edges[key] = e
    return fixed_edges_list, list(candidate_edges.values())


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_simple_graph(rng):
    fixed, cand = build_simple_graph(100, 50, rng)
    ac = AlgebraicConnectivityMaximization()
    ac.set_graph(fixed, cand)
    selection = ac.select_candidates(10, {0: True},
                                     greedy_initialization=False)
    assert len(selection) == 10


def test_greedy_initialization(rng):
    fixed, cand = build_simple_graph(100, 50, rng)
    weights = rng.random(50)
    ac = AlgebraicConnectivityMaximization()
    cand = [ac.replace_weight(e, w) for e, w in zip(cand, weights)]
    ac.set_graph(fixed, cand)
    inc = ac.check_graph_disconnections({0: True})
    ac.compute_offsets(inc)
    edges = ac.rekey_edges(list(ac.candidate_edges.values()), inc)
    w_init = ac.greedy_initialization(10, edges)
    got = np.sum(np.array([e.weight for e in edges])[w_init.astype(bool)])
    want = np.sum(np.sort(weights)[-10:])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_greedy_initialization_zero_budget(rng):
    """Zero budget selects nothing (reference defect fixed, SURVEY §7)."""
    fixed, cand = build_simple_graph(20, 10, rng)
    ac = AlgebraicConnectivityMaximization()
    ac.set_graph(fixed, cand)
    inc = ac.check_graph_disconnections({0: True})
    ac.compute_offsets(inc)
    edges = ac.rekey_edges(list(ac.candidate_edges.values()), inc)
    assert ac.greedy_initialization(0, edges).sum() == 0


def test_add_measurements(rng):
    fixed, cand = build_simple_graph(100, 50, rng)
    ac = AlgebraicConnectivityMaximization()
    ac.set_graph(fixed, cand)
    considered = {0: True}
    assert len(ac.select_candidates(10, considered, False)) == 10
    for _ in range(10):
        ac.add_candidate_edge(
            EdgeInterRobot(0, int(rng.choice(100)), 0, int(rng.choice(100)),
                           1.0))
    assert len(ac.select_candidates(10, considered, False)) == 10
    assert len(ac.select_candidates(12, considered, False)) == 12
    for _ in range(10):
        ac.add_candidate_edge(
            EdgeInterRobot(0, int(rng.choice(100)), 0, int(rng.choice(100)),
                           1.0))
    assert len(ac.select_candidates(12, considered, False)) == 12


def test_fixed_loop_closures(rng):
    fixed, cand = build_simple_graph(100, 50, rng)
    ac = AlgebraicConnectivityMaximization()
    ac.set_graph(fixed, cand)
    considered = {0: True}
    assert len(ac.select_candidates(10, considered, False)) == 10
    for _ in range(10):
        ac.add_fixed_edge(
            EdgeInterRobot(0, int(rng.choice(100)), 0, int(rng.choice(100)),
                           1.0))
    assert len(ac.select_candidates(10, considered, False)) == 10


def test_remove_candidate0(rng):
    fixed, cand = build_simple_graph(100, 50, rng)
    ac = AlgebraicConnectivityMaximization()
    ac.set_graph(fixed, cand)
    before = ac.candidate_edges.copy()
    selection0 = ac.select_candidates(10, {0: True}, False)
    assert len(selection0) == 10
    seen = set()
    for e in selection0:
        assert e in list(before.values())
        seen.add(e)
    assert len(seen) == 10
    nb0 = len(ac.candidate_edges)
    ac.remove_candidate_edges(list(ac.candidate_edges.values())[:10])
    nb1 = len(ac.candidate_edges)
    assert nb0 == nb1 + 10


def test_remove_candidate1(rng):
    fixed, cand = build_multi_robot_graph(10, 10, 3, rng)
    ac = AlgebraicConnectivityMaximization(robot_id=0, max_nb_robots=3)
    ac.set_graph(fixed, cand)
    before = ac.candidate_edges.copy()
    considered = {i: True for i in range(3)}
    selection0 = ac.select_candidates(3, considered, False)
    assert len(selection0) == 3
    for e in selection0:
        assert e in list(before.values())
    nb0 = len(ac.candidate_edges)
    ac.remove_candidate_edges([list(ac.candidate_edges.values())[0]])
    assert nb0 == len(ac.candidate_edges) + 1
    ac.remove_candidate_edges([EdgeInterRobot(0, 1, 4, 1, 1.0)])
    assert nb0 == len(ac.candidate_edges) + 1


def test_candidate_to_fixed(rng):
    fixed, cand = build_simple_graph(100, 50, rng)
    ac = AlgebraicConnectivityMaximization()
    ac.set_graph(fixed, cand)
    before = ac.candidate_edges.copy()
    considered = {0: True}
    selection0 = ac.select_candidates(10, considered, False)
    assert len(selection0) == 10
    ac.candidate_edges_to_fixed(selection0)
    for e in selection0:
        assert e not in list(ac.candidate_edges.values())
    selection1 = ac.select_candidates(10, considered, False)
    for e in selection1:
        assert e in list(before.values())
    for e0 in selection0:
        for e1 in selection1:
            assert not (e0.robot0_keyframe_id == e1.robot0_keyframe_id
                        and e0.robot1_keyframe_id == e1.robot1_keyframe_id)


def test_check_graph_disconnections(rng):
    considered = {i: True for i in range(3)}
    fixed, cand = build_multi_robot_graph(10, 10, 3, rng)
    ac = AlgebraicConnectivityMaximization(robot_id=0, max_nb_robots=3)
    ac.set_graph(fixed, cand)
    included = ac.check_graph_disconnections(considered)
    assert all(included.values())

    considered[1] = False
    included = ac.check_graph_disconnections(considered)
    for r, inc in included.items():
        assert inc == considered[r]
    considered[1] = True

    # robot 0 has no edges at all
    fixed, cand = build_multi_robot_graph(10, 10, 3, rng)
    fixed = [e for e in fixed if 0 not in (e.robot0_id, e.robot1_id)]
    cand = [e for e in cand if 0 not in (e.robot0_id, e.robot1_id)]
    ac = AlgebraicConnectivityMaximization(robot_id=1, max_nb_robots=3)
    ac.set_graph(fixed, cand)
    included = ac.check_graph_disconnections(considered)
    assert not included[0]
    assert included[1] and included[2]


def test_compute_offsets(rng):
    fixed, cand = build_multi_robot_graph(10, 10, 5, rng)
    ac = AlgebraicConnectivityMaximization(robot_id=1, max_nb_robots=5)
    ac.set_graph(fixed, cand)
    considered = {i: True for i in range(5)}
    included = ac.check_graph_disconnections(considered)
    ac.compute_offsets(included)
    nb = ac.nb_poses
    assert ac.offsets[0] == 0
    for r in range(1, 5):
        assert ac.offsets[r] == ac.offsets[r - 1] + nb[r - 1]

    # robot 0 not connected
    fixed = [e for e in fixed if 0 not in (e.robot0_id, e.robot1_id)]
    cand = [e for e in cand if 0 not in (e.robot0_id, e.robot1_id)]
    ac = AlgebraicConnectivityMaximization(robot_id=1, max_nb_robots=5)
    ac.set_graph(fixed, cand)
    included = ac.check_graph_disconnections(considered)
    ac.compute_offsets(included)
    assert ac.offsets[0] == 0 and ac.offsets[1] == 0
    assert ac.offsets[2] == ac.offsets[1] + nb[1]
    assert ac.offsets[3] == ac.offsets[2] + nb[2]
    assert ac.offsets[4] == ac.offsets[3] + nb[3]

    # robots 0 and 3 not connected
    fixed = [e for e in fixed if 3 not in (e.robot0_id, e.robot1_id)]
    cand = [e for e in cand if 3 not in (e.robot0_id, e.robot1_id)]
    fixed.append(EdgeInterRobot(1, 1, 4, 1, 1.0))
    ac = AlgebraicConnectivityMaximization(robot_id=1, max_nb_robots=5)
    ac.set_graph(fixed, cand)
    included = ac.check_graph_disconnections(considered)
    ac.compute_offsets(included)
    assert ac.offsets[0] == 0 and ac.offsets[1] == 0 and ac.offsets[3] == 0
    assert ac.offsets[2] == ac.offsets[1] + nb[1]
    assert ac.offsets[4] == ac.offsets[2] + nb[2]


def test_keys_roundtrip(rng):
    nb_poses = 10
    fixed, cand = build_multi_robot_graph(nb_poses, 10, 3, rng)
    ac = AlgebraicConnectivityMaximization(robot_id=0, max_nb_robots=3)
    ac.set_graph(fixed, cand)
    considered = {i: True for i in range(3)}
    included = ac.check_graph_disconnections(considered)
    ac.compute_offsets(included)
    rekeyed_fixed = ac.rekey_edges(ac.fixed_edges, included)
    assert len(ac.fixed_edges) == 2
    rekeyed_fixed.extend(ac.fill_odometry())
    assert len(rekeyed_fixed) == 3 * (nb_poses - 1) + 2
    rekeyed_cand = ac.rekey_edges(list(ac.candidate_edges.values()), included)
    values = list(ac.candidate_edges.values())
    for e, r in zip(values, rekeyed_cand):
        assert r.i == e.robot0_keyframe_id + e.robot0_id * 10
        assert r.j == e.robot1_keyframe_id + e.robot1_id * 10
    recovered = ac.recover_inter_robot_edges(rekeyed_cand, included)
    for e, r in zip(values, recovered):
        assert r.robot0_keyframe_id == e.robot0_keyframe_id
        assert r.robot1_keyframe_id == e.robot1_keyframe_id


@pytest.mark.parametrize("robot_id", [0, 1])
def test_multi_robot_edges(rng, robot_id):
    nb_poses, max_nb_robots = 100, 3
    fixed, cand = build_multi_robot_graph(nb_poses, 100, max_nb_robots, rng)
    ac = AlgebraicConnectivityMaximization(robot_id=robot_id,
                                           max_nb_robots=max_nb_robots)
    ac.set_graph(fixed, cand)
    considered = {i: True for i in range(max_nb_robots)}
    selection = ac.select_candidates(10, considered, False)
    assert len(selection) == 10
    for s in selection:
        assert 0 <= s.robot0_keyframe_id < nb_poses
        assert 0 <= s.robot1_keyframe_id < nb_poses
        assert 0 <= s.robot0_id < max_nb_robots
        assert 0 <= s.robot1_id < max_nb_robots


def test_add_match():
    ac = AlgebraicConnectivityMaximization(robot_id=0, max_nb_robots=3)
    ac.add_match(EdgeInterRobot(0, 1, 1, 3, 0.1))
    assert len(ac.candidate_edges) == 1
    ac.add_match(EdgeInterRobot(0, 2, 2, 4, 0.1))
    assert len(ac.candidate_edges) == 2
    ac.add_match(EdgeInterRobot(0, 1, 1, 3, 0.2))
    assert len(ac.candidate_edges) == 2
    assert ac.candidate_edges[(0, 1, 1, 3)].weight == pytest.approx(0.2)


def test_mac_improves_over_random_and_respects_budget(rng):
    """MAC's selection should achieve lambda_2 >= a random selection's."""
    fixed, cand = build_simple_graph(60, 40, rng)
    ac = AlgebraicConnectivityMaximization()
    ac.set_graph(fixed, cand)
    included = ac.check_graph_disconnections({0: True})
    ac.compute_offsets(included)
    rekeyed_fixed = ac.rekey_edges(ac.fixed_edges, included)
    rekeyed_fixed.extend(ac.fill_odometry())
    rekeyed_cand = ac.rekey_edges(list(ac.candidate_edges.values()), included)
    ac.total_nb_poses = sum(ac.nb_poses.values())
    k = 8
    mac = MAC(rekeyed_fixed, rekeyed_cand, ac.total_nb_poses)
    w_init = ac.greedy_initialization(k, rekeyed_cand)
    res = mac.fw_subset(w_init, k, max_iters=20)
    assert int(res.w.sum()) == k
    mac_obj = mac.evaluate_objective(res.w)
    # random baseline (average of a few)
    rand_objs = []
    for _ in range(5):
        w_rand = np.zeros(len(rekeyed_cand), np.float32)
        w_rand[rng.choice(len(rekeyed_cand), size=k, replace=False)] = 1.0
        rand_objs.append(mac.evaluate_objective(w_rand))
    assert mac_obj >= np.mean(rand_objs) - 1e-5
    # the dual upper-bounds the achieved objective
    assert res.upper_bound >= mac_obj - 1e-5


def test_mac_disconnected_raises():
    # two disjoint odometry chains, candidate edge within one chain only
    fixed = [Edge(0, 1, 1.0), Edge(2, 3, 1.0)]
    cand = [Edge(0, 1, 0.5)]
    mac = MAC(fixed, cand, 4)
    with pytest.raises(DisconnectedGraphError):
        mac.fw_subset(np.array([1.0]), 1)


def test_candidate_selection_min_weight_floor(rng):
    """frontend.candidate_selection_min_weight keeps low-similarity
    candidates OUT of the budgeted selection but IN the pool (they can
    be promoted later by the max-weight dedup). Measured basis:
    SCALING.md §5 — at 8 robots every failed verification carried
    weight <= 0.70 while successes had median 0.87."""
    fixed, cand = build_simple_graph(60, 40, rng)
    weights = np.concatenate([np.full(20, 0.55), np.full(20, 0.9)])
    ac = AlgebraicConnectivityMaximization(extra_params={
        "frontend.enable_sparsification": True,
        "frontend.candidate_selection_min_weight": 0.7,
    })
    cand = [ac.replace_weight(e, float(w)) for e, w in zip(cand, weights)]
    ac.set_graph(fixed, cand)
    selection = ac.select_candidates(10, {0: True},
                                     greedy_initialization=False)
    assert len(selection) == 10
    assert all(e.weight >= 0.7 for e in selection)
    # below-floor candidates remain in the pool
    remaining = [e.weight for e in ac.candidate_edges.values()]
    assert sum(1 for w in remaining if w < 0.7) == 20
    # a later higher-weight re-observation of a below-floor pair
    # promotes it into selectability
    low = [e for e in cand if e.weight < 0.7][0]
    ac.add_match(ac.replace_weight(low, 0.95))
    key = ac.edge_key(low)
    assert ac.candidate_edges[key].weight == pytest.approx(0.95)


def test_selection_floor_backfills_instead_of_starving(rng):
    """The floor prioritizes — it must never return an empty selection
    while candidates exist (regression: a 2-robot crash-resume mission
    had every candidate below the 0.7 launch floor and selected ZERO,
    losing all loop closures)."""
    fixed, cand = build_simple_graph(60, 40, rng)
    # every candidate below the floor
    cand = [AlgebraicConnectivityMaximization().replace_weight(e, 0.4 + 0.005 * i)
            for i, e in enumerate(cand)]
    ac = AlgebraicConnectivityMaximization(extra_params={
        "frontend.enable_sparsification": True,
        "frontend.candidate_selection_min_weight": 0.7,
    })
    ac.set_graph(fixed, cand)
    selection = ac.select_candidates(5, {0: True},
                                     greedy_initialization=False)
    assert len(selection) == 5
    # with zero above-floor candidates and budget 5, the backfilled
    # pool is exactly the top-5 below-floor weights — all selected
    chosen = sorted(e.weight for e in selection)
    offered = sorted((0.4 + 0.005 * i for i in range(40)),
                     reverse=True)[:5]
    np.testing.assert_allclose(chosen, sorted(offered), atol=1e-9)
